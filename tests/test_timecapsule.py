"""TIMECAPSULE flashback — version query, flashback table, recyclebin.

Mirrors the reference's regress flow
(`src/test/regress/input/timecapsule_version_test_1.source`: create →
insert → update → delete → insert, flashback to each CSN) over the
commit-manifest implementation (`ddl_tables.py` TableManager +
`operators/timecapsule.py`).
"""

from __future__ import annotations

import glob
import os

import pytest

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT


def _eng(spark, tmp_path):
    eng = Engine(spark=spark, sf_dir=SF_CORRECT)
    eng.managed_tables.root = str(tmp_path / "wh")
    return eng


def _rows(eng, sql):
    return sorted(tuple(r) for r in eng.sql(sql).collect())


def test_version_flashback_regress_flow(spark, tmp_path):
    """The t1 flow of timecapsule_version_test_1.source: every
    intermediate CSN reconstructs its exact state."""
    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql("CREATE TABLE t1 (a int)")
    csns = [mt.tables["t1"]["history"][-1]["csn"]]
    eng.sql("INSERT INTO t1 VALUES (1), (2), (3)")
    csns.append(mt.tables["t1"]["history"][-1]["csn"])
    eng.sql("UPDATE t1 SET a = 99 WHERE a = 2")
    csns.append(mt.tables["t1"]["history"][-1]["csn"])
    eng.sql("DELETE FROM t1 WHERE a = 3")
    csns.append(mt.tables["t1"]["history"][-1]["csn"])
    eng.sql("INSERT INTO t1 VALUES (4), (5)")
    csns.append(mt.tables["t1"]["history"][-1]["csn"])
    states = [
        [],
        [(1,), (2,), (3,)],
        [(1,), (3,), (99,)],
        [(1,), (99,)],
        [(1,), (4,), (5,), (99,)],
    ]
    for csn, want in zip(csns, states):
        got = _rows(eng, f"SELECT a FROM t1 TIMECAPSULE CSN {csn}")
        assert got == want, (csn, got, want)
    # WHERE composes with the snapshot scan (regress: `where a < 6`)
    got = _rows(
        eng,
        f"SELECT a FROM t1 TIMECAPSULE CSN {csns[4]} WHERE a < 6",
    )
    assert got == [(1,), (4,), (5,)]
    # live state unchanged by flashback reads
    assert _rows(eng, "SELECT a FROM t1") == states[4]


def test_timestamp_flashback(spark, tmp_path):
    """TIMECAPSULE TIMESTAMP resolves to the last commit at or before
    the instant (tcap_version.cpp's timestamp→CSN mapping)."""
    from datetime import datetime

    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql("CREATE TABLE tt (a int)")
    eng.sql("INSERT INTO tt VALUES (1), (2)")
    ts1 = mt.tables["tt"]["history"][-1]["ts"]
    eng.sql("DELETE FROM tt WHERE a = 2")
    # a literal strictly between the two commits (session tz == local)
    lit = datetime.fromtimestamp(ts1 + 0.0005).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    got = _rows(eng, f"SELECT a FROM tt TIMECAPSULE TIMESTAMP '{lit}'")
    assert got == [(1,), (2,)]
    # too-old timestamp → the reference's "too old" error
    old = datetime.fromtimestamp(ts1 - 3600).strftime("%Y-%m-%d %H:%M:%S")
    with pytest.raises(Exception, match="too old"):
        eng.sql(f"SELECT a FROM tt TIMECAPSULE TIMESTAMP '{old}'")


def test_append_shares_generation(spark, tmp_path):
    """INSERTs append files into ONE generation; the old manifest's
    file subset excludes them (no copy-on-write for appends)."""
    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql("CREATE TABLE ap (a int)")
    eng.sql("INSERT INTO ap VALUES (1)")
    h1 = mt.tables["ap"]["history"][-1]
    eng.sql("INSERT INTO ap VALUES (2)")
    h2 = mt.tables["ap"]["history"][-1]
    assert h1["gen"] == h2["gen"], "appends must not open a generation"
    assert set(h1["files"]) < set(h2["files"])
    assert _rows(eng, f"SELECT a FROM ap TIMECAPSULE CSN {h1['csn']}") \
        == [(1,)]


def test_flashback_table_to_csn(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql("CREATE TABLE ft (a int, b string)")
    eng.sql("INSERT INTO ft VALUES (1, 'x'), (2, 'y')")
    v = mt.tables["ft"]["history"][-1]["csn"]
    eng.sql("UPDATE ft SET b = 'z' WHERE a = 1")
    eng.sql(f"TIMECAPSULE TABLE ft TO CSN {v}")
    assert _rows(eng, "SELECT a, b FROM ft") == [(1, "x"), (2, "y")]
    # the restore is itself a commit — flashback past it still works
    assert mt.tables["ft"]["history"][-1]["tag"] == "timecapsule"


def test_before_drop_and_recyclebin(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE rb (a int)")
    eng.sql("INSERT INTO rb VALUES (7)")
    eng.sql("DROP TABLE rb")
    assert "rb" not in eng.managed_tables.tables
    listing = eng.sql("SELECT * FROM pg_recyclebin").collect()
    assert [r.rcyoriginname for r in listing] == ["rb"]
    # restore under a NEW name (gram.y: TO BEFORE DROP RENAME TO)
    eng.sql("TIMECAPSULE TABLE rb TO BEFORE DROP RENAME TO rb2")
    assert _rows(eng, "SELECT a FROM rb2") == [(7,)]
    assert eng.sql("SELECT * FROM pg_recyclebin").count() == 0
    # drop again without restore, then PURGE frees the storage
    eng.sql("DROP TABLE rb2")
    entry_dir = eng.managed_tables.recyclebin[-1]["dir"]
    assert os.path.isdir(entry_dir)
    eng.sql("PURGE RECYCLEBIN")
    assert not os.path.isdir(entry_dir)
    with pytest.raises(KeyError, match="recyclebin"):
        eng.sql("TIMECAPSULE TABLE rb2 TO BEFORE DROP")


def test_drop_purge_skips_recyclebin(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE dp (a int)")
    tbl_dir = os.path.join(eng.managed_tables.root, "dp")
    eng.sql("DROP TABLE dp PURGE")
    assert eng.managed_tables.recyclebin == []
    assert not os.path.isdir(tbl_dir)


def test_before_truncate(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE tr (a int)")
    eng.sql("INSERT INTO tr VALUES (1), (2), (3)")
    eng.sql("TRUNCATE tr")
    assert eng.sql("SELECT COUNT(*) AS n FROM tr").collect()[0].n == 0
    eng.sql("TIMECAPSULE TABLE tr TO BEFORE TRUNCATE")
    assert _rows(eng, "SELECT a FROM tr") == [(1,), (2,), (3,)]


def test_before_truncate_partitioned(spark, tmp_path):
    """Partitioned TRUNCATE is an O(1) empty generation; TO BEFORE
    TRUNCATE restores rows AND the routing layout."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE ptr (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    eng.sql("INSERT INTO ptr VALUES (1, 1.0), (15, 15.0)")
    eng.sql("TRUNCATE ptr")
    assert eng.sql("SELECT COUNT(*) AS n FROM ptr").collect()[0].n == 0
    eng.sql("TIMECAPSULE TABLE ptr TO BEFORE TRUNCATE")
    assert _rows(eng, "SELECT k FROM ptr") == [(1,), (15,)]
    from opengauss_vectordb_spark.operators.partition_ddl import PART_COL

    # the restored relation re-routed into partition directories
    assert glob.glob(
        os.path.join(eng.managed_tables._path("ptr"), f"{PART_COL}=*")
    )


def test_ddl_is_a_flashback_barrier(spark, tmp_path):
    """tcap refuses version flashback across a definition change."""
    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql("CREATE TABLE bar (a int)")
    eng.sql("INSERT INTO bar VALUES (1)")
    v = mt.tables["bar"]["history"][-1]["csn"]
    eng.sql("ALTER TABLE bar ADD COLUMN b int")
    with pytest.raises(Exception, match="cross DDL"):
        eng.sql(f"SELECT a FROM bar TIMECAPSULE CSN {v}").collect()
    # the barrier commit itself IS reachable
    vb = mt.tables["bar"]["history"][-1]["csn"]
    assert _rows(eng, f"SELECT a, b FROM bar TIMECAPSULE CSN {vb}") \
        == [(1, None)]


def test_partition_surgery_is_a_barrier(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql(
        "CREATE TABLE pb (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    eng.sql("INSERT INTO pb VALUES (1, 1.0), (15, 15.0)")
    v = mt.tables["pb"]["history"][-1]["csn"]
    eng.sql("ALTER TABLE pb DROP PARTITION p0")
    with pytest.raises(Exception, match="cross DDL"):
        eng.sql(f"SELECT k FROM pb TIMECAPSULE CSN {v}").collect()


def test_vacuum_and_cluster_preserve_flashback(spark, tmp_path):
    """Compaction/reorder rewrites open a new generation and keep the
    old files — flashback across them returns identical rows."""
    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql("CREATE TABLE vc (a bigint)")
    for i in range(3):
        eng.sql(f"INSERT INTO vc VALUES ({i})")
    v = mt.tables["vc"]["history"][-1]["csn"]
    eng.sql("VACUUM vc")
    eng.sql("CLUSTER vc ON (a)")
    assert _rows(eng, f"SELECT a FROM vc TIMECAPSULE CSN {v}") == \
        [(0,), (1,), (2,)]


def test_purge_table_resets_live_window(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql("CREATE TABLE pw (a int)")
    eng.sql("INSERT INTO pw VALUES (1)")
    v = mt.tables["pw"]["history"][-1]["csn"]
    eng.sql("UPDATE pw SET a = 2 WHERE a = 1")  # gen bump
    old_gen_dir = mt._gen_path("pw", 0)
    assert os.path.isdir(old_gen_dir)
    eng.sql("PURGE TABLE pw")
    assert not os.path.isdir(old_gen_dir)
    with pytest.raises(Exception, match="too old|cross DDL"):
        eng.sql(f"SELECT a FROM pw TIMECAPSULE CSN {v}").collect()
    # live reads unaffected
    assert _rows(eng, "SELECT a FROM pw") == [(2,)]


def test_flashback_refused_on_catalog_table(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    with pytest.raises(ValueError, match="managed"):
        eng.sql("SELECT * FROM orders TIMECAPSULE CSN 1")


def test_flashback_scan_keeps_pushdown(spark, tmp_path):
    """A TIMECAPSULE snapshot is a plain parquet relation: predicates
    on the flashback SELECT must still reach the scan (PushedFilters)
    — the property that makes time travel free at 100 TB."""
    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql(
        "CREATE TABLE pf AS SELECT o_orderkey AS k,"
        " CAST(o_totalprice AS DOUBLE) AS p FROM orders"
        " WHERE o_orderkey <= 2000"
    )
    v = mt.tables["pf"]["history"][-1]["csn"]
    eng.sql("DELETE FROM pf WHERE k > 1000")
    df = eng.sql(f"SELECT k FROM pf TIMECAPSULE CSN {v} WHERE k <= 50")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the predicate reaches the parquet scan of the OLD manifest's
    # files, and the scan reads only the projected column
    assert "LessThanOrEqual(k,50)" in plan
    assert "ReadSchema: struct<k:bigint>" in plan
    # snapshot(filtered) == pre-DELETE live(filtered)
    want = eng.spark.sql(
        "SELECT COUNT(*) AS n FROM orders"
        " WHERE o_orderkey <= 50"
    ).collect()[0].n
    assert df.count() == want


def test_flashback_random_program_matches_model(spark, tmp_path):
    """A seeded random DML program (insert/update/delete/truncate)
    executed against BOTH the engine and a plain Python model of the
    multiset; afterwards, TIMECAPSULE CSN reconstruction of EVERY
    recorded version must equal the model's snapshot at that commit —
    the tcap_version regress property, generalized."""
    import random

    rng = random.Random(73)
    eng = _eng(spark, tmp_path)
    mt = eng.managed_tables
    eng.sql("CREATE TABLE rp (a int)")
    model: list[int] = []
    snapshots = [(mt.tables["rp"]["history"][-1]["csn"], [])]
    next_val = 0
    for _ in range(10):
        op = rng.choice(["insert", "insert", "update", "delete",
                         "truncate"])
        if op == "insert":
            vals = [next_val + i for i in range(rng.randint(1, 3))]
            next_val += len(vals)
            eng.sql(
                "INSERT INTO rp VALUES "
                + ", ".join(f"({v})" for v in vals)
            )
            model.extend(vals)
        elif op == "update" and model:
            pivot = rng.choice(model)
            eng.sql(f"UPDATE rp SET a = a + 1000 WHERE a = {pivot}")
            model = [v + 1000 if v == pivot else v for v in model]
        elif op == "delete" and model:
            pivot = rng.choice(model)
            eng.sql(f"DELETE FROM rp WHERE a >= {pivot}")
            model = [v for v in model if v < pivot]
        elif op == "truncate":
            eng.sql("TRUNCATE rp")
            model = []
        else:
            continue
        snapshots.append(
            (mt.tables["rp"]["history"][-1]["csn"], sorted(model))
        )
    assert len(snapshots) >= 6  # the walk really exercised DML
    for csn, want in snapshots:
        got = sorted(
            r.a for r in eng.sql(
                f"SELECT a FROM rp TIMECAPSULE CSN {csn}"
            ).collect()
        )
        assert got == want, (csn, got, want)


def test_savepoint_rollback_release(spark, tmp_path):
    """SAVEPOINT / ROLLBACK TO SAVEPOINT / RELEASE (TransactionStmt
    savepoints): in the single-session autocommit engine a savepoint
    is a named restore frame over the commit log — ROLLBACK TO
    restores every advanced table through the TIMECAPSULE machinery
    and drops tables created after the frame; the savepoint survives
    the rollback (PG semantics); RELEASE discards it; a bare ROLLBACK
    still refuses naming the savepoint form."""
    import pytest

    from opengauss_vectordb_spark.engine import Engine

    eng = Engine(spark, SF_CORRECT)
    eng.managed_tables.root = str(tmp_path)
    eng.sql("CREATE TABLE sv AS SELECT * FROM VALUES"
            " (1, 10.0), (2, 20.0) AS t(id, v)")
    out = eng.sql("SAVEPOINT before_batch").collect()[0]
    assert out.tag == "SAVEPOINT" and out.tables_framed >= 1
    eng.sql("UPDATE sv SET v = v * 100")
    eng.sql("CREATE TABLE sv_scratch AS SELECT 1 AS a")
    eng.sql("INSERT INTO sv SELECT 3, 30.0")
    out = eng.sql("ROLLBACK TO SAVEPOINT before_batch").collect()[0]
    assert out.tables_restored == 2  # sv restored + scratch dropped
    rows = sorted((r.id, float(r.v))
                  for r in eng.sql("SELECT * FROM sv").collect())
    assert rows == [(1, 10.0), (2, 20.0)]
    assert "sv_scratch" not in eng.managed_tables.tables
    # the savepoint survives (PG): a second batch can roll back again
    eng.sql("DELETE FROM sv WHERE id = 1")
    eng.sql("ROLLBACK TO before_batch")
    assert eng.sql("SELECT COUNT(*) AS c FROM sv").collect()[0].c == 2
    eng.sql("RELEASE SAVEPOINT before_batch")
    with pytest.raises(KeyError, match="does not exist"):
        eng.sql("ROLLBACK TO SAVEPOINT before_batch")
    with pytest.raises(KeyError, match="does not exist"):
        eng.sql("RELEASE nope")
    with pytest.raises(NotImplementedError, match="SAVEPOINT"):
        eng.sql("ROLLBACK")
    eng.sql("DROP TABLE sv PURGE")
