"""GENERATED ALWAYS AS ... STORED columns + AUTO_INCREMENT identity.

Reference: `parser/gram.y:8122` (generated column grammar),
`gram.y:7650-7664` (AUTO_INCREMENT constraint), `catalog/heap.cpp:4197`
(one auto_increment column per table), `heap.cpp:4352` (generated may
not refer to auto_increment), `executor/nodeModifyTable.cpp`
(ExecComputeStoredGenerated recomputes stored values on every write).
"""

from __future__ import annotations

import pytest

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT


def _eng(spark, tmp_path):
    eng = Engine(spark=spark, sf_dir=SF_CORRECT)
    eng.managed_tables.root = str(tmp_path / "wh")
    return eng


def test_generated_insert_update_recompute(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE g (price double, qty int,"
        " total double GENERATED ALWAYS AS (price * qty) STORED)"
    )
    eng.sql("INSERT INTO g VALUES (2.5, 4), (1.0, 3)")
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM g").collect())
    assert got == [(1.0, 3, 3.0), (2.5, 4, 10.0)]
    # UPDATE of a dependency recomputes the stored value on hit rows
    eng.sql("UPDATE g SET qty = 10 WHERE price = 2.5")
    got = sorted(
        tuple(r) for r in eng.sql("SELECT qty, total FROM g").collect()
    )
    assert got == [(3, 3.0), (10, 25.0)]


def test_generated_refusals(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE gr (a double,"
        " b double GENERATED ALWAYS AS (a * 2) STORED)"
    )
    eng.sql("INSERT INTO gr VALUES (1.0)")
    with pytest.raises(ValueError, match="generated"):
        eng.sql("UPDATE gr SET b = 9.0 WHERE a = 1.0")
    with pytest.raises(ValueError, match="generated"):
        eng.sql("INSERT INTO gr SELECT 2.0, 99.0")
    # dropping the dependency is refused; dropping the generated
    # column itself converts the table back to plain
    with pytest.raises(ValueError, match="depend"):
        eng.sql("ALTER TABLE gr DROP COLUMN a")
    with pytest.raises(NotImplementedError, match="orphan"):
        eng.sql("ALTER TABLE gr RENAME COLUMN a TO a2")
    eng.sql("ALTER TABLE gr DROP COLUMN b")
    eng.sql("INSERT INTO gr VALUES (5.0)")
    assert eng.sql("SELECT COUNT(*) AS n FROM gr").collect()[0].n == 2


def test_generated_on_partitioned_refused(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    with pytest.raises(NotImplementedError, match="partitioned"):
        eng.sql(
            "CREATE TABLE gp (k bigint, v double,"
            " w double GENERATED ALWAYS AS (v + 1) STORED)"
            " PARTITION BY RANGE (k) ("
            "PARTITION p0 VALUES LESS THAN (MAXVALUE))"
        )


def test_create_table_rules(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    # heap.cpp:4197 — one auto_increment column
    with pytest.raises(ValueError, match="only one auto_increment"):
        eng.sql(
            "CREATE TABLE t2a (a bigint AUTO_INCREMENT,"
            " b bigint AUTO_INCREMENT)"
        )
    # heap.cpp:4352 — generated may not refer to auto_increment
    with pytest.raises(ValueError, match="auto_increment"):
        eng.sql(
            "CREATE TABLE tga (a bigint AUTO_INCREMENT,"
            " b bigint GENERATED ALWAYS AS (a + 1) STORED)"
        )


def test_auto_increment_dense_unique_bulk(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE ai (k bigint AUTO_INCREMENT, v bigint)")
    eng.sql(
        "INSERT INTO ai SELECT o_orderkey FROM orders"
        " WHERE o_orderkey <= 500"
    )
    r = eng.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT k) AS d,"
        " MIN(k) AS mn, MAX(k) AS mx FROM ai"
    ).collect()[0]
    assert (r.n, r.d, r.mn, r.mx) == (r.n, r.n, 1, r.n)
    # a second omitted-id INSERT continues the sequence densely
    eng.sql("INSERT INTO ai SELECT 0 WHERE 1 = 1")
    mx = eng.sql("SELECT MAX(k) AS mx FROM ai").collect()[0].mx
    assert mx == r.n + 1


def test_auto_increment_explicit_bumps_counter(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE ab (k bigint AUTO_INCREMENT, v double)")
    eng.sql("INSERT INTO ab VALUES (1.0), (2.0)")  # ids 1, 2
    eng.sql("INSERT INTO ab SELECT 100, 3.0")      # explicit id
    eng.sql("INSERT INTO ab VALUES (4.0)")          # continues at 101
    ids = sorted(r.k for r in eng.sql("SELECT k FROM ab").collect())
    assert ids == [1, 2, 100, 101]


def test_auto_and_generated_update_interplay(spark, tmp_path):
    """UPDATE may move the plain columns; the identity column is
    stable and the generated column follows its dependencies."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE mix (id bigint AUTO_INCREMENT, a double,"
        " b double GENERATED ALWAYS AS (a * a) STORED)"
    )
    eng.sql("INSERT INTO mix VALUES (2.0), (3.0)")
    eng.sql("UPDATE mix SET a = 5.0 WHERE id = 1")
    got = sorted(tuple(r) for r in eng.sql(
        "SELECT id, a, b FROM mix"
    ).collect())
    assert got == [(1, 5.0, 25.0), (2, 3.0, 9.0)]


def test_serial_pseudotypes(spark, tmp_path):
    """serial/bigserial create the identity path — the implicit
    sequence of parse_utilcmd.cpp:1051."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE sp (id serial, big bigint)")
    eng.sql("INSERT INTO sp VALUES (10), (20)")
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM sp").collect())
    assert got == [(1, 10), (2, 20)]
    assert "int" in dict(
        (f.name, f.dataType.simpleString())
        for f in eng.sql("SELECT * FROM sp").schema.fields
    )["id"]
    with pytest.raises(NotImplementedError, match="one identity"):
        eng.sql("CREATE TABLE sp2 (a serial, b bigserial)")


def test_storage_options_and_distribute_by(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE col_t (k bigint, v double) WITH"
        " (ORIENTATION = COLUMN, COMPRESSION = low)"
        " DISTRIBUTE BY HASH(k)"
    )
    meta = eng.managed_tables.tables["col_t"]
    assert meta["distribute_by"] == "k"
    assert meta["storage_options"]["orientation"] == "column"
    eng.sql(
        "INSERT INTO col_t SELECT o_orderkey % 7,"
        " CAST(o_totalprice AS DOUBLE) FROM orders"
        " WHERE o_orderkey <= 300"
    )
    # co-location: every parquet file holds one hash bucket's keys —
    # no key straddles… (files may hold several buckets, but each key
    # lands in exactly ONE file set written by its hash partition)
    n = eng.sql("SELECT COUNT(*) AS n FROM col_t").collect()[0].n
    assert n == 301
    # CTAS header form
    eng.sql(
        "CREATE TABLE col_c WITH (ORIENTATION = COLUMN)"
        " DISTRIBUTE BY HASH(o_custkey) AS"
        " SELECT o_custkey, o_totalprice FROM orders"
        " WHERE o_orderkey <= 50"
    )
    assert eng.managed_tables.tables["col_c"]["distribute_by"] \
        == "o_custkey"


def test_select_into(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "SELECT o_orderkey, o_orderstatus INTO si_t FROM orders"
        " WHERE o_orderkey <= 30"
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM si_t").collect()[0].n == 31
    eng.sql("SELECT r_regionkey INTO TEMP si_tmp FROM region")
    assert eng.managed_tables.tables["si_tmp"].get("temp") is True
    # INTO below top level is NOT a table materialization
    r = eng.sql(
        "SELECT COUNT(*) AS n FROM (SELECT o_orderkey FROM orders"
        " WHERE o_orderkey <= 10) t"
    ).collect()[0]
    assert r.n == 11
    # string literals containing INTO stay literal
    r = eng.sql("SELECT 'go into the x' AS s FROM region").collect()
    assert len(r) == 5


def test_update_from_and_delete_using(spark, tmp_path):
    """gram.y:23328 UPDATE from_clause / :23218 DELETE using_clause."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE jt (k bigint, v double)")
    eng.sql("INSERT INTO jt VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    eng.sql("CREATE TABLE js (k bigint, mult double)")
    eng.sql("INSERT INTO js VALUES (1, 2.0), (3, 10.0), (9, 5.0)")
    out = eng.sql(
        "UPDATE jt SET v = jt.v * s.mult FROM js s WHERE jt.k = s.k"
    ).collect()[0]
    assert out.rows == 2
    got = sorted(tuple(r) for r in eng.sql("SELECT k, v FROM jt").collect())
    assert got == [(1, 20.0), (2, 20.0), (3, 300.0)]
    # RETURNING carries the NEW values of the hit rows
    ret = eng.sql(
        "UPDATE jt SET v = jt.v + s.mult FROM js s WHERE jt.k = s.k"
        " AND s.mult > 5 RETURNING k, v"
    ).collect()
    assert [(r.k, r.v) for r in ret] == [(3, 310.0)]
    out = eng.sql(
        "DELETE FROM jt USING js s WHERE jt.k = s.k AND s.mult >= 2"
    ).collect()[0]
    assert out.rows == 2
    assert [r.k for r in eng.sql("SELECT k FROM jt").collect()] == [2]
    # multiple source matches: ONE deterministic winner per target row
    eng.sql("CREATE TABLE mm (k bigint, v string)")
    eng.sql("INSERT INTO mm VALUES (1, 'old')")
    eng.sql("CREATE TABLE ms (k bigint, nv string)")
    eng.sql("INSERT INTO ms VALUES (1, 'zzz'), (1, 'aaa')")
    eng.sql("UPDATE mm SET v = s.nv FROM ms s WHERE mm.k = s.k")
    # lexicographically-first source row wins
    assert eng.sql("SELECT v FROM mm").collect()[0].v == "aaa"


def test_insert_on_duplicate_key(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pk (k bigint PRIMARY KEY, v double, n bigint)"
    )
    eng.sql("INSERT INTO pk VALUES (1, 1.0, 1), (2, 2.0, 1)")
    assert eng.managed_tables.tables["pk"]["primary_key"] == ("k",)
    eng.sql(
        "INSERT INTO pk VALUES (2, 99.0, 1), (5, 5.0, 1)"
        " ON DUPLICATE KEY UPDATE v = VALUES(v), n = n + 1"
    )
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM pk").collect())
    assert got == [(1, 1.0, 1), (2, 99.0, 2), (5, 5.0, 1)]
    # UPDATE NOTHING = insert-only-if-new
    eng.sql(
        "INSERT INTO pk VALUES (5, 0.0, 0), (7, 7.0, 1)"
        " ON DUPLICATE KEY UPDATE NOTHING"
    )
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM pk").collect())
    assert got == [(1, 1.0, 1), (2, 99.0, 2), (5, 5.0, 1), (7, 7.0, 1)]
    # table-level composite PRIMARY KEY is recorded too
    eng.sql(
        "CREATE TABLE pk2 (a bigint, b bigint, v double,"
        " PRIMARY KEY (a, b))"
    )
    assert eng.managed_tables.tables["pk2"]["primary_key"] == ("a", "b")
    # no key → the reference's refusal
    eng.sql("CREATE TABLE nk (a bigint, v double)")
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        eng.sql(
            "INSERT INTO nk VALUES (1, 1.0)"
            " ON DUPLICATE KEY UPDATE v = VALUES(v)"
        )
    # key columns may not be modified
    with pytest.raises(ValueError, match="key column"):
        eng.sql(
            "INSERT INTO pk VALUES (1, 1.0, 1)"
            " ON DUPLICATE KEY UPDATE k = VALUES(k)"
        )


def test_dup_key_intra_batch_refused(spark, tmp_path):
    """The reference upserts row-by-row; set-based merge cannot — a
    source with duplicate keys must refuse, not silently diverge."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE pkd (k bigint PRIMARY KEY, v double)")
    with pytest.raises(NotImplementedError, match="row-by-row"):
        eng.sql(
            "INSERT INTO pkd VALUES (1, 1.0), (1, 2.0)"
            " ON DUPLICATE KEY UPDATE v = VALUES(v)"
        )


def test_replace_into(spark, tmp_path):
    """REPLACE INTO (gram.y:9552 DUPLICATE_REPLACE): matched keys take
    the whole incoming row, fresh keys insert."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE rp (k bigint PRIMARY KEY, a double, b string)")
    eng.sql("INSERT INTO rp VALUES (1, 1.0, 'x'), (2, 2.0, 'y')")
    eng.sql("REPLACE INTO rp VALUES (2, 99.0, 'z'), (5, 5.0, 'w')")
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM rp").collect())
    assert got == [(1, 1.0, "x"), (2, 99.0, "z"), (5, 5.0, "w")]
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        eng.sql("CREATE TABLE rn (a bigint)")
        eng.sql("REPLACE INTO rn VALUES (1)")
    with pytest.raises(NotImplementedError, match="row-by-row"):
        eng.sql("REPLACE INTO rp VALUES (7, 1.0, 'a'), (7, 2.0, 'b')")


def test_insert_column_list(spark, tmp_path):
    """INSERT INTO t (cols) <source>: listed columns in order,
    unlisted NULL, identity assigned, generated computed/refused."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE cl (id bigserial, a bigint, b string,"
        " c double, d double GENERATED ALWAYS AS (c * 2) STORED)"
    )
    eng.sql("INSERT INTO cl (b, a) VALUES ('x', 1), ('y', 2)")
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM cl").collect())
    assert got == [
        (1, 1, "x", None, None),
        (2, 2, "y", None, None),
    ]
    # explicit identity in the list advances the counter
    eng.sql("INSERT INTO cl (id, a, c) VALUES (100, 3, 1.5)")
    got = sorted(
        tuple(r)
        for r in eng.sql("SELECT id, a, c, d FROM cl").collect()
    )
    assert (100, 3, 1.5, 3.0) in got
    eng.sql("INSERT INTO cl (a) VALUES (4)")
    assert eng.sql(
        "SELECT MAX(id) AS m FROM cl"
    ).collect()[0].m == 101
    # refusals: unknown / generated / arity / duplicates
    with pytest.raises(KeyError, match="do not exist"):
        eng.sql("INSERT INTO cl (zz) VALUES (1)")
    with pytest.raises(ValueError, match="generated"):
        eng.sql("INSERT INTO cl (d) VALUES (1.0)")
    with pytest.raises(ValueError, match="expression"):
        eng.sql("INSERT INTO cl (a, b) VALUES (1)")
    with pytest.raises(ValueError, match="duplicates"):
        eng.sql("INSERT INTO cl (a, a) VALUES (1, 2)")
    # RETURNING composes with the column-list form
    ret = eng.sql(
        "INSERT INTO cl (a, c) VALUES (9, 4.0) RETURNING a, d"
    ).collect()
    assert [(r.a, r.d) for r in ret] == [(9, 8.0)]


def test_insert_default_values(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE dv (id bigserial, a bigint, b string)")
    eng.sql("INSERT INTO dv DEFAULT VALUES")
    eng.sql("INSERT INTO dv DEFAULT VALUES")
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM dv").collect())
    assert got == [(1, None, None), (2, None, None)]


def test_update_from_respects_rls(spark, tmp_path):
    """ADVICE r7 (high): UPDATE ... FROM must apply the session's RLS
    policy qual to the target scan exactly as plain UPDATE and
    DELETE ... USING do — a restricted role may only modify rows its
    policy exposes (rewriteRlsPolicy.cpp injects quals into every
    scan of a protected relation, joined DML included)."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE rt (k bigint, grp bigint, v string)")
    eng.sql(
        "INSERT INTO rt VALUES (1, 0, 'a'), (2, 0, 'b'),"
        " (3, 1, 'c'), (4, 1, 'd')"
    )
    eng.sql("CREATE TABLE rs (k bigint, nv string)")
    eng.sql(
        "INSERT INTO rs VALUES (1, 'X'), (2, 'X'), (3, 'X'), (4, 'X')"
    )
    eng.sql("ALTER TABLE rt ENABLE ROW LEVEL SECURITY")
    eng.sql("CREATE POLICY p ON rt TO analyst USING (grp = 0)")
    eng.sql("GRANT ALL ON rt TO analyst")
    eng.sql("GRANT SELECT ON rs TO analyst")
    eng.sql("SET ROLE analyst")
    eng.sql("UPDATE rt SET v = s.nv FROM rs s WHERE rt.k = s.k")
    eng.sql("RESET ROLE")
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM rt").collect())
    # grp=0 rows updated; grp=1 rows invisible to the role, untouched
    assert got == [(1, 0, "X"), (2, 0, "X"), (3, 1, "c"), (4, 1, "d")]
    eng.sql("DROP TABLE rt")
    eng.sql("DROP TABLE rs")


def test_upsert_requires_update_privilege(spark, tmp_path):
    """ADVICE r7 (medium): INSERT ... ON DUPLICATE KEY UPDATE rewrites
    matched rows, so a role granted INSERT-only must be refused when
    the SET list is non-empty (UPDATE NOTHING stays insert-only)."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE upk (k bigint PRIMARY KEY, v double)")
    eng.sql("INSERT INTO upk VALUES (1, 1.0)")
    eng.sql("GRANT INSERT ON upk TO loader")
    eng.sql("GRANT SELECT ON upk TO loader")
    eng.sql("SET ROLE loader")
    with pytest.raises(PermissionError, match="permission denied"):
        eng.sql(
            "INSERT INTO upk VALUES (1, 9.0)"
            " ON DUPLICATE KEY UPDATE v = VALUES(v)"
        )
    # insert-only-if-new form stays within the INSERT grant
    eng.sql(
        "INSERT INTO upk VALUES (2, 2.0) ON DUPLICATE KEY UPDATE NOTHING"
    )
    eng.sql("RESET ROLE")
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM upk").collect())
    assert got == [(1, 1.0), (2, 2.0)]
    eng.sql("DROP TABLE upk")
