"""Named-partition DDL (PARTITION BY RANGE/LIST/HASH, ADD/DROP/
TRUNCATE PARTITION, pg_partitions, partition elimination)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from opengauss_vectordb_spark.engine import Engine
from opengauss_vectordb_spark.operators.partition_ddl import (
    PART_COL,
    SUBPART_COL,
    PartitionSpec,
    eligible_labels,
    parse_partition_by,
    pruned_scan,
)

from .conftest import SF_CORRECT


def _eng(spark, tmp_path):
    eng = Engine(spark, SF_CORRECT)
    eng.managed_tables.root = str(tmp_path)
    return eng


def test_parse_partition_by_grammar():
    s = parse_partition_by(
        "PARTITION BY RANGE (k) (PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION p1 VALUES LESS THAN (20), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    assert s.kind == "range" and s.key == "k"
    assert s.parts == [("p0", 10), ("p1", 20), ("pmax", None)]
    s = parse_partition_by(
        "PARTITION BY LIST (c) (PARTITION pa VALUES ('x', 'y'), "
        "PARTITION pd VALUES (DEFAULT))"
    )
    assert s.parts == [("pa", ("x", "y")), ("pd", None)]
    s = parse_partition_by("PARTITION BY HASH (k) PARTITIONS 4")
    assert [n for n, _ in s.parts] == ["p0", "p1", "p2", "p3"]
    # bounds must ascend; MAXVALUE must be last; list values disjoint
    with pytest.raises(ValueError, match="ascend"):
        parse_partition_by(
            "PARTITION BY RANGE (k) (PARTITION a VALUES LESS THAN (20),"
            " PARTITION b VALUES LESS THAN (10))"
        )
    with pytest.raises(ValueError, match="last"):
        parse_partition_by(
            "PARTITION BY RANGE (k) "
            "(PARTITION a VALUES LESS THAN (MAXVALUE),"
            " PARTITION b VALUES LESS THAN (10))"
        )
    with pytest.raises(ValueError, match="more than one"):
        parse_partition_by(
            "PARTITION BY LIST (c) (PARTITION a VALUES ('x'),"
            " PARTITION b VALUES ('x', 'z'))"
        )


def test_range_prune_bound_walk():
    s = PartitionSpec("range", "k", [("p0", 10), ("p1", 20), ("pm", None)])
    assert s.prune("<", 10) == ["p0"]
    assert s.prune("<=", 10) == ["p0", "p1"]
    assert s.prune("<", 15) == ["p0", "p1"]
    assert s.prune(">=", 10) == ["p1", "pm"]
    assert s.prune(">", 25) == ["pm"]
    assert s.prune("=", 5) == ["p0"]
    assert s.prune("=", 10) == ["p1"]  # ranges are [lo, hi)
    assert s.prune("in", [5, 25]) == ["p0", "pm"]
    lst = PartitionSpec(
        "list", "c", [("pa", ("x", "y")), ("pb", ("z",)), ("pd", None)]
    )
    assert lst.prune("=", "x") == ["pa"]
    assert lst.prune("=", "q") == ["pd"]  # only DEFAULT can hold it
    assert lst.prune("in", ["y", "z"]) == ["pa", "pb"]


def test_range_partition_ddl_end_to_end(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pt (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION p1 VALUES LESS THAN (20), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    # empty table is selectable with the declared schema
    assert eng.sql("SELECT * FROM pt").columns == ["k", "v"]
    assert eng.sql("SELECT * FROM pt").count() == 0
    eng.sql(
        "INSERT INTO pt VALUES (1, 1.0), (5, 5.0), (15, 15.0), "
        "(25, 25.0), (NULL, 99.0)"
    )
    # NULL key routes to the MAXVALUE partition (openGauss NULLs-last)
    path = eng.managed_tables._path("pt")
    dirs = sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(path, f"{PART_COL}=*"))
    )
    assert dirs == [
        f"{PART_COL}=p0", f"{PART_COL}=p1", f"{PART_COL}=pmax"
    ]
    # the view hides the label column
    assert eng.sql("SELECT * FROM pt").columns == ["k", "v"]
    assert eng.sql("SELECT COUNT(*) AS n FROM pt").collect()[0].n == 5

    # pg_partitions catalog
    rows = eng.sql("SELECT * FROM pg_partitions").collect()
    assert [(r.partitionname, r.bound) for r in rows] == [
        ("p0", "< 10"), ("p1", "< 20"), ("pmax", "MAXVALUE")
    ]

    # pruned scan reads ONLY eligible directories
    df = pruned_scan(eng, "pt", "k < 10")
    assert sorted(r.k for r in df.collect()) == [1, 5]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "p0" in plan
    assert "p1" not in plan.split("PartitionFilters")[1][:200]

    # DROP PARTITION is one directory unlink — no rewrite
    eng.sql("ALTER TABLE pt DROP PARTITION p0")
    assert not os.path.exists(os.path.join(path, f"{PART_COL}=p0"))
    assert sorted(
        r.k for r in eng.sql("SELECT k FROM pt WHERE k IS NOT NULL")
        .collect()
    ) == [15, 25]
    rows = eng.sql("SELECT * FROM pg_partitions").collect()
    assert [r.partitionname for r in rows] == ["p1", "pmax"]

    # TRUNCATE PARTITION empties but keeps the definition
    eng.sql("ALTER TABLE pt TRUNCATE PARTITION p1")
    assert [r.partitionname for r in
            eng.sql("SELECT * FROM pg_partitions").collect()] == [
        "p1", "pmax"
    ]
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM pt WHERE k IS NOT NULL"
    ).collect()[0].n == 1

    # ADD PARTITION refuses after MAXVALUE (reference rule)
    with pytest.raises(ValueError, match="MAXVALUE"):
        eng.sql("ALTER TABLE pt ADD PARTITION p9 VALUES LESS THAN (50)")
    eng.sql("DROP TABLE pt")


def test_range_partition_no_home_row_raises(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE ptn (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10))"
    )
    with pytest.raises(ValueError, match="do not map"):
        eng.sql("INSERT INTO ptn VALUES (99, 1.0)")
    eng.sql("DROP TABLE ptn")


def test_add_partition_then_insert(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pta (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10))"
    )
    eng.sql("INSERT INTO pta VALUES (1, 1.0)")
    eng.sql("ALTER TABLE pta ADD PARTITION p1 VALUES LESS THAN (20)")
    eng.sql("INSERT INTO pta VALUES (15, 15.0)")
    assert sorted(r.k for r in eng.sql("SELECT k FROM pta").collect()) \
        == [1, 15]
    eng.sql("DROP TABLE pta")


def test_list_partition_and_default(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pl (c text, v bigint) PARTITION BY LIST (c) ("
        "PARTITION pa VALUES ('x', 'y'), PARTITION pd VALUES (DEFAULT))"
    )
    eng.sql(
        "INSERT INTO pl VALUES ('x', 1), ('y', 2), ('q', 3), (NULL, 4)"
    )
    # unlisted + NULL route to DEFAULT
    df = pruned_scan(eng, "pl", "c = 'x'")
    assert [r.v for r in df.collect()] == [1]
    labels = eligible_labels(
        eng.spark,
        PartitionSpec.from_meta(
            eng.managed_tables.tables["pl"]["partition_spec"]
        ),
        "c = 'x'",
    )
    assert labels == ["pa"]
    assert eng.sql("SELECT COUNT(*) AS n FROM pl").collect()[0].n == 4
    eng.sql("DROP TABLE pl")


def test_hash_partition_layout_and_eq_prune(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE ph (k bigint, v double) "
        "PARTITION BY HASH (k) PARTITIONS 4"
    )
    eng.sql(
        "INSERT INTO ph SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey <= 200"
    )
    path = eng.managed_tables._path("ph")
    dirs = glob.glob(os.path.join(path, f"{PART_COL}=*"))
    assert 1 <= len(dirs) <= 4
    # content preserved across the hash routing
    n = eng.sql("SELECT COUNT(*) AS n FROM ph").collect()[0].n
    base = eng.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderkey <= 200"
    ).collect()[0].n
    assert n == base
    # equality prune lands on exactly one partition
    spec = PartitionSpec.from_meta(
        eng.managed_tables.tables["ph"]["partition_spec"]
    )
    labels = eligible_labels(eng.spark, spec, "k = 7", "bigint")
    assert len(labels) == 1
    assert [r.k for r in pruned_scan(eng, "ph", "k = 7").collect()] == [7]
    # regression (r7 ADVICE): the literal must hash with the COLUMN's
    # declared type (bigint), not Python-int's IntegerType — Murmur3
    # differs by type, so the old code picked the wrong bucket for
    # most values.  Sweep a range of keys and require every one found.
    for k in range(1, 13):
        got = [r.k for r in
               pruned_scan(eng, "ph", f"k = {k}").collect()]
        assert got == [k], f"k={k} lost by hash pruning: {got}"
    # IN-list goes through the same hash path
    got = sorted(r.k for r in
                 pruned_scan(eng, "ph", "k IN (3, 9, 11)").collect())
    assert got == [3, 9, 11]
    # without a known key type, hash-eq pruning must bail to the
    # full superset rather than guess a bucket
    assert set(eligible_labels(eng.spark, spec, "k = 7")) == {
        n for n, _ in spec.parts
    }
    eng.sql("DROP TABLE ph")


def test_partitioned_update_moves_rows(spark, tmp_path):
    """Copy-on-write UPDATE recomputes the routing label — the
    reference's row-movement semantics."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pm (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    eng.sql("INSERT INTO pm VALUES (1, 1.0), (2, 2.0)")
    eng.sql("UPDATE pm SET k = 15 WHERE k = 2")
    assert sorted(
        r.k for r in pruned_scan(eng, "pm", "k >= 10").collect()
    ) == [15]
    path = eng.managed_tables._path("pm")
    pm_dir = os.path.join(path, f"{PART_COL}=pmax")
    assert os.path.exists(pm_dir)
    eng.sql("DROP TABLE pm")


def test_partition_key_alter_refused_and_maintenance(spark, tmp_path):
    """ALTER on the partition key refuses (the layout derives from it);
    TRUNCATE unlinks every partition directory without a write job;
    CLUSTER keeps the partitioned layout (within-partition order);
    ALTER on an empty partitioned table names the recreate path."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pk (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    with pytest.raises(NotImplementedError, match="EMPTY"):
        eng.sql("ALTER TABLE pk ADD COLUMN extra text")
    eng.sql("INSERT INTO pk VALUES (1, 1.0), (15, 15.0)")
    for stmt in (
        "ALTER TABLE pk DROP COLUMN k",
        "ALTER TABLE pk RENAME COLUMN k TO kk",
        "ALTER TABLE pk ALTER COLUMN k TYPE text",
    ):
        with pytest.raises(ValueError, match="partition key"):
            eng.sql(stmt)
    # non-key ALTER works and survives a TRUNCATE (schema follows)
    eng.sql("ALTER TABLE pk ADD COLUMN note text")
    assert eng.sql("SELECT * FROM pk").columns == ["k", "v", "note"]
    # CLUSTER keeps the _part directories
    eng.sql("CLUSTER pk ON (k)")
    path = eng.managed_tables._path("pk")
    assert glob.glob(os.path.join(path, f"{PART_COL}=*"))
    assert eng.sql("SELECT COUNT(*) AS n FROM pk").collect()[0].n == 2
    eng.sql("TRUNCATE pk")
    # TRUNCATE opens a fresh empty generation (the old one stays on
    # disk as TIMECAPSULE undo) — the LIVE path holds no partition dirs
    assert not glob.glob(
        os.path.join(eng.managed_tables._path("pk"), f"{PART_COL}=*")
    )
    assert eng.sql("SELECT * FROM pk").columns == ["k", "v", "note"]
    assert eng.sql("SELECT COUNT(*) AS n FROM pk").collect()[0].n == 0
    # table is still usable after TRUNCATE
    eng.sql("INSERT INTO pk VALUES (2, 2.0, 'x')")
    assert eng.sql("SELECT COUNT(*) AS n FROM pk").collect()[0].n == 1
    eng.sql("DROP TABLE pk")


def test_date_string_range_partitions(spark, tmp_path):
    """Range bounds as ISO date strings — the time-partitioned fact
    table shape; string comparison is the ISO date order."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pd (d text, v bigint) PARTITION BY RANGE (d) ("
        "PARTITION y97 VALUES LESS THAN ('1998-01-01'), "
        "PARTITION y98 VALUES LESS THAN ('1999-01-01'), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    eng.sql(
        "INSERT INTO pd VALUES ('1997-06-01', 1), ('1998-03-15', 2), "
        "('2001-01-01', 3)"
    )
    assert [r.v for r in
            pruned_scan(eng, "pd", "d < '1998-01-01'").collect()] == [1]
    labels = eligible_labels(
        eng.spark,
        PartitionSpec.from_meta(
            eng.managed_tables.tables["pd"]["partition_spec"]
        ),
        "d BETWEEN '1998-01-01' AND '1998-12-31'",
    )
    assert labels == ["y98"]
    eng.sql("DROP TABLE pd")


def test_interval_partition_autoextend(spark, tmp_path):
    """openGauss interval partitions (hw_partition_interval_* regress
    family): INSERTs beyond the last declared bound auto-create
    sys_p<N> partitions in INTERVAL steps — driver-side bounds
    arithmetic, no manual ADD PARTITION per period."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pi (d text, v bigint) PARTITION BY RANGE (d) "
        "INTERVAL ('1 month') ("
        "PARTITION p0 VALUES LESS THAN ('2020-03-01'), "
        "PARTITION p1 VALUES LESS THAN ('2020-04-01'))"
    )
    eng.sql("INSERT INTO pi VALUES ('2020-02-15', 1), ('2020-03-10', 2)")
    assert [r.partitionname for r in
            eng.sql("SELECT * FROM pg_partitions").collect()] == [
        "p0", "p1"
    ]
    # a key two months past the last bound creates sys_p1 + sys_p2
    eng.sql("INSERT INTO pi VALUES ('2020-05-20', 3)")
    rows = eng.sql("SELECT * FROM pg_partitions").collect()
    assert [(r.partitionname, r.bound) for r in rows] == [
        ("p0", "< '2020-03-01'"), ("p1", "< '2020-04-01'"),
        ("sys_p1", "< '2020-05-01'"), ("sys_p2", "< '2020-06-01'"),
    ]
    path = eng.managed_tables._path("pi")
    assert os.path.exists(os.path.join(path, f"{PART_COL}=sys_p2"))
    assert not os.path.exists(os.path.join(path, f"{PART_COL}=sys_p1"))
    assert eng.sql("SELECT COUNT(*) AS n FROM pi").collect()[0].n == 3
    # pruning works across declared and auto-created partitions
    assert [r.v for r in
            pruned_scan(eng, "pi", "d >= '2020-05-01'").collect()] == [3]
    # NULL keys still have no home (no MAXVALUE partition by design)
    with pytest.raises(ValueError, match="do not map"):
        eng.sql("INSERT INTO pi VALUES (NULL, 9)")
    eng.sql("DROP TABLE pi")


def test_interval_partition_grammar_rules():
    with pytest.raises(ValueError, match="exclusive"):
        parse_partition_by(
            "PARTITION BY RANGE (d) INTERVAL ('1 month') ("
            "PARTITION p0 VALUES LESS THAN ('2020-01-01'), "
            "PARTITION pm VALUES LESS THAN (MAXVALUE))"
        )
    with pytest.raises(ValueError, match="RANGE"):
        parse_partition_by(
            "PARTITION BY HASH (k) INTERVAL ('1 month') PARTITIONS 4"
        )
    # numeric interval steps for integer keys
    s = parse_partition_by(
        "PARTITION BY RANGE (k) INTERVAL ('1000') ("
        "PARTITION p0 VALUES LESS THAN (1000))"
    )
    assert s.interval == (1000, None)


def test_interval_numeric_autoextend(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pn (k bigint, v double) PARTITION BY RANGE (k) "
        "INTERVAL ('1000') (PARTITION p0 VALUES LESS THAN (1000))"
    )
    eng.sql("INSERT INTO pn VALUES (1, 1.0), (2500, 2.0)")
    rows = eng.sql("SELECT * FROM pg_partitions").collect()
    assert [r.partitionname for r in rows] == ["p0", "sys_p1", "sys_p2"]
    assert [r.v for r in
            pruned_scan(eng, "pn", "k >= 2000").collect()] == [2.0]
    eng.sql("DROP TABLE pn")


def test_exchange_partition(spark, tmp_path):
    """EXCHANGE PARTITION swaps storage with a staging table in O(1)
    directory renames (tablecmds.cpp ATExecExchangePartition) — the
    bulk-load fast path; WITH VALIDATION rejects out-of-range rows."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE px (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION p1 VALUES LESS THAN (20))"
    )
    eng.sql("INSERT INTO px VALUES (1, 1.0), (15, 15.0)")
    eng.sql("CREATE TABLE staging (k bigint, v double)")
    eng.sql("INSERT INTO staging VALUES (11, 110.0), (12, 120.0)")
    # staging rows belong to p1: exchange swaps them in, old p1 out
    eng.sql("ALTER TABLE px EXCHANGE PARTITION (p1) WITH TABLE staging")
    assert sorted(r.k for r in eng.sql("SELECT k FROM px").collect()) \
        == [1, 11, 12]
    assert [r.k for r in eng.sql("SELECT k FROM staging").collect()] \
        == [15]
    # swap back restores both sides
    eng.sql("ALTER TABLE px EXCHANGE PARTITION (p1) WITH TABLE staging")
    assert sorted(r.k for r in eng.sql("SELECT k FROM px").collect()) \
        == [1, 15]
    assert sorted(r.k for r in
                  eng.sql("SELECT k FROM staging").collect()) == [11, 12]
    # validation rejects rows outside the partition's range
    eng.sql("INSERT INTO staging VALUES (5, 5.0)")
    with pytest.raises(ValueError, match="do not belong"):
        eng.sql(
            "ALTER TABLE px EXCHANGE PARTITION (p1) WITH TABLE staging"
        )
    # ... unless WITHOUT VALIDATION, as the reference allows
    eng.sql(
        "ALTER TABLE px EXCHANGE PARTITION (p1) WITH TABLE staging"
        " WITHOUT VALIDATION"
    )
    assert sorted(r.k for r in eng.sql("SELECT k FROM px").collect()) \
        == [1, 5, 11, 12]
    eng.sql("DROP TABLE px")
    eng.sql("DROP TABLE staging")


def test_exchange_empty_partition(spark, tmp_path):
    """Exchanging INTO an empty partition (the canonical load shape)
    leaves the staging table empty but readable."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pe (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION p1 VALUES LESS THAN (20))"
    )
    eng.sql("INSERT INTO pe VALUES (1, 1.0)")  # p1 stays empty
    eng.sql("CREATE TABLE st2 (k bigint, v double)")
    eng.sql("INSERT INTO st2 VALUES (11, 110.0)")
    eng.sql("ALTER TABLE pe EXCHANGE PARTITION (p1) WITH TABLE st2")
    assert sorted(r.k for r in eng.sql("SELECT k FROM pe").collect()) \
        == [1, 11]
    assert eng.sql("SELECT COUNT(*) AS n FROM st2").collect()[0].n == 0
    assert eng.sql("SELECT * FROM st2").columns == ["k", "v"]
    eng.sql("DROP TABLE pe")
    eng.sql("DROP TABLE st2")


def test_merge_partitions_stmt(spark, tmp_path):
    """MERGE PARTITIONS moves files between directories and unions the
    bounds — no data rewrite (ATExecMergePartition); range partitions
    must be consecutive."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pmg (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION p1 VALUES LESS THAN (20), "
        "PARTITION p2 VALUES LESS THAN (30))"
    )
    eng.sql("INSERT INTO pmg VALUES (1, 1.0), (15, 15.0), (25, 25.0)")
    with pytest.raises(ValueError, match="consecutive"):
        eng.sql("ALTER TABLE pmg MERGE PARTITIONS p0, p2"
                " INTO PARTITION pbad")
    eng.sql("ALTER TABLE pmg MERGE PARTITIONS p0, p1 INTO PARTITION p01")
    rows = eng.sql("SELECT * FROM pg_partitions").collect()
    assert [(r.partitionname, r.bound) for r in rows] == [
        ("p01", "< 20"), ("p2", "< 30")
    ]
    assert sorted(r.k for r in eng.sql("SELECT k FROM pmg").collect()) \
        == [1, 15, 25]
    # the merged directory holds both old partitions' files
    ndir = os.path.join(eng.managed_tables._path("pmg"),
                        f"{PART_COL}=p01")
    assert os.path.isdir(ndir)
    # pruning respects the merged bound
    assert sorted(
        r.k for r in pruned_scan(eng, "pmg", "k < 20").collect()
    ) == [1, 15]
    eng.sql("DROP TABLE pmg")


def test_merge_list_partitions(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pml (c text, v bigint) PARTITION BY LIST (c) ("
        "PARTITION pa VALUES ('x'), PARTITION pb VALUES ('y'), "
        "PARTITION pc VALUES ('z'))"
    )
    eng.sql("INSERT INTO pml VALUES ('x', 1), ('y', 2), ('z', 3)")
    eng.sql("ALTER TABLE pml MERGE PARTITIONS pa, pc INTO PARTITION pac")
    rows = eng.sql("SELECT * FROM pg_partitions").collect()
    assert [(r.partitionname, r.bound) for r in rows] == [
        ("pac", "IN ('x', 'z')"), ("pb", "IN ('y')")
    ]
    assert [r.v for r in
            pruned_scan(eng, "pml", "c IN ('x', 'z')").collect()] \
        in ([1, 3], [3, 1])
    eng.sql("DROP TABLE pml")


def test_partition_selector_select(spark, tmp_path):
    """SELECT ... FROM <t> PARTITION (<p>) (the reference's
    partition-selector scan) reads exactly one directory."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE psel (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION p1 VALUES LESS THAN (20))"
    )
    eng.sql("INSERT INTO psel VALUES (1, 1.0), (15, 15.0)")
    rows = eng.sql(
        "SELECT k, v FROM psel PARTITION (p1) ORDER BY k"
    ).collect()
    assert [(r.k, r.v) for r in rows] == [(15, 15.0)]
    # aggregates over a selector work too
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM psel PARTITION (p0)"
    ).collect()[0].n == 1
    with pytest.raises(KeyError, match="does not exist"):
        eng.sql("SELECT * FROM psel PARTITION (nope)")
    eng.sql("DROP TABLE psel")


def test_split_partition(spark, tmp_path):
    """SPLIT PARTITION rewrites only the split partition's directory
    into two (ATExecSplitPartition) — O(partition), not O(table)."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE psp (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (20), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    eng.sql("INSERT INTO psp VALUES (1, 1.0), (15, 15.0), (25, 25.0)")
    eng.sql(
        "ALTER TABLE psp SPLIT PARTITION p0 AT (10) INTO "
        "(PARTITION pa, PARTITION pb)"
    )
    rows = eng.sql("SELECT * FROM pg_partitions").collect()
    assert [(r.partitionname, r.bound) for r in rows] == [
        ("pa", "< 10"), ("pb", "< 20"), ("pmax", "MAXVALUE")
    ]
    path = eng.managed_tables._path("psp")
    assert not os.path.exists(os.path.join(path, f"{PART_COL}=p0"))
    assert [r.k for r in
            eng.sql("SELECT k FROM psp PARTITION (pa)").collect()] == [1]
    assert [r.k for r in
            eng.sql("SELECT k FROM psp PARTITION (pb)").collect()] == [15]
    assert sorted(r.k for r in eng.sql("SELECT k FROM psp").collect()) \
        == [1, 15, 25]
    # AT must fall strictly inside the split partition's range
    with pytest.raises(ValueError, match="strictly inside"):
        eng.sql(
            "ALTER TABLE psp SPLIT PARTITION pb AT (10) INTO "
            "(PARTITION x, PARTITION y)"
        )
    # splitting the MAXVALUE partition keeps MAXVALUE on the upper half
    eng.sql(
        "ALTER TABLE psp SPLIT PARTITION pmax AT (30) INTO "
        "(PARTITION pc, PARTITION pm2)"
    )
    rows = eng.sql("SELECT * FROM pg_partitions").collect()
    assert [(r.partitionname, r.bound) for r in rows] == [
        ("pa", "< 10"), ("pb", "< 20"), ("pc", "< 30"),
        ("pm2", "MAXVALUE"),
    ]
    assert [r.k for r in
            eng.sql("SELECT k FROM psp PARTITION (pc)").collect()] == [25]
    eng.sql("DROP TABLE psp")


def test_local_index_on_partitioned_table(spark, tmp_path):
    """CREATE INDEX ... LOCAL (the reference's per-partition index) =
    within-partition sorted layout; the partition directories
    survive."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE pli (k bigint, v double) PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (100), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    eng.sql(
        "INSERT INTO pli SELECT o_orderkey, o_totalprice FROM orders"
        " WHERE o_orderkey <= 300"
    )
    eng.sql("CREATE INDEX pli_v_idx ON pli (v) LOCAL")
    idx = {r.indexname for r in
           eng.sql("SELECT * FROM pg_indexes").collect()}
    assert "pli_v_idx" in idx
    path = eng.managed_tables._path("pli")
    assert glob.glob(os.path.join(path, f"{PART_COL}=*"))
    n = eng.sql("SELECT COUNT(*) AS n FROM pli").collect()[0].n
    assert n == eng.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderkey <= 300"
    ).collect()[0].n
    eng.sql("DROP TABLE pli")


def test_subpartition_range_list(spark, tmp_path):
    """Two-level partitioning (the reference's hw_subpartition_scan
    range_list shape): routing writes _part/_subpart directories,
    elimination prunes on BOTH keys, selectors read one partition or
    one subpartition, TRUNCATE/DROP SUBPARTITION unlink one leaf
    directory."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE rl (month_code text, dept_code text, amt bigint) "
        "PARTITION BY RANGE (month_code) SUBPARTITION BY LIST "
        "(dept_code) ("
        "  PARTITION p_201901 VALUES LESS THAN ('201903') ("
        "    SUBPARTITION p_201901_a VALUES ('1'),"
        "    SUBPARTITION p_201901_b VALUES ('2')"
        "  ),"
        "  PARTITION p_201902 VALUES LESS THAN ('201910') ("
        "    SUBPARTITION p_201902_a VALUES ('1'),"
        "    SUBPARTITION p_201902_b VALUES ('2')"
        "  ))"
    )
    eng.sql(
        "INSERT INTO rl VALUES ('201902', '1', 1), ('201902', '2', 1),"
        " ('201902', '1', 1), ('201903', '2', 1), ('201903', '1', 1)"
    )
    path = eng.managed_tables._path("rl")
    assert os.path.isdir(os.path.join(
        path, f"{PART_COL}=p_201901", f"{SUBPART_COL}=p_201901_a"
    ))
    assert eng.sql("SELECT * FROM rl").columns == [
        "month_code", "dept_code", "amt"
    ]
    assert eng.sql("SELECT COUNT(*) AS n FROM rl").collect()[0].n == 5
    # pg_partitions lists subpartitions under their parents
    rows = eng.sql("SELECT * FROM pg_partitions").collect()
    names = [r.partitionname for r in rows]
    assert "p_201901/p_201901_a" in names and "p_201902" in names

    # two-level elimination
    df = pruned_scan(
        eng, "rl", "month_code < '201903' AND dept_code = '1'"
    )
    assert df.count() == 2  # the two ('201902', '1') rows
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # selectors
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM rl PARTITION (p_201901)"
    ).collect()[0].n == 3
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM rl SUBPARTITION (p_201901_b)"
    ).collect()[0].n == 1

    # TRUNCATE SUBPARTITION: one leaf unlink, definition kept
    eng.sql("ALTER TABLE rl TRUNCATE SUBPARTITION p_201901_b")
    assert eng.sql("SELECT COUNT(*) AS n FROM rl").collect()[0].n == 4
    assert "p_201901/p_201901_b" in [
        r.partitionname
        for r in eng.sql("SELECT * FROM pg_partitions").collect()
    ]
    # DROP SUBPARTITION removes the definition too
    eng.sql("ALTER TABLE rl DROP SUBPARTITION p_201901_b")
    assert "p_201901/p_201901_b" not in [
        r.partitionname
        for r in eng.sql("SELECT * FROM pg_partitions").collect()
    ]
    # a dept '2' row now has no home under p_201901
    with pytest.raises(ValueError, match="do not map"):
        eng.sql("INSERT INTO rl VALUES ('201902', '2', 9)")
    with pytest.raises(ValueError, match="last subpartition"):
        eng.sql("ALTER TABLE rl DROP SUBPARTITION p_201901_a")
    eng.sql("DROP TABLE rl")


def test_subpartition_default_and_add_partition(spark, tmp_path):
    """A partition without an explicit subpartition list gets the
    auto <p>_subpartdefault1 catch-all (the reference's naming), and
    ADD PARTITION on a subpartitioned table does the same."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE sd (k bigint, c text, v bigint) "
        "PARTITION BY RANGE (k) SUBPARTITION BY LIST (c) ("
        "  PARTITION p0 VALUES LESS THAN (10))"
    )
    eng.sql("INSERT INTO sd VALUES (1, 'anything', 1)")
    names = [r.partitionname for r in
             eng.sql("SELECT * FROM pg_partitions").collect()]
    assert "p0/p0_subpartdefault1" in names
    eng.sql("ALTER TABLE sd ADD PARTITION p1 VALUES LESS THAN (20)")
    eng.sql("INSERT INTO sd VALUES (15, 'x', 2)")
    names = [r.partitionname for r in
             eng.sql("SELECT * FROM pg_partitions").collect()]
    assert "p1/p1_subpartdefault1" in names
    assert eng.sql("SELECT COUNT(*) AS n FROM sd").collect()[0].n == 2
    # partition-level MERGE/SPLIT refuse on subpartitioned tables
    # (the reference's own line); EXCHANGE executes since r12 but
    # demands a spec-matching partitioned staging side — a plain
    # table refuses with the requirement named
    eng.sql("CREATE TABLE sd_stage (k bigint, c text, v bigint)")
    with pytest.raises(ValueError, match="singly partitioned"):
        eng.sql("ALTER TABLE sd EXCHANGE PARTITION (p0)"
                " WITH TABLE sd_stage")
    with pytest.raises(NotImplementedError, match="subpartitioned"):
        eng.sql("ALTER TABLE sd MERGE PARTITIONS p0, p1"
                " INTO PARTITION pm")
    with pytest.raises(NotImplementedError, match="subpartitioned"):
        eng.sql("ALTER TABLE sd SPLIT PARTITION p0 AT (5) INTO "
                "(PARTITION a, PARTITION b)")
    eng.sql("DROP TABLE sd")
    eng.sql("DROP TABLE sd_stage")


def test_hash_subpartitions_and_named_hash(spark, tmp_path):
    """Hash subpartition templates and named hash partitions (round
    11 — the r10 verdict's subpartition-surgery refusal, narrowed):
    the reference declares hash subpartitions as BARE NAMES with
    positional buckets (hw_subpartition_createtable.sql:47-59
    list_hash) and also partitions BY HASH with named partitions.
    Rows route by Murmur3 bucket to the DECLARED name, every row has
    a home, counts are exhaustive, selectors and hash-eq elimination
    work on the declared names."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE lh (month_code text, dept_code text, amt bigint)"
        " PARTITION BY LIST (month_code) SUBPARTITION BY HASH"
        " (dept_code) ("
        "  PARTITION p_201901 VALUES ('201902') ("
        "    SUBPARTITION p_201901_a,"
        "    SUBPARTITION p_201901_b"
        "  ),"
        "  PARTITION p_201902 VALUES ('201903') ("
        "    SUBPARTITION p_201902_a,"
        "    SUBPARTITION p_201902_b"
        "  ))"
    )
    eng.sql("INSERT INTO lh VALUES ('201902', '1', 1), ('201902', '2', 1),"
            " ('201902', '3', 1), ('201903', '4', 1), ('201903', '5', 1),"
            " ('201903', '6', 1)")
    assert eng.sql("SELECT COUNT(*) AS n FROM lh").collect()[0].n == 6
    # every leaf is one of the declared names
    names = {r.partitionname for r in
             eng.sql("SELECT * FROM pg_partitions").collect()}
    leaf = {n for n in names if "/" in n}
    assert leaf <= {"p_201901/p_201901_a", "p_201901/p_201901_b",
                    "p_201902/p_201902_a", "p_201902/p_201902_b"}
    # subpartition selector sums to the partition
    na = eng.sql("SELECT COUNT(*) AS n FROM lh"
                 " SUBPARTITION (p_201901_a)").collect()[0].n
    nb = eng.sql("SELECT COUNT(*) AS n FROM lh"
                 " SUBPARTITION (p_201901_b)").collect()[0].n
    assert na + nb == 3
    # hash-eq elimination on the subkey prunes to ONE declared leaf
    df = pruned_scan(eng, "lh",
                     "month_code = '201902' AND dept_code = '2'")
    assert df.count() == 1
    eng.sql("DROP TABLE lh")
    # named hash partitions at the TOP level, with subpartitions
    eng.sql(
        "CREATE TABLE hh (k bigint, c text, v bigint)"
        " PARTITION BY HASH (k) SUBPARTITION BY LIST (c) ("
        "  PARTITION h0 ("
        "    SUBPARTITION h0_a VALUES ('a'),"
        "    SUBPARTITION h0_b VALUES ('b')"
        "  ),"
        "  PARTITION h1 ("
        "    SUBPARTITION h1_a VALUES ('a'),"
        "    SUBPARTITION h1_b VALUES ('b')"
        "  ))"
    )
    eng.sql("INSERT INTO hh VALUES (1, 'a', 10), (2, 'b', 20),"
            " (3, 'a', 30), (4, 'b', 40)")
    assert eng.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM hh"
                   ).collect()[0].s == 100
    n0 = eng.sql("SELECT COUNT(*) AS n FROM hh PARTITION (h0)"
                 ).collect()[0].n
    n1 = eng.sql("SELECT COUNT(*) AS n FROM hh PARTITION (h1)"
                 ).collect()[0].n
    assert n0 + n1 == 4
    # hash-eq elimination resolves to the DECLARED partition name
    df = pruned_scan(eng, "hh", "k = 3")
    assert df.count() == 1
    eng.sql("DROP TABLE hh")


def test_exchange_subpartition(spark, tmp_path):
    """EXCHANGE SUBPARTITION (round 11 — the r10 verdict's
    subpartition-surgery item): the leaf directory
    ``_part=<p>/_subpart=<s>`` swaps with a plain staging table in
    O(1) renames (tablecmds.cpp ATExecExchangePartition over a
    subpartition OID, hw_subpartition_* regress).  Validation routes
    every staging row to exactly (owner, subpartition); the swapped-
    out rows land in the staging table; WITHOUT VALIDATION skips the
    check; partition-level exchange on the subpartitioned table
    stays refused."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE xs (k bigint, c text, v bigint) "
        "PARTITION BY RANGE (k) SUBPARTITION BY LIST (c) ("
        "  PARTITION p0 VALUES LESS THAN (10) ("
        "    SUBPARTITION p0_a VALUES ('a'),"
        "    SUBPARTITION p0_b VALUES ('b')"
        "  ),"
        "  PARTITION p1 VALUES LESS THAN (20) ("
        "    SUBPARTITION p1_a VALUES ('a'),"
        "    SUBPARTITION p1_b VALUES ('b')"
        "  ))"
    )
    eng.sql("INSERT INTO xs VALUES (1, 'a', 10), (1, 'b', 20),"
            " (15, 'a', 30)")
    # staging rows all route to (p0, p0_a)
    eng.sql("CREATE TABLE xstage (k bigint, c text, v bigint)")
    eng.sql("INSERT INTO xstage VALUES (2, 'a', 100), (3, 'a', 200)")
    out = eng.sql(
        "ALTER TABLE xs EXCHANGE SUBPARTITION (p0_a) WITH TABLE xstage"
    ).collect()[0]
    assert (out.partition, out.subpartition) == ("p0", "p0_a")
    assert eng.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM xs"
                   ).collect()[0].s == 100 + 200 + 20 + 30
    # the old leaf rows landed in the staging table
    assert [tuple(r) for r in eng.sql(
        "SELECT k, c, v FROM xstage").collect()] == [(1, "a", 10)]
    # stray rows refuse under validation...
    eng.sql("INSERT INTO xstage VALUES (15, 'b', 999)")
    with pytest.raises(ValueError, match="do not belong"):
        eng.sql("ALTER TABLE xs EXCHANGE SUBPARTITION (p0_a)"
                " WITH TABLE xstage")
    # ...and WITHOUT VALIDATION skips the check (reference semantics)
    eng.sql("ALTER TABLE xs EXCHANGE SUBPARTITION (p1_b)"
            " WITH TABLE xstage WITHOUT VALIDATION")
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM xs SUBPARTITION (p1_b)"
    ).collect()[0].n == 2
    with pytest.raises(KeyError, match="does not exist"):
        eng.sql("ALTER TABLE xs EXCHANGE SUBPARTITION (nope)"
                " WITH TABLE xstage")
    # top-level exchange (lifted r12) demands a staging table
    # partitioned like the subpartition spec — a plain table refuses
    with pytest.raises(ValueError, match="singly partitioned"):
        eng.sql("ALTER TABLE xs EXCHANGE PARTITION (p0)"
                " WITH TABLE xstage")
    eng.sql("DROP TABLE xs")
    eng.sql("DROP TABLE xstage")


def test_exchange_partition_on_subpartitioned(spark, tmp_path):
    """Top-level EXCHANGE PARTITION on a SUBPARTITIONED table (r12 —
    the r11 verdict's item #5; hw_subpartition_alter_table.sql): the
    whole ``_part=<p>`` directory swaps with a staging table
    partitioned exactly like p's subpartition spec — O(#leaves)
    renames, no data copy; validation routes every staging row to p
    AND checks each row's stored leaf against the parent's
    subpartition routing; spec mismatches refuse."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE xt (k bigint, c text, v bigint) "
        "PARTITION BY RANGE (k) SUBPARTITION BY LIST (c) ("
        "  PARTITION p0 VALUES LESS THAN (10) ("
        "    SUBPARTITION p0_a VALUES ('a'),"
        "    SUBPARTITION p0_b VALUES ('b')"
        "  ),"
        "  PARTITION p1 VALUES LESS THAN (20) ("
        "    SUBPARTITION p1_a VALUES ('a'),"
        "    SUBPARTITION p1_b VALUES ('b')"
        "  ))"
    )
    eng.sql("INSERT INTO xt VALUES (1, 'a', 10), (2, 'b', 20),"
            " (15, 'a', 30)")
    # staging partitioned EXACTLY like p0's subpartition spec
    eng.sql(
        "CREATE TABLE xtst (k bigint, c text, v bigint)"
        " PARTITION BY LIST (c) ("
        "  PARTITION p0_a VALUES ('a'),"
        "  PARTITION p0_b VALUES ('b'))"
    )
    eng.sql("INSERT INTO xtst VALUES (3, 'a', 100), (4, 'b', 200)")
    out = eng.sql(
        "ALTER TABLE xt EXCHANGE PARTITION (p0) WITH TABLE xtst"
    ).collect()[0]
    assert (out.partition, out.with_table) == ("p0", "xtst")
    # the staged month is in; the old p0 rows are in the staging side
    assert eng.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM xt"
                   ).collect()[0].s == 100 + 200 + 30
    assert sorted(tuple(r) for r in eng.sql(
        "SELECT k, c, v FROM xtst").collect()) == \
        [(1, "a", 10), (2, "b", 20)]
    # subpartition pruning still serves the swapped-in leaves
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM xt SUBPARTITION (p0_b)"
    ).collect()[0].n == 1
    # validation: a staging row routing to p1 refuses
    eng.sql("INSERT INTO xtst VALUES (15, 'a', 999)")
    with pytest.raises(ValueError, match="do not route"):
        eng.sql("ALTER TABLE xt EXCHANGE PARTITION (p0)"
                " WITH TABLE xtst")
    # WITHOUT VALIDATION skips the check (reference semantics)
    eng.sql("ALTER TABLE xt EXCHANGE PARTITION (p0) WITH TABLE xtst"
            " WITHOUT VALIDATION")
    # spec mismatch refuses: staging partitioned by the WRONG leaves
    eng.sql(
        "CREATE TABLE xbad (k bigint, c text, v bigint)"
        " PARTITION BY LIST (c) ("
        "  PARTITION q_a VALUES ('a'))"
    )
    with pytest.raises(ValueError, match="exactly like"):
        eng.sql("ALTER TABLE xt EXCHANGE PARTITION (p1)"
                " WITH TABLE xbad")
    eng.sql("DROP TABLE xt")
    eng.sql("DROP TABLE xtst")
    eng.sql("DROP TABLE xbad")


def test_split_subpartition(spark, tmp_path):
    """SPLIT SUBPARTITION (round 11 — ATExecSplitSubPartition, the
    hw_subpartition_split regress family): a LIST subpartition's
    value set splits into (listed → a, remainder → b), the DEFAULT
    catch-all carves a list out and keeps the catch-all, and a RANGE
    subpartition splits AT a bound — each re-routing ONLY the split
    leaf's rows."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE ss (k bigint, c text, v bigint)"
        " PARTITION BY RANGE (k) SUBPARTITION BY LIST (c) ("
        "  PARTITION p0 VALUES LESS THAN (100) ("
        "    SUBPARTITION p0_ab VALUES ('a', 'b'),"
        "    SUBPARTITION p0_rest VALUES (DEFAULT)"
        "  ))"
    )
    eng.sql("INSERT INTO ss VALUES (1, 'a', 1), (2, 'b', 2),"
            " (3, 'c', 3), (4, 'd', 4)")
    out = eng.sql(
        "ALTER TABLE ss SPLIT SUBPARTITION p0_ab VALUES ('a')"
        " INTO (SUBPARTITION p0_a, SUBPARTITION p0_b)"
    ).collect()[0]
    assert out.into == "p0_a,p0_b"
    assert eng.sql("SELECT COUNT(*) AS n FROM ss"
                   " SUBPARTITION (p0_a)").collect()[0].n == 1
    assert eng.sql("SELECT COUNT(*) AS n FROM ss"
                   " SUBPARTITION (p0_b)").collect()[0].n == 1
    # totals survive the surgery
    assert eng.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM ss"
                   ).collect()[0].s == 10
    # the DEFAULT catch-all splits into (list, still-DEFAULT)
    eng.sql("ALTER TABLE ss SPLIT SUBPARTITION p0_rest VALUES ('c')"
            " INTO (SUBPARTITION p0_c, SUBPARTITION p0_def)")
    assert eng.sql("SELECT COUNT(*) AS n FROM ss"
                   " SUBPARTITION (p0_c)").collect()[0].n == 1
    assert eng.sql("SELECT COUNT(*) AS n FROM ss"
                   " SUBPARTITION (p0_def)").collect()[0].n == 1
    # a new DEFAULT-routed row still has a home
    eng.sql("INSERT INTO ss VALUES (5, 'z', 5)")
    assert eng.sql("SELECT COUNT(*) AS n FROM ss"
                   " SUBPARTITION (p0_def)").collect()[0].n == 2
    with pytest.raises(ValueError, match="subset"):
        eng.sql("ALTER TABLE ss SPLIT SUBPARTITION p0_a VALUES ('q')"
                " INTO (SUBPARTITION x1, SUBPARTITION x2)")
    with pytest.raises(KeyError, match="does not exist"):
        eng.sql("ALTER TABLE ss SPLIT SUBPARTITION nope VALUES ('a')"
                " INTO (SUBPARTITION x1, SUBPARTITION x2)")
    eng.sql("DROP TABLE ss")
    # RANGE subpartitions split AT a bound
    eng.sql(
        "CREATE TABLE sr (k bigint, d bigint, v bigint)"
        " PARTITION BY LIST (k) SUBPARTITION BY RANGE (d) ("
        "  PARTITION p0 VALUES (1, 2) ("
        "    SUBPARTITION s_low VALUES LESS THAN (100),"
        "    SUBPARTITION s_hi VALUES LESS THAN (MAXVALUE)"
        "  ))"
    )
    eng.sql("INSERT INTO sr VALUES (1, 10, 1), (1, 60, 2), (2, 150, 3)")
    eng.sql("ALTER TABLE sr SPLIT SUBPARTITION s_low AT (50)"
            " INTO (SUBPARTITION s_a, SUBPARTITION s_b)")
    assert eng.sql("SELECT COUNT(*) AS n FROM sr"
                   " SUBPARTITION (s_a)").collect()[0].n == 1
    assert eng.sql("SELECT COUNT(*) AS n FROM sr"
                   " SUBPARTITION (s_b)").collect()[0].n == 1
    with pytest.raises(ValueError, match="strictly inside"):
        eng.sql("ALTER TABLE sr SPLIT SUBPARTITION s_hi AT (40)"
                " INTO (SUBPARTITION x1, SUBPARTITION x2)")
    eng.sql("DROP TABLE sr")


def test_pruning_bails_under_or_and_not(spark, tmp_path):
    """A key comparison under OR/NOT no longer bounds the result set —
    elimination must bail to all labels rather than drop rows."""
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TABLE por (k bigint, flag bigint) "
        "PARTITION BY RANGE (k) ("
        "PARTITION p0 VALUES LESS THAN (10), "
        "PARTITION pmax VALUES LESS THAN (MAXVALUE))"
    )
    eng.sql("INSERT INTO por VALUES (1, 0), (50, 1)")
    spec = PartitionSpec.from_meta(
        eng.managed_tables.tables["por"]["partition_spec"]
    )
    assert eligible_labels(eng.spark, spec, "k < 10 OR flag = 1") == [
        "p0", "pmax"
    ]
    assert eligible_labels(
        eng.spark, spec, "NOT (k BETWEEN 1 AND 5)"
    ) == ["p0", "pmax"]
    # rows from BOTH partitions survive the scan
    assert sorted(
        r.k for r in pruned_scan(eng, "por", "k < 10 OR flag = 1")
        .collect()
    ) == [1, 50]
    assert [r.k for r in
            pruned_scan(eng, "por", "NOT (k BETWEEN 1 AND 60)")
            .collect()] == []
    eng.sql("DROP TABLE por")
