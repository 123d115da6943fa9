"""Materialized views (commands/matview.cpp) and prepared statements
(commands/prepare.cpp) — edge behaviors beyond the driver-gated queries:
WITH NO DATA gating, SPJ incremental append, shape rejection, full
REFRESH picking up base changes, PREPARE/EXECUTE error contract, and
EXECUTE argument-literal parsing."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from opengauss_vectordb_spark.engine import Engine
from opengauss_vectordb_spark.operators.prepared import _parse_args

from .conftest import SF_SMOKE


@pytest.fixture()
def eng(spark):
    e = Engine(spark, SF_SMOKE)
    tmp = tempfile.mkdtemp(prefix="mv_test_")
    e.matviews.root = tmp
    yield e
    for name in list(e.matviews.views):
        e.matviews.drop(name)
    e.prepared.deallocate(None)
    shutil.rmtree(tmp, ignore_errors=True)


def test_matview_no_data_not_scannable(eng):
    eng.sql(
        "CREATE MATERIALIZED VIEW mv_t1 AS"
        " SELECT o_orderstatus, COUNT(*) AS n FROM orders"
        " GROUP BY o_orderstatus WITH NO DATA"
    )
    # PG: "materialized view has not been populated" — here: the name
    # is not registered, so analysis fails
    with pytest.raises(Exception):
        eng.spark.sql("SELECT * FROM mv_t1").collect()
    eng.sql("REFRESH MATERIALIZED VIEW mv_t1")
    assert eng.sql("SELECT COUNT(*) AS c FROM mv_t1").collect()[0].c > 0


def test_matview_full_refresh_sees_base_changes(eng):
    eng.spark.range(5).selectExpr("id", "id * 2 AS v").createOrReplaceTempView(
        "mv_base_t2"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW mv_t2 AS"
        " SELECT CAST(SUM(v) AS BIGINT) AS total FROM mv_base_t2"
    )
    assert eng.sql("SELECT total FROM mv_t2").collect()[0].total == 20
    # snapshot isolation: base changes are invisible until REFRESH
    eng.spark.range(10).selectExpr("id", "id * 2 AS v").createOrReplaceTempView(
        "mv_base_t2"
    )
    assert eng.sql("SELECT total FROM mv_t2").collect()[0].total == 20
    eng.sql("REFRESH MATERIALIZED VIEW mv_t2")
    assert eng.sql("SELECT total FROM mv_t2").collect()[0].total == 90
    eng.spark.catalog.dropTempView("mv_base_t2")


def test_matview_incremental_spj_appends(eng):
    base = eng.spark.range(10).selectExpr("id", "id % 3 AS grp")
    base.createOrReplaceTempView("mv_base_t3")
    eng.sql(
        "CREATE INCREMENTAL MATERIALIZED VIEW mv_t3 AS"
        " SELECT id, grp FROM mv_base_t3 WHERE grp <> 2"
    )
    n0 = eng.sql("SELECT COUNT(*) AS c FROM mv_t3").collect()[0].c
    delta = eng.spark.range(10, 16).selectExpr("id", "id % 3 AS grp")
    eng.matviews.refresh_incremental("mv_t3", delta)
    n1 = eng.sql("SELECT COUNT(*) AS c FROM mv_t3").collect()[0].c
    expected_delta = delta.filter(F.col("grp") != 2).count()
    assert n1 == n0 + expected_delta
    eng.spark.catalog.dropTempView("mv_base_t3")


def test_matview_incremental_rejects_nondecomposable(eng):
    with pytest.raises(ValueError, match="decomposable"):
        eng.sql(
            "CREATE INCREMENTAL MATERIALIZED VIEW mv_bad AS"
            " SELECT o_orderstatus, MAX(o_totalprice) AS m FROM orders"
            " GROUP BY o_orderstatus"
        )
    with pytest.raises(ValueError, match="shape"):
        eng.matviews.create(
            "mv_bad2", "SELECT a FROM t1 JOIN t2 ON t1.k = t2.k",
            incremental=True,
        )


def test_matview_create_duplicate_and_drop(eng):
    eng.sql(
        "CREATE MATERIALIZED VIEW mv_t4 AS SELECT 1 AS one"
    )
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE MATERIALIZED VIEW mv_t4 AS SELECT 2 AS two")
    row = eng.sql("DROP MATERIALIZED VIEW mv_t4").collect()[0]
    assert row.existed is True
    row = eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_t4").collect()[0]
    assert row.existed is False


def test_prepare_execute_contract(eng):
    eng.sql("PREPARE pq1 AS SELECT 1 AS a")
    assert eng.sql("EXECUTE pq1").collect()[0].a == 1
    # re-PREPARE of a live name errors (prepare.sql:13-17)
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("PREPARE pq1 AS SELECT 2 AS a")
    eng.sql("DEALLOCATE PREPARE pq1")
    eng.sql("PREPARE pq1 AS SELECT 2 AS b")
    assert eng.sql("EXECUTE pq1").collect()[0].b == 2
    eng.sql("DEALLOCATE ALL")
    assert eng.prepared.stmts == {}


def test_prepare_param_binding_types(eng):
    eng.sql(
        "PREPARE pq2(int, text) AS"
        " SELECT $1 + 1 AS n, upper($2) AS s, $1 AS echo"
    )
    row = eng.sql("EXECUTE pq2(41, 'abc')").collect()[0]
    assert (row.n, row.s, row.echo) == (42, "ABC", 41)
    # $n inside a string literal is data, not a marker
    eng.sql("PREPARE pq3 AS SELECT '$1 costs $2' AS lit, $1 AS v")
    row = eng.sql("EXECUTE pq3(7)").collect()[0]
    assert (row.lit, row.v) == ("$1 costs $2", 7)


def test_execute_arg_literal_parsing():
    assert _parse_args("'a,b', 5, 10.5, false, NULL") == [
        "a,b", 5, 10.5, False, None,
    ]
    assert _parse_args("5::smallint, 'x''y'") == [5, "x'y"]
    assert _parse_args(None) == []
    assert _parse_args("-3") == [-3]


def test_cursor_fetch_move_close(eng):
    eng.sql(
        "DECLARE tc CURSOR FOR"
        " SELECT id FROM range(10) ORDER BY id"
    )
    assert [r.id for r in eng.sql("FETCH 3 FROM tc").collect()] == [0, 1, 2]
    # MOVE skips without returning rows (portalcmds.cpp fetch with
    # dest=None)
    eng.sql("MOVE 2 FROM tc")
    assert [r.id for r in eng.sql("FETCH 3 FROM tc").collect()] == [5, 6, 7]
    # FETCH NEXT (no count) = 1 row
    assert [r.id for r in eng.sql("FETCH FROM tc").collect()] == [8]
    # exhaustion returns empty, not an error
    eng.sql("FETCH 5 FROM tc")
    assert eng.sql("FETCH 5 FROM tc").collect() == []
    eng.sql("CLOSE tc")
    with pytest.raises(KeyError):
        eng.cursors.fetch("tc", 1)
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("DECLARE tc2 CURSOR FOR SELECT 1 AS x")
        eng.sql("DECLARE tc2 CURSOR FOR SELECT 2 AS x")
    eng.cursors.close("tc2")


def test_explain_returns_plan(eng):
    rows = eng.sql(
        "EXPLAIN SELECT o_orderstatus, COUNT(*) AS n FROM orders"
        " GROUP BY o_orderstatus"
    ).collect()
    text = "\n".join(r[0] for r in rows)
    assert "HashAggregate" in text
    assert "Scan parquet" in text or "Scan Parquet" in text
    # EXPLAIN ANALYZE executes then renders
    rows = eng.sql("EXPLAIN ANALYZE SELECT COUNT(*) AS n FROM nation").collect()
    assert any("Aggregate" in r[0] for r in rows)


def test_analyze_sampling_and_consumer(eng):
    from opengauss_vectordb_spark.operators.stats import (
        analyze_table,
        histogram_bounds,
    )

    o = eng.table("orders")
    # sampled + approx-NDV operating point (the 100 TB default):
    # same schema, stats within sane envelopes of the exact full scan
    sampled = analyze_table(
        o, ["o_orderstatus"], sample_rows=200, id_col="o_orderkey",
        exact_distinct=False,
    ).collect()
    assert [r.col_name for r in sampled] == ["o_orderstatus"]
    assert sampled[0].n_rows == 200
    assert 1 <= sampled[0].n_distinct <= 5
    # ANALYZE through the SQL entry caches for the planner consumer
    eng.sql("ANALYZE nation (n_regionkey)")
    assert eng.suggest_broadcast("nation") is True
    with pytest.raises(KeyError, match="ANALYZE"):
        eng.suggest_broadcast("lineitem")
    # equi-depth histogram bounds are sorted and span min..max
    b = histogram_bounds(o, "o_totalprice", buckets=4)
    assert len(b) == 5 and b == sorted(b)


def test_ctas_view_ddl_contract(eng):
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="ddl_test_")
    eng.managed_tables.root = tmp
    try:
        eng.sql("CREATE TABLE mt1 AS SELECT id, id * 2 AS v FROM range(5)")
        assert eng.sql("SELECT COUNT(*) AS c FROM mt1").collect()[0].c == 5
        with pytest.raises(ValueError, match="already exists"):
            eng.sql("CREATE TABLE mt1 AS SELECT 1 AS x")
        # INSERT VALUES casts by position to the declared schema
        eng.sql("INSERT INTO mt1 VALUES (100, 0), (101, 1)")
        assert eng.sql("SELECT COUNT(*) AS c FROM mt1").collect()[0].c == 7
        with pytest.raises(ValueError, match="columns"):
            eng.sql("INSERT INTO mt1 VALUES (1, 2, 3)")
        # plain views are LIVE (DefineView rewrite-rule semantics):
        # they see managed-table appends without any refresh
        eng.sql("CREATE VIEW vt1 AS SELECT COUNT(*) AS c FROM mt1")
        assert eng.sql("SELECT c FROM vt1").collect()[0].c == 7
        eng.sql("INSERT INTO mt1 VALUES (102, 2)")
        assert eng.sql("SELECT c FROM vt1").collect()[0].c == 8
        with pytest.raises(ValueError, match="already exists"):
            eng.sql("CREATE VIEW vt1 AS SELECT 1 AS c")
        eng.sql("CREATE OR REPLACE VIEW vt1 AS SELECT 42 AS c")
        assert eng.sql("SELECT c FROM vt1").collect()[0].c == 42
        assert eng.sql("DROP VIEW vt1").collect()[0].existed is True
        assert eng.sql("DROP TABLE mt1").collect()[0].existed is True
        row = eng.sql("DROP TABLE IF EXISTS mt1").collect()[0]
        assert row.existed is False
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sequences(eng):
    eng.sql("CREATE SEQUENCE s1")
    assert [eng.sql("SELECT nextval('s1')").collect()[0][0]
            for _ in range(3)] == [1, 2, 3]
    assert eng.sql("SELECT currval('s1')").collect()[0][0] == 3
    eng.sql("SELECT setval('s1', 41)")
    assert eng.sql("SELECT nextval('s1')").collect()[0][0] == 42
    # bounded + CYCLE (sequence.cpp nextval_internal wrap)
    eng.sql("CREATE SEQUENCE s2 START 1 INCREMENT 1 MAXVALUE 2 CYCLE")
    vals = [eng.sql("SELECT nextval('s2')").collect()[0][0]
            for _ in range(4)]
    assert vals == [1, 2, 1, 2]
    eng.sql("CREATE SEQUENCE s3 MAXVALUE 1")
    eng.sql("SELECT nextval('s3')")
    with pytest.raises(ValueError, match="maximum"):
        eng.sequences.nextval("s3")
    with pytest.raises(ValueError, match="not yet defined"):
        eng.sequences.currval("s_fresh") if eng.sql(
            "CREATE SEQUENCE s_fresh"
        ) is not None else None
    eng.sql("DROP SEQUENCE s1")
    with pytest.raises(KeyError):
        eng.sequences.nextval("s1")
    for s in ("s2", "s3", "s_fresh"):
        eng.sequences.drop(s)


def test_scrollable_cursor(spark):
    """SCROLL directions (portalcmds.cpp PerformPortalFetch):
    BACKWARD reverses over consumed rows, ABSOLUTE repositions,
    FIRST/LAST jump to the ends, MOVE BACKWARD retreats."""
    from opengauss_vectordb_spark.engine import Engine

    from .conftest import SF_CORRECT

    eng = Engine(spark=spark, sf_dir=SF_CORRECT)
    eng.sql(
        "DECLARE sc SCROLL CURSOR FOR SELECT o_orderkey FROM orders"
        " WHERE o_orderkey <= 20 ORDER BY o_orderkey"
    )
    fwd = [r[0] for r in eng.sql("FETCH 5 FROM sc").collect()]
    assert len(fwd) == 5 and fwd == sorted(fwd)
    back = [r[0] for r in eng.sql("FETCH BACKWARD 3 FROM sc").collect()]
    assert back == fwd[-1:-4:-1]  # last three, reversed
    # position retreated to 2: next forward fetch resumes there
    again = [r[0] for r in eng.sql("FETCH 2 FROM sc").collect()]
    assert again == fwd[2:4]
    first = eng.sql("FETCH FIRST FROM sc").collect()
    assert [r[0] for r in first] == fwd[:1]
    one = eng.sql("FETCH ABSOLUTE 4 FROM sc").collect()
    assert [r[0] for r in one] == [fwd[3]]
    last = eng.sql("FETCH LAST FROM sc").collect()
    assert len(last) == 1
    # after LAST the forward window is exhausted
    assert eng.sql("FETCH 3 FROM sc").count() == 0
    eng.sql("MOVE BACKWARD 2 FROM sc")
    tail2 = eng.sql("FETCH 5 FROM sc").collect()
    assert len(tail2) == 2 and tail2[-1][0] == last[0][0]
    eng.sql("CLOSE sc")
