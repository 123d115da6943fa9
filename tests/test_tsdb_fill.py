"""tsdb time-bucket functions (operators/tsdb_fill.py): time_window
origin-anchored flooring pinned to the tsdb_aggregate.out values,
GROUP BY time_fill gapfill + fill_last/fill_first, the first/last
array pairs, and the regress error shapes."""

from __future__ import annotations

import datetime

import pytest

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark, SF_CORRECT)
    e.sql("CREATE TABLE tf_cpu (idle DOUBLE, node STRING, "
          "time_string TIMESTAMP)")
    e.sql(
        "INSERT INTO tf_cpu VALUES"
        " (1.0, 'node_a', TIMESTAMP'2019-07-12 00:10:10'),"
        " (2.0, 'node_b', TIMESTAMP'2019-07-12 00:12:10'),"
        " (3.0, 'node_c', TIMESTAMP'2019-07-12 00:13:10')"
    )
    return e


def one(eng, sql):
    return eng.sql(sql).collect()[0][0]


def test_time_window_units_pinned_to_regress(eng):
    # tsdb_aggregate.out (PDT renders shifted −7h; values here are the
    # same instants in the naive frame the engine stores)
    t = "TIMESTAMP'2019-07-12 11:09:01'"
    cases = {
        "interval '1 second'": "2019-07-12 11:09:01",
        "interval '1 min'": "2019-07-12 11:09:00",
        "interval '1 hour'": "2019-07-12 11:00:00",
        "interval '1 day'": "2019-07-12 00:00:00",
        "interval '1 week'": "2019-07-08 00:00:00",   # a Monday
        "interval '10 week'": "2019-05-13 00:00:00",
        "interval '100 day'": "2019-06-12 00:00:00",
        "interval '1000 hour'": "2019-07-07 00:00:00",
        "1": "2019-07-12 00:00:00",                   # bare int = days
    }
    for iv, want in cases.items():
        got = one(eng, f"SELECT time_window({iv}, {t}) AS tw")
        assert got == datetime.datetime.fromisoformat(want), (iv, got)
    assert one(eng, f"SELECT time_window(NULL, {t}) AS tw") is None
    # sub-second precision survives
    got = one(eng, "SELECT time_window(interval '1 millisecond', "
                   "TIMESTAMP'2019-07-12 11:09:01.0014') AS tw")
    assert got == datetime.datetime(2019, 7, 12, 11, 9, 1, 1000)


def test_time_fill_buckets_and_locf(eng):
    rows = [tuple(r) for r in eng.sql("""
        SELECT time_fill(interval '1 min', time_string,
                         '2019-07-12 00:09:00', '2019-07-12 00:14:00'),
               avg(idle)
        FROM tf_cpu GROUP BY time_fill ORDER BY time_fill
    """).collect()]
    assert [r[1] for r in rows] == [None, 1.0, None, 2.0, 3.0, None]
    assert rows[0][0] == datetime.datetime(2019, 7, 12, 0, 9)
    assert rows[-1][0] == datetime.datetime(2019, 7, 12, 0, 14)
    locf = [tuple(r) for r in eng.sql("""
        SELECT time_fill(interval '1 min', time_string,
                         '2019-07-12 00:09:00', '2019-07-12 00:14:00')
                 AS b,
               fill_last(avg(idle)) AS v
        FROM tf_cpu GROUP BY time_fill ORDER BY b
    """).collect()]
    assert [r[1] for r in locf] == [None, 1.0, 1.0, 2.0, 3.0, 3.0]
    nocb = [tuple(r)[1] for r in eng.sql("""
        SELECT time_fill(interval '1 min', time_string,
                         '2019-07-12 00:09:00', '2019-07-12 00:14:00')
                 AS b,
               fill_first(avg(idle)) AS v
        FROM tf_cpu GROUP BY time_fill ORDER BY b
    """).collect()]
    assert nocb == [1.0, 1.0, 2.0, 2.0, 3.0, None]
    # unaligned bounds floor to the bucket grid; out-of-range rows drop
    got = [tuple(r) for r in eng.sql("""
        SELECT time_fill(interval '1 min', time_string,
                         '2019-07-12 00:09:30', '2019-07-12 00:12:30'),
               CAST(COUNT(idle) AS INT) AS n
        FROM tf_cpu GROUP BY time_fill ORDER BY time_fill
    """).collect()]
    assert got[0][0] == datetime.datetime(2019, 7, 12, 0, 9)
    assert got[-1][0] == datetime.datetime(2019, 7, 12, 0, 12)
    assert len(got) == 4  # 00:13 bucket excluded by the TO bound


def test_first_last_array_pairs(eng):
    got = [tuple(r) for r in eng.sql("""
        SELECT first(array_agg(idle), array_agg(time_string)) AS f,
               last(array_agg(idle), array_agg(time_string)) AS l,
               CAST(SUM(CAST(idle AS DECIMAL(18,6))) AS DOUBLE) AS s
        FROM tf_cpu
    """).collect()]
    assert got == [(1.0, 3.0, 6.0)]
    # Spark's own one/two-arg first/last aggregates stay untouched
    assert one(eng, "SELECT first(idle) FROM (SELECT idle FROM tf_cpu "
                    "ORDER BY time_string)") == 1.0


def test_error_shapes_match_regress(eng):
    with pytest.raises(ValueError, match="gapfill context"):
        eng.sql("SELECT fill_last(1)")
    with pytest.raises(ValueError, match="GROUP BY"):
        eng.sql("SELECT time_fill(interval '1 min', time_string,"
                "'2019-07-12 00:09:00','2019-07-12 00:14:00')"
                " FROM tf_cpu")
    with pytest.raises(ValueError, match="multiple time_fill"):
        eng.sql("SELECT time_fill(interval '1 min', time_string,"
                "'2019-07-12 00:09:00','2019-07-12 00:14:00'),"
                " time_fill(interval '1 min', time_string,"
                "'2019-07-12 00:09:00','2019-07-12 00:14:00')"
                " FROM tf_cpu GROUP BY 1")
    with pytest.raises(ValueError, match="extra operations"):
        eng.sql("SELECT time_fill(interval '1 min', time_string,"
                "'2019-07-12 00:09:00','2019-07-12 00:14:00')"
                " + interval 1 minute FROM tf_cpu GROUP BY 1")
    with pytest.raises(ValueError, match="distance"):
        eng.sql("SELECT time_fill(interval '1 day', time_string,"
                "'2019-07-12 00:09:00','2019-07-12 00:14:00')"
                " FROM tf_cpu GROUP BY time_fill")
    with pytest.raises(NotImplementedError, match="per-series"):
        eng.sql("SELECT time_fill(interval '1 min', time_string,"
                "'2019-07-12 00:09:00','2019-07-12 00:14:00'), node"
                " FROM tf_cpu GROUP BY time_fill, node")


def test_plan_is_python_free(eng):
    df = eng.sql("""
        SELECT time_fill(interval '1 min', time_string,
                         '2019-07-12 00:09:00', '2019-07-12 00:14:00')
                 AS b,
               fill_last(avg(idle)) AS v
        FROM tf_cpu GROUP BY time_fill ORDER BY b
    """)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_view_over_time_fill_body(eng):
    eng.sql("CREATE VIEW tf_view AS SELECT time_fill(interval '1 min',"
            " time_string, '2019-07-12 00:09:00',"
            " '2019-07-12 00:14:00') AS b, fill_last(avg(idle)) AS v"
            " FROM tf_cpu GROUP BY time_fill")
    got = [tuple(r)[1] for r in
           eng.sql("SELECT * FROM tf_view ORDER BY b").collect()]
    assert got == [None, 1.0, 1.0, 2.0, 3.0, 3.0]
    # scalar time_window composes through a view body too
    eng.sql("CREATE VIEW tw_view AS SELECT time_window("
            "interval '1 hour', time_string) AS h FROM tf_cpu")
    assert eng.sql("SELECT COUNT(DISTINCT h) FROM tw_view"
                   ).collect()[0][0] == 1


def test_time_window_grid_vs_duckdb_time_bucket(eng):
    """Cross-engine anchor check: 200 seeded random (interval,
    timestamp) pairs; the engine's time_window must equal DuckDB's
    independent TimescaleDB-compatible time_bucket on every pair."""
    import random

    import duckdb

    rng = random.Random(1242)
    units = [("microsecond", 1), ("millisecond", 7), ("second", 13),
             ("min", 7), ("hour", 36), ("day", 13), ("week", 5)]
    pairs = []
    for _ in range(200):
        unit, maxn = units[rng.randrange(len(units))]
        n = rng.randrange(1, maxn + 1)
        ts = (f"{rng.randrange(1995, 2031)}-{rng.randrange(1, 13):02d}-"
              f"{rng.randrange(1, 29):02d} {rng.randrange(24):02d}:"
              f"{rng.randrange(60):02d}:{rng.randrange(60):02d}."
              f"{rng.randrange(10**6):06d}")
        pairs.append((n, unit, ts))
    items = ", ".join(
        f"time_window(interval '{n} {u}', TIMESTAMP'{t}') AS c{i}"
        for i, (n, u, t) in enumerate(pairs)
    )
    got = list(eng.sql(f"SELECT {items}").collect()[0])
    duck_units = {"min": "minute"}
    ditems = ", ".join(
        f"time_bucket(INTERVAL '{n} {duck_units.get(u, u)}', "
        f"TIMESTAMP '{t}') AS c{i}"
        for i, (n, u, t) in enumerate(pairs)
    )
    want = list(duckdb.connect().execute(f"SELECT {ditems}").fetchone())
    mismatches = [
        (pairs[i], g, w) for i, (g, w) in enumerate(zip(got, want))
        if g != w
    ]
    assert not mismatches, mismatches[:5]
