"""PG range types (utils/adt/rangetypes.cpp; the rangetypes.sql
regress shapes — census batch 9): constructors, canonicalization,
accessors, the operator set, range-typed columns, and range_in
literals — every expectation below is pinned to the reference's own
expected output (src/test/regress/expected/rangetypes.out)."""

from __future__ import annotations

import tempfile

import pytest

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT


@pytest.fixture()
def eng(spark):
    e = Engine(spark, SF_CORRECT)
    e.managed_tables.root = tempfile.mkdtemp(prefix="rng_")
    return e


def one(eng, q):
    return eng.sql(q).collect()[0][0]


def test_constructors_and_accessors(eng):
    assert one(eng, "SELECT isempty(numrange(1.1, 2.2))") is False
    assert one(eng, "SELECT isempty(numrange(1.7, 1.7))") is True
    assert one(eng, "SELECT isempty(numrange(1.7, 1.7, '[]'))") is False
    assert float(one(eng, "SELECT lower(numrange(1.1, 2.2))")) == 1.1
    assert float(one(eng, "SELECT upper(numrange(1.1, 2.2))")) == 2.2
    assert one(eng, "SELECT lower_inc(numrange(1.1, 2.2))") is True
    assert one(eng, "SELECT upper_inc(numrange(1.1, 2.2))") is False
    assert one(eng, "SELECT lower_inf(numrange(NULL, 2.2))") is True
    assert one(eng, "SELECT upper_inf(numrange(1.1, NULL))") is True
    # string lower/upper must NOT be hijacked by the range rewrite
    assert one(eng, "SELECT lower('ABC')") == "abc"
    assert one(eng, "SELECT upper('abc')") == "ABC"
    # discrete canonicalization (int4range's canonical fn): (1,5] →
    # [2,6)
    assert int(one(eng, "SELECT lower(int4range(1, 5, '(]'))")) == 2
    assert int(one(eng, "SELECT upper(int4range(1, 5, '(]'))")) == 6
    assert one(eng, "SELECT isempty(int4range(2, 2))") is True
    # bound-order error (range_serialize)
    with pytest.raises(Exception, match="lower bound"):
        eng.sql("SELECT numrange(2.0, 1.0)").collect()


def test_operator_matrix(eng):
    cases = [
        # elem containment
        ("numrange(1.0, 10.0) @> 5.5", True),
        ("numrange(1.0, 10.0) @> 10.0", False),
        ("numrange(1.0, 10.0, '[]') @> 10.0", True),
        ("1.9 <@ numrange(1.0, 2.0)", True),
        # range containment (rangetypes.out)
        ("numrange(1.0, 3.0) @> numrange(1.5, 2.0)", True),
        ("numrange(1.1, 3.3) <@ numrange(0.1, 10.1)", True),
        ("numrange(0.1, 10.1) <@ numrange(1.1, 3.3)", False),
        # overlap with inclusivity
        ("numrange(4.5, 5.5, '[]') && numrange(5.5, 6.5)", True),
        ("numrange(4.5, 5.5) && numrange(5.5, 6.5)", False),
        # strictly left with inclusivity
        ("numrange(1.0, 2.0) << numrange(3.0, 4.0)", True),
        ("numrange(1.0, 3.0, '[]') << numrange(3.0, 4.0, '[]')", False),
        # adjacency (bounds_adjacent: meet with exactly one inclusive)
        ("numrange(2.0, 3.0) -|- numrange(3.0, 4.0)", True),
        ("numrange(2.0, 3.0, '[]') -|- numrange(3.0, 4.0, '()')", True),
        ("numrange(1.0, 2.0) -|- numrange(2.0, 3.0, '[]')", True),
        ("range_adjacent(numrange(2.0, 3.0), numrange(3.1, 4.0))",
         False),
        ("range_adjacent(numrange(2.0, 3.0, '(]'),"
         " numrange(1.0, 2.0, '(]'))", True),
        # equality through canonicalization
        ("numrange(1.0, 1.0) = 'empty'", True),
        ("int4range(1, 3) = int4range(1, 2, '[]')", True),
    ]
    exprs = ", ".join(f"({q}) AS c{i}" for i, (q, _) in enumerate(cases))
    row = eng.sql(f"SELECT {exprs}").collect()[0]
    for i, (q, want) in enumerate(cases):
        assert row[i] is want, f"{q}: got {row[i]}, want {want}"


def test_range_arithmetic(eng):
    r = eng.sql("SELECT numrange(1.0, 3.0) * numrange(2.0, 4.0) AS r"
                ).collect()[0].r
    assert (float(r.lo), float(r.hi), r.li, r.ui) == \
        (2.0, 3.0, True, False)
    r = eng.sql("SELECT numrange(1.0, 2.0) + numrange(1.5, 3.0) AS r"
                ).collect()[0].r
    assert (float(r.lo), float(r.hi)) == (1.0, 3.0)
    # minus: cut right (rangetypes.out '[1.1,2.0)')
    r = eng.sql("SELECT numrange(1.1, 2.2) - numrange(2.0, 3.0) AS r"
                ).collect()[0].r
    assert (float(r.lo), float(r.hi), r.li, r.ui) == \
        (1.1, 2.0, True, False)
    # minus: disjoint → identity
    r = eng.sql(
        "SELECT range_minus(numrange(10.1,12.2,'[]'),"
        " numrange(110.0,120.2,'(]')) AS r").collect()[0].r
    assert (float(r.lo), float(r.hi)) == (10.1, 12.2)
    # union of disjoint non-adjacent errors (range_union)
    with pytest.raises(Exception, match="contiguous"):
        eng.sql("SELECT numrange(1.0, 2.0) + numrange(3.0, 4.0) AS r"
                ).collect()
    # minus that would split errors (range_minus)
    with pytest.raises(Exception, match="contiguous"):
        eng.sql("SELECT numrange(1.0, 10.0) - numrange(3.0, 4.0) AS r"
                ).collect()
    # range < range ordering refuses toward the accessor rewrite
    with pytest.raises(NotImplementedError, match="lower"):
        eng.sql("SELECT numrange(1.0, 2.0) < numrange(3.0, 4.0)")


def test_range_column_table(eng):
    """The rangetypes.sql table shapes: a NUMRANGE column, range_in
    literals in INSERT, operator dispatch on the column, literal
    equality."""
    eng.sql("CREATE TABLE numrange_test (nr numrange)")
    for lit in ("'[,)'", "'[3,]'", "'[, 5)'", "numrange(1.1, 2.2)",
                "'empty'", "numrange(1.7, 1.7, '[]')"):
        eng.sql(f"INSERT INTO numrange_test VALUES({lit})")
    rows = eng.sql(
        "SELECT isempty(nr) AS e, lower(nr) AS lo, upper(nr) AS hi"
        " FROM numrange_test").collect()
    assert len(rows) == 6
    assert sum(1 for r in rows if r.e) == 1
    cnt = lambda q: eng.sql(  # noqa: E731
        f"SELECT COUNT(*) AS n FROM numrange_test WHERE {q}"
    ).collect()[0].n
    # rangetypes.out expectations over the same inserts
    assert cnt("nr @> numrange(1.0,10000.1)") == 1     # only '[,)'
    assert cnt("1.9 <@ nr") == 3
    assert cnt("nr = 'empty'") == 1
    assert cnt("nr = '[1.1, 2.2)'") == 1
    assert cnt("range_contains(nr, numrange(1.9,1.91))") == 3
    assert cnt("range_contained_by(numrange(-1e7,-10000.1), nr)") == 2
    eng.sql("DROP TABLE numrange_test")


def test_range_ops_stay_codegen(eng):
    """Scale pin: a range predicate over a table compiles to pure
    bound comparisons — no Python nodes, filter above the scan."""
    from opengauss_vectordb_spark.plans.explain import (
        physical_plan,
        python_eval_nodes,
    )

    df = eng.sql(
        "SELECT COUNT(*) AS n FROM orders"
        " WHERE int8range(500, 1500) @> o_orderkey"
    )
    assert python_eval_nodes(df) == 0
    assert "BatchEvalPython" not in physical_plan(df)
    assert df.collect()[0].n > 0


def test_range_update_set(eng):
    """UPDATE's SET position is an ASSIGNMENT — a range literal there
    must convert to the constructor struct, never to an equality
    predicate; the WHERE keeps operator dispatch."""
    eng.sql("CREATE TABLE r12_upd (k int, nr numrange)")
    eng.sql("INSERT INTO r12_upd VALUES (1, '[1,2)'), (2, '[5,9)')")
    eng.sql("UPDATE r12_upd SET nr = '[10,20)' WHERE 6.0 <@ nr")
    rows = sorted(
        (r.k, float(r.lo) if r.lo is not None else None)
        for r in eng.sql(
            "SELECT k, lower(nr) AS lo FROM r12_upd").collect()
    )
    assert rows == [(1, 1.0), (2, 10.0)]
    eng.sql("UPDATE r12_upd SET nr = numrange(0.5, 1.5) WHERE k = 1")
    assert float(eng.sql(
        "SELECT upper(nr) FROM r12_upd WHERE k = 1"
    ).collect()[0][0]) == 1.5
    eng.sql("DROP TABLE r12_upd")


def test_daterange_and_int8range(eng):
    """Discrete kinds beyond int4range: daterange steps by day
    (date_add canonicalization), int8range by 1 — constructors,
    literals, containment, adjacency."""
    # daterange canonicalization: (d1, d2] → [d1+1, d2+1)
    assert str(one(eng, "SELECT lower(daterange(DATE '2020-01-01',"
                        " DATE '2020-01-10', '(]'))")) == "2020-01-02"
    assert str(one(eng, "SELECT upper(daterange(DATE '2020-01-01',"
                        " DATE '2020-01-10', '(]'))")) == "2020-01-11"
    assert one(eng, "SELECT daterange(DATE '2020-01-01',"
                    " DATE '2020-02-01') @> DATE '2020-01-15'") is True
    assert one(eng, "SELECT daterange(DATE '2020-01-01',"
                    " DATE '2020-02-01') @> DATE '2020-02-01'") is False
    # adjacency through canonical [lo, hi): [jan, feb) -|- [feb, mar)
    assert one(
        eng,
        "SELECT daterange(DATE '2020-01-01', DATE '2020-02-01') -|- "
        "daterange(DATE '2020-02-01', DATE '2020-03-01')") is True
    # date literals through range_in
    eng.sql("CREATE TABLE r12_dr (dr daterange)")
    eng.sql("INSERT INTO r12_dr VALUES('[2020-01-01, 2020-02-01)')")
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM r12_dr"
        " WHERE dr @> DATE '2020-01-31'").collect()[0].n == 1
    eng.sql("DROP TABLE r12_dr")
    # int8range empty canonicalization and equality
    assert one(eng, "SELECT isempty(int8range(5, 5))") is True
    assert one(eng, "SELECT int8range(1, 10) = int8range(0, 9, '(]')"
               ) is True


def test_literal_range_predicate_pushes_down(eng):
    """Scale pin: an all-literal range constructor constant-folds in
    Catalyst and its elem-containment comparisons reach the parquet
    scan as PushedFilters — a literal range predicate costs the same
    as writing the bound comparisons by hand."""
    from opengauss_vectordb_spark.plans.explain import has_pushed_filter

    df = eng.sql(
        "SELECT COUNT(*) AS n FROM orders"
        " WHERE int8range(500, 1500) @> o_orderkey"
    )
    assert has_pushed_filter(df, "o_orderkey")
