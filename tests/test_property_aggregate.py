"""Property test for CREATE AGGREGATE's fold compilation: random
SQL-transition aggregates (affine transitions over (acc, x), GREATEST/
LEAST transitions, strict and non-strict, with and without INITCOND,
with and without an affine FINALFUNC) run over random integer columns
containing NULLs; a direct Python interpreter of PG's
advance_transition_function contract (nodeAgg.cpp: strict transitions
skip NULL inputs and adopt the first value into a NULL state;
non-strict transitions see every row) must agree with the compiled
aggregate() fold on every dataset.  One Spark job per example keeps
the suite minutes-bounded; shrinking stays useful because the program
space is a small tuple grammar."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT

# transition: ('affine', a, b, c)  = a*acc + b*x + c
#             ('greatest',) / ('least',) over (acc, x)
transitions = st.one_of(
    st.tuples(st.just("affine"), st.integers(-2, 2),
              st.integers(-2, 2), st.integers(-3, 3)),
    st.tuples(st.just("greatest")),
    st.tuples(st.just("least")),
)
finals = st.one_of(
    st.none(),
    st.tuples(st.integers(-2, 2), st.integers(-5, 5)),  # f*acc + g
)
datasets = st.lists(
    st.one_of(st.none(), st.integers(-5, 5)), min_size=0, max_size=6
)


def _step_sql(t) -> str:
    if t[0] == "affine":
        _, a, b, c = t
        return f"SELECT {a} * acc + {b} * x + {c}"
    return f"SELECT {t[0]}(acc, x)"


def _step_py(t, acc, x):
    if t[0] == "affine":
        _, a, b, c = t
        return a * acc + b * x + c
    return max(acc, x) if t[0] == "greatest" else min(acc, x)


def _reference(t, strict, init, final, data):
    acc = init
    for x in data:
        if strict:
            if x is None:
                continue
            if acc is None:
                acc = x
                continue
        else:
            if acc is None or x is None:
                # non-strict affine arithmetic over NULL is NULL and
                # stays NULL for affine; greatest/least(NULL, x) is
                # Spark/PG null-skipping for GREATEST? No: PG GREATEST
                # ignores NULLs. Model each transition faithfully:
                if t[0] == "affine":
                    acc = None
                    continue
                # greatest/least: NULL args are ignored (PG rule)
                vals = [v for v in (acc, x) if v is not None]
                acc = (max(vals) if t[0] == "greatest" else min(vals)) \
                    if vals else None
                continue
        acc = _step_py(t, acc, x)
    if final is not None and acc is not None:
        acc = final[0] * acc + final[1]
    return acc


_SEQ = [0]


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_CORRECT)


@settings(max_examples=25, deadline=None)
@given(t=transitions, strict=st.booleans(), has_init=st.booleans(),
       final=finals, data=datasets)
def test_fold_matches_reference(eng, t, strict, has_init, final, data):
    # strict + no INITCOND requires STYPE = input type — always true
    # here (both BIGINT); non-strict + no INITCOND starts NULL
    _SEQ[0] += 1
    n = _SEQ[0]
    init = 1 if has_init else None
    eng.sql(f"CREATE OR REPLACE FUNCTION pstep{n}(acc bigint, x bigint)"
            f" RETURNS bigint AS '{_step_sql(t)}' LANGUAGE SQL"
            + (" STRICT" if strict else ""))
    ddl = (f"SFUNC = pstep{n}, STYPE = bigint"
           + (", INITCOND = '1'" if has_init else ""))
    if final is not None:
        eng.sql(
            f"CREATE OR REPLACE FUNCTION pfin{n}(acc bigint)"
            f" RETURNS bigint AS"
            f" 'SELECT {final[0]} * acc + {final[1]}' LANGUAGE SQL"
        )
        ddl += f", FINALFUNC = pfin{n}"
    eng.sql(f"CREATE AGGREGATE pagg{n}(bigint) ({ddl})")
    vals = ", ".join(
        "(CAST(NULL AS BIGINT))" if v is None else f"({v})"
        for v in data
    ) or "(CAST(NULL AS BIGINT))"
    where = "" if data else " WHERE FALSE"
    got = eng.sql(
        f"SELECT pagg{n}(v) AS r FROM (VALUES {vals}) AS t(v){where}"
    ).collect()[0].r
    eng.sql(f"DROP AGGREGATE pagg{n}(bigint)")
    eng.sql(f"DROP FUNCTION pstep{n}")
    if final is not None:
        eng.sql(f"DROP FUNCTION pfin{n}")
    expected = _reference(t, strict, init, final, data)
    assert got == expected, (
        f"t={t} strict={strict} init={init} final={final} "
        f"data={data}: fold={got}, reference={expected}"
    )
