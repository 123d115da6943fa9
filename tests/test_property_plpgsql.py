"""Property test for the plpgsql→SQL compiler: random programs in the
declarative subset (DECLARE, assignment, nested IF/ELSIF/ELSE with both
RETURN and fall-through branches, CASE statements in searched and
simple forms, FOR-IN-SELECT accumulator loops) are compiled to one SQL
expression and executed in DuckDB; a direct Python interpreter of the
same program must agree on every input. This is the compiler analogue
of the oracle-parity gate — two independent executions of one
semantics."""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_vectordb_spark.operators.plpgsql import translate_plpgsql

# --- program AST ----------------------------------------------------------
# expr: ('lin', a, b)   = a*x + b        (over the parameter x)
#       ('var', c)      = v + c          (over the declared variable v)
# cond: ('cmp', op, k)  = x <op> k
# stmt: ('assign', expr) | ('return', expr) |
#       ('if', [(cond|None, [stmt, ...]), ...]) |
#       ('for', rows, k, kind, [(a, b), ...])
#         = FOR r IN SELECT c FROM (VALUES rows) WHERE c <= k LOOP
#           one accumulator statement per (a, b) over e = r.c*a + b:
#           kind 'add' → v := v + e; 'max'/'min' → v := GREATEST/
#           LEAST(v, e)  (kinds never mix on one acc — the compiler
#           refuses mixed kinds, pinned below)

exprs = st.one_of(
    st.tuples(st.just("lin"), st.integers(-3, 3), st.integers(-5, 5)),
    st.tuples(st.just("var"), st.integers(-5, 5)),
)
conds = st.tuples(
    st.just("cmp"), st.sampled_from(["<", ">", "=", "<=", ">="]),
    st.integers(-3, 3),
)


def if_strategy(depth: int):
    branch_body = st.lists(
        st.one_of(
            st.tuples(st.just("assign"), exprs),
            st.tuples(st.just("return"), exprs),
        ) if depth <= 0 else st.one_of(
            st.tuples(st.just("assign"), exprs),
            st.tuples(st.just("return"), exprs),
            if_strategy(depth - 1),
        ),
        min_size=1,
        max_size=2,
    )
    return st.builds(
        lambda c1, b1, rest, els: (
            "if",
            [(c1, b1)] + rest + ([(None, els)] if els is not None else []),
        ),
        conds,
        branch_body,
        st.lists(st.tuples(conds, branch_body), max_size=2),
        st.one_of(st.none(), branch_body),
    )


def case_strategy(depth: int):
    """CASE statements (searched and simple forms), always WITH an
    ELSE — the no-match/no-ELSE path compiles to raise_error, which
    DuckDB (the property executor) has no analogue for; that path is
    pinned by unit tests instead."""
    branch_body = st.lists(
        st.one_of(
            st.tuples(st.just("assign"), exprs),
            st.tuples(st.just("return"), exprs),
        ) if depth <= 0 else st.one_of(
            st.tuples(st.just("assign"), exprs),
            st.tuples(st.just("return"), exprs),
            if_strategy(depth - 1),
        ),
        min_size=1,
        max_size=2,
    )
    searched = st.builds(
        lambda brs, els: ("case", False, brs, els),
        st.lists(st.tuples(conds, branch_body), min_size=1, max_size=3),
        branch_body,
    )
    simple = st.builds(
        lambda brs, els: ("case", True, brs, els),
        st.lists(
            st.tuples(
                st.lists(st.integers(-3, 3), min_size=1, max_size=2,
                         unique=True),
                branch_body,
            ),
            min_size=1, max_size=3,
        ),
        branch_body,
    )
    return st.one_of(searched, simple)


fors = st.tuples(
    st.just("for"),
    st.lists(st.integers(-5, 5), min_size=1, max_size=4),
    st.integers(-6, 6),
    st.sampled_from(["add", "max", "min"]),
    st.lists(
        st.tuples(st.integers(-2, 2), st.integers(-3, 3)),
        min_size=1, max_size=2,
    ),
)

programs = st.lists(
    st.one_of(
        st.tuples(st.just("assign"), exprs),
        if_strategy(2),
        case_strategy(1),
        fors,
    ),
    max_size=3,
).map(lambda body: body + [("return", ("var", 0))])


# --- render to plpgsql source --------------------------------------------


def _expr_src(e) -> str:
    if e[0] == "lin":
        return f"x * {e[1]} + {e[2]}"
    return f"v + {e[1]}"


def _cond_src(c) -> str:
    return f"x {c[1]} {c[2]}"


def _stmt_src(s, ind: str) -> str:
    if s[0] == "assign":
        return f"{ind}v := {_expr_src(s[1])};"
    if s[0] == "return":
        return f"{ind}RETURN {_expr_src(s[1])};"
    if s[0] == "for":
        _, rows, k, kind, accs = s
        vals = ", ".join(f"({v})" for v in rows)
        out = [f"{ind}FOR r IN SELECT c FROM (VALUES {vals}) AS t(c)"
               f" WHERE c <= {k} LOOP"]
        for a, b in accs:
            e = f"r.c * {a} + {b}"
            if kind == "add":
                out.append(f"{ind}    v := v + ({e});")
            else:
                fn = "GREATEST" if kind == "max" else "LEAST"
                out.append(f"{ind}    v := {fn}(v, {e});")
        out.append(f"{ind}END LOOP;")
        return "\n".join(out)
    if s[0] == "case":
        _, simple, branches, els = s
        out = [f"{ind}CASE" + (" x" if simple else "")]
        for cond, body in branches:
            w = (", ".join(str(v) for v in cond) if simple
                 else _cond_src(cond))
            out.append(f"{ind}    WHEN {w} THEN")
            out.extend(_stmt_src(b, ind + "        ") for b in body)
        out.append(f"{ind}    ELSE")
        out.extend(_stmt_src(b, ind + "        ") for b in els)
        out.append(f"{ind}END CASE;")
        return "\n".join(out)
    out = []
    first = True
    for cond, body in s[1]:
        if cond is None:
            out.append(f"{ind}ELSE")
        elif first:
            out.append(f"{ind}IF {_cond_src(cond)} THEN")
            first = False
        else:
            out.append(f"{ind}ELSIF {_cond_src(cond)} THEN")
        out.extend(_stmt_src(b, ind + "    ") for b in body)
    out.append(f"{ind}END IF;")
    return "\n".join(out)


def render(prog) -> str:
    body = "\n".join(_stmt_src(s, "    ") for s in prog)
    return (
        "CREATE FUNCTION prop_fn(x bigint) RETURNS bigint AS $$\n"
        "DECLARE\n    r RECORD;\n    v bigint := 0;\nBEGIN\n"
        f"{body}\nEND;\n$$ LANGUAGE plpgsql"
    )


# --- direct interpreter ---------------------------------------------------


class _Returned(Exception):
    def __init__(self, value):
        self.value = value


def _eval_expr(e, env):
    if e[0] == "lin":
        return env["x"] * e[1] + e[2]
    return env["v"] + e[1]


def _eval_cond(c, env):
    import operator

    ops = {"<": operator.lt, ">": operator.gt, "=": operator.eq,
           "<=": operator.le, ">=": operator.ge}
    return ops[c[1]](env["x"], c[2])


def _run_stmts(stmts, env):
    for s in stmts:
        if s[0] == "assign":
            env["v"] = _eval_expr(s[1], env)
        elif s[0] == "return":
            raise _Returned(_eval_expr(s[1], env))
        elif s[0] == "for":
            _, rows, k, kind, accs = s
            for c in rows:
                if c <= k:
                    for a, b in accs:
                        e = c * a + b
                        if kind == "add":
                            env["v"] = env["v"] + e
                        elif kind == "max":
                            env["v"] = max(env["v"], e)
                        else:
                            env["v"] = min(env["v"], e)
        elif s[0] == "case":
            _, simple, branches, els = s
            for cond, body in branches:
                hit = (env["x"] in cond) if simple \
                    else _eval_cond(cond, env)
                if hit:
                    _run_stmts(body, env)
                    break
            else:
                _run_stmts(els, env)
        else:
            for cond, body in s[1]:
                if cond is None or _eval_cond(cond, env):
                    _run_stmts(body, env)
                    break


def interpret(prog, x: int) -> int:
    env = {"x": x, "v": 0}
    try:
        _run_stmts(prog, env)
    except _Returned as r:
        return r.value
    raise AssertionError("generated program must always return")


# --- the property ---------------------------------------------------------


@settings(max_examples=120, deadline=None)
@given(prog=programs, x=st.integers(-6, 6))
def test_compiled_matches_interpreter(prog, x):
    from hypothesis import assume

    try:
        ddl = translate_plpgsql(render(prog))
    except NotImplementedError as e:
        # the 100 KB size guard refusing a pathologically nested
        # program is designed behavior, not a miscompilation
        assert "100 KB" in str(e)
        assume(False)
    assert ddl is not None
    m = re.search(r"RETURN (.+)$", ddl, re.DOTALL)
    expr = m.group(1)
    got = duckdb.sql(
        f"SELECT CAST(({expr}) AS BIGINT) AS r"
        f" FROM (SELECT CAST({x} AS BIGINT) AS x)"
    ).fetchone()[0]
    assert got == interpret(prog, x), render(prog)


def test_compiled_expression_is_spark_valid(spark):
    """One end-to-end pin that the emitted DDL parses and runs in Spark
    too (DuckDB carries the bulk of the property examples)."""
    prog = [
        ("assign", ("lin", 2, 1)),
        ("for", [3, -1, 4], 3, "add", [(1, 0), (-1, 2)]),
        ("if", [
            (("cmp", ">", 0), [("return", ("var", 10))]),
            (None, [("assign", ("var", -1))]),
        ]),
        ("for", [2, 5], 6, "max", [(2, -1)]),
        ("return", ("var", 0)),
    ]
    ddl = translate_plpgsql(render(prog))
    spark.sql(ddl)
    for x in (-2, 0, 3):
        got = spark.sql(
            f"SELECT prop_fn(CAST({x} AS BIGINT)) AS r"
        ).first().r
        assert got == interpret(prog, x)
    spark.sql("DROP TEMPORARY FUNCTION prop_fn")


def test_for_loop_mixed_kinds_refuse():
    """Mixing additive and extreme updates on one accumulator in a FOR
    loop interleaves per row (v := v + r.c; v := GREATEST(v, r.c) over
    [5, -10] gives -5, composed aggregates give 5) — the compiler must
    refuse, never miscompile."""
    src = (
        "CREATE FUNCTION mixk(x int) RETURNS int AS $$\n"
        "DECLARE r RECORD; v int := 0;\n"
        "BEGIN\n"
        "    FOR r IN SELECT c FROM (VALUES (5), (-10)) AS t(c) LOOP\n"
        "        v := v + r.c;\n"
        "        v := GREATEST(v, r.c);\n"
        "    END LOOP;\n"
        "    RETURN v;\n"
        "END;\n"
        "$$ LANGUAGE plpgsql"
    )
    with pytest.raises(NotImplementedError, match="mixes"):
        translate_plpgsql(src)


@pytest.mark.parametrize(
    "start,bound,step",
    [
        (1, 5, 1), (1, 1, 1), (1, 0, 1), (0, -3, 2), (2, 9, 3),
        (-4, 4, 1), (5, 5, 2), (3, 2, 1), (0, 0, 1), (1, 10, 4),
    ],
)
def test_do_while_matches_interpreter(spark, start, bound, step):
    """Tail EXIT WHEN (do-while, pl_exec.cpp:114): the one-iteration
    unroll + inverted pre-test closed form must agree with a direct
    interpreter on every boundary — including bounds already exceeded
    at entry, where do-while still runs the body exactly once."""
    src = f"""CREATE FUNCTION dwp(x bigint) RETURNS bigint AS $$
DECLARE total bigint := 0; i bigint := {start};
BEGIN
    LOOP
        total := total + i * 3;
        i := i + {step};
        EXIT WHEN i > {bound};
    END LOOP;
    RETURN total * 1000 + i + x;
END;
$$ LANGUAGE plpgsql"""
    ddl = translate_plpgsql(src)
    assert ddl is not None
    spark.sql(ddl)
    for x in (-3, 1, 4):
        # direct interpreter
        total, i = 0, start
        while True:
            total += i * 3
            i += step
            if i > bound:
                break
        want = total * 1000 + i + x
        got = spark.sql(
            f"SELECT dwp(CAST({x} AS BIGINT)) AS r"
        ).first().r
        assert got == want, (start, bound, step, x)
    spark.sql("DROP TEMPORARY FUNCTION dwp")


def test_do_while_mid_body_exit_refuses():
    """A mid-body EXIT WHEN skips only the statements after it — no
    shared closed form; the compiler must refuse, never miscompile."""
    src = """CREATE FUNCTION dwm(x int) RETURNS int AS $$
DECLARE t int := 0; i int := 0;
BEGIN
    LOOP
        t := t + i;
        EXIT WHEN i > 3;
        i := i + 1;
    END LOOP;
    RETURN t;
END;
$$ LANGUAGE plpgsql"""
    with pytest.raises(NotImplementedError, match="mid-body"):
        translate_plpgsql(src)
