"""CREATE AGGREGATE — the SQL-transition-function subset (SURVEY §2.10).

The reference defines user aggregates through ``DefineAggregate``
(src/common/backend/catalog/pg_aggregate.cpp): an SFUNC advances an
STYPE state once per input row, an optional FINALFUNC renders the
result, INITCOND seeds the state, and CFUNC (PG: COMBINEFUNC) merges
partial states.  datavec itself declares ``avg(vector)`` /
``sum(vector)`` exactly this way
(contrib/datavec/sql/datavec--0.7.2.sql:116-130).

Spark-first compilation — a SEQUENTIAL transition function is exactly
the fold contract of the ``aggregate()`` higher-order function, so a
call site ``myagg(e1, ..., ek)`` rewrites to::

    final(aggregate(collect_list(named_struct('a1', e1, ...)),
                    <initcond literal>,
                    (acc, x) -> CAST(<sfunc body>[p1→acc, p_{i+1}→x.a_i]
                                     AS <stype>)))

* The ``named_struct`` wrapper keeps NULL inputs in the collected list
  — bare ``collect_list(e)`` silently drops NULLs, but PG feeds them
  to a non-strict sfunc (nodeAgg.cpp advance_transition_function).
* A STRICT sfunc compiles PG's strict-TRANSITION rule, which differs
  from strict-scalar null propagation: a NULL input keeps the current
  state, and a NULL state adopts the first input value when STYPE
  equals the input type (executor/nodeAgg.cpp:initialize_aggregate's
  transValue seeding).  So the fold stays correct for ``max``-like
  aggregates declared with no INITCOND.
* An empty group folds the bare INITCOND through FINALFUNC — PG's rule
  — and NULL INITCOND yields NULL, the agg-over-zero-rows contract.

Scale: ``collect_list`` partial-aggregates map-side and the fold runs
JVM-side inside codegen, but the state is O(group) DURING the fold —
the honest cost of an opaque sequential transition (the reference pays
the same serial per-group sfunc loop in nodeAgg.cpp).  Aggregates whose
transition is associative should use the built-in SQL aggregates or
higher-order ``aggregate()`` directly; C-language transition functions
refuse (there is no JVM analogue to load a C sfunc into).
"""

from __future__ import annotations

import re

from .create_function import _map_type
from ._util import status_frame

_CREATE_AGG_HEAD = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?AGGREGATE\s+(?P<name>\w+)\s*\(",
    re.IGNORECASE,
)

_DROP_AGG = re.compile(
    r"^\s*DROP\s+AGGREGATE\s+(?:IF\s+EXISTS\s+)?(?P<name>\w+)\s*"
    r"(?:\([^)]*\))?\s*;?\s*$",
    re.IGNORECASE,
)


def _split_commas(s: str) -> list[str]:
    """Top-level comma split, quote- and paren-aware (INITCOND values
    like '{0,0}' and types like numeric(10,2) carry inner commas)."""
    parts, cur, depth, in_q, i = [], [], 0, False, 0
    while i < len(s):
        c = s[i]
        if in_q:
            cur.append(c)
            if c == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    cur.append("'")
                    i += 1
                else:
                    in_q = False
        elif c == "'":
            in_q = True
            cur.append(c)
        elif c in "([":
            depth += 1
            cur.append(c)
        elif c in ")]":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _stype_spark(pg_type: str) -> str:
    """STYPE → Spark type ('<base>[]' array states — the datavec
    avg(vector) shape — handled by _map_type)."""
    return _map_type(pg_type)


def _initcond_expr(lit: str, stype_spark: str) -> str:
    """INITCOND text (pg_aggregate.agginitval, stored as the TYPED
    INPUT representation) → a Spark literal of the state type."""
    v = lit.strip()
    if v.startswith("'") and v.endswith("'"):
        v = v[1:-1].replace("''", "'")
    am = re.fullmatch(r"\{(.*)\}", v.strip())
    if am is not None and stype_spark.upper().startswith("ARRAY<"):
        elem = stype_spark[6:-1]
        els = [e.strip() for e in am.group(1).split(",") if e.strip()]
        inner = ", ".join(f"CAST({e} AS {elem})" for e in els)
        return f"array({inner})"
    if re.fullmatch(r"-?\d+(\.\d+)?", v):
        return f"CAST({v} AS {stype_spark})"
    return f"CAST('{v.replace(chr(39), chr(39) * 2)}' AS {stype_spark})"


def _subst_params(expr: str, mapping: dict[str, str]) -> str:
    """Whole-word parameter-name → replacement, outside literals (the
    stored spec expr carries no string literals of concern, but a
    body CAN quote a param name — mask first)."""
    from .plpgsql import _mask_strings

    out = expr
    for pname, rep in mapping.items():
        pat = re.compile(rf"(?<![\w.])\b{re.escape(pname)}\b",
                         re.IGNORECASE)
        pos = 0
        while True:
            m = pat.search(_mask_strings(out), pos)
            if m is None:
                break
            out = out[:m.start()] + rep + out[m.end():]
            pos = m.start() + len(rep)
    return out


def _resolve_fn(engine, fname: str, n_args: int, role: str) -> dict:
    """SFUNC/FINALFUNC name → {'expr', 'params', 'strict'} — either a
    registered SQL-language function's spec, or a pass-through call to
    a built-in (quoted verbatim into the lambda).  C-language
    transitions have nothing to inline and refuse by name."""
    specs = getattr(engine, "sql_fn_specs", {})
    spec = specs.get(fname.lower())
    if spec is not None:
        if spec.get("subquery"):
            raise NotImplementedError(
                f"CREATE AGGREGATE: {role} {fname} reads a relation "
                "(FROM in its body) — a fold lambda cannot host a "
                "subquery; express the transition as a pure "
                "expression over its parameters"
            )
        if len(spec["params"]) != n_args:
            raise ValueError(
                f"{role} {fname}: takes {len(spec['params'])} "
                f"parameter(s), aggregate supplies {n_args}"
            )
        return spec
    if fname.lower() in getattr(engine, "sql_functions", {}) or \
            fname.lower() in getattr(engine, "plfn_interpreted", {}):
        raise NotImplementedError(
            f"CREATE AGGREGATE: {role} {fname} is not an inlinable "
            "scalar SQL function — declare the transition with CREATE "
            "FUNCTION ... LANGUAGE SQL (single RETURN expression)"
        )
    # a bare built-in name (PG: C-language catalog functions like
    # int4larger; Spark: any built-in) — call it positionally
    params = [f"__bp{i}" for i in range(n_args)]
    return {
        "params": params,
        "expr": f"{fname}({', '.join(params)})",
        "strict": False,
        "builtin": True,
    }


def _parse_create_agg(query: str):
    """(name, args_text, opts_text) or None — paren-aware so types
    like decimal(18,6) and '{0,0}' INITCONDs parse in both the modern
    two-group form ``name(types)(opts)`` and the pre-8.2 one-group
    form ``name(BASETYPE=..., SFUNC=..., ...)``."""
    m = _CREATE_AGG_HEAD.match(query)
    if m is None:
        return None
    op1 = m.end() - 1
    cl1 = _find_close_masked(query, op1)
    if cl1 < 0:
        return None
    rest = query[cl1 + 1:].strip().rstrip(";").strip()
    if not rest:
        # one paren group: the old syntax — everything is options
        return m.group("name").lower(), "", query[op1 + 1:cl1]
    if not rest.startswith("("):
        return None
    cl2 = _find_close_masked(rest, 0)
    if cl2 != len(rest) - 1:
        return None
    return (m.group("name").lower(), query[op1 + 1:cl1],
            rest[1:cl2])


def _create_aggregate(engine, parsed):
    name, args_text, opts_text = parsed
    opts: dict[str, str] = {}
    for part in _split_commas(opts_text):
        if "=" not in part:
            raise ValueError(f"CREATE AGGREGATE: bad option {part!r}")
        k, v = part.split("=", 1)
        opts[k.strip().lower()] = v.strip()
    in_types = [t for t in _split_commas(args_text) if t]
    if not in_types and "basetype" in opts:
        # the pre-8.2 spelling: CREATE AGGREGATE name (BASETYPE=..., ...)
        in_types = [opts["basetype"]]
    if "sfunc" not in opts or "stype" not in opts:
        raise ValueError("CREATE AGGREGATE requires SFUNC and STYPE")
    k = max(len(in_types), 1)
    stype = _stype_spark(opts["stype"])
    sfunc = _resolve_fn(engine, opts["sfunc"], k + 1, "SFUNC")
    final = None
    if opts.get("finalfunc"):
        final = _resolve_fn(engine, opts["finalfunc"], 1, "FINALFUNC")
    init = None
    if "initcond" in opts:
        init = _initcond_expr(opts["initcond"], stype)
    if init is None and sfunc.get("strict"):
        # PG: strict sfunc + null initcond is only legal when the
        # state type equals the (single) input type — the first
        # non-null input seeds the state (DefineAggregate's check)
        if k != 1 or _map_type(in_types[0]) != stype:
            raise ValueError(
                "CREATE AGGREGATE: a STRICT SFUNC with no INITCOND "
                "requires STYPE = input type (the first input seeds "
                "the state)"
            )
    # compose the fold pieces NOW (resolution is CREATE-time, PG's
    # rule — later DROP FUNCTION does not unbind the aggregate)
    ps = sfunc["params"]
    step = _subst_params(
        sfunc["expr"],
        {ps[0]: "__agg_acc",
         **{ps[i + 1]: f"__agg_x.a{i + 1}" for i in range(k)}},
    )
    if sfunc.get("strict"):
        null_any = " OR ".join(
            f"__agg_x.a{i + 1} IS NULL" for i in range(k)
        )
        adopt = ("WHEN __agg_acc IS NULL THEN "
                 f"CAST(__agg_x.a1 AS {stype}) " if init is None else "")
        step = (f"CASE WHEN {null_any} THEN __agg_acc {adopt}"
                f"ELSE {step} END")
    fin_expr = None
    if final is not None:
        fin_expr = _subst_params(final["expr"],
                                 {final["params"][0]: "__agg_acc"})
        if final.get("strict"):
            fin_expr = (f"CASE WHEN __agg_acc IS NULL THEN NULL "
                        f"ELSE {fin_expr} END")
    if not hasattr(engine, "aggregates"):
        engine.aggregates = {}
    engine.aggregates[name] = {
        "n_args": k,
        "init": init if init is not None else f"CAST(NULL AS {stype})",
        "stype": stype,
        "step": step,
        "final": fin_expr,
        # CFUNC/COMBINEFUNC accepted as metadata: the fold itself is
        # serial per group (the sfunc contract); a declared combine
        # documents associativity but Spark's collect_list already
        # partial-aggregates the INPUT, which is the shuffle that
        # matters
        "cfunc": opts.get("cfunc") or opts.get("combinefunc"),
    }
    return status_frame(engine.spark, ("CREATE AGGREGATE", name, opts["sfunc"].lower(),
          opts["stype"].lower(), opts.get("finalfunc", "").lower()), "tag STRING, aggregate STRING, sfunc STRING, stype STRING,"
        " finalfunc STRING",)


def fold_expr(agg: dict, arg_exprs: list[str]) -> str:
    """The complete aggregate()-fold expression for one call site."""
    k = agg["n_args"]
    if len(arg_exprs) != k:
        raise ValueError(
            f"aggregate call: {len(arg_exprs)} argument(s) for "
            f"{k} declared input type(s)"
        )
    fields = ", ".join(
        f"'a{i + 1}', {e}" for i, e in enumerate(arg_exprs)
    )
    coll = f"collect_list(named_struct({fields}))"
    body = (f"aggregate({coll}, {agg['init']}, "
            f"(__agg_acc, __agg_x) -> "
            f"CAST(({agg['step']}) AS {agg['stype']})")
    if agg["final"] is not None:
        body += f", __agg_acc -> ({agg['final']})"
    body += ")"
    return body


def rewrite_agg_calls(engine, query: str) -> str:
    """Call-site rewrite: ``myagg(args)`` → the fold expression.
    Identity when no aggregate is registered or none is named in the
    text (substring pre-filter — this runs on every statement)."""
    aggs = getattr(engine, "aggregates", None)
    if not aggs:
        return query
    low = query.lower()
    if not any(n in low for n in aggs):
        return query
    from .plpgsql import _mask_strings

    out = query
    for name in aggs:
        pat = re.compile(rf"(?<![\w.])\b{re.escape(name)}\s*\(",
                         re.IGNORECASE)
        pos = 0
        while True:
            masked = _mask_strings(out)
            mm = pat.search(masked, pos)
            if mm is None:
                break
            op = mm.end() - 1
            cl = _find_close_masked(masked, op)
            if cl < 0:
                break
            inner = out[op + 1:cl].strip()
            if re.match(r"^(DISTINCT|ALL)\b", inner, re.IGNORECASE) \
                    or re.search(r"\bORDER\s+BY\b",
                                 _mask_strings(inner), re.IGNORECASE):
                raise NotImplementedError(
                    "user aggregates: DISTINCT/ORDER BY inside the "
                    "call are not supported — deduplicate or sort in "
                    "a subquery first"
                )
            rep = fold_expr(aggs[name], _split_commas(inner))
            out = out[:mm.start()] + rep + out[cl + 1:]
            pos = mm.start() + len(rep)
    return out


def _find_close_masked(masked: str, open_pos: int) -> int:
    depth = 0
    for i in range(open_pos, len(masked)):
        if masked[i] == "(":
            depth += 1
        elif masked[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def try_handle_stmt(engine, query: str):
    """Engine.sql hook: CREATE/DROP AGGREGATE routing."""
    parsed = _parse_create_agg(query)
    if parsed is not None:
        return _create_aggregate(engine, parsed)
    m = _DROP_AGG.match(query)
    if m:
        name = m.group("name").lower()
        existed = getattr(engine, "aggregates", {}).pop(name, None)
        if existed is not None or re.search(r"IF\s+EXISTS", query,
                                            re.IGNORECASE):
            return status_frame(engine.spark, ("DROP AGGREGATE", name, existed is not None), "tag STRING, aggregate STRING, existed BOOLEAN",)
        raise KeyError(f"DROP AGGREGATE: {name!r} does not exist")
    return None


# ------------------------------------------------------------------
# gate row
# ------------------------------------------------------------------

from ..registry import query as _register


@_register(
    "create_aggregate_sql",
    """
    WITH g AS (
      SELECT l_returnflag,
             SUM(CAST(l_quantity * (1.0 - l_discount)
                      AS DECIMAL(18,6))) AS wsum_exact,
             SUM(CAST(ln(l_quantity) AS DECIMAL(18,10))) AS lnsum,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(wsum_exact AS DOUBLE) AS wsum,
           round(exp(CAST(lnsum AS DOUBLE) / n), 6) AS geo_mean,
           n AS n_rows
    FROM g ORDER BY l_returnflag
    """,
)
def create_aggregate_sql(spark, sf_dir):
    """CREATE AGGREGATE end-to-end (pg_aggregate.cpp DefineAggregate;
    the datavec avg(vector) declaration shape,
    datavec--0.7.2.sql:116-123): a TWO-INPUT weighted-sum aggregate
    (SFUNC + INITCOND) and an ARRAY-STATE geometric mean (SFUNC +
    FINALFUNC + INITCOND '{0,0}') — both transitions declared as
    LANGUAGE SQL functions and compiled into aggregate() folds; the
    oracle is each fold's CLOSED FORM (sum of x·w; exp(Σln x / n)),
    so a green row proves the seed, per-row transition, and final
    projection, not just that some aggregation ran.

    Exactness: the weighted-sum transition accumulates in
    DECIMAL(18,6) (associative), cast to DOUBLE by the final read;
    the geometric mean rounds to 6 digits because Σln(x) is
    order-dependent in IEEE — round() makes both engines agree.

    Scale: collect_list partial-aggregates map-side; the fold is a
    codegen'd lambda over each group's collected inputs — O(group)
    state, the same serial-sfunc cost nodeAgg.cpp pays, with no
    Python in the path."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql("""
        CREATE FUNCTION gate_wsum_step(acc decimal(18,6),
                                       x double precision,
                                       w double precision)
        RETURNS decimal(18,6)
        AS $$ SELECT acc + CAST(x * (1.0 - w) AS DECIMAL(18,6)) $$
        LANGUAGE SQL
    """)
    eng.sql("""
        CREATE FUNCTION gate_gm_step(st double precision[],
                                     x double precision)
        RETURNS double precision[]
        AS $$ SELECT array(element_at(st, 1) + ln(x),
                           element_at(st, 2) + 1.0d) $$
        LANGUAGE SQL
    """)
    eng.sql("""
        CREATE FUNCTION gate_gm_final(st double precision[])
        RETURNS double precision
        AS $$ SELECT round(exp(element_at(st, 1) / element_at(st, 2)),
                           6) $$
        LANGUAGE SQL
    """)
    eng.sql("""
        CREATE AGGREGATE gate_wsum(double precision, double precision) (
            SFUNC = gate_wsum_step,
            STYPE = decimal(18,6),
            INITCOND = '0'
        )
    """)
    eng.sql("""
        CREATE AGGREGATE gate_gmean(double precision) (
            SFUNC = gate_gm_step,
            STYPE = double precision[],
            FINALFUNC = gate_gm_final,
            INITCOND = '{0,0}'
        )
    """)
    out = eng.sql(
        "SELECT l_returnflag,"
        " CAST(gate_wsum(l_quantity, l_discount) AS DOUBLE) AS wsum,"
        " gate_gmean(l_quantity) AS geo_mean,"
        " COUNT(*) AS n_rows"
        " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    rows = out.collect()
    eng.sql("DROP AGGREGATE gate_wsum(double precision, double precision)")
    eng.sql("DROP AGGREGATE gate_gmean(double precision)")
    for fn in ("gate_wsum_step", "gate_gm_step", "gate_gm_final"):
        eng.sql(f"DROP FUNCTION {fn}")
    return spark.createDataFrame(
        rows,
        "l_returnflag STRING, wsum DOUBLE, geo_mean DOUBLE,"
        " n_rows BIGINT",
    )
