"""CREATE FUNCTION ... LANGUAGE plpgsql — the declarative subset,
compiled to one inlined Spark SQL expression.

Reference: `src/common/pl/plpgsql/src/` (~35k LoC: gram.y grammar,
pl_exec.cpp statement interpreter, pl_comp.cpp compiler).  The
reference executes plpgsql as a per-call, row-at-a-time interpreter
over SPI statements — exactly the execution model a distributed
declarative engine must not reproduce (COVERAGE.md §2.10 states the
position).  What CAN port is the large class of plpgsql functions
that are declarative control flow in procedural clothing — the
guard-and-return scalar idiom:

    CREATE FUNCTION grade(score float8) RETURNS text AS $$
    DECLARE
        bonus float8 := 5.0;
    BEGIN
        IF score + bonus >= 90 THEN
            RETURN 'A';
        ELSIF score + bonus >= 75 THEN
            RETURN 'B';
        ELSE
            RETURN 'C';
        END IF;
    END;
    $$ LANGUAGE plpgsql;

This module compiles that subset — DECLARE with initializers,
sequential assignment, IF/ELSIF/ELSE with RETURN or RAISE EXCEPTION
branches, nested IF, scalar-subquery assignments — into a single SQL
expression (CASE chains + substituted bindings) and emits the same
Spark native SQL-UDF DDL as create_function.py, so the function body
inlines into whole-stage codegen with zero interpreter overhead:
pl_exec.cpp's exec_stmt_if (:1809) becomes a CASE expression,
exec_assign_value becomes expression substitution, and the SPI
round-trips disappear entirely.

Deliberately NOT covered (each raises a clear NotImplementedError
naming the Spark-side rewrite): LOOP/WHILE/FOR (set-based rewrite —
the statement layer's one-statement DML), dynamic EXECUTE, cursors in
function bodies (DECLARE CURSOR at the session level instead), and
EXCEPTION blocks (no subtransactions on an immutable store).

Variable substitution is textual with identifier-boundary matching;
variables shadow columns of the same name inside the body, matching
plpgsql's own (notorious) scoping rule.
"""

from __future__ import annotations

import re

from .create_function import _map_type, _split_params, _strip_comments

_CREATE_PLFN = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+(?P<name>\w+)\s*"
    r"\((?P<params>.*?)\)\s*"
    r"RETURNS\s+(?P<ret>SETOF\s+\w+|"
    r"\w+(?:\s+\w+)?(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s+"
    r"AS\s+(?P<body>\$(?P<tag>\w*)\$.*?\$(?P=tag)\$|'(?:[^']|'')*')\s+"
    r"LANGUAGE\s+PLPGSQL(?P<flags>(?:\s+\w+(?:\s+\w+)*)?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_DECLARE_RE = re.compile(
    r"^\s*DECLARE\s+(?P<decls>.*?)\s*BEGIN\s+(?P<body>.*?)\s*END\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_BEGIN_RE = re.compile(
    r"^\s*BEGIN\s+(?P<body>.*?)\s*END\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_UNSUPPORTED = [
    (re.compile(r"\b(WHILE|LOOP|FOREACH)\b", re.IGNORECASE),
     "LOOP/WHILE/FOR has no inlined-expression form; rewrite the loop "
     "as one set-oriented statement (UPDATE/INSERT ... SELECT)"),
    (re.compile(r"\bFOR\s+\w+\s+IN\b", re.IGNORECASE),
     "FOR ... IN loops have no inlined-expression form; rewrite as one "
     "set-oriented statement"),
    (re.compile(r"\bEXECUTE\s+", re.IGNORECASE),
     "dynamic EXECUTE cannot inline; build the statement client-side"),
    (re.compile(r"\bEXCEPTION\s+WHEN\b", re.IGNORECASE),
     "EXCEPTION blocks need subtransactions; validate inputs with "
     "IF ... RAISE EXCEPTION guards instead"),
    (re.compile(r"\bOPEN\s+\w+|\bFETCH\s+", re.IGNORECASE),
     "cursors inside function bodies are unsupported; DECLARE CURSOR "
     "at the session level (operators/portal.py)"),
]


def _mask_strings(text: str) -> str:
    """Copy of ``text`` with every character INSIDE a string literal
    replaced by a space (quotes kept, positions preserved), so keyword
    and identifier scans never match inside literals while every match
    offset remains valid in the original text."""
    out = list(text)
    in_str = False
    i = 0
    while i < len(text):
        ch = text[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(text) and text[i + 1] == "'":
                    out[i] = " "
                    out[i + 1] = " "
                    i += 2
                    continue
                in_str = False
            else:
                out[i] = " "
        elif ch == "'":
            in_str = True
        i += 1
    return "".join(out)


def _subst(expr: str, bindings: dict[str, str]) -> str:
    """Replace variable references with their (parenthesized) bound
    expressions — identifier-boundary matched, longest names first so
    `total` never corrupts `total_x`, and matched on the string-masked
    copy so a variable name inside a string literal is never
    rewritten. Qualified references (`t.total`) are never touched —
    they are plpgsql's documented escape hatch for a column whose name
    collides with a variable (an unqualified collision resolves to the
    variable here, the classic shadowing rule)."""
    out = expr
    for name in sorted(bindings, key=len, reverse=True):
        pat = re.compile(rf"(?<!\.)\b{re.escape(name)}\b", re.IGNORECASE)
        pos = 0
        while True:
            m = pat.search(_mask_strings(out), pos)
            if m is None:
                break
            rep = f"({bindings[name]})"
            out = out[:m.start()] + rep + out[m.end():]
            pos = m.start() + len(rep)
    return out.strip()


def _scan_stmt(text: str, pos: int) -> tuple[str, int]:
    """Read one simple statement up to its terminating top-level ';'
    (quote- and paren-aware). Returns (stmt, next_pos)."""
    depth, in_str, i = 0, False, pos
    while i < len(text):
        ch = text[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(text) and text[i + 1] == "'":
                    i += 2
                    continue
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == ";" and depth == 0:
            return text[pos:i].strip(), i + 1
        i += 1
    return text[pos:].strip(), len(text)


# one combined token scanner (END IF before END, ELSIF before IF);
# always run against the STRING-MASKED text so literals never match
_TOKEN = re.compile(
    r"\bEND\s+IF\b|\bELSIF\b|\bCASE\b|\bEND\b|\bELSE\b|\bTHEN\b|\bIF\b",
    re.IGNORECASE,
)


def _find_end_if(text: str, pos: int) -> tuple[int, int]:
    """Given pos just after an opening IF, find the matching END IF
    (tracking nested IF and CASE ... END spans, on the string-masked
    text so keywords inside literals are invisible); returns
    (start_of_end_if, pos_after_terminator)."""
    masked = _mask_strings(text)
    if_depth, case_depth = 1, 0
    for m in _TOKEN.finditer(masked, pos):
        raw = m.group(0).upper()
        tok = "END IF" if raw.startswith("END") and raw.endswith("IF") \
            else raw
        if tok == "CASE":
            case_depth += 1
        elif tok == "END IF":
            if case_depth == 0:
                if_depth -= 1
                if if_depth == 0:
                    after = m.end()
                    semi = re.match(r"\s*;", text[after:])
                    return m.start(), after + (semi.end() if semi else 0)
        elif tok == "END":
            if case_depth > 0:
                case_depth -= 1
        elif tok == "IF":
            if case_depth == 0:
                if_depth += 1
    raise ValueError("plpgsql: IF without matching END IF")


def _split_branches(block: str) -> list[tuple[str | None, str]]:
    """Split an IF-block interior `cond THEN stmts [ELSIF cond THEN
    stmts]* [ELSE stmts]` into [(cond|None, stmts)] at THIS nesting
    level — nested IF...END IF and CASE...END spans (including a
    CASE's own THEN/ELSE) are skipped via depth tracking on the
    string-masked text."""
    masked = _mask_strings(block)
    branches: list[tuple[str | None, str]] = []
    if_depth = case_depth = 0
    in_cond = True  # scanning a condition, waiting for its THEN
    cond: str | None = block  # placeholder; set at first THEN
    cond_start = 0
    body_start = 0
    for m in _TOKEN.finditer(masked):
        raw = m.group(0).upper()
        tok = "END IF" if raw.startswith("END") and raw.endswith("IF") \
            else raw
        if tok == "CASE":
            case_depth += 1
        elif tok == "END":
            if case_depth > 0:
                case_depth -= 1
        elif case_depth > 0:
            continue  # THEN/ELSE/IF/ELSIF inside a CASE expression
        elif tok == "IF":
            if_depth += 1
        elif tok == "END IF":
            if_depth -= 1
        elif if_depth > 0:
            continue  # delimiters of a nested IF
        elif tok == "THEN":
            if in_cond:
                cond = block[cond_start:m.start()].strip()
                body_start = m.end()
                in_cond = False
        elif tok == "ELSIF":
            branches.append((cond, block[body_start:m.start()].strip()))
            in_cond = True
            cond_start = m.end()
        elif tok == "ELSE":
            branches.append((cond, block[body_start:m.start()].strip()))
            cond = None
            body_start = m.end()
            in_cond = False
    if in_cond:
        raise ValueError("plpgsql: IF without THEN")
    branches.append((cond, block[body_start:].strip()))
    return branches


def _compile_stmts(text: str, bindings: dict[str, str]) -> str:
    """Compile a statement sequence to ONE SQL expression: the value
    the sequence RETURNs. Assignments update bindings; IF compiles to
    CASE with the post-IF continuation as the implicit ELSE."""
    pos, n = 0, len(text)
    while pos < n:
        rest = text[pos:].lstrip()
        off = len(text[pos:]) - len(rest)
        if not rest:
            break
        m_if = re.match(r"IF\b", rest, re.IGNORECASE)
        if m_if:
            start = pos + off + m_if.end()
            end_start, end_after = _find_end_if(text, start)
            block = text[start:end_start]
            branches = _split_branches(block)
            if not re.search(r"\b(RETURN|RAISE)\b", _mask_strings(block),
                             re.IGNORECASE):
                # conditional ASSIGNMENT (no branch terminates): fold
                # each assigned variable into CASE WHEN cond THEN new
                # ELSE old END and keep scanning the continuation
                _fold_conditional_assign(branches, bindings)
                pos = end_after
                continue
            continuation = text[end_after:]
            whens = []
            has_else = False
            for cond, body in branches:
                # compile branch + continuation as one sequence: a
                # branch that RETURNs never reaches the continuation
                # (dead code after RETURN), while a branch that only
                # assigns falls through into it with its updated
                # bindings — exactly pl_exec's control flow
                merged = body.rstrip()
                if merged and not merged.endswith(";"):
                    merged += ";"
                merged = merged + "\n" + continuation
                val = _compile_stmts(merged, dict(bindings))
                if cond is None:
                    has_else = True
                    whens.append(f"ELSE {val}")
                else:
                    whens.append(f"WHEN {_subst(cond, bindings)} THEN {val}")
            if not has_else:
                cont = _compile_stmts(continuation, dict(bindings))
                whens.append(f"ELSE {cont}")
            return "CASE " + " ".join(whens) + " END"
        stmt, pos = _scan_stmt(text, pos + off)
        if not stmt:
            continue
        m_ret = re.match(r"RETURN\s+(?P<e>.+)$", stmt,
                         re.IGNORECASE | re.DOTALL)
        if m_ret:
            return _subst(m_ret.group("e"), bindings)
        m_raise = re.match(
            r"RAISE\s+EXCEPTION\s+'(?P<msg>(?:[^']|'')*)'\s*$",
            stmt, re.IGNORECASE,
        )
        if m_raise:
            # pl_exec.cpp exec_stmt_raise → Spark raise_error(); typed
            # NULL keeps every CASE branch the same type
            return f"raise_error('{m_raise.group('msg')}')"
        m_asn = re.match(r"(?P<v>\w+)\s*:=\s*(?P<e>.+)$", stmt,
                         re.IGNORECASE | re.DOTALL)
        if m_asn:
            bindings[m_asn.group("v").lower()] = _subst(
                m_asn.group("e"), bindings
            )
            continue
        # SELECT expr INTO var [FROM ...] (pl_exec exec_stmt_execsql's
        # INTO path) → scalar-subquery binding, which Catalyst plans as
        # a one-row subquery join
        m_into = re.match(
            r"SELECT\s+(?P<e>.+?)\s+INTO\s+(?:STRICT\s+)?(?P<v>\w+)"
            r"(?P<tail>\s+FROM\s+.+)?$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if m_into:
            tail = (m_into.group("tail") or "").strip()
            # explicit space before the tail: _subst strips, and a
            # selected expression ending in an identifier would
            # otherwise glue onto FROM ('cntFROM metrics')
            sub = "(SELECT " + _subst(m_into.group("e"), bindings)
            if tail:
                sub += " " + _subst(tail, bindings)
            bindings[m_into.group("v").lower()] = sub + ")"
            continue
        raise NotImplementedError(
            f"plpgsql statement not in the declarative subset: "
            f"{stmt.split(None, 1)[0].upper()!r} — see module docstring "
            "for the Spark-side rewrite"
        )
    raise ValueError(
        "plpgsql: control reached end of function without RETURN"
    )


def _fold_conditional_assign(
    branches: list[tuple[str | None, str]], bindings: dict[str, str]
) -> None:
    """Fold a RETURN-free IF block into the bindings: each variable a
    branch assigns becomes CASE WHEN cond THEN new ELSE old END.
    Branch bodies may themselves contain nested RETURN-free IF blocks
    (applied recursively via _apply_stmts)."""
    updates: list[tuple[str | None, dict[str, str]]] = []
    assigned: set[str] = set()
    for cond, body in branches:
        b = dict(bindings)
        _apply_stmts(body, b)
        changed = {k: v for k, v in b.items() if bindings.get(k) != v}
        assigned |= set(changed)
        updates.append(
            (None if cond is None else _subst(cond, bindings), changed)
        )
    for var in assigned:
        old = bindings.get(var)
        if old is None:
            raise ValueError(
                f"plpgsql: conditional assignment to undeclared "
                f"variable {var!r}"
            )
        whens = []
        has_else = False
        for cond, changed in updates:
            val = changed.get(var, old)
            if cond is None:
                has_else = True
                whens.append(f"ELSE {val}")
            else:
                whens.append(f"WHEN {cond} THEN {val}")
        if not has_else:
            whens.append(f"ELSE {old}")
        bindings[var] = "CASE " + " ".join(whens) + " END"


def _apply_stmts(body: str, bindings: dict[str, str]) -> None:
    """Apply a RETURN-free statement sequence to the bindings:
    assignments update them directly; nested IF blocks fold via
    _fold_conditional_assign."""
    pos, n = 0, len(body)
    while pos < n:
        rest = body[pos:].lstrip()
        off = len(body[pos:]) - len(rest)
        if not rest:
            break
        m_if = re.match(r"IF\b", rest, re.IGNORECASE)
        if m_if:
            start = pos + off + m_if.end()
            end_start, end_after = _find_end_if(body, start)
            _fold_conditional_assign(
                _split_branches(body[start:end_start]), bindings
            )
            pos = end_after
            continue
        stmt, pos = _scan_stmt(body, pos + off)
        if not stmt:
            continue
        m = re.match(r"(?P<v>\w+)\s*:=\s*(?P<e>.+)$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if not m:
            raise NotImplementedError(
                "plpgsql: a non-terminating IF branch may only contain "
                f"assignments (got {stmt.split(None, 1)[0].upper()!r})"
            )
        bindings[m.group("v").lower()] = _subst(m.group("e"), bindings)


def _parse_decls(decls: str, bindings: dict[str, str]) -> None:
    pos = 0
    while pos < len(decls):
        stmt, pos = _scan_stmt(decls, pos)
        if not stmt:
            continue
        m = re.match(
            r"(?P<v>\w+)\s+(?P<t>\w+(?:\s+\w+)?"
            r"(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
            r"(?:\s*:=\s*(?P<e>.+))?$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"plpgsql: cannot parse declaration {stmt!r}")
        v = m.group("v").lower()
        if m.group("e") is not None:
            bindings[v] = _subst(m.group("e"), bindings)
        else:
            bindings[v] = f"CAST(NULL AS {_map_type(m.group('t'))})"


def translate_plpgsql(query: str) -> str | None:
    """PG CREATE FUNCTION ... LANGUAGE plpgsql → Spark SQL-UDF DDL, or
    None when the text is not that statement shape."""
    m = _CREATE_PLFN.match(query)
    if m is None:
        return None
    ret = m.group("ret").strip()
    if re.match(r"^SETOF\b", ret, re.IGNORECASE):
        raise NotImplementedError(
            "RETURNS SETOF in plpgsql is RETURN NEXT/RETURN QUERY — "
            "use a SQL-language table function (RETURNS TABLE) instead"
        )
    from .create_function import _unquote_body

    body = _strip_comments(_unquote_body(m.group("body"), m.group("tag")))
    masked_body = _mask_strings(body)  # keywords in literals are inert
    for pat, why in _UNSUPPORTED:
        if pat.search(masked_body):
            raise NotImplementedError(f"plpgsql: {why}")
    params = _split_params(m.group("params"))
    md = _DECLARE_RE.match(body) or _BEGIN_RE.match(body)
    if md is None:
        raise ValueError("plpgsql body must be [DECLARE ...] BEGIN ... END")
    bindings: dict[str, str] = {}
    if "decls" in md.groupdict() and md.groupdict().get("decls"):
        _parse_decls(md.group("decls"), bindings)
    expr = _compile_stmts(md.group("body"), bindings)
    if len(expr) > 100_000:
        # fall-through branches duplicate the continuation per branch,
        # so long chains of mixed IF blocks grow the expression
        # exponentially — refuse with a actionable message instead of
        # handing Catalyst a megabyte expression
        raise NotImplementedError(
            "plpgsql: compiled expression exceeds 100 KB — long chains "
            "of IF blocks with fall-through branches duplicate the "
            "remaining body per branch; split the function, or express "
            "the tiers as a single CASE in LANGUAGE SQL"
        )
    name = m.group("name").lower()
    flags = (m.group("flags") or "").upper().split()
    strict = "STRICT" in flags or (
        "RETURNS" in flags and "NULL" in flags
    )
    spark_params = ", ".join(
        f"{pname} {_map_type(ptype)}" for pname, ptype in params
    )
    if strict and params:
        null_guard = " OR ".join(f"{p} IS NULL" for p, _ in params)
        expr = f"CASE WHEN {null_guard} THEN NULL ELSE {expr} END"
    return (
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({spark_params}) "
        f"RETURNS {_map_type(ret)} RETURN {expr}"
    )


def try_handle_stmt(engine, query: str):
    """Engine.sql hook: CREATE FUNCTION ... LANGUAGE plpgsql routing
    (DROP FUNCTION is shared with create_function.py)."""
    spark_ddl = translate_plpgsql(query)
    if spark_ddl is None:
        return None
    engine.spark.sql(spark_ddl)
    name = _CREATE_PLFN.match(query).group("name").lower()
    engine.sql_functions[name] = spark_ddl
    return engine.spark.createDataFrame(
        [("CREATE FUNCTION", name)], "tag STRING, function STRING"
    )


# --------------------------------------------------------------------------
# Driver-gate queries: LANGUAGE plpgsql end-to-end.  The compiled
# function inlines into the calling plan, so the oracle is simply the
# CASE chain / scalar subquery the compiler is SUPPOSED to emit —
# written out by hand in DuckDB SQL.
# --------------------------------------------------------------------------
from ..registry import query as _register_query


@_register_query(
    "plpgsql_guard_function",
    """
    WITH graded AS (
      SELECT CASE WHEN o_totalprice IS NULL THEN NULL
                  WHEN o_totalprice >= 200000.0 THEN 'large'
                  WHEN o_totalprice >= 50000.0 THEN 'medium'
                  ELSE 'small' END AS tier,
             o_totalprice
      FROM orders
    )
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total
    FROM graded GROUP BY tier ORDER BY tier
    """,
)
def plpgsql_guard_function(spark, sf_dir):
    """CREATE FUNCTION ... LANGUAGE plpgsql end-to-end — the
    guard-and-return idiom (pl_exec.cpp exec_stmt_if :1809 /
    exec_assign_value, the shape the reference's plpgsql regress
    suites exercise constantly): DECLARE initializers feed an
    IF/ELSIF/ELSE chain whose branches RETURN, declared STRICT, then
    the function tiers every order by o_totalprice in a grouped
    aggregation.  The oracle is the inlined CASE chain the compiler
    emits, written out by hand.

    Scale: the plpgsql body compiles to ONE inlined CASE expression
    (zero interpreter, zero Python, no SPI round-trips), so the plan is
    identical to hand-written SQL — one scan, whole-stage codegen, one
    partial/final aggregate exchange on the 3-value tier key."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql("""
        CREATE FUNCTION gate_order_tier(p float8) RETURNS text AS $$
        DECLARE
            lo float8 := 50000.0;
            hi float8 := 200000.0;
        BEGIN
            IF p >= hi THEN
                RETURN 'large';
            ELSIF p >= lo THEN
                RETURN 'medium';
            ELSE
                RETURN 'small';
            END IF;
        END;
        $$ LANGUAGE plpgsql STRICT
    """)
    out = eng.sql(
        "SELECT gate_order_tier(o_totalprice) AS tier,"
        " COUNT(*) AS n,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)"
        "   AS total"
        " FROM orders GROUP BY tier ORDER BY tier"
    )
    rows = out.collect()
    eng.sql("DROP FUNCTION gate_order_tier")
    return spark.createDataFrame(
        rows, "tier STRING, n BIGINT, total DOUBLE"
    )


@_register_query(
    "plpgsql_select_into_nested_if",
    """
    WITH cc AS (
      SELECT c_nationkey, COUNT(*) AS c FROM customer GROUP BY c_nationkey
    )
    SELECT n_nationkey, n_name,
           CASE WHEN COALESCE(c, 0) > 0
                THEN CASE WHEN c >= 60 THEN 'high' ELSE 'low' END
                ELSE 'none' END AS density
    FROM nation LEFT JOIN cc ON c_nationkey = n_nationkey
    ORDER BY n_nationkey
    """,
)
def plpgsql_select_into_nested_if(spark, sf_dir):
    """The second plpgsql shape: SELECT ... INTO binds a correlated
    scalar subquery (pl_exec.cpp exec_stmt_execsql's INTO path), a
    nested RETURN-free IF folds conditional assignments into CASE
    bindings, and the initializer supplies the fall-through value.
    Applied per nation row, the function classifies customer density.

    Scale: the INTO subquery inlines as a correlated scalar subquery
    that Catalyst decorrelates into an aggregate + join — the same plan
    the oracle's explicit LEFT JOIN spells, with no per-row SPI
    execution; the nation probe side is broadcast-sized."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql("""
        CREATE FUNCTION gate_cust_density(nk int) RETURNS text AS $$
        DECLARE
            c bigint;
            label text := 'none';
        BEGIN
            SELECT COUNT(*) INTO c FROM customer WHERE c_nationkey = nk;
            IF c > 0 THEN
                IF c >= 60 THEN
                    label := 'high';
                ELSE
                    label := 'low';
                END IF;
            END IF;
            RETURN label;
        END;
        $$ LANGUAGE plpgsql
    """)
    out = eng.sql(
        "SELECT n_nationkey, n_name, gate_cust_density(n_nationkey)"
        " AS density FROM nation ORDER BY n_nationkey"
    )
    rows = out.collect()
    eng.sql("DROP FUNCTION gate_cust_density")
    return spark.createDataFrame(
        rows, "n_nationkey INT, n_name STRING, density STRING"
    )
