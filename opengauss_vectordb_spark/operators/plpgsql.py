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

from .create_function import _map_type, _split_params

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


def _strip_comments(text: str) -> str:
    text = re.sub(r"--[^\n]*", "", text)
    return re.sub(r"/\*.*?\*/", "", text, flags=re.DOTALL)


def _subst(expr: str, bindings: dict[str, str]) -> str:
    """Replace variable references with their (parenthesized) bound
    expressions, identifier-boundary matched, longest names first so
    `total` never corrupts `total_x`."""
    out = expr
    for name in sorted(bindings, key=len, reverse=True):
        out = re.sub(
            rf"\b{re.escape(name)}\b", f"({bindings[name]})", out,
            flags=re.IGNORECASE,
        )
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


_IF_OPEN = re.compile(r"\bIF\b", re.IGNORECASE)
_END_IF = re.compile(r"\bEND\s+IF\s*;", re.IGNORECASE)
_ELSIF = re.compile(r"\bELSIF\b", re.IGNORECASE)
_ELSE = re.compile(r"\bELSE\b", re.IGNORECASE)
_THEN = re.compile(r"\bTHEN\b", re.IGNORECASE)


def _find_end_if(text: str, pos: int) -> tuple[int, int]:
    """Given pos just after an opening IF, find the matching END IF;
    returns (start_of_end_if, pos_after).  (The \\bIF\\b inside an
    "END IF" match sits at a LATER offset than the match start, so the
    open-before-close comparison classifies it correctly, and ELSIF
    never matches \\bIF\\b.)"""
    depth = 1
    i = pos
    while i < len(text):
        m_open = _IF_OPEN.search(text, i)
        m_close = _END_IF.search(text, i)
        if m_close is None:
            raise ValueError("plpgsql: IF without matching END IF")
        if m_open is not None and m_open.start() < m_close.start():
            depth += 1
            i = m_open.end()
        else:
            depth -= 1
            if depth == 0:
                return m_close.start(), m_close.end()
            i = m_close.end()
    raise ValueError("plpgsql: IF without matching END IF")


def _split_branches(block: str) -> list[tuple[str | None, str]]:
    """Split an IF-block interior `cond THEN stmts [ELSIF cond THEN
    stmts]* [ELSE stmts]` into [(cond|None, stmts)] at THIS nesting
    level (nested IF...END IF spans are skipped)."""
    branches: list[tuple[str | None, str]] = []
    i, n = 0, len(block)
    # first condition
    m = _THEN.search(block)
    if m is None:
        raise ValueError("plpgsql: IF without THEN")
    cond = block[:m.start()].strip()
    body_start = m.end()
    depth = 0
    j = body_start
    while j < n:
        m_if = _IF_OPEN.search(block, j)
        m_endif = re.compile(r"\bEND\s+IF\b", re.IGNORECASE).search(block, j)
        m_elsif = _ELSIF.search(block, j)
        m_else = _ELSE.search(block, j)
        candidates = [m for m in (m_if, m_endif, m_elsif, m_else) if m]
        if not candidates:
            break
        nxt = min(candidates, key=lambda m: m.start())
        if nxt is m_if:
            depth += 1
            j = nxt.end()
        elif nxt is m_endif:
            depth -= 1
            j = nxt.end()
        elif depth == 0 and nxt is m_elsif:
            branches.append((cond, block[body_start:nxt.start()].strip()))
            m2 = _THEN.search(block, nxt.end())
            if m2 is None:
                raise ValueError("plpgsql: ELSIF without THEN")
            cond = block[nxt.end():m2.start()].strip()
            body_start = m2.end()
            j = m2.end()
        elif depth == 0 and nxt is m_else:
            branches.append((cond, block[body_start:nxt.start()].strip()))
            cond = None
            body_start = nxt.end()
            j = nxt.end()
        else:
            j = nxt.end()
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
            if not re.search(r"\b(RETURN|RAISE)\b", block, re.IGNORECASE):
                # conditional ASSIGNMENT (no branch terminates): fold
                # each assigned variable into CASE WHEN cond THEN new
                # ELSE old END and keep scanning the continuation
                updates: list[tuple[str | None, dict[str, str]]] = []
                assigned: set[str] = set()
                for cond, body in branches:
                    b = dict(bindings)
                    _apply_assignments(body, b)
                    changed = {
                        k: v for k, v in b.items()
                        if bindings.get(k) != v
                    }
                    assigned |= set(changed)
                    updates.append(
                        (None if cond is None
                         else _subst(cond, bindings), changed)
                    )
                for var in assigned:
                    old = bindings.get(var)
                    if old is None:
                        raise ValueError(
                            f"plpgsql: conditional assignment to "
                            f"undeclared variable {var!r}"
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
                pos = end_after
                continue
            continuation = text[end_after:]
            whens = []
            has_else = False
            for cond, body in branches:
                val = _compile_stmts(body, dict(bindings))
                if cond is None:
                    has_else = True
                    whens.append(f"ELSE {val}")
                else:
                    whens.append(f"WHEN {_subst(cond, bindings)} THEN {val}")
            if not has_else:
                cont = _compile_stmts(continuation, dict(bindings))
                whens.append(f"ELSE {cont}")
                return "CASE " + " ".join(whens) + " END"
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
            tail = m_into.group("tail") or ""
            bindings[m_into.group("v").lower()] = (
                "(SELECT " + _subst(m_into.group("e"), bindings)
                + _subst(tail, bindings) + ")"
            )
            continue
        raise NotImplementedError(
            f"plpgsql statement not in the declarative subset: "
            f"{stmt.split(None, 1)[0].upper()!r} — see module docstring "
            "for the Spark-side rewrite"
        )
    raise ValueError(
        "plpgsql: control reached end of function without RETURN"
    )


def _apply_assignments(body: str, bindings: dict[str, str]) -> None:
    """Apply a branch consisting solely of assignment statements to the
    bindings (used for conditional-assignment IF blocks)."""
    pos = 0
    while pos < len(body):
        stmt, pos = _scan_stmt(body, pos)
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
    for pat, why in _UNSUPPORTED:
        if pat.search(body):
            raise NotImplementedError(f"plpgsql: {why}")
    params = _split_params(m.group("params"))
    md = _DECLARE_RE.match(body) or _BEGIN_RE.match(body)
    if md is None:
        raise ValueError("plpgsql body must be [DECLARE ...] BEGIN ... END")
    bindings: dict[str, str] = {}
    if "decls" in md.groupdict() and md.groupdict().get("decls"):
        _parse_decls(md.group("decls"), bindings)
    expr = _compile_stmts(md.group("body"), bindings)
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
