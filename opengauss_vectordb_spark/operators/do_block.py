"""DO $$ ... $$ — anonymous PL/pgSQL blocks through Engine.sql.

Reference: DoStmt (``commands/functioncmds.cpp`` ExecuteDoStmt → the
plpgsql handler's ``plpgsql_inline_handler``, ``pl_handler.cpp``).  A
DO block runs ONCE per statement, not once per row — so unlike
``operators/plpgsql.py`` (which compiles function bodies into inlined
column expressions precisely to avoid per-row interpretation), the
right altitude here is DRIVER-SIDE orchestration of distributed
statements: conditions and assignments evaluate as one-row Spark SQL
SELECTs, DML statements route through ``Engine.sql`` (each one a
distributed write), and RAISE maps to driver-side notice collection /
exceptions.  This is exactly how a migration script or psql ``DO``
block is used against the reference.

Supported statement forms inside ``BEGIN ... END``: DECLARE
initializers, ``var := expr`` (evaluated eagerly as a one-row SELECT),
``SELECT expr INTO var [FROM ...]``, ``IF / ELSIF / ELSE / END IF``
(conditions evaluated driver-side, branches executed), ``RAISE
NOTICE/WARNING/INFO 'msg' [, args]`` (format %-substitution, collected
into the result frame), ``RAISE EXCEPTION 'msg'`` (raises), ``GET
DIAGNOSTICS v = ROW_COUNT`` (last DML's row count), dynamic
``EXECUTE`` in the
literal-derived subset (pl_exec.cpp:139 exec_stmt_dynexecute — the
text composes from ``format('<literal>', ...)``, a string literal, or
a ``||`` concatenation of literals and variables; ``INTO [STRICT]``
binds results, ``USING`` binds ``$n`` parameters), ``PERFORM <query>``
(run and discard, exec_stmt_perform), DML ``RETURNING <exprs> INTO
[STRICT] v1[, v2 ...]`` (binds the RETURNING frame's first row
positionally; zero rows NULL the targets and clear FOUND), ``CASE ... END CASE``
statements (rewritten to the IF/ELSIF chain, CASE_NOT_FOUND on
fall-through), the implicit ``FOUND`` variable (exec_set_found:
false at block entry; set by SELECT INTO / DML row counts / PERFORM;
never modified by EXECUTE — PG's documented rule; a user DECLARE of
the name shadows it), and any other
statement text (INSERT / UPDATE / DELETE / CREATE / COPY / ...)
executed through Engine.sql with variable references substituted as
typed SQL literals.

EXCEPTION frames (round 9) carry REAL rollback semantics: the frame
snapshots every managed table's latest CSN at entry, and an error
restores advanced tables through the TIMECAPSULE machinery
(read_snapshot + rewrite) and drops block-created tables — rollback
happens BEFORE the handler search, so an unmatched error still rolls
back and re-throws, matching pl_exec.cpp:95's subtransaction abort.
Handlers dispatch on the ACTUAL runtime error class (the frame runs
under ANSI evaluation so zero divisions / bad casts RAISE the way PG
raises them), and variables keep their pre-error values.

NOT supported (clear errors): loops (set-based rewrite — one
distributed statement), DROP/ALTER inside a guarded block (their
undo lives outside the frame's reach), and cursors (session-level
DECLARE CURSOR).
"""

from __future__ import annotations

import re

from .plpgsql import (
    _BEGIN_RE,
    _DECLARE_RE,
    _find_end_if,
    _mask_strings,
    _rewrite_assert_stmts,
    _rewrite_case_stmts,
    _scan_stmt,
    _split_branches,
)
from .create_function import _map_type, _split_params, _strip_comments
from ._util import pin_schema, status_frame

_DO_RE = re.compile(
    r"^\s*DO\s+(?P<body>\$(?P<tag>\w*)\$.*?\$(?P=tag)\$)"
    r"(?:\s+LANGUAGE\s+PLPGSQL)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_UNSUPPORTED = [
    (re.compile(r"\b(WHILE|LOOP|FOREACH)\b|\bFOR\s+\w+\s+IN\b",
                re.IGNORECASE),
     "only FOR <rec> IN SELECT/<bound cursor>/EXECUTE '<literal>' "
     "LOOP bodies made of accumulator assignments execute (as ONE "
     "aggregate statement), plus the cursor fetch-loop shape "
     "(LOOP FETCH c INTO ...; EXIT WHEN NOT FOUND; ...); "
     "WHILE/FOREACH/other bare LOOPs have no set-oriented form here "
     "— rewrite as one statement (INSERT/UPDATE ... SELECT)"),
]


def _scan_unsupported(masked: str, where: str) -> None:
    """Refuse constructs with no set-oriented execution — but blank
    FOR ... END LOOP constructs and cursor fetch-loops first (the
    supported loop shapes; a bad body still refuses later with the
    aggregate-shape message) — the plpgsql.py:2040 convention."""
    scan = re.sub(
        r"\b(?:FOR\s+\w+\s+IN\b|LOOP\s+FETCH\b).*?\bEND\s+LOOP\b",
        " ", masked, flags=re.IGNORECASE | re.DOTALL,
    )
    for pat, why in _UNSUPPORTED:
        if pat.search(scan):
            raise NotImplementedError(f"{where}: {why}")


def _sql_literal(v) -> str:
    """Render a driver-side Python value as a Spark SQL literal."""
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        # a bare decimal literal parses as DECIMAL in Spark SQL,
        # which would silently switch a double variable's arithmetic
        # to exact decimal — the CAST keeps float8 semantics (PG's
        # variable substitution preserves the declared type)
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


class _Varray(list):
    """A PL/SQL collection variable (TYPE t IS VARRAY(n) OF e / TABLE
    OF e): a driver-side list with the declared capacity and element
    type (gram.y varray/table-of declarations; hw_varray.sql).  The
    1-based paren indexing, .COUNT/.FIRST/.LAST, and the PG text
    rendering live in _subst_values / the assignment handler."""

    def __init__(self, cap=None, et="string"):
        super().__init__()
        self.cap = cap
        self.et = et


def _safe_index(text: str) -> int:
    """Evaluate an already-substituted collection subscript —
    integer arithmetic only (loop counters and literals)."""
    s = text.strip()
    if not re.fullmatch(r"[\d\s+\-*/()]+", s):
        raise NotImplementedError(
            "collection subscripts evaluate driver-side: use integer "
            "variables/literals (got a non-arithmetic subscript)"
        )
    return int(eval(s, {"__builtins__": {}}, {}))  # noqa: S307


def _subst_values(text: str, env: dict) -> str:
    """Replace variable references with typed literals of their CURRENT
    driver-side values — identifier-boundary matched on the
    string-masked copy, qualified refs untouched (the plpgsql rules).
    Collection variables substitute first: ``v(i)`` element reads and
    ``v.COUNT/.FIRST/.LAST`` methods, then bare references render in
    the PG '{...}' text form."""
    out = text
    coll = {n for n, v in env.items() if isinstance(v, _Varray)}
    for name in sorted(coll, key=len, reverse=True):
        arr = env[name]
        pat = re.compile(
            rf"(?<!\.)\b{re.escape(name)}\s*\(\s*([^()]+)\s*\)",
            re.IGNORECASE,
        )
        while True:
            m = pat.search(_mask_strings(out))
            if m is None:
                break
            idx = _safe_index(_subst_values(m.group(1), env))
            v = arr[idx - 1] if 1 <= idx <= len(arr) else None
            rep = _sql_literal(v)
            out = out[:m.start()] + rep + out[m.end():]
        mpat = re.compile(
            rf"(?<!\.)\b{re.escape(name)}\s*\.\s*(count|first|last)\b",
            re.IGNORECASE,
        )
        while True:
            m = mpat.search(_mask_strings(out))
            if m is None:
                break
            meth = m.group(1).lower()
            if meth == "count":
                v = len(arr)
            elif meth == "first":
                v = 1 if arr else None
            else:
                v = len(arr) if arr else None
            rep = _sql_literal(v)
            out = out[:m.start()] + rep + out[m.end():]
    for name in sorted(env, key=len, reverse=True):
        pat = re.compile(rf"(?<!\.)\b{re.escape(name)}\b", re.IGNORECASE)
        pos = 0
        while True:
            m = pat.search(_mask_strings(out), pos)
            if m is None:
                break
            val = env[name]
            if isinstance(val, _Varray):
                rep = _sql_literal(
                    "{" + ",".join(
                        "NULL" if x is None else str(x) for x in val
                    ) + "}"
                )
            else:
                rep = _sql_literal(val)
            out = out[:m.start()] + rep + out[m.end():]
            pos = m.start() + len(rep)
    return out.strip()


class _DoRunner:
    def __init__(self, engine):
        self.engine = engine
        # the implicit FOUND variable starts false at block entry
        # (pl_exec.cpp plpgsql_estate_setup → exec_set_found(false));
        # a user DECLARE of the same name shadows it (decls parse
        # after construction and set _found_shadowed)
        self.env: dict = {"found": False}
        self.notices: list[str] = []
        self.executed = 0
        self._found_shadowed = False
        # PL/SQL collection types declared in this block:
        # name -> (capacity or None, element type text)
        self.coll_types: dict = {}
        # GET DIAGNOSTICS ROW_COUNT source: the last DML's row count
        self.last_row_count: int = 0
        # bound cursors (DECLARE c CURSOR FOR/IS <query>): name →
        # query text, consumed by cursor FOR loops (exec_stmt_forc)
        self.cursors: dict[str, str] = {}
        # OPENed cursors (exec_stmt_open): name → incremental
        # take-buffer (doubling batches — Spark's take() scans one
        # partition, then geometrically more, so a protocol-sized
        # FETCH sequence reads only leading partitions; measured 3×
        # cheaper per open than toLocalIterator's per-partition job
        # pipeline + result-serving socket, OPTIMIZATION_r12.md)
        self.open_cursors: dict = {}

    def _set_found(self, hit: bool) -> None:
        """exec_set_found — SELECT INTO, PERFORM and DML update the
        implicit FOUND; a user-declared `found` shadows it, and
        EXECUTE never modifies it (PG's documented rule)."""
        if not self._found_shadowed:
            self.env["found"] = bool(hit)

    def _note_row_count(self, df) -> None:
        try:
            if df is not None and "rows" in df.columns:
                row = df.first()
                if row is not None and row["rows"] is not None:
                    self.last_row_count = int(row["rows"])
                    self._set_found(self.last_row_count > 0)
        except Exception:  # noqa: BLE001 — diagnostics never break DML
            pass

    def _eval_scalar(self, sql: str):
        # every caller passes "SELECT <scalar expr>" with all variables
        # already substituted as literals.  Anchoring the projection on
        # an inline VALUES row lets Catalyst fold it to a LocalRelation
        # (OneRowRelation is not eligible for ConvertToLocalRelation),
        # so evaluation is driver-side — no job, no result-serving
        # socket: measured 46 → 15 ms per eval, and interpreted bodies
        # run tens of these (OPTIMIZATION_r12.md).  Scalar subqueries
        # inside the expression still execute as ordinary plans.
        row = self.engine.spark.sql(
            sql + " FROM VALUES (0) AS __onerow(__z)"
        ).first()
        return None if row is None else row[0]

    def run(self, text: str) -> None:
        # CASE ... END CASE statements are IF/ELSIF sugar
        # (exec_stmt_case) and ASSERT is IF/RAISE sugar
        # (exec_stmt_assert) — rewrite before dispatch, same as the
        # compiled-function path; idempotent on recursive branch runs
        text = _rewrite_case_stmts(_rewrite_assert_stmts(text))
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
                for cond, body in _split_branches(text[start:end_start]):
                    if cond is None or self._eval_scalar(
                        "SELECT " + _subst_values(cond, self.env)
                    ):
                        self.run(body)
                        break
                pos = end_after
                continue
            if re.match(r"FOR\b", rest, re.IGNORECASE):
                from .plpgsql import _parse_for_block

                pf = _parse_for_block(text, pos + off)
                if pf is not None:
                    var, src, lbody, pos = pf
                    self._exec_for_loop(var, src, lbody)
                    continue
            if re.match(r"LOOP\b", rest, re.IGNORECASE):
                pos = self._exec_fetch_loop(text, pos + off)
                continue
            stmt, pos = _scan_stmt(text, pos + off)
            if not stmt:
                continue
            self._exec_stmt(stmt)

    def _exec_for_loop(self, var: str, src: str, body: str) -> None:
        """FOR <rec> IN <source> LOOP <accumulator assignments> END
        LOOP — executed as ONE distributed aggregate statement, never
        a driver row loop.  Sources mirror pl_exec.cpp: a SELECT or
        bounded integer range (exec_stmt_fors/fori — the function
        compiler's _parse_loop_accs validates and folds), a BOUND
        CURSOR name declared ``c CURSOR FOR <query>`` (exec_stmt_forc
        — pure name indirection), or ``EXECUTE <literal-derived
        text>`` (exec_stmt_dynfors — composed by the same rule as
        statement-level EXECUTE).  Accumulators bind back into the
        env from the one result row; FOUND reflects whether the loop
        saw rows (post-CONTINUE-filter when the body leads with
        CONTINUE WHEN — the one documented deviation, PG counts
        pre-filter iterations)."""
        from .plpgsql import _acc_agg_expr, _parse_loop_accs

        s = src.strip()
        mex = re.match(r"EXECUTE\s+(?P<e>.+)$", s,
                       re.IGNORECASE | re.DOTALL)
        if mex:
            s = self._compose_dynsql(mex.group("e").strip())
        elif re.fullmatch(r"\w+", s):
            if s.lower() not in self.cursors:
                raise KeyError(
                    f"FOR {var} IN {s}: {s!r} is not a declared "
                    "bound cursor (DECLARE <c> CURSOR FOR <query>)"
                )
            s = self.cursors[s.lower()]
        # collection-writing numeric FOR loops (the hw_varray.sql
        # shape: FOR i IN 1..n LOOP a(i) := ...) iterate DRIVER-SIDE —
        # a collection is driver state bounded by its declared
        # capacity, so the loop is protocol-sized by construction;
        # set-oriented folding stays the rule for everything else
        coll = [n for n, v in self.env.items()
                if isinstance(v, _Varray)]
        mr = re.match(
            r"^(?P<rev>REVERSE\s+)?(?P<lo>[^.]+?)\s*\.\.\s*"
            r"(?P<hi>.+)$", s, re.IGNORECASE | re.DOTALL,
        )
        if (mr and coll and re.search(
            rf"\b(?:{'|'.join(map(re.escape, coll))})\s*[(.]",
            _mask_strings(body), re.IGNORECASE,
        )):
            lo = _safe_index(_subst_values(mr.group("lo"), self.env))
            hi = _safe_index(_subst_values(mr.group("hi"), self.env))
            if hi - lo + 1 > 10000:
                raise NotImplementedError(
                    "collection FOR loop over more than 10000 "
                    "iterations — use an ARRAY column and set-oriented "
                    "statements"
                )
            vkey = var.lower()
            had, old = vkey in self.env, self.env.get(vkey)
            if mr.group("rev"):
                # pl_exec exec_stmt_fori REVERSE: first DOWN to second
                rng = range(lo, hi - 1, -1)
                nonempty = lo >= hi
            else:
                rng = range(lo, hi + 1)
                nonempty = hi >= lo
            for i in rng:
                self.env[vkey] = i
                self.run(body)
            if had:
                self.env[vkey] = old
            else:
                self.env.pop(vkey, None)
            self._set_found(nonempty)
            self.executed += 1
            return
        bindings = {k: _sql_literal(v) for k, v in self.env.items()}
        accs, q_sub = _parse_loop_accs(var, s, body, bindings)
        cur: dict[str, str] = {}
        for acc, kind, e_sub, old in accs:
            cur[acc] = _acc_agg_expr(kind, e_sub, cur.get(acc, old))
        proj = ", ".join(f"{e} AS {a}" for a, e in cur.items())
        row = self.engine.sql(
            f"SELECT COUNT(*) AS __n, {proj} FROM ({q_sub}) AS {var}"
        ).first()
        for acc in cur:
            self.env[acc] = row[acc]
        self._set_found(row["__n"] > 0)
        self.executed += 1

    def _exec_fetch_loop(self, text: str, pos: int) -> int:
        """``LOOP FETCH c INTO vars; EXIT WHEN NOT FOUND; <acc stmts>
        END LOOP`` — the canonical cursor fetch loop (pl_exec.cpp
        exec_stmt_fetch driving exec_stmt_loop) IS a bound-cursor FOR
        loop in disguise: it rewrites to ``FOR rec IN <cursor query>
        LOOP`` with the fetch variables renamed to the record's
        columns, and executes as ONE distributed aggregate — the
        row-at-a-time protocol shape never reaches the executor.
        Post-loop, PG's own semantics hold: the failed FETCH left the
        targets NULL and FOUND false.  Returns the position after END
        LOOP; any other bare-LOOP shape refuses naming the rewrite."""
        from .plpgsql import _LOOP_TOKEN

        masked = _mask_strings(text)
        body_start = pos + 4
        depth = 1
        end_start = end_after = None
        for mt in _LOOP_TOKEN.finditer(masked, body_start):
            if mt.group(0).upper().startswith("END"):
                depth -= 1
                if depth == 0:
                    end_start, end_after = mt.start(), mt.end()
                    break
            else:
                depth += 1
        if end_start is None:
            raise ValueError("LOOP without END LOOP")
        body = text[body_start:end_start]
        stmts = []
        bpos = 0
        while bpos < len(body):
            s, bpos = _scan_stmt(body, bpos)
            if s:
                stmts.append(s)
        mf = (re.match(
            r"FETCH\s+(?:NEXT\s+)?(?:FROM\s+)?(?P<c>\w+)\s+INTO\s+"
            r"(?P<vs>\w+(?:\s*,\s*\w+)*)$", stmts[0], re.IGNORECASE)
            if stmts else None)
        ok_exit = len(stmts) >= 2 and re.fullmatch(
            r"EXIT\s+WHEN\s+NOT\s+FOUND", stmts[1].strip(),
            re.IGNORECASE)
        cname = mf.group("c").lower() if mf else None
        qtext = None
        opened = None
        if cname is not None:
            opened = self.open_cursors.get(cname)
            if opened is not None:
                # desugaring aggregates over the FULL cursor query, so
                # it is only sound while the buffer is UNSTARTED —
                # rows already consumed by straight-line FETCHes would
                # be double-counted.  Prefer the OPEN-time substituted
                # text (pl_exec's open-time parameter snapshot).
                if opened["buf"] is None:
                    qtext = opened["q"]
            else:
                # DECLARE'd but never OPENed: the declaration text,
                # substituted at loop entry
                qtext = self.cursors.get(cname)
        if mf is None or not ok_exit or qtext is None:
            raise NotImplementedError(
                "bare LOOP: only the cursor fetch-loop shape executes "
                "(LOOP FETCH <bound cursor> INTO vars; EXIT WHEN NOT "
                "FOUND; <accumulator stmts>; END LOOP — rewritten to "
                "the bound-cursor FOR aggregate, valid only before any "
                "straight-line FETCH consumed rows); otherwise rewrite "
                "as one set-oriented statement or a FOR loop"
            )
        q = qtext
        cols = self.engine.sql(_subst_values(q, self.env)).columns
        names = [v.strip().lower() for v in mf.group("vs").split(",")]
        if len(names) != len(cols):
            # exec_stmt_fetch's row-to-target contract: arity must
            # match in BOTH directions (a silent prefix bind would
            # leave trailing cursor columns unread)
            raise ValueError(
                f"FETCH {cname}: {len(names)} target variable(s) for "
                f"{len(cols)} cursor column(s)"
            )
        rest_body = " ".join(s + ";" for s in stmts[2:])
        for i, v in enumerate(names):
            pat = re.compile(rf"(?<!\.)\b{re.escape(v)}\b",
                             re.IGNORECASE)
            spos = 0
            while True:
                mv = pat.search(_mask_strings(rest_body), spos)
                if mv is None:
                    break
                rep = f"__crec.{cols[i]}"
                rest_body = (rest_body[:mv.start()] + rep
                             + rest_body[mv.end():])
                spos = mv.start() + len(rep)
        self._exec_for_loop("__crec", q, rest_body)
        # the loop ended on a failed FETCH: targets NULL, FOUND false,
        # and the cursor stands EXHAUSTED — a FETCH after the loop
        # must return NULL/FOUND=false, not restart from row 1
        if opened is not None:
            opened["buf"], opened["done"] = [], True
        for v in names:
            self.env[v] = None
        self._set_found(False)
        return end_after

    def _exec_stmt(self, stmt: str) -> None:
        # dbe_output.print_line / dbms_output.put_line (the A-format
        # serveroutput channel; 77 regress uses): evaluate the
        # argument and collect it with the notices — the same
        # client-visible stream RAISE INFO feeds
        m = re.match(
            r"(?:CALL\s+)?(?:dbe_output\s*\.\s*print_line|"
            r"dbms_output\s*\.\s*put_line)\s*\((?P<a>.*)\)\s*$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if m:
            v = self._eval_scalar(
                "SELECT CAST(("
                + _subst_values(m.group("a"), self.env)
                + ") AS STRING)"
            )
            self.notices.append("" if v is None else str(v))
            return
        m = re.match(
            r"RAISE\s+(?P<lvl>NOTICE|WARNING|INFO|EXCEPTION)\s+"
            r"'(?P<msg>(?:[^']|'')*)'(?:\s*,\s*(?P<args>.+?))?\s*$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if m:
            msg = m.group("msg").replace("''", "'")
            if m.group("args"):
                # pl_exec exec_stmt_raise: each % consumes one
                # evaluated argument ('%%' escapes)
                vals = [
                    self._eval_scalar(
                        "SELECT " + _subst_values(a, self.env)
                    )
                    for a in _split_call_args(m.group("args"))
                ]
                out, i, ai = [], 0, 0
                while i < len(msg):
                    ch = msg[i]
                    if ch == "%" and i + 1 < len(msg) \
                            and msg[i + 1] == "%":
                        out.append("%")
                        i += 2
                        continue
                    if ch == "%":
                        if ai >= len(vals):
                            raise ValueError(
                                "RAISE: too few parameters for "
                                "format string"
                            )
                        v = vals[ai]
                        out.append("<NULL>" if v is None else str(v))
                        ai += 1
                        i += 1
                        continue
                    out.append(ch)
                    i += 1
                if ai != len(vals):
                    raise ValueError(
                        "RAISE: too many parameters for format string"
                    )
                msg = "".join(out)
            if m.group("lvl").upper() == "EXCEPTION":
                raise RuntimeError(f"DO block RAISE EXCEPTION: {msg}")
            self.notices.append(f"{m.group('lvl').upper()}: {msg}")
            return
        # GET [CURRENT] DIAGNOSTICS v = ROW_COUNT — pl_exec.cpp
        # exec_stmt_getdiag: binds the row count of the LAST DML
        m = re.match(
            r"GET\s+(?:CURRENT\s+)?DIAGNOSTICS\s+(?P<v>\w+)\s*:?=\s*"
            r"ROW_COUNT\s*$",
            stmt, re.IGNORECASE,
        )
        if m:
            self.env[m.group("v").lower()] = self.last_row_count
            return
        # collection element assignment v(i) := e and v.extend[(n)]
        # (the hw_varray.sql subset: 1-based paren indexing with
        # auto-extension up to the declared capacity)
        m = re.match(
            r"(?P<v>\w+)\s*\(\s*(?P<i>[^()]+)\s*\)\s*:=\s*(?P<e>.+)$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if m and isinstance(self.env.get(m.group("v").lower()),
                            _Varray):
            arr = self.env[m.group("v").lower()]
            idx = _safe_index(_subst_values(m.group("i"), self.env))
            if idx < 1 or (arr.cap is not None and idx > arr.cap):
                raise ValueError(
                    f"collection subscript {idx} is outside the "
                    f"declared VARRAY limit"
                )
            val = self._eval_scalar(
                "SELECT CAST(("
                + _subst_values(m.group("e"), self.env)
                + f") AS {_map_type(arr.et)})"
            )
            while len(arr) < idx:
                arr.append(None)
            arr[idx - 1] = val
            return
        m = re.match(
            r"(?P<v>\w+)\s*\.\s*extend\s*(?:\(\s*(?P<n>\d+)\s*\))?\s*$",
            stmt, re.IGNORECASE,
        )
        if m and isinstance(self.env.get(m.group("v").lower()),
                            _Varray):
            arr = self.env[m.group("v").lower()]
            n = int(m.group("n") or 1)
            if arr.cap is not None and len(arr) + n > arr.cap:
                raise ValueError(
                    "extend exceeds the declared VARRAY capacity"
                )
            arr.extend([None] * n)
            return
        m = re.match(r"(?P<v>\w+)\s*:=\s*(?P<e>.+)$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if m:
            self.env[m.group("v").lower()] = self._eval_scalar(
                "SELECT " + _subst_values(m.group("e"), self.env)
            )
            return
        m = re.match(
            r"SELECT\s+(?P<e>.+?)\s+INTO\s+(?:STRICT\s+)?(?P<v>\w+)"
            r"(?P<tail>\s+FROM\s+.+)?$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if m:
            tail = (m.group("tail") or "").strip()
            sql = "SELECT " + _subst_values(m.group("e"), self.env)
            if tail:
                sql += " " + _subst_values(tail, self.env)
            row = self.engine.sql(sql).first()
            self.env[m.group("v").lower()] = None if row is None else row[0]
            self._set_found(row is not None)
            return
        # DML ... RETURNING <exprs> INTO [STRICT] v1[, v2 ...] —
        # pl_exec.cpp exec_stmt_execsql's INTO path over a RETURNING
        # DML: run the statement (the engine's RETURNING frame IS the
        # result set), bind the first row's values positionally, set
        # FOUND/ROW_COUNT from the returned rows
        if re.match(r"(INSERT|UPDATE|DELETE)\b", stmt, re.IGNORECASE):
            masked = _mask_strings(stmt)
            mr = re.search(r"\bRETURNING\b", masked, re.IGNORECASE)
            mi = mr and re.search(
                r"\s+INTO\s+(?:STRICT\s+)?(?P<vs>\w+(?:\s*,\s*\w+)*)\s*$",
                masked[mr.end():], re.IGNORECASE,
            )
            if mi:
                dml = stmt[: mr.end() + mi.start()]
                rows = self.engine.sql(
                    _subst_values(dml, self.env)
                ).collect()
                self.executed += 1
                self.last_row_count = len(rows)
                self._set_found(len(rows) > 0)
                row = rows[0] if rows else None
                names = [v.strip().lower()
                         for v in mi.group("vs").split(",")]
                if row is not None and len(row) < len(names):
                    raise ValueError(
                        "RETURNING INTO: statement returns "
                        f"{len(row)} column(s) for {len(names)} "
                        "target variable(s)"
                    )
                for i, v in enumerate(names):
                    self.env[v] = None if row is None else row[i]
                return
        # EXECUTE <dynamic sql> — pl_exec.cpp:139 exec_stmt_dynexecute,
        # the literal-derived subset (see _compose_dynsql).  The
        # A-format spelling EXECUTE IMMEDIATE (gram.y's
        # ExecuteImmediateStmt; 116 regress uses) is the same
        # statement — the keyword strips.
        m = re.match(r"EXECUTE\s+(?:IMMEDIATE\s+)?(?P<rest>.+)$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if m:
            self._exec_dynexecute(m.group("rest"))
            return
        # OPEN c / OPEN c FOR <query> — pl_exec.cpp exec_stmt_open:
        # bind the cursor's query (the bound declaration, or the OPEN
        # FOR text) and start a STREAMING row iterator — partitions
        # arrive on demand, the result is never materialized whole
        m = re.match(r"OPEN\s+(?P<c>\w+)\s*(?:FOR\s+(?P<q>.+))?$",
                     stmt, re.IGNORECASE | re.DOTALL)
        if m:
            name = m.group("c").lower()
            q = m.group("q") or self.cursors.get(name)
            if q is None:
                raise KeyError(
                    f"OPEN {name}: not a declared bound cursor and no "
                    "FOR <query> given (DECLARE <c> CURSOR FOR "
                    "<query>, or OPEN <c> FOR <query>)"
                )
            # the query binds at OPEN (env values substituted NOW,
            # pl_exec's open-time parameter snapshot) but no job runs
            # until the first FETCH — a fetch LOOP over this cursor
            # compiles to one aggregate and never touches the iterator
            self.open_cursors[name] = {
                "q": _subst_values(q, self.env),
                "buf": None, "pos": 0, "done": False,
            }
            self.executed += 1
            return
        # FETCH [NEXT] [FROM] c INTO v1[, ...] — exec_stmt_fetch: one
        # row from the open cursor's buffer, positional binding;
        # exhaustion sets the targets NULL and FOUND false (PG's rule).
        # Buffering strategy is decided ONCE at the first FETCH from
        # the cursor plan (r13 hardening, ADVICE r12):
        #   * exchange-free plans (narrow scan/filter/project/generate/
        #     limit) use the incremental doubling take() buffer — each
        #     take() re-scans only the leading partitions it needs, and
        #     the prefix is deterministic across re-executions because
        #     row order is the immutable files' order;
        #   * plans whose row order is NOT stable across executions
        #     (joins, aggregates, sorts with ties, windows, distinct,
        #     repartitions — anything with an exchange) take ONE
        #     64-row buffer up front (single execution — for a sorted
        #     cursor that is a cheap TakeOrdered top-K, not a full
        #     sort), covering any protocol-sized FETCH sequence
        #     hazard-free; a sequence that exhausts it collect()s once
        #     and VERIFIES the already-delivered prefix is unchanged,
        #     raising a descriptive error instead of silently skipping
        #     or repeating a row the way a regrown take() could.
        m = re.match(
            r"FETCH\s+(?:NEXT\s+)?(?:FROM\s+)?(?P<c>\w+)\s+INTO\s+"
            r"(?P<vs>\w+(?:\s*,\s*\w+)*)$",
            stmt, re.IGNORECASE,
        )
        if m:
            name = m.group("c").lower()
            if name not in self.open_cursors:
                raise KeyError(f"FETCH {name}: cursor is not open")
            cur = self.open_cursors[name]
            if cur["buf"] is None:
                df = self.engine.sql(cur["q"])
                plan = df._jdf.queryExecution().optimizedPlan().toString()
                cur["df"] = df
                cur["stable_prefix"] = not re.search(
                    r"\b(?:Join|Aggregate|Sort|Window|Deduplicate"
                    r"|Repartition|RepartitionByExpression|Sample"
                    r"|Intersect|Except)\b",
                    plan,
                )
            if cur["buf"] is None or (
                cur["pos"] >= len(cur["buf"]) and not cur["done"]
            ):
                if cur["stable_prefix"]:
                    want = max(4 * cur["pos"], 2)
                    cur["buf"] = cur["df"].take(want)
                    cur["done"] = len(cur["buf"]) < want
                elif cur["buf"] is None:
                    cur["buf"] = cur["df"].take(64)
                    cur["done"] = len(cur["buf"]) < 64
                else:
                    full = cur["df"].collect()
                    if full[: cur["pos"]] != cur["buf"][: cur["pos"]]:
                        raise RuntimeError(
                            "FETCH: cursor row order changed between "
                            "executions (plan has no stable prefix — "
                            "exchange with ties); add a total ORDER BY "
                            "(unique tiebreak column) to the cursor "
                            "query"
                        )
                    cur["buf"], cur["done"] = full, True
            row = (
                cur["buf"][cur["pos"]]
                if cur["pos"] < len(cur["buf"])
                else None
            )
            cur["pos"] += 1
            names = [v.strip().lower() for v in m.group("vs").split(",")]
            for i, v in enumerate(names):
                self.env[v] = None if row is None else row[i]
            self._set_found(row is not None)
            self.executed += 1
            return
        m = re.match(r"CLOSE\s+(?P<c>\w+)$", stmt, re.IGNORECASE)
        if m and m.group("c").lower() in self.open_cursors:
            del self.open_cursors[m.group("c").lower()]
            self.executed += 1
            return
        # PERFORM <query> = run and discard (pl_exec exec_stmt_perform)
        m = re.match(r"PERFORM\s+(?P<q>.+)$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if m:
            rows = self.engine.sql(
                "SELECT " + _subst_values(m.group("q"), self.env)
            ).collect()
            self._set_found(len(rows) > 0)
            self.executed += 1
            return
        # anything else is a statement for the engine (DML/DDL/COPY)
        res = self.engine.sql(_subst_values(stmt, self.env))
        self.executed += 1
        self._note_row_count(res)


    # ---------------------------------------------------------------
    # dynamic EXECUTE — pl_exec.cpp:139 exec_stmt_dynexecute, the
    # LITERAL-DERIVED subset: the statement text must compose from a
    # literal format() template, a string literal, or a ||
    # concatenation of literals and declared variables.  The composed
    # string then runs through the ordinary Engine.sql statement path
    # — dynamic SQL is string composition plus the existing planner,
    # exactly how a migration script uses it.  Arbitrary expressions
    # building the text refuse: an engine cannot validate SQL it
    # cannot see until runtime, and the reference's own regress
    # suites derive their EXECUTE strings from format()/|| literals.
    # ---------------------------------------------------------------
    def _parse_dynexecute(self, rest: str):
        """(composed sql with USING $n substituted, into_m, using_m,
        rest) — the shared front half of EXECUTE handling; RETURN
        QUERY EXECUTE reuses it without the INTO tail."""
        masked = _mask_strings(rest)
        into_m = using_m = None
        depth = 0
        for mm in re.finditer(r"[()]|\bINTO\b|\bUSING\b", masked,
                              re.IGNORECASE):
            t = mm.group(0)
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            elif depth == 0:
                if t.upper() == "INTO" and into_m is None:
                    into_m = mm
                elif t.upper() == "USING" and using_m is None:
                    using_m = mm
        q_end = min(
            m.start() for m in (into_m, using_m) if m is not None
        ) if (into_m or using_m) else len(rest)
        sql = self._compose_dynsql(rest[:q_end].strip())
        if using_m:
            vals = [
                self._eval_scalar(
                    "SELECT " + _subst_values(a, self.env)
                )
                for a in _split_call_args(
                    rest[using_m.end():
                         into_m.start() if into_m
                         and into_m.start() > using_m.end()
                         else len(rest)]
                )
            ]
            out, last = [], 0
            for pm in re.finditer(r"\$(\d+)", _mask_strings(sql)):
                k = int(pm.group(1))
                if not 1 <= k <= len(vals):
                    raise ValueError(
                        f"EXECUTE ... USING: ${k} has no parameter "
                        f"({len(vals)} given)"
                    )
                out.append(sql[last:pm.start()])
                out.append(_sql_literal(vals[k - 1]))
                last = pm.end()
            sql = "".join(out) + sql[last:]
        return sql, into_m, using_m

    def _exec_dynexecute(self, rest: str) -> None:
        sql, into_m, using_m = self._parse_dynexecute(rest)
        if into_m:
            into_txt = rest[into_m.end():
                            using_m.start() if using_m else len(rest)]
            strict = re.match(r"\s*STRICT\b", into_txt, re.IGNORECASE)
            if strict:
                into_txt = into_txt[strict.end():]
            vars_ = [v.strip().lower() for v in into_txt.split(",")]
            rows = self.engine.sql(sql).take(2)
            if strict and len(rows) != 1:
                # pl_exec.cpp exec_stmt_dynexecute STRICT errors
                raise ValueError(
                    "EXECUTE ... INTO STRICT: query returned "
                    + ("no rows" if not rows else "more than one row")
                )
            row = rows[0] if rows else None
            for i, v in enumerate(vars_):
                self.env[v] = None if row is None else row[i]
        else:
            self._note_row_count(self.engine.sql(sql))
        self.executed += 1

    def _compose_dynsql(self, qe: str) -> str:
        # PG's lexer concatenates adjacent string literals separated
        # by whitespace containing a NEWLINE (SQL standard rule) —
        # the idiom every long format() template uses
        qe = re.sub(
            r"'((?:[^']|'')*)'[ \t]*\n\s*'", lambda m: f"'{m.group(1)}",
            qe,
        )
        mfmt = re.match(
            r"format\s*\(\s*(?P<fmt>'(?:[^']|'')*')"
            r"\s*(?:,\s*(?P<args>.+))?\)\s*$",
            qe, re.IGNORECASE | re.DOTALL,
        )
        if mfmt:
            fmt = mfmt.group("fmt")[1:-1].replace("''", "'")
            args = (_split_call_args(mfmt.group("args"))
                    if mfmt.group("args") else [])
            vals = [
                self._eval_scalar(
                    "SELECT " + _subst_values(a, self.env)
                )
                for a in args
            ]
            return _pg_format(fmt, vals)
        # string literal / || concatenation of literals and variables
        bare = re.sub(r"\|\|", " ", _mask_strings(qe))
        alien = sorted({
            t.group(0).lower()
            for t in re.finditer(r"\b[A-Za-z_]\w*\b", bare)
            if t.group(0).lower() not in self.env
        })
        if alien:
            raise NotImplementedError(
                "EXECUTE: the statement text must derive from "
                "literals — a string literal, a || concatenation of "
                "literals and declared variables, or "
                "format('<literal>', ...) — so the engine can see the "
                f"SQL it runs ({', '.join(alien)} is neither); build "
                "the statement text in those forms, or run it as a "
                "plain statement"
            )
        val = self._eval_scalar("SELECT " + _subst_values(qe, self.env))
        if val is None:
            # pl_exec.cpp exec_stmt_dynexecute's null-query error
            raise ValueError(
                "EXECUTE: query string argument is null"
            )
        return str(val)


def _pg_format(fmt: str, vals: list) -> str:
    """PG's format() (stringinfo %I/%L/%s conversions) over
    driver-side values: %s inlines the text, %L renders a SQL
    literal, %I validates a plain identifier (the engine's catalog
    has no quoted-identifier names to protect, so %I admits exactly
    what the catalog can hold), %% escapes."""
    out, i, ai = [], 0, 0
    while i < len(fmt):
        ch = fmt[i]
        if ch != "%":
            out.append(ch)
            i += 1
            continue
        if i + 1 >= len(fmt):
            raise ValueError("format(): trailing %")
        spec = fmt[i + 1]
        if spec == "%":
            out.append("%")
            i += 2
            continue
        if spec not in "ILs":
            raise NotImplementedError(
                f"format(): only %I, %L, %s and %% compose "
                f"(got %{spec})"
            )
        if ai >= len(vals):
            raise ValueError("format(): too few arguments")
        v = vals[ai]
        ai += 1
        if spec == "s":
            out.append("" if v is None else str(v))
        elif spec == "L":
            out.append(_sql_literal(v))
        else:
            if v is None:
                raise ValueError("format(): NULL identifier for %I")
            s = str(v)
            if not re.match(r"^[A-Za-z_]\w*$", s):
                raise NotImplementedError(
                    f"format() %I: {s!r} is not a plain identifier — "
                    "the engine's catalog holds [A-Za-z_]\\w* names "
                    "only"
                )
            out.append(s.lower())
        i += 2
    return "".join(out)


def _parse_decls_values(decls: str, runner: _DoRunner) -> None:
    pos = 0
    while pos < len(decls):
        stmt, pos = _scan_stmt(decls, pos)
        if not stmt:
            continue
        # c [NO SCROLL|SCROLL] CURSOR FOR|IS <query> — a BOUND cursor
        # (gram.y decl_cursor_query; IS is the A-format spelling):
        # just the query text, consumed by cursor FOR loops — must
        # parse before the generic declaration shape below
        mc = re.match(
            r"(?P<v>\w+)\s+(?:NO\s+SCROLL\s+|SCROLL\s+)?CURSOR\s+"
            r"(?:FOR|IS)\s+(?P<q>.+)$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if mc:
            runner.cursors[mc.group("v").lower()] = mc.group("q").strip()
            continue
        # TYPE t IS VARRAY(n) OF e / TYPE t IS TABLE OF e — PL/SQL
        # collection types (gram.y; the hw_varray.sql family): the
        # 1-D scalar-element subset executes; nested collections and
        # record elements refuse naming the array-column rewrite
        mv = re.match(
            r"TYPE\s+(?P<t>\w+)\s+IS\s+"
            r"(?:VARRAY\s*\(\s*(?P<n>\d+)\s*\)|TABLE)\s+OF\s+"
            r"(?P<et>\w+(?:\s+\w+)?"
            r"(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if mv:
            et = mv.group("et").strip()
            if (et.lower() in runner.coll_types
                    or et.lower() in getattr(runner, "record_types", {})):
                raise NotImplementedError(
                    "nested collection / record-element VARRAYs — "
                    "model multi-level data as ARRAY columns in a "
                    "relation (multimodal/array column pattern) or "
                    "flatten to parallel 1-D collections"
                )
            cap = int(mv.group("n")) if mv.group("n") else None
            runner.coll_types[mv.group("t").lower()] = (cap, et)
            continue
        # v tbl.col%TYPE — pl_comp.cpp plpgsql_parse_cwordtype: the
        # declared type IS the referenced column's type, resolvable
        # here because the runner holds the engine's catalog
        mt = re.match(
            r"(?P<v>\w+)\s+(?P<tbl>\w+)\.(?P<col>\w+)\s*%\s*TYPE"
            r"(?:\s*:=\s*(?P<e>.+))?$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if mt:
            tbl, col = mt.group("tbl").lower(), mt.group("col").lower()
            try:
                field = next(
                    f for f in runner.engine.spark.table(tbl).schema
                    if f.name.lower() == col
                )
            except Exception:
                raise KeyError(
                    f"DO block: %TYPE reference {tbl}.{col} does not "
                    "resolve to a known column"
                ) from None
            v = mt.group("v").lower()
            if mt.group("e") is None:
                runner.env[v] = None
            else:
                runner.env[v] = runner._eval_scalar(
                    "SELECT CAST(("
                    + _subst_values(mt.group("e"), runner.env)
                    + f") AS {field.dataType.simpleString()})"
                )
            continue
        m = re.match(
            r"(?P<v>\w+)\s+(?P<t>\w+(?:\s+\w+)?"
            r"(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
            r"(?:\s*:=\s*(?P<e>.+))?$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"DO block: cannot parse declaration {stmt!r}")
        v = m.group("v").lower()
        tname = m.group("t").strip().lower()
        if tname in runner.coll_types:
            cap, et = runner.coll_types[tname]
            arr = _Varray(cap, et)
            init = m.group("e")
            if init is not None:
                mi = re.match(rf"^{tname}\s*\((?P<a>.*)\)\s*$",
                              init.strip(), re.IGNORECASE | re.DOTALL)
                if not mi:
                    raise NotImplementedError(
                        "collection initializers use the constructor "
                        "form t(e1, e2, ...)"
                    )
                for a in _split_call_args(mi.group("a")):
                    arr.append(runner._eval_scalar(
                        "SELECT CAST(("
                        + _subst_values(a, runner.env)
                        + f") AS {_map_type(et)})"
                    ))
                if cap is not None and len(arr) > cap:
                    raise ValueError(
                        "collection initializer exceeds the declared "
                        "VARRAY capacity"
                    )
            runner.env[v] = arr
            continue
        if v == "found":
            runner._found_shadowed = True
        if m.group("e") is None:
            runner.env[v] = None
        else:
            runner.env[v] = runner._eval_scalar(
                "SELECT CAST(("
                + _subst_values(m.group("e"), runner.env)
                + f") AS {_map_type(m.group('t'))})"
            )


def try_handle_stmt(engine, query: str):
    """Engine.sql hook: DO $$ ... $$ anonymous blocks."""
    m = _DO_RE.match(query)
    if m is None:
        return None
    from .create_function import _unquote_body

    body = _strip_comments(_unquote_body(m.group("body"), m.group("tag")))
    _scan_unsupported(_mask_strings(body), "DO block")
    md = _DECLARE_RE.match(body) or _BEGIN_RE.match(body)
    if md is None:
        raise ValueError("DO block body must be [DECLARE ...] BEGIN ... END")
    runner = _DoRunner(engine)
    if "decls" in md.groupdict() and md.groupdict().get("decls"):
        _parse_decls_values(md.group("decls"), runner)
    from .plpgsql import _split_exception

    exc = _split_exception(md.group("body"))
    if exc is not None:
        _run_with_exception_frame(engine, runner, exc[0], exc[1])
    else:
        runner.run(md.group("body"))
    rows = [("DO", runner.executed, len(runner.notices),
             "\n".join(runner.notices))]
    return engine.spark.createDataFrame(
        rows,
        "tag STRING, statements_executed INT, n_notices INT,"
        " notices STRING",
    )


# --------------------------------------------------------------------------
# EXCEPTION frames in DO blocks — pl_exec.cpp:95 exec_stmt_block's
# exception frame, with REAL rollback semantics: the reference opens a
# subtransaction and aborts it before running the handler; here the
# TableManager's commit log (the TIMECAPSULE machinery) plays the undo
# role — the frame snapshots every managed table's latest CSN at block
# entry, and an error restores each advanced table to its entry CSN
# (read_snapshot + rewrite, the same path TIMECAPSULE TABLE ... TO CSN
# uses) and drops tables the block created.  Because the DO runner
# executes driver-side, the handler dispatches on the ACTUAL runtime
# error (unlike the plpgsql compiler's static guards) and variables
# keep their pre-error values, exactly PG's semantics.  DDL beyond
# CREATE TABLE refuses inside a guarded block: ALTER marks a flashback
# barrier and DROP parks storage in the recyclebin — both put the undo
# outside the frame's reach.
# --------------------------------------------------------------------------

_EXC_CLASS_PATTERNS = [
    ("division_by_zero",
     re.compile(r"DIVIDE_BY_ZERO|division by zero|INTERVAL_DIVIDED",
                re.IGNORECASE)),
    ("invalid_text_representation",
     re.compile(r"CAST_INVALID_INPUT|CANNOT_PARSE|invalid input syntax",
                re.IGNORECASE)),
    ("numeric_value_out_of_range",
     re.compile(r"ARITHMETIC_OVERFLOW|CAST_OVERFLOW|NUMERIC_VALUE_OUT"
                r"|out of range", re.IGNORECASE)),
    ("raise_exception",
     re.compile(r"DO block RAISE EXCEPTION")),
]

_DO_EXC_CONDS = {
    "division_by_zero", "invalid_text_representation",
    "numeric_value_out_of_range", "raise_exception", "others",
}


def _classify_error(ex: BaseException) -> set[str]:
    s = str(ex)
    return {name for name, pat in _EXC_CLASS_PATTERNS if pat.search(s)}


def _parse_handlers(handlers_text: str) -> list[tuple[list[str], str]]:
    from .plpgsql import _HANDLER_WHEN

    m0 = _HANDLER_WHEN.match(handlers_text)
    if m0 is None:
        raise ValueError("DO block: EXCEPTION section without a "
                         "WHEN <condition> THEN handler")
    from .plpgsql import _norm_cond

    def _conds(m):
        return [_norm_cond(c)
                for c in re.split(r"\s+OR\s+", m.group("conds"),
                                  flags=re.IGNORECASE)]
    handlers: list[tuple[list[str], str]] = []
    conds, pos, seg_start = _conds(m0), m0.end(), m0.end()
    while pos < len(handlers_text):
        rest = handlers_text[pos:].lstrip()
        off = len(handlers_text[pos:]) - len(rest)
        mn = _HANDLER_WHEN.match(handlers_text, pos + off)
        if mn and all(c in _DO_EXC_CONDS for c in _conds(mn)):
            handlers.append((conds, handlers_text[seg_start:pos + off]))
            conds, pos = _conds(mn), mn.end()
            seg_start = pos
            continue
        _stmt, pos = _scan_stmt(handlers_text, pos + off)
    handlers.append((conds, handlers_text[seg_start:]))
    for cs, _stmts in handlers:
        bad = [c for c in cs if c not in _DO_EXC_CONDS]
        if bad:
            raise NotImplementedError(
                f"DO block EXCEPTION: condition {bad[0]!r} has no "
                "driver-side error mapping — supported: "
                + ", ".join(sorted(_DO_EXC_CONDS))
            )
    return handlers


def _run_with_exception_frame(
    engine, runner: _DoRunner, main: str, handlers_text: str
) -> None:
    handlers = _parse_handlers(handlers_text)
    if re.search(r"\b(DROP|ALTER)\s+TABLE\b|\bDROP\s+SCHEMA\b",
                 _mask_strings(main), re.IGNORECASE):
        raise NotImplementedError(
            "DO block EXCEPTION: DROP/ALTER inside a guarded block "
            "puts the undo outside the frame's reach (ALTER marks a "
            "flashback barrier; DROP parks storage in the recyclebin) "
            "— move the DDL outside the block, or guard with IF "
            "checks before it"
        )
    from .timecapsule import snapshot_csns

    entry_csn = snapshot_csns(engine)
    # inside the frame, errors must RAISE the way PG raises them:
    # non-ANSI Spark nulls a zero division / bad cast instead of
    # erroring, which would silently skip the handler — so the frame
    # runs under ANSI evaluation and restores the setting after
    # (pl_exec.cpp's guarded block is exactly the scope where PG's
    # error semantics are load-bearing)
    conf = engine.spark.conf
    prev_ansi = conf.get("spark.sql.ansi.enabled", "false")
    conf.set("spark.sql.ansi.enabled", "true")
    try:
        runner.run(main)
        return
    except _ReturnValue:  # a function's RETURN is success, not error
        raise
    except BaseException as ex:  # noqa: BLE001 — the frame's whole job
        # the subtransaction aborts BEFORE the handler search
        # (pl_exec exec_stmt_block): rollback happens whether or not
        # a handler matches, then an unmatched error re-throws
        _rollback_to(engine, entry_csn, ex)
        classes = _classify_error(ex)
        chosen = None
        for cs, stmts in handlers:
            if (classes & set(cs)) or "others" in cs:
                chosen = stmts
                break
        if chosen is None:
            raise  # no matching handler: propagate (PG re-throw)
        # SQLERRM in the handler = the actual runtime message
        # (pl_exec assigns estate->cur_error->message); first line,
        # bounded — Spark exceptions carry multi-KB stack context
        err_msg = str(ex).strip().splitlines()[0][:500]
    finally:
        conf.set("spark.sql.ansi.enabled", prev_ansi)
    runner.env["sqlerrm"] = err_msg
    runner.run(chosen)


def _rollback_to(engine, entry_csn: dict, original: BaseException) -> None:
    """Restore every managed table the block touched to its entry
    CSN — tcap_version.cpp TvRestoreVersion driven by the exception
    frame instead of a TIMECAPSULE statement (the shared restore-frame
    machinery in operators/timecapsule.py).  Tables the block created
    drop with PURGE (they never existed)."""
    from .timecapsule import restore_csns

    restore_csns(engine, entry_csn, original)


# --------------------------------------------------------------------------
# Driver gate: DO block end-to-end — conditional DDL/DML orchestration,
# the migration-script shape, vs an oracle that spells the same result
# as one query.
# --------------------------------------------------------------------------
from ..registry import query as _register_query


@_register_query(
    "do_block_stmt",
    """
    WITH hi AS (SELECT MAX(o_totalprice) AS h FROM orders)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total
    FROM orders, hi WHERE o_totalprice >= h / 2
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def do_block_stmt(spark, sf_dir):
    """DO $$ ... $$ end-to-end (DoStmt → plpgsql_inline_handler,
    pl_handler.cpp): SELECT INTO binds a driver-side scalar, an IF
    guards a CTAS parameterized by that variable, RAISE NOTICE is
    collected — then the created table is aggregated and compared to
    the oracle's single-query formulation.

    Scale: the block itself runs ONCE on the driver (that is DoStmt's
    execution model); every statement inside it is a full distributed
    operation — the CTAS is one parquet write, the aggregate one
    partial/final exchange. Nothing here is per-row."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="do_gate_")
    eng.managed_tables.root = tmp
    try:
        tag = eng.sql("""
            DO $$
            DECLARE
                hi double precision;
            BEGIN
                SELECT MAX(o_totalprice) INTO hi FROM orders;
                IF hi IS NULL THEN
                    RAISE EXCEPTION 'empty orders table';
                END IF;
                CREATE TABLE do_gate_t AS
                    SELECT o_orderstatus, o_totalprice FROM orders
                    WHERE o_totalprice >= hi / 2;
                RAISE NOTICE 'slice built';
            END;
            $$
        """).collect()[0]
        assert tag.tag == "DO" and tag.n_notices == 1
        out = eng.sql(
            "SELECT o_orderstatus, COUNT(*) AS n,"
            " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)"
            "   AS total"
            " FROM do_gate_t GROUP BY o_orderstatus ORDER BY o_orderstatus"
        )
        rows = out.collect()
        eng.sql("DROP TABLE do_gate_t PURGE")
        return spark.createDataFrame(
            [(r[0], r[1], float(r[2])) for r in rows],
            "o_orderstatus STRING, n BIGINT, total DOUBLE",
        ).select("o_orderstatus", "n", F.col("total").cast("double"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register_query(
    "do_block_for_loop",
    """
    WITH c AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS total,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders WHERE o_orderkey <= 100
    ), h AS (
      SELECT MAX(o_totalprice) AS hi
      FROM orders WHERE o_orderkey <= 50 AND o_totalprice >= 100000
    ), d AS (
      SELECT CAST(SUM(o_orderkey) AS BIGINT) AS dyn
      FROM orders, c WHERE o_orderkey <= c.cnt
    )
    SELECT ROUND(c.total, 2) AS total, c.cnt AS cnt, h.hi AS hi, d.dyn
      AS dyn
    FROM c, h, d
    """,
)
def do_block_for_loop(spark, sf_dir):
    """FOR loops in DO blocks, all three sources (pl_exec.cpp
    exec_stmt_forc bound cursors / exec_stmt_fors SELECT /
    exec_stmt_dynfors EXECUTE): a bound cursor drives two
    accumulators, a SELECT loop with a leading CONTINUE WHEN drives a
    MAX, and a ||-composed EXECUTE loop sums keys bounded by an
    earlier accumulator — each loop executes as ONE distributed
    aggregate statement (never a driver row loop), and the oracle
    recomputes all four scalars with explicit aggregates.

    Scale: DoStmt runs once on the driver; each folded loop is one
    partial/final aggregation over a pushed-down scan."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    tag = eng.sql("""
        DO $$
        DECLARE
            total DECIMAL(18,6) := 0;
            cnt BIGINT := 0;
            hi DOUBLE PRECISION := 0;
            dyn BIGINT := 0;
            c CURSOR FOR SELECT o_totalprice FROM orders
                         WHERE o_orderkey <= 100;
        BEGIN
            FOR r IN c LOOP
                total := total + r.o_totalprice;
                cnt := cnt + 1;
            END LOOP;
            FOR r IN SELECT o_totalprice AS p FROM orders
                     WHERE o_orderkey <= 50 LOOP
                CONTINUE WHEN r.p < 100000;
                hi := GREATEST(hi, r.p);
            END LOOP;
            FOR r IN EXECUTE
                'SELECT o_orderkey AS k FROM orders'
                || ' WHERE o_orderkey <= ' || cnt LOOP
                dyn := dyn + r.k;
            END LOOP;
            RAISE NOTICE 'total=% cnt=% hi=% dyn=%',
                ROUND(total, 2), cnt, hi, dyn;
        END;
        $$
    """).collect()[0]
    vals = re.fullmatch(
        r"NOTICE: total=(?P<t>[-\d.]+) cnt=(?P<c>\d+) hi=(?P<h>[-\d.]+)"
        r" dyn=(?P<d>\d+)",
        tag.notices.strip(),
    )
    return status_frame(spark, (float(vals.group("t")), int(vals.group("c")),
          float(vals.group("h")), int(vals.group("d"))), "total DOUBLE, cnt BIGINT, hi DOUBLE, dyn BIGINT",)


# --------------------------------------------------------------------------
# CREATE PROCEDURE / CALL — named DO blocks with IN parameters.
# Reference: openGauss CREATE PROCEDURE (gram.y's A-format procedure
# grammar; executed by the same plpgsql handler as DO), CALL statement.
# Procedures run ONCE per CALL on the driver, like DO — every inner
# statement is a distributed operation.
# --------------------------------------------------------------------------

_CREATE_PROC_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?PROCEDURE\s+(?P<name>\w+)\s*"
    r"\((?P<params>.*?)\)\s*"
    r"(?:AS|IS)\s+(?P<body>\$(?P<tag>\w*)\$.*?\$(?P=tag)\$|.+?END\s*;?)"
    r"(?:\s+LANGUAGE\s+PLPGSQL)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CALL_RE = re.compile(
    r"^\s*CALL\s+(?P<name>\w+)\s*\((?P<args>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_PROC_RE = re.compile(
    r"^\s*DROP\s+PROCEDURE\s+(?:IF\s+EXISTS\s+)?(?P<name>\w+)"
    r"\s*(?:\(.*?\))?\s*;?\s*$",
    re.IGNORECASE,
)


def _split_call_args(args: str) -> list[str]:
    """Paren- and quote-aware top-level comma split of a CALL arg list."""
    out, depth, cur, in_str = [], 0, [], False
    for ch in args:
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur))
    return [a.strip() for a in out]


def try_handle_procedure(engine, query: str):
    """Engine.sql hook: CREATE PROCEDURE / CALL / DROP PROCEDURE."""
    if not hasattr(engine, "procedures"):
        engine.procedures = {}
    m = _CREATE_PROC_RE.match(query)
    if m:
        from .create_function import _split_params, _unquote_body

        raw = m.group("body")
        body = (
            _unquote_body(raw, m.group("tag"))
            if raw.startswith("$") else raw
        )
        body = _strip_comments(body)
        _scan_unsupported(_mask_strings(body), "procedure")
        params = []
        for pname, ptype in _split_params(m.group("params")):
            # both orders parse: PG's 'IN name type' (the mode lands
            # in the NAME slot) and A-format's 'name IN type' (the
            # mode leads the TYPE slot)
            if pname.upper() in ("IN", "OUT", "INOUT"):
                pmode = pname.lower()
                parts = ptype.split(None, 1)
                if len(parts) != 2:
                    raise ValueError(
                        f"procedure parameter {ptype!r} needs a name "
                        "and a type"
                    )
                pname, ptype = parts
            else:
                mode = re.match(r"^(IN|OUT|INOUT)\s+(.*)$", ptype,
                                re.IGNORECASE)
                pmode = mode.group(1).lower() if mode else "in"
                if mode:
                    ptype = mode.group(2)
            params.append((pname.lower(), ptype, pmode))
        name = m.group("name").lower()
        engine.procedures[name] = (params, body)
        return status_frame(engine.spark, ("CREATE PROCEDURE", name), "tag STRING, procedure STRING")
    m = _CALL_RE.match(query)
    if m:
        name = m.group("name").lower()
        if name not in engine.procedures:
            raise KeyError(f"CALL: procedure {name!r} does not exist")
        params, body = engine.procedures[name]
        arg_texts = _split_call_args(m.group("args"))
        if len(arg_texts) != len(params):
            raise ValueError(
                f"CALL {name}: expected {len(params)} argument(s), "
                f"got {len(arg_texts)}"
            )
        runner = _DoRunner(engine)
        for (pname, ptype, pmode), atext in zip(params, arg_texts):
            if pmode == "out":
                # pl_exec.cpp exec_stmt_call: OUT slots start NULL —
                # the call-site placeholder (NULL / a client variable
                # name) is never evaluated
                runner.env[pname] = None
            else:
                runner.env[pname] = runner._eval_scalar(
                    f"SELECT CAST(({atext}) AS {_map_type(ptype)})"
                )
        md = _DECLARE_RE.match(body) or _BEGIN_RE.match(body)
        if md is None:
            raise ValueError(
                "procedure body must be [DECLARE ...] BEGIN ... END"
            )
        if "decls" in md.groupdict() and md.groupdict().get("decls"):
            _parse_decls_values(md.group("decls"), runner)
        from .plpgsql import _split_exception

        exc = _split_exception(md.group("body"))
        if exc is not None:
            _run_with_exception_frame(engine, runner, exc[0], exc[1])
        else:
            runner.run(md.group("body"))
        outs = [(p, t) for p, t, mode in params if mode != "in"]
        if outs:
            # hw_func_return_out.sql: OUT/INOUT values ARE the CALL
            # result — one row, one typed column per OUT param in
            # declaration order (psql renders exactly this frame)
            cols = ", ".join(
                f"CAST({_sql_literal(runner.env.get(p))} "
                f"AS {_map_type(t)}) AS {p}"
                for p, t in outs
            )
            # inline-VALUES anchor → LocalRelation fold, no job on
            # materialization (the _util.status_frame convention)
            return engine.spark.sql(
                f"SELECT {cols} FROM VALUES (0) AS __onerow(__z)"
            )
        return status_frame(engine.spark, ("CALL", name, runner.executed, len(runner.notices),
              "\n".join(runner.notices)), "tag STRING, procedure STRING, statements_executed INT,"
            " n_notices INT, notices STRING",)
    m = _DROP_PROC_RE.match(query)
    if m:
        name = m.group("name").lower()
        existed = engine.procedures.pop(name, None) is not None
        if not existed and not re.search(r"IF\s+EXISTS", query,
                                         re.IGNORECASE):
            raise KeyError(f"DROP PROCEDURE: {name!r} does not exist")
        return status_frame(engine.spark, ("DROP PROCEDURE", name, existed), "tag STRING, procedure STRING, existed BOOLEAN",)
    return None


# --------------------------------------------------------------------------
# Interpreted plpgsql FUNCTIONs — dynamic EXECUTE inside CREATE
# FUNCTION bodies (pl_exec.cpp:139 exec_stmt_dynexecute, the same
# literal-derived subset the DO/procedure path compiles).  A body with
# EXECUTE cannot inline as a SQL macro — the engine cannot see the SQL
# until the call composes it — but it CAN run exactly the way DO
# blocks and procedures run: once per call on the driver, each inner
# statement a distributed plan.  Such functions register as
# INTERPRETED; ``RETURN <expr>`` delivers the scalar result through a
# control-flow signal.  Call sites are TOP-LEVEL scalar invocations
# (SELECT fn(args) with driver-evaluable arguments); per-row
# invocation over a relation refuses — a per-call driver loop over
# rows is the anti-pattern the compiled path exists to avoid.
# --------------------------------------------------------------------------


class _ReturnValue(Exception):
    """Control-flow signal: a function body executed RETURN."""

    def __init__(self, value):
        self.value = value


class _FnRunner(_DoRunner):
    """_DoRunner + RETURN (pl_exec.cpp exec_stmt_return): evaluates
    the expression against the current env and unwinds — IF branches
    and exception frames propagate the signal naturally."""

    def _exec_stmt(self, stmt: str) -> None:
        m = re.match(r"RETURN(?:\s+(?P<e>.+))?\s*$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if m:
            e = (m.group("e") or "").strip()
            raise _ReturnValue(
                None if not e else self._eval_scalar(
                    "SELECT " + _subst_values(e, self.env)
                )
            )
        super()._exec_stmt(stmt)


class _SetofRunner(_FnRunner):
    """_FnRunner + RETURN QUERY [EXECUTE] / RETURN NEXT
    (pl_exec.cpp exec_stmt_return_query :3585 / exec_stmt_return_next
    :3334): result frames accumulate as DataFrames — each RETURN
    QUERY is a full distributed plan (the dynamic EXECUTE form
    composes its text by the literal-derived rule first), RETURN NEXT
    is a one-row frame, and a bare RETURN ends execution."""

    def __init__(self, engine):
        super().__init__(engine)
        self.frames: list = []

    def _exec_stmt(self, stmt: str) -> None:
        m = re.match(r"RETURN\s+QUERY\s+(?P<rest>.+)$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if m:
            rest = m.group("rest")
            mex = re.match(r"EXECUTE\s+(?P<e>.+)$", rest,
                           re.IGNORECASE | re.DOTALL)
            if mex:
                sql, into_m, _using = self._parse_dynexecute(
                    mex.group("e")
                )
                if into_m:
                    raise ValueError(
                        "RETURN QUERY EXECUTE does not take INTO"
                    )
            else:
                sql = _subst_values(rest, self.env)
            self.frames.append(self.engine.sql(sql))
            self.executed += 1
            return
        m = re.match(r"RETURN\s+NEXT\s+(?P<e>.+)$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if m:
            self.frames.append(self.engine.sql(
                "SELECT " + _subst_values(m.group("e"), self.env)
            ))
            self.executed += 1
            return
        super()._exec_stmt(stmt)


def register_interpreted_plfn(engine, name: str, params, ret_type: str,
                              body: str, kind: str = "scalar") -> None:
    """Catalog an EXECUTE/cursor-bearing plpgsql function for
    interpreted execution — ``kind`` 'scalar' (RETURN <expr> through
    _FnRunner) or 'setof' (RETURN QUERY [EXECUTE]/RETURN NEXT frames
    through _SetofRunner).  Validates the body against the DO-block
    statement subset up front, so CREATE fails fast."""
    scan = re.sub(
        r"\bRETURN\s+(?:QUERY|NEXT)\b", " ", _mask_strings(body),
        flags=re.IGNORECASE,
    )
    _scan_unsupported(scan, "plpgsql function")
    if not hasattr(engine, "plfn_interpreted"):
        engine.plfn_interpreted = {}
    # CREATE OR REPLACE over a previously COMPILED function: drop the
    # stale Spark macro so no call site resolves the old body
    if name in getattr(engine, "sql_functions", {}):
        engine.sql_functions.pop(name, None)
        engine.spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
    engine.plfn_interpreted[name] = (params, ret_type, body, kind)


_FNCALL_RE = re.compile(
    r"^\s*SELECT\s+(?P<name>\w+)\s*\((?P<args>.*)\)\s*"
    r"(?:AS\s+(?P<alias>\w+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _bind_and_run(engine, runner, params, arg_texts, body) -> None:
    """Shared call protocol: evaluate + CAST each argument into the
    runner's env, parse declarations, and run the body (under an
    exception frame when one is declared)."""
    if len(arg_texts) != len(params):
        raise ValueError(
            f"expected {len(params)} argument(s), got {len(arg_texts)}"
        )
    for (pname, ptype), atext in zip(params, arg_texts):
        runner.env[pname.lower()] = runner._eval_scalar(
            f"SELECT CAST(({atext}) AS {_map_type(ptype)})"
        )
    md = _DECLARE_RE.match(body) or _BEGIN_RE.match(body)
    if md is None:
        raise ValueError(
            "plpgsql body must be [DECLARE ...] BEGIN ... END"
        )
    if "decls" in md.groupdict() and md.groupdict().get("decls"):
        _parse_decls_values(md.group("decls"), runner)
    from .plpgsql import _split_exception

    exc = _split_exception(md.group("body"))
    if exc is not None:
        _run_with_exception_frame(engine, runner, exc[0], exc[1])
    else:
        runner.run(md.group("body"))


def _setof_target(engine, name: str, ret: str) -> list[tuple[str, str]]:
    """Declared output columns [(name, spark_type)] for a SETOF /
    TABLE(...) return spec — PG's positional mapping rule."""
    mt = re.match(r"^TABLE\s*\((?P<tc>.*)\)\s*$", ret,
                  re.IGNORECASE | re.DOTALL)
    if mt:
        return [(n.lower(), _map_type(t))
                for n, t in _split_params(mt.group("tc"))]
    ms = re.match(r"^SETOF\s+(?P<t>\w+)\s*$", ret, re.IGNORECASE)
    base = ms.group("t").lower() if ms else None
    try:
        df = engine.table(base)
        return [(f.name, f.dataType.simpleString()) for f in df.schema]
    except Exception:
        # SETOF <scalar>: one column named after the function (PG)
        return [(name, _map_type(base))]


def _run_setof(engine, name: str, arg_texts: list):
    """Evaluate a SETOF interpreted function: run the body, union the
    RETURN QUERY/NEXT frames, map positionally onto the declared
    columns (cast + rename)."""
    params, ret, body, _kind = engine.plfn_interpreted[name]
    runner = _SetofRunner(engine)
    try:
        _bind_and_run(engine, runner, params, arg_texts, body)
    except _ReturnValue:
        pass
    target = _setof_target(engine, name, ret.strip())
    ddl = ", ".join(f"{n} {t}" for n, t in target)
    if not runner.frames:
        return engine.spark.createDataFrame([], ddl)
    from pyspark.sql import functions as F

    out = None
    for fr in runner.frames:
        if len(fr.columns) != len(target):
            raise ValueError(
                f"{name}: RETURN QUERY/NEXT yields "
                f"{len(fr.columns)} column(s) for {len(target)} "
                "declared"
            )
        mapped = fr.select(*[
            F.col(c).cast(t).alias(n)
            for c, (n, t) in zip(fr.columns, target)
        ])
        out = mapped if out is None else out.unionByName(mapped)
    return out


_SETOF_CALL = re.compile(
    r"\b(?P<kw>FROM|JOIN)\s+(?P<name>\w+)\s*\(", re.IGNORECASE
)


def try_handle_fncall(engine, query: str):
    """Engine.sql hook for interpreted plpgsql functions: top-level
    scalar calls (SELECT fn(args)) and FROM-position SETOF calls
    (SELECT ... FROM fn(args) ...), which evaluate into a temp view
    and re-enter the statement pipeline.  Returns None for anything
    else — including calls to ordinary (compiled/Spark) functions,
    which keep their plan-time path."""
    fns = getattr(engine, "plfn_interpreted", None)
    if not fns:
        return None
    masked = _mask_strings(query)
    for mm in _SETOF_CALL.finditer(masked):
        fname = mm.group("name").lower()
        entry = fns.get(fname)
        if entry is None or entry[3] != "setof":
            continue
        op = masked.index("(", mm.end() - 1)
        depth, cl = 0, -1
        for i in range(op, len(masked)):
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
                if depth == 0:
                    cl = i
                    break
        if cl < 0:
            raise ValueError(f"{fname}: unbalanced call parentheses")
        args = [a for a in _split_call_args(query[op + 1:cl])
                if a.strip()]
        df = _run_setof(engine, fname, args)
        view = f"__setof_{fname}_{abs(hash(query)) % 10**8}"
        df.createOrReplaceTempView(view)
        new_q = (query[:mm.start()] + mm.group("kw") + " " + view
                 + query[cl + 1:])
        return engine.sql(new_q)
    m = _FNCALL_RE.match(query)
    if (m is None or m.group("name").lower() not in fns
            or fns[m.group("name").lower()][3] != "scalar"):
        # a per-row or nested use of an interpreted function cannot
        # run as a driver call — refuse with the rewrite named
        for fname, entry in fns.items():
            if entry[3] == "scalar" and re.search(
                rf"\b{re.escape(fname)}\s*\(", masked, re.IGNORECASE,
            ):
                raise NotImplementedError(
                    f"{fname} contains dynamic EXECUTE and runs "
                    "interpreted (operators/do_block.py): call it as "
                    f"a top-level scalar — SELECT {fname}(...) — or "
                    "rewrite the body without EXECUTE so it compiles "
                    "into the calling plan"
                )
        return None
    name = m.group("name").lower()
    params, ret_type, body, _kind = fns[name]
    arg_texts = [a for a in _split_call_args(m.group("args"))
                 if a.strip()]
    runner = _FnRunner(engine)
    val = None
    try:
        _bind_and_run(engine, runner, params, arg_texts, body)
    except _ReturnValue as rv:
        val = rv.value
    alias = (m.group("alias") or name).lower()
    return engine.spark.sql(
        f"SELECT CAST({_sql_literal(val)} AS {_map_type(ret_type)}) "
        f"AS {alias} FROM VALUES (0) AS __onerow(__z)"
    )


@_register_query(
    "call_procedure_stmt",
    """
    WITH hi AS (
      SELECT MAX(o_totalprice) AS h FROM orders WHERE o_orderkey <= 500
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total
    FROM orders, hi
    WHERE o_orderkey <= 500 AND o_totalprice >= h * 0.5
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def call_procedure_stmt(spark, sf_dir):
    """CREATE PROCEDURE / CALL end-to-end (openGauss A-format
    procedures, the same plpgsql inline handler as DO): a procedure
    with IN parameters computes a bound from the data (SELECT INTO),
    guards it, and CTASes a parameterized slice; CALL binds the
    arguments and the created table aggregates against the oracle's
    single-query formulation.

    Scale: the procedure body runs ONCE per CALL on the driver; the
    CTAS inside is one distributed write, the aggregate one
    partial/final exchange — nothing per-row."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="call_gate_")
    eng.managed_tables.root = tmp
    try:
        eng.sql("""
            CREATE PROCEDURE build_top_slice(maxkey bigint, frac double)
            AS $$
            DECLARE
                hi double precision;
            BEGIN
                SELECT MAX(o_totalprice) INTO hi FROM orders
                    WHERE o_orderkey <= maxkey;
                IF hi IS NULL THEN
                    RAISE EXCEPTION 'empty slice';
                END IF;
                CREATE TABLE call_gate_t AS
                    SELECT o_orderstatus, o_totalprice FROM orders
                    WHERE o_orderkey <= maxkey
                      AND o_totalprice >= hi * frac;
                RAISE NOTICE 'built';
            END;
            $$
        """)
        tag = eng.sql("CALL build_top_slice(500, 0.5)").collect()[0]
        assert tag.tag == "CALL" and tag.n_notices == 1
        out = eng.sql(
            "SELECT o_orderstatus, COUNT(*) AS n,"
            " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)"
            "   AS total"
            " FROM call_gate_t GROUP BY o_orderstatus"
            " ORDER BY o_orderstatus"
        )
        rows = out.collect()
        eng.sql("DROP TABLE call_gate_t PURGE")
        eng.sql("DROP PROCEDURE build_top_slice")
        return spark.createDataFrame(
            [(r[0], r[1], float(r[2])) for r in rows],
            "o_orderstatus STRING, n BIGINT, total DOUBLE",
        ).select("o_orderstatus", "n", F.col("total").cast("double"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register_query(
    "call_out_params",
    """
    SELECT CAST(10.0 + MAX(o_totalprice) AS DOUBLE) AS acc,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders WHERE o_orderkey <= 500
    """,
)
def call_out_params(spark, sf_dir):
    """OUT/INOUT procedure parameters (hw_func_return_out.sql;
    pl_exec.cpp exec_stmt_call's output tuple): CALL returns the
    OUT/INOUT values as its result frame — one row, one typed column
    per OUT param in declaration order, exactly the frame psql
    renders.  The INOUT slot starts from its call-site argument;
    the OUT slots start NULL and are filled by SELECT INTO.

    Scale: the body's SELECT INTOs are distributed aggregates; only
    the final scalars return to the driver."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql("""
        CREATE PROCEDURE gate_out_stats(
            IN lim int, INOUT acc double,
            OUT n_orders bigint, OUT max_price double) AS $$
        BEGIN
            SELECT COUNT(*) INTO n_orders FROM orders
                WHERE o_orderkey <= lim;
            SELECT MAX(o_totalprice) INTO max_price FROM orders
                WHERE o_orderkey <= lim;
            acc := acc + max_price;
        END;
        $$
    """)
    out = eng.sql("CALL gate_out_stats(500, 10.0, NULL, NULL)")
    eng.sql("DROP PROCEDURE gate_out_stats")
    return pin_schema(out, "acc DOUBLE, n_orders BIGINT, max_price DOUBLE")


@_register_query(
    "do_block_dynexecute",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS top
    FROM orders
    WHERE o_totalprice >= 100000.0 AND o_orderkey % 2 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def do_block_dynexecute(spark, sf_dir):
    """Dynamic EXECUTE end-to-end (pl_exec.cpp:139
    exec_stmt_dynexecute; regress dynamic-SQL suites): a DO block
    composes a CTAS from format(%I/%L), reads a count back through
    EXECUTE ... INTO STRICT over a ||-composed string, refines the
    table through EXECUTE ... USING ($1 parameter binding), and the
    final aggregate is compared to the oracle's single-query
    formulation of the same math.

    Scale: EXECUTE is string composition on the driver; every
    composed statement is a full distributed operation through the
    ordinary Engine.sql path — the dynamic-ness costs nothing at
    plan time."""
    import shutil
    import tempfile

    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="dynexec_gate_")
    eng.managed_tables.root = tmp
    try:
        tag = eng.sql("""
            DO $$
            DECLARE
                tname text := 'dyn_gate_t';
                thresh double precision := 100000.0;
                cnt bigint;
            BEGIN
                EXECUTE format('CREATE TABLE %I AS SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice >= %L', tname, thresh);
                EXECUTE 'SELECT COUNT(*) FROM ' || tname
                    INTO STRICT cnt;
                IF cnt = 0 THEN
                    RAISE EXCEPTION 'empty slice';
                END IF;
                EXECUTE format(
                    'DELETE FROM %I WHERE o_orderkey %% 2 <> $1',
                    tname) USING 0;
            END;
            $$
        """).collect()[0]
        assert tag.tag == "DO"
        out = eng.sql(
            "SELECT o_orderstatus, COUNT(*) AS n,"
            " CAST(MAX(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS top"
            " FROM dyn_gate_t"
            " GROUP BY o_orderstatus ORDER BY o_orderstatus"
        )
        rows = out.collect()
        eng.sql("DROP TABLE dyn_gate_t PURGE")
        return spark.createDataFrame(
            rows, "o_orderstatus STRING, n BIGINT, top DOUBLE"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register_query(
    "do_block_exception_rollback",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total
    FROM orders WHERE o_orderkey <= 2000
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'ROLLBACK' AS o_orderstatus, CAST(1 AS BIGINT) AS n,
           CAST(-1.0 AS DOUBLE) AS total
    ORDER BY o_orderstatus
    """,
)
def do_block_exception_rollback(spark, sf_dir):
    """EXCEPTION frame rollback end-to-end (pl_exec.cpp:95
    exec_stmt_block's subtransaction abort): the guarded block doubles
    every price in a working table and then fails; the frame restores
    the table to its entry CSN through the TIMECAPSULE commit log and
    the handler appends one sentinel row — so the final aggregate
    equals the UNTOUCHED entry state plus the sentinel, which is
    exactly what the oracle states over the pristine source.

    Scale: the rollback cost is one snapshot rewrite of the touched
    table (the same copy-on-write move every UPDATE already makes),
    driven by manifest metadata — no undo log, no row-level locks."""
    import shutil
    import tempfile

    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="excframe_gate_")
    eng.managed_tables.root = tmp
    try:
        eng.sql(
            "CREATE TABLE exc_gate_t AS SELECT o_orderkey,"
            " o_orderstatus, CAST(o_totalprice AS DOUBLE) AS"
            " o_totalprice FROM orders WHERE o_orderkey <= 2000"
        )
        tag = eng.sql("""
            DO $$
            DECLARE denom bigint := 0; junk double precision;
            BEGIN
                UPDATE exc_gate_t SET o_totalprice = o_totalprice * 2;
                DELETE FROM exc_gate_t WHERE o_orderstatus = 'O';
                junk := 1 / denom;
            EXCEPTION WHEN division_by_zero THEN
                INSERT INTO exc_gate_t SELECT -1, 'ROLLBACK', -1.0;
            END;
            $$
        """).collect()[0]
        assert tag.tag == "DO"
        out = eng.sql(
            "SELECT o_orderstatus, COUNT(*) AS n,"
            " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)"
            " AS total FROM exc_gate_t"
            " GROUP BY o_orderstatus ORDER BY o_orderstatus"
        )
        rows = out.collect()
        eng.sql("DROP TABLE exc_gate_t PURGE")
        return spark.createDataFrame(
            rows, "o_orderstatus STRING, n BIGINT, total DOUBLE"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register_query(
    "plpgsql_cursor_fetch",
    """
    WITH ks AS (SELECT CAST(r_regionkey AS INT) AS k FROM region),
    top2 AS (
      SELECT k,
             (SELECT CAST(s_acctbal AS DOUBLE) FROM supplier
              WHERE s_nationkey = k
              ORDER BY s_acctbal DESC, s_suppkey LIMIT 1) AS a,
             (SELECT CAST(s_acctbal AS DOUBLE) FROM supplier
              WHERE s_nationkey = k
              ORDER BY s_acctbal DESC, s_suppkey LIMIT 1 OFFSET 1)
               AS b,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier
              WHERE s_nationkey = k) AS n
      FROM ks
    )
    SELECT k, COALESCE(a, 0.0) + COALESCE(b, 0.0) AS top2_bal,
           n AS n_sup
    FROM top2 ORDER BY k
    """,
)
def plpgsql_cursor_fetch(spark, sf_dir):
    """OPEN/FETCH/CLOSE cursors inside plpgsql function bodies
    (pl_exec.cpp exec_stmt_open/fetch/close — the r9 verdict's
    missing-item cursors half): straight-line FETCHes bind the top-2
    rows of an ORDER BY cursor (protocol-sized, the psql pagination
    shape), and the canonical ``LOOP FETCH ...; EXIT WHEN NOT FOUND``
    loop compiles to ONE bound-cursor FOR aggregate — the driver
    never iterates rows.

    Scale: OPEN is lazy (no job until the first FETCH), FETCHes
    consume a doubling take() buffer (incremental partition scan —
    protocol-sized fetch sequences read only leading partitions), and
    the fetch LOOP is a distributed aggregate — identical plan to the
    FOR loop it desugars into."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql("""
        CREATE FUNCTION gate_cur_top2(k int) RETURNS double precision
        AS $$
        DECLARE c CURSOR FOR SELECT CAST(s_acctbal AS DOUBLE) AS b
                 FROM supplier WHERE s_nationkey = k
                 ORDER BY s_acctbal DESC, s_suppkey;
                a double precision; b double precision;
        BEGIN
            OPEN c;
            FETCH c INTO a;
            FETCH c INTO b;
            CLOSE c;
            RETURN coalesce(a, 0) + coalesce(b, 0);
        END $$ LANGUAGE plpgsql
    """)
    eng.sql("""
        CREATE FUNCTION gate_cur_count(k int) RETURNS bigint AS $$
        DECLARE c CURSOR FOR SELECT s_suppkey FROM supplier
                 WHERE s_nationkey = k;
                sk bigint; n bigint := 0;
        BEGIN
            OPEN c;
            LOOP
                FETCH c INTO sk;
                EXIT WHEN NOT FOUND;
                n := n + 1;
            END LOOP;
            CLOSE c;
            RETURN n;
        END $$ LANGUAGE plpgsql
    """)
    rows = []
    for k in range(5):
        t2 = eng.sql(f"SELECT gate_cur_top2({k}) AS v").collect()[0].v
        n = eng.sql(f"SELECT gate_cur_count({k}) AS v").collect()[0].v
        rows.append((k, float(t2), int(n)))
    eng.sql("DROP FUNCTION gate_cur_top2")
    eng.sql("DROP FUNCTION gate_cur_count")
    return spark.createDataFrame(
        rows, "k INT, top2_bal DOUBLE, n_sup BIGINT"
    )


@_register_query(
    "plpgsql_setof_dynexecute",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS nm
    FROM nation WHERE n_regionkey = 1
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS k, 'SENTINEL' AS nm
    ORDER BY k
    """,
)
def plpgsql_setof_dynexecute(spark, sf_dir):
    """RETURN QUERY EXECUTE in SETOF/TABLE plpgsql functions
    (pl_exec.cpp exec_stmt_return_query :3585 composing
    exec_stmt_dynexecute's literal-derived text; the reference's
    dynamic table-function idiom): the function registers INTERPRETED,
    a FROM-position call evaluates the body — the format()-composed
    statement runs as one distributed plan, RETURN NEXT appends a
    sentinel frame — and the union maps positionally onto the
    declared TABLE columns.

    Scale: the call site view-substitutes and re-enters the
    statement pipeline, so the function's rows join/aggregate like
    any relation; nothing materializes driver-side."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql("""
        CREATE FUNCTION gate_dyn_setof(tbl text, reg int)
        RETURNS TABLE(k bigint, nm text) AS $$
        BEGIN
            RETURN QUERY EXECUTE format(
 'SELECT n_nationkey, n_name FROM %I WHERE n_regionkey = $1', tbl)
                USING reg;
            RETURN NEXT CAST(-1 AS BIGINT), 'SENTINEL';
        END $$ LANGUAGE plpgsql
    """)
    out = eng.sql(
        "SELECT k, nm FROM gate_dyn_setof('nation', 1) ORDER BY k"
    )
    eng.sql("DROP FUNCTION gate_dyn_setof")
    return pin_schema(out, "k BIGINT, nm STRING")
