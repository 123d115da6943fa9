"""Oracle/PG SQL-compat translation — the reference's compat-parser layer.

openGauss accepts Oracle dialect on top of PG (A_FORMAT compatibility:
`src/common/backend/parser/parse_compatibility.cpp`); the pieces Spark
SQL does not already speak are translated here:

  * `ROWNUM <= n` / `ROWNUM < n` top-level filters → `LIMIT` — the
    reference does this rewrite in the planner
    (`src/gausskernel/optimizer/prep/preprownum.cpp`) ONLY when the
    query block has no sortClause, because Oracle assigns ROWNUM before
    ORDER BY. When an ORDER BY is present in the same block we preserve
    Oracle semantics by limiting first in a derived table and sorting
    the limited rows: `SELECT * FROM (<query> LIMIT n) ORDER BY ...`.
  * `FROM dual` → removed (Spark allows SELECT without FROM).
  * `SYSDATE` → `current_timestamp()`.

Everything else Oracle-ish is native in Spark 4 (`MINUS`, `nvl`,
`nvl2`, `decode`, `::` casts) or registered under its PG name by
functions/pg_compat.py. The translator is conservative on purpose: only
whole-clause tail patterns are rewritten, matching preprownum.cpp's
"simple filter" scope; anything it does not recognize passes through
untouched for Spark's parser to judge.
"""

from __future__ import annotations

import re

_FROM_DUAL = re.compile(r"\bfrom\s+dual\b", re.IGNORECASE)
_SYSDATE = re.compile(r"\bsysdate\b", re.IGNORECASE)

# datavec's vector distance operators (datavec--0.7.2.sql:172-187:
# <-> l2, <#> negative inner product for index order, <=> cosine,
# <+> l1) between simple operands: a column reference or a quoted
# pgvector literal '[1,2,3]'. Conservative on purpose — compound
# expressions pass through for Spark's parser to reject loudly rather
# than be half-rewritten.
_VEC_OPERAND = r"(?:'\[[^\]']*\]'|[A-Za-z_][A-Za-z0-9_.]*)"
_VEC_OP = re.compile(
    rf"(?P<a>{_VEC_OPERAND})\s*(?P<op><->|<#>|<=>|<\+>)\s*"
    rf"(?P<b>{_VEC_OPERAND})"
)
_VEC_FNS = {
    "<->": "l2_distance",
    "<#>": "neg_inner_product",
    "<=>": "cosine_distance",
    "<+>": "l1_distance",
}
_VEC_LIT = re.compile(r"^'\[(?P<body>[^\]']*)\]'$")


def _vec_operand_sql(tok: str) -> str:
    m = _VEC_LIT.match(tok)
    if m:
        return f"array({m.group('body')})"
    return f"CAST({tok} AS ARRAY<DOUBLE>)"


def _rewrite_vector_ops(sql: str) -> str:
    def sub(m: re.Match) -> str:
        fn = _VEC_FNS[m.group("op")]
        a = _vec_operand_sql(m.group("a"))
        b = _vec_operand_sql(m.group("b"))
        if fn == "neg_inner_product":
            return f"(-inner_product({a}, {b}))"
        return f"{fn}({a}, {b})"

    return _VEC_OP.sub(sub, sql)

# `WHERE ROWNUM <= n` (whole clause) or `AND ROWNUM <= n` (tail of a
# larger WHERE), optionally followed by the block's ORDER BY, at the end
# of the statement.
_ROWNUM_TAIL = re.compile(
    r"(?P<kw>\bwhere\b|\band\b)\s+rownum\s*(?P<op><=|<)\s*(?P<n>\d+)"
    r"(?P<order>\s+order\s+by\s+[^;]*?)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def translate(sql: str) -> str:
    """Rewrite the supported Oracle-compat constructs into Spark SQL."""
    out = _FROM_DUAL.sub("", sql)
    out = _SYSDATE.sub("current_timestamp()", out)
    out = _rewrite_vector_ops(out)

    m = _ROWNUM_TAIL.search(out)
    if m:
        n = int(m.group("n"))
        if m.group("op") == "<":
            n -= 1
        order = m.group("order") or ""
        # for an `AND ROWNUM...` tail the preceding predicates (and their
        # WHERE) stay; for a whole `WHERE ROWNUM...` clause the WHERE
        # goes too.
        body = out[: m.start()].strip()
        if order:
            # Oracle assigns ROWNUM BEFORE ORDER BY of the same block
            # (preprownum.cpp refuses the plain-LIMIT rewrite when a
            # sortClause exists): limit first, then sort the n rows.
            out = f"SELECT * FROM ({body} LIMIT {n}) {order.strip()}"
        else:
            out = f"{body} LIMIT {n}"
    return out
