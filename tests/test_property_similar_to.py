"""Property test for the SIMILAR TO rewrite (similar_to_escape,
adt/regexp.cpp): random patterns over the operator's metacharacter set
— %, _, |, *, +, ?, parens, character classes, backslash escapes, and
embedded SQL-escaped quotes — go through the FULL statement pipeline
(SQL-literal quoting → translate()'s masking → regex building → Spark
string-literal escaping) and the extracted regex must agree with a
reference translator written directly from the PG documentation over
the RAW Python strings.  The two paths share no code: the pipeline's
masking/unescape/re-escape layers are exactly where the r10 ADVICE
found the '' collapse bug, and DuckDB cannot serve as the oracle here
(its SIMILAR TO treats the pattern as a plain POSIX regex — '%' does
not match 'a' there)."""

from __future__ import annotations

import re

import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from opengauss_vectordb_spark.functions.sql_compat import translate

_PIECES = ["a", "b", "c", "%", "_", "|", "*", "+", "?", "(", ")",
           "[ab]", "\\%", "\\_", "'", "."]

patterns = st.lists(
    st.sampled_from(_PIECES), min_size=1, max_size=6
).map("".join)
texts = st.lists(
    st.sampled_from(["a", "b", "c", "'", ".", "x"]),
    min_size=0, max_size=5,
).map("".join)


def _reference_regex(pat: str) -> str:
    """similar_to_escape per the PG documentation, written against the
    RAW pattern string (no SQL-literal layer): % -> .*, _ -> ., a
    backslash escapes the next character, '.' is a literal dot, the
    POSIX subset (| * + ? ( ) [ ]) passes through; anchored."""
    out, i = [], 0
    while i < len(pat):
        ch = pat[i]
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch == "\\" and i + 1 < len(pat):
            out.append(re.escape(pat[i + 1]))
            i += 1
        elif ch in ".^$":
            out.append("\\" + ch)
        else:
            out.append(ch)
        i += 1
    return "^(?:" + "".join(out) + ")$"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _extract_rlike_regex(sql: str) -> str | None:
    m = re.search(r"RLIKE\s+'((?:[^']|'')*)'", sql)
    if m is None:
        return None
    lit = m.group(1)
    # reverse the Spark string-literal escaping the rewrite applied:
    # quotes were doubled AFTER backslashes were doubled
    return lit.replace("''", "'").replace("\\\\", "\\")


@settings(max_examples=400, deadline=None)
@given(text=texts, pat=patterns)
def test_similar_to_pipeline_matches_reference(text, pat):
    try:
        ref = re.compile(_reference_regex(pat))
    except re.error:
        assume(False)  # unbalanced parens etc. — invalid SIMILAR TO too
    stmt = f"SELECT {_sql_quote(text)} SIMILAR TO {_sql_quote(pat)}"
    out = translate(stmt)
    rx = _extract_rlike_regex(out)
    assert rx is not None, f"no RLIKE produced for {stmt!r}: {out!r}"
    try:
        got = re.search(rx, text) is not None
    except re.error:
        pytest.fail(f"rewrite produced invalid regex {rx!r} for {pat!r}")
    expected = ref.search(text) is not None
    assert got == expected, (
        f"text={text!r} pattern={pat!r}: pipeline regex {rx!r} -> "
        f"{got}, reference -> {expected}"
    )
    # the text side must never be touched by the rewrite (operators
    # inside string literals stay inert)
    assert _sql_quote(text) in out
