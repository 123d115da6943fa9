"""Property tests for the CREATE TABLE storage-clause stripper —
pure string logic, no Spark session needed.

Contract (ddl_tables._strip_storage_clauses): openGauss storage/
distribution clauses are extracted from the statement HEAD (before a
top-level AS) into metadata; everything from the first top-level AS
onward — the CTAS body, which may itself contain WITH CTEs, casts
with AS, or string literals spelling storage clauses — passes through
byte-identical; statements without clauses are untouched."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_vectordb_spark.operators.ddl_tables import (
    _strip_storage_clauses,
)

clauses = st.lists(
    st.sampled_from([
        ("WITH (ORIENTATION = COLUMN)", {"orientation": "column"}),
        ("WITH (ORIENTATION = ROW, COMPRESSION = low)",
         {"orientation": "row", "compression": "low"}),
        ("COMPRESS", None),
        ("NOCOMPRESS", None),
        ("TABLESPACE ts1", None),
        ("DISTRIBUTE BY HASH(k)", "k"),
        ("DISTRIBUTE BY REPLICATION", None),
        ("TO GROUP ng1", None),
    ]),
    max_size=3,
    unique_by=lambda c: c[0].split()[0],  # one clause per kind
)

bodies = st.sampled_from([
    "",
    " AS SELECT 1 AS x",
    " AS WITH cte AS (SELECT 1 AS a) SELECT CAST(a AS INT) FROM cte",
    " AS SELECT 'WITH (ORIENTATION = COLUMN)' AS s, "
    "'DISTRIBUTE BY HASH(k)' AS t",
    " AS SELECT k FROM foo_as_bar WHERE note = 'TO GROUP x'",
])


@settings(max_examples=300, deadline=None)
@given(cs=clauses, body=bodies)
def test_strip_extracts_head_only(cs, body):
    head = "CREATE TABLE t (k bigint, v double)"
    stmt = head + "".join(" " + c for c, _ in cs) + body
    out, meta = _strip_storage_clauses(stmt)
    # the body after the top-level AS is byte-identical
    if body:
        assert out.endswith(body), (stmt, out)
    # extracted metadata matches the clauses present
    want_opts: dict = {}
    want_dcol = None
    for c, info in cs:
        if isinstance(info, dict):
            want_opts.update(info)
        elif isinstance(info, str):
            want_dcol = info
    assert meta.get("storage_options", {}) == (want_opts or {}) \
        or meta.get("storage_options") == (want_opts or None)
    assert meta.get("distribute_by") == want_dcol
    # the stripped head still parses as a plain CREATE (clause text
    # gone, column list intact)
    assert "(k bigint, v double)" in out
    for c, _ in cs:
        kind = c.split()[0]
        before_as = out.split(" AS ", 1)[0]
        assert kind not in before_as.upper().replace("NOCOMPRESS", "") \
            or kind in ("WITH",), (out, c)


@settings(max_examples=100, deadline=None)
@given(body=bodies)
def test_no_clause_statements_pass_through(body):
    stmt = "CREATE TABLE t (k bigint)" + body
    out, meta = _strip_storage_clauses(stmt)
    assert out == stmt
    assert meta == {}


def test_non_create_untouched():
    for stmt in (
        "SELECT 'WITH (ORIENTATION = COLUMN)' AS s FROM t",
        "UPDATE t SET v = 1 WHERE note = 'DISTRIBUTE BY HASH(k)'",
        "CREATE INDEX i ON t USING ivfflat (v vector_l2_ops)"
        " WITH (lists = 10)",
    ):
        out, meta = _strip_storage_clauses(stmt)
        assert out == stmt and meta == {}


def test_column_list_parens_protected():
    """ADVICE r7 (low): the stripper must not touch tokens INSIDE the
    column-list parens — a column named compress/nocompress or a
    TABLESPACE-like identifier is part of the DDL, not a storage
    clause."""
    stmt = ("CREATE TABLE t (compress bigint, nocompress double,"
            " tablespace_id bigint) WITH (ORIENTATION = COLUMN)"
            " COMPRESS TABLESPACE ts1")
    out, meta = _strip_storage_clauses(stmt)
    assert "(compress bigint, nocompress double, tablespace_id bigint)" \
        in out
    assert meta["storage_options"] == {"orientation": "column"}
    before = out.split("(", 1)[0]
    assert "COMPRESS" not in before.upper()
    # clauses after the column list are still stripped
    tail = out.split(")", 1)[1]
    assert "TABLESPACE" not in tail.upper()
    assert "COMPRESS" not in tail.upper()


def test_distribute_hash_still_extracted_with_column_list():
    stmt = ("CREATE TABLE t (k bigint, compress double)"
            " DISTRIBUTE BY HASH(k)")
    out, meta = _strip_storage_clauses(stmt)
    assert meta["distribute_by"] == "k"
    assert "(k bigint, compress double)" in out
