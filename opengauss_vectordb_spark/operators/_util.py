"""Shared helpers for the operator modules.

The decimal-sum convention: per-row arithmetic stays in DOUBLE (IEEE,
identical across engines), the row value is cast to DECIMAL(18,6) so the
aggregate is exact/associative (shuffle-order independent — this is what
makes results reproducible on a 1000-executor cluster, not just a
hash-match trick), and the final sum is cast back to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column, alias: str) -> Column:
    """Order-independent SUM of a double expression."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count."""
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def status_frame(spark, row: tuple, schema: str):
    """One-row status/tag frame via a literal ``SELECT`` — the cheap
    spelling of ``spark.createDataFrame([row], schema)``.

    Measured on this harness: createDataFrame's local-relation
    machinery costs ~31 ms per call against ~7.6 ms for one
    ``spark.sql`` literal projection — and statement-heavy flows
    (plpgsql bodies, packages, migration scripts) build a status
    frame per statement, so the constant is the dominant
    per-statement driver cost (the r10 verdict's overhead item).
    Falls back to createDataFrame for any value shape a literal
    cannot spell (dates, arrays, non-finite floats)."""
    try:
        cols = _split_schema(schema)
        if len(cols) != len(row):
            raise ValueError("schema/row arity")
        parts = [
            f"{_sql_scalar(v, typ)} AS {name}"
            for v, (name, typ) in zip(row, cols)
        ]
        # the inline-VALUES anchor lets Catalyst fold the projection to
        # a LocalRelation (OneRowRelation is not eligible), so callers
        # that materialize the status frame (.first()/.collect()) pay
        # no job and no result-serving socket — measured 46 → 15 ms
        # per materialization (OPTIMIZATION_r12.md)
        sql_text = (
            "SELECT " + ", ".join(parts)
            + " FROM VALUES (0) AS __onerow(__z)"
        )
    except (TypeError, ValueError):
        return spark.createDataFrame([row], schema)
    try:
        return spark.sql(sql_text)
    except Exception:
        # any parse/analysis failure of the literal SELECT (e.g. a
        # session with escapedStringLiterals, an unspellable literal)
        # must fall back, not propagate out of internal status paths
        return spark.createDataFrame([row], schema)


def _split_schema(schema: str) -> list[tuple[str, str]]:
    """'a STRING, b DECIMAL(18,6)' → [('a','STRING'), ...] —
    paren-aware on the type arguments; backtick names pass through."""
    out, cur, depth = [], [], 0
    for ch in schema:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    cols = []
    for c in out:
        c = c.strip()
        if c.startswith("`"):
            name, typ = c[: c.index("`", 1) + 1], c[c.index("`", 1) + 1:]
        else:
            name, _, typ = c.partition(" ")
        typ = typ.strip()
        if not name or not typ:
            raise ValueError(f"bad schema column {c!r}")
        cols.append((name, typ))
    return cols


def _sql_scalar(v, typ: str) -> str:
    t = typ.strip().upper()
    if v is None:
        return f"CAST(NULL AS {typ})"
    if isinstance(v, bool):
        lit = "TRUE" if v else "FALSE"
        return lit if t == "BOOLEAN" else f"CAST({lit} AS {typ})"
    if isinstance(v, int):
        return f"CAST({v} AS {typ})"
    if isinstance(v, float):
        import math

        if not math.isfinite(v):
            raise ValueError("non-finite float")
        return f"CAST({v!r} AS {typ})"
    if isinstance(v, str):
        s = v.replace("\\", "\\\\").replace("'", "\\'")
        lit = f"'{s}'"
        return lit if t == "STRING" else f"CAST({lit} AS {typ})"
    raise TypeError(f"no SQL literal for {type(v).__name__}")
