"""Replicates the driver's correctness protocol locally: run each
registered Spark query and its DuckDB oracle on the same parquet tables,
then compare row count, column names, and (column-name-sorted,
row-sorted) values.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from opengauss_vectordb_spark.catalog import TABLES


def run_oracle(
    sql: str, sf_dir: str, want_dtypes: bool = False
) -> tuple[list[str], list[tuple], dict[str, str]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    dtypes: dict[str, str] = {}
    if want_dtypes:
        # the driver moves oracle results through pandas — a DuckDB
        # HUGEINT (= SUM over any integer type) lands as float64 there,
        # so 1435 hashes as "1435.0" against Spark's int64 "1435"
        # (r6 source_mix_rebalance red). Capture the pandas dtype kind
        # per column so compare() can flag the mismatch.
        pdf = con.execute(sql).df()
        dtypes = {c: pdf[c].dtype.kind for c in pdf.columns}
    con.close()
    return cols, rows, dtypes


def _norm(v: Any) -> Any:
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def canonical(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, then rows — order-insensitive comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(
    spark_df, oracle: str, sf_dir: str, check_repr: bool = False
) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass).

    With ``check_repr`` (the parity test's default for every
    non-exempt query), also asserts the DRIVER's representation
    conventions on the raw oracle values, before local normalization
    masks them: no decimal.Decimal (the driver hashes decimal
    representations — r4 incremental_agg_merge, r5 source_mix_rebalance
    where the DECIMAL was a bare oracle literal) and no list cells (the
    driver's pandas row-sort canonicalizer dies on unhashable lists —
    r5 array_funcs2). The local harness tolerates both via _norm, which
    is exactly why these slipped the gate three rounds running.
    """
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows, d_dtypes = run_oracle(
        oracle, sf_dir, want_dtypes=check_repr
    )
    problems = []
    if check_repr:
        import decimal

        bad_cols: dict[str, str] = {}
        for r in d_rows:
            for c, v in zip(d_cols, r):
                if isinstance(v, decimal.Decimal):
                    bad_cols[c] = "Decimal"
                elif isinstance(v, (list, tuple)):
                    bad_cols[c] = "list"
        if bad_cols:
            problems.append(
                "oracle emits driver-hostile representations "
                f"{bad_cols} — CAST to DOUBLE / array_to_string in the "
                "oracle SQL (registry convention)"
            )
        # dtype-KIND parity through pandas, the driver's actual path:
        # DuckDB HUGEINT → float64 while Spark's long → int64, so the
        # same integer hashes differently (r6 source_mix_rebalance).
        # Compare the pandas dtype kind of each oracle column against
        # the kind Spark's toPandas() would produce for its schema.
        from pyspark.sql import types as T

        _kind = {
            T.LongType: "i", T.IntegerType: "i", T.ShortType: "i",
            T.ByteType: "i", T.DoubleType: "f", T.FloatType: "f",
            T.BooleanType: "b", T.StringType: "O",
            T.DateType: "O", T.TimestampType: "M", T.BinaryType: "O",
        }
        s_has_null = None  # computed lazily, only on a suspect column
        for f in spark_df.schema.fields:
            sk = _kind.get(type(f.dataType))
            dk = d_dtypes.get(f.name, d_dtypes.get(f.name.lower()))
            if sk is None or dk is None:
                continue
            if sk == "i" and dk == "f":
                # nulls legitimately floatify BOTH sides in pandas —
                # only flag when the Spark column is null-free (then
                # Spark hashes "1435" vs the oracle's "1435.0")
                if s_has_null is None:
                    s_has_null = {
                        c: any(r[i] is None for r in s_rows)
                        for i, c in enumerate(s_cols)
                    }
                if not s_has_null.get(f.name, False):
                    problems.append(
                        f"column {f.name!r}: Spark int64 vs oracle "
                        "pandas float64 (DuckDB HUGEINT? CAST the "
                        "oracle SUM to BIGINT — registry convention)"
                    )
            elif sk == "f" and dk == "i":
                problems.append(
                    f"column {f.name!r}: Spark float64 vs oracle "
                    "pandas int64 — cast the oracle column to DOUBLE"
                )
    if sorted(s_cols) != sorted(c.lower() for c in d_cols) and sorted(
        c.lower() for c in s_cols
    ) != sorted(c.lower() for c in d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc = canonical(s_cols, s_rows)
    dc = canonical(d_cols, d_rows)
    if sc != dc:
        n_bad = 0
        for i, (a, b) in enumerate(zip(sc, dc)):
            if a != b:
                if n_bad < 3:
                    problems.append(f"row {i}: spark={a!r} duckdb={b!r}")
                n_bad += 1
        if n_bad:
            problems.append(f"{n_bad} differing rows of {len(sc)}")
        elif len(sc) != len(dc):
            pass
    return problems
