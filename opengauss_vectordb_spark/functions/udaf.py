"""User-defined aggregates (reference: CREATE AGGREGATE with
sfunc/combinefunc/finalfunc — e.g. datavec's avg(vector),
`datavec--0.7.2.sql:116-123`; SURVEY.md §2.10).

Two forms, mirroring the engine's two execution tiers:
  * Catalyst-expression aggregates (preferred — codegen'd): built from
    sum/count compositions, e.g. vector_sum_agg / vector_avg_agg via
    per-dimension sums (posexplode + pivot-free groupBy).
  * Arrow-batched pandas GROUPED_AGG UDAFs for genuinely custom math
    (geometric mean shown) — one JVM→Arrow hop per group batch, still
    vectorized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geometric_mean(v: "pd.Series") -> float:
        """GROUPED_AGG pandas UDAF: exp(mean(ln x)) over positive values."""
        import numpy as np

        arr = v.dropna()
        arr = arr[arr > 0]
        if len(arr) == 0:
            return float("nan")
        return float(np.exp(np.log(arr.astype("float64")).mean()))

except ImportError:  # pragma: no cover
    geometric_mean = None


def vector_sum_agg(df: DataFrame, group_cols: list[str], vec_col: str) -> DataFrame:
    """sum(vector) — element-wise (datavec vector_accum/vector_combine):
    posexplode to (dim, value), exact DECIMAL(38,9) accumulation per
    dimension (order-independent; each element rounds half-up at 1e-9,
    and the 38-digit sum cannot overflow for any realistic group size —
    unlike a scaled BIGINT, which wraps past ~9.2e18), reassemble ordered
    arrays. Pure relational ops: partial aggregation combines map-side,
    the shuffle carries dim rows per group — the distributed shape of the
    reference's transfn/combinefn."""
    ex = df.select(
        *group_cols, F.posexplode(F.col(vec_col)).alias("_dim", "_x")
    )
    summed = ex.groupBy(*group_cols, "_dim").agg(
        F.sum(F.col("_x").cast("double").cast("decimal(38,9)"))
        .cast("double")
        .alias("_s")
    )
    return (
        summed.groupBy(*group_cols)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_dim"), F.col("_s")))
                ),
                lambda e: e.getField("_s"),
            ).alias(f"sum_{vec_col}")
        )
    )


def vector_avg_agg(df: DataFrame, group_cols: list[str], vec_col: str) -> DataFrame:
    """avg(vector) — element-wise (datavec vector_avg final function)."""
    ex = df.select(
        *group_cols, F.posexplode(F.col(vec_col)).alias("_dim", "_x")
    )
    avged = ex.groupBy(*group_cols, "_dim").agg(
        (
            F.sum(F.col("_x").cast("double").cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_a")
    )
    return (
        avged.groupBy(*group_cols)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_dim"), F.col("_a")))
                ),
                lambda e: e.getField("_a"),
            ).alias(f"avg_{vec_col}")
        )
    )
