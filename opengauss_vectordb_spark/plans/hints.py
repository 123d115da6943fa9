"""Plan-shaping surfaces (SURVEY.md §4.1 rows "plan hints" and "large
IN-list → join"):

  * Spark SQL hints (/*+ BROADCAST(t) */, REPARTITION, MERGE) replace the
    reference's hint grammar (`parser/hint_gram.y`) — helpers here expose
    the DataFrame-side equivalents.
  * in_list_filter: the `qrw_inlist2join_optmode` rewrite
    (`guc_sql.cpp:2890`) — a small IN-list stays a scan predicate (gets
    pushed to parquet), a huge one becomes a broadcast semi join so the
    filter is a hash probe instead of a giant expression.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# beyond this many values, an IN-list expression stops being pushdown-able
# and slows codegen; the reference's inlist2join threshold concept
INLIST_JOIN_THRESHOLD = 512


def in_list_filter(
    df: DataFrame,
    col: str,
    values: Sequence,
    threshold: int = INLIST_JOIN_THRESHOLD,
) -> DataFrame:
    """col IN (values...) — as a predicate for small lists (parquet
    pushdown + InSet), as a broadcast semi join for large ones."""
    vals = list(values)
    if len(vals) <= threshold:
        return df.filter(F.col(col).isin(vals))
    spark = df.sparkSession
    lookup = spark.createDataFrame([(v,) for v in vals], f"__inlist_{col} {_ddl_of(df, col)}")
    return df.join(
        F.broadcast(lookup), df[col] == lookup[f"__inlist_{col}"], "left_semi"
    )


def _ddl_of(df: DataFrame, col: str) -> str:
    return df.schema[col].dataType.simpleString()


def broadcast_hint(df: DataFrame) -> DataFrame:
    """DataFrame-side /*+ BROADCAST */."""
    return F.broadcast(df)


def repartition_hint(df: DataFrame, n: int, *cols: str) -> DataFrame:
    """DataFrame-side /*+ REPARTITION(n, cols) */."""
    return df.repartition(n, *[F.col(c) for c in cols]) if cols else df.repartition(n)
