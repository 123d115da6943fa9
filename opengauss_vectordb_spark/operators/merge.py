"""MERGE INTO emulation (reference: `executor/execMerge.cpp`,
`vecnode/vecmergeinto.cpp`, `parser/parse_merge.cpp`) and UPSERT
(`nodeModifyTable.cpp` ON DUPLICATE KEY UPDATE).

Without a transactional table format, MERGE is expressed as a full-outer
join producing the post-merge relation, which the caller writes back
atomically via overwrite (parquet) — the append-only analogue of the
reference's in-place DML. On a format with native MERGE (Delta/Iceberg)
the same plan maps 1:1 onto `MERGE INTO`.

Scale note: the join shuffles both sides on the key — unavoidable for
arbitrary MERGE; when the source is small it broadcasts automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched_update: dict[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    when_not_matched_insert: bool = True,
) -> DataFrame:
    """Returns the post-MERGE relation.

    * matched + when_matched_delete predicate → row dropped
    * matched (otherwise) → target columns replaced per
      when_matched_update ({col: expression over source/target})
    * unmatched target rows → kept as-is
    * unmatched source rows → inserted when when_not_matched_insert
    """
    # presence sentinels, not key nullability: a target row whose join key
    # is NULL never matches in the equi-join, but it is still a target row
    # and must be kept as-is (execMerge.cpp leaves unmatched target rows
    # unchanged) — deriving sides from t.<key> IS NULL would misclassify
    # it as a source-only insert and null out every column
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = None
    for k in on:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")
    if not when_not_matched_insert:
        joined = joined.filter(F.col("t._t_present").isNotNull())

    matched = (
        F.col("t._t_present").isNotNull() & F.col("s._s_present").isNotNull()
    )
    s_only = F.col("t._t_present").isNull()

    out_cols = []
    for name in target.columns:
        tcol = F.col(f"t.{name}")
        scol = F.col(f"s.{name}") if name in source.columns else F.lit(None)
        updated = (
            when_matched_update.get(name, tcol)
            if when_matched_update is not None
            else scol if name in source.columns else tcol
        )
        value = (
            F.when(matched, updated).when(s_only, scol).otherwise(tcol)
        )
        out_cols.append(value.alias(name))

    result = joined.select(*out_cols)
    if when_matched_delete is not None:
        # re-derive the matched flag on the merged rows via an anti join
        # (NULL target keys never appear here, so they are never deleted)
        keep_keys = (
            joined.filter(matched & when_matched_delete)
            .select(*[F.col(f"t.{k}").alias(k) for k in on])
        )
        result = result.join(keep_keys, on, "left_anti")
    return result


def upsert(target: DataFrame, source: DataFrame, on: list[str]) -> DataFrame:
    """INSERT ... ON DUPLICATE KEY UPDATE: source wins on key collision."""
    return merge_into(target, source, on, when_matched_update=None)


# ---------------------------------------------------------------- queries

from ..catalog import table  # noqa: E402
from ..registry import query  # noqa: E402


@query(
    "merge_upsert_orders",
    """
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey <= 200
    ), source AS (
      SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey BETWEEN 150 AND 250
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice
    FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    ORDER BY o_orderkey
    """,
)
def merge_upsert_orders(spark, sf_dir):
    # MERGE INTO through the driver gate: upsert a modified slice into a
    # target slice; matched rows take source values, unmatched source
    # rows insert (execMerge.cpp semantics over append-only storage)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = o.filter(F.col("o_orderkey") <= 200)
    source = o.filter(F.col("o_orderkey").between(150, 250)).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    return upsert(target, source, ["o_orderkey"]).orderBy("o_orderkey")


@query(
    "merge_delete_action",
    """
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey <= 200
    ), source AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey BETWEEN 150 AND 250
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice
    FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    WHERE NOT (t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
               AND s.o_totalprice > 300000.0)
    ORDER BY o_orderkey
    """,
)
def merge_delete_action(spark, sf_dir):
    """MERGE with a WHEN MATCHED AND <cond> THEN DELETE action
    (execMerge.cpp handles matched-delete alongside matched-update;
    parse_merge.cpp's action list): matched rows whose doubled source
    price exceeds the threshold are DELETED, other matched rows take
    source values, unmatched source rows INSERT, unmatched target rows
    survive untouched.  The oracle spells the same post-merge relation
    as a full-outer join with the delete predicate as a WHERE.

    Scale: one shuffle on the merge key (broadcast when the source is
    dim-sized); the delete path re-derives matched keys with a
    key-projected anti join — no second scan of the wide rows."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = o.filter(F.col("o_orderkey") <= 200)
    source = o.filter(F.col("o_orderkey").between(150, 250)).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    merged = merge_into(
        target,
        source,
        ["o_orderkey"],
        when_matched_update=None,  # matched rows take source values
        when_matched_delete=F.col("s.o_totalprice") > 300000.0,
    )
    return merged.orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Incremental aggregate maintenance — the materialized-view refresh shape
# (the steady-state form of every 100 TB rollup: never re-aggregate the
# full history; merge the delta batch's partial aggregates into the
# stored aggregate state). Decomposable aggregates only (count/sum —
# avg derives); the merge is a full-outer join on the group key between
# two GROUP-KEY-sized relations, both orders of magnitude smaller than
# the fact history.
# --------------------------------------------------------------------------

from ..catalog import table  # noqa: E402
from ..registry import query  # noqa: E402


def merge_agg_state(
    state: DataFrame, delta_aggs: DataFrame, keys: list[str],
    counters: list[str],
) -> DataFrame:
    """state ⟗ delta on keys; each counter column sums coalesced sides —
    the generic decomposable-aggregate merge."""
    d = delta_aggs.select(
        *keys, *[F.col(c).alias(f"_d_{c}") for c in counters]
    )
    out = state.join(d, keys, "full_outer")
    for c in counters:
        out = out.withColumn(
            c,
            F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"_d_{c}"), F.lit(0)),
        )
    return out.select(*keys, *counters)


@query(
    "incremental_agg_merge",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                     AS DECIMAL(28,6)) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def incremental_agg_merge(spark, sf_dir):
    """Materialized-view incremental refresh: the orders history is
    split into 'yesterday's state' (orderkey % 10 != 0, pre-aggregated)
    and 'today's delta' (orderkey % 10 == 0); the delta is aggregated
    ALONE and merged into the state via a full-outer group-key join of
    counter columns. The oracle is the full re-aggregation — hash
    equality proves merge(state, agg(delta)) == agg(full), the
    decomposability contract that lets a 100 TB rollup pay O(|delta|)
    per refresh. Exact DECIMAL counters make the split-order
    irrelevant (float sums would drift between the two paths); the
    FINAL column is cast to DOUBLE per the registry determinism
    convention — the driver hashes decimal representations, not
    values, so a DECIMAL(28,6) output red-flags even when bit-equal
    (r4 gate finding)."""
    o = table(spark, sf_dir, "orders")
    keys, counters = ["o_orderpriority"], ["n_orders", "total_price"]

    def agg(df):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .alias("total_price"),
        )

    state = agg(o.filter(F.col("o_orderkey") % 10 != 0))
    delta = agg(o.filter(F.col("o_orderkey") % 10 == 0))
    merged = merge_agg_state(state, delta, keys, counters)
    return merged.select(
        *keys,
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("total_price").cast("decimal(28,6)").cast("double")
        .alias("total_price"),
    ).orderBy(*keys)
