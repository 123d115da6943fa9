"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine is ``opengauss_vectordb_spark``; the query inventory lives in
its registry (one entry per implemented operator from SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opengauss_vectordb_spark import registry
from opengauss_vectordb_spark.registry import ORACLES, QUERIES

registry.load_all_queries()

# The correctness gate verifies queries in registration order, so the
# ordering below is a rotation schedule: queries that still lack a green
# gate row go first.  Round 2 front-loads the full vector/ANN surface
# (the product's namesake capability), window functions, aggregate
# families, set ops, the four round-1 hash mismatches (now fixed), and
# the formerly oracle-less registrations (now oracled), with two green
# TPC-H sentinels for regression cover.  Everything else follows in its
# original order and rotates forward next round.
GATE_PRIORITY: list[str] = [
    # sentinels (green in round 1)
    "tpch_q1",
    "tpch_q6",
    # round-1 hash mismatches, fixed via stable output casts
    "money_funcs",
    "to_number_parse",
    "train_test_split",
    "corpus_curation_pipeline",
    # formerly oracle-less, now with deterministic SQL oracles
    "multimodal_feature_stats",
    "hll_approx_distinct",
    "hll_union_reaggregate",
    # vector / ANN surface (SURVEY §2.7 distance fns + §2.8 indexes)
    "knn_l2",
    "knn_cosine",
    "knn_inner_product",
    "knn_l1",
    "vector_ops",
    "vector_avg_by_label",
    "knn_join_exact",
    "embedding_dup_pairs_cosine",
    "knn_hamming_binary",
    "knn_jaccard_binary",
    "sparsevec_dot_topk",
    "knn_l2_halfvec",
    "ivf_search_exhaustive",
    "ivf_search_probed",
    "vector_btree_compare",
    "vector_cast_roundtrip",
    "knn_l2_filtered",
    "ivf_knn_join_full",
    "knn_binary_rerank",
    "ivf_filtered_full",
    # window functions (SURVEY §2.5)
    "window_topn_per_group",
    "window_lag_lead",
    "window_moving_frames",
    "window_rank_dist",
    "window_first_last_value",
    "window_range_frame",
    "null_ordering",
    # aggregate families (SURVEY §2.4)
    "agg_rollup",
    "agg_cube",
    "agg_distinct",
    "agg_percentiles",
    "agg_mode_percentile_disc",
    "agg_stddev_var",
    "agg_min_max_by",
    "agg_string_array",
    "agg_bool_bit",
    "agg_corr_covar",
    "agg_grouping_sets",
    # set operations (SURVEY §2.6)
    "setop_intersect",
    "setop_except",
    "setop_union_distinct",
]


def _ordered(mapping: dict) -> dict:
    missing = [n for n in GATE_PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"GATE_PRIORITY names not registered: {missing}")
    head = {n: mapping[n] for n in GATE_PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    return _ordered(ORACLES)
