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
# gate row go first.  Rounds 1-2 gated 93 of the 136 queries registered
# then (92 green; knn_binary_rerank hash-red, since fixed with stable
# BIGINT casts on both sides).  Round 3 front-loads the 43 never-gated
# queries (TPC-H tail, streaming-equivalent event windows, scalar-
# function families, recursive/hierarchical, FTS extensions, PQ rerank),
# the re-gated knn_binary_rerank, and four of round 3's new operators
# (BM25, incremental dedup, IVF×PQ, z-order pruning — all verified
# locally against DuckDB), with tpch_q1/q6 as green sentinels.  After
# this round only round-3 additions past slot 50 remain for rotation.
GATE_PRIORITY: list[str] = [
    # sentinels (green in rounds 1-2)
    "tpch_q1",
    "tpch_q6",
    # round-3 additions, verified locally against DuckDB
    "fts_bm25",
    "dedup_incremental_minhash",
    "ivf_pq_search",
    "zorder_pruned_scan",
    # round-2 hash red, fixed: hamming cast BIGINT on both sides
    "knn_binary_rerank",
    # TPC-H tail (SURVEY §2.3/§2.4/§2.6 joins, anti/semi, subplans)
    "tpch_q12_adapted",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16_adapted",
    "tpch_q17_adapted",
    "tpch_q18_adapted",
    "tpch_q19_adapted",
    "tpch_q20_adapted",
    "tpch_q21_adapted",
    "tpch_q22_adapted",
    # event/time windows (batch equivalents of streaming ops)
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_windows",
    "events_funnel",
    "events_interval_join",
    # scalar function families (SURVEY §2.7)
    "string_funcs",
    "date_funcs",
    "math_funcs",
    "json_funcs",
    "json_build_each",
    "hash_encode_funcs",
    "conditional_funcs",
    "sql_compat_oracle",
    # scans / sampling / misc relational (SURVEY §2.1/§2.6)
    "values_scan",
    "limit_offset",
    "sample_deterministic",
    "sample_cluster_balanced",
    "join_full_outer",
    "bucketed_join_colocated",
    "pivot_status_counts",
    "copy_binary_roundtrip",
    "sql_entry_q6",
    # recursive / hierarchical (SURVEY §2.6)
    "recursive_series",
    "recursive_cte_native",
    "connect_by_hierarchy",
    "connect_by_path_funcs",
    # full-text extensions (SURVEY §2.7)
    "fts_rank_cd",
    "fts_bool_phrase",
    "dedup_simhash_pairs",
    # ML / sketches / vector additions
    "db4ai_gbt_classify",
    "agg_approx_percentiles",
    "knn_pq_rerank",
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
