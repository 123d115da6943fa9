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
# gate row go first.  After round 5 the registry stood at 245 queries,
# 232 gated across r1-r5, 230 green on latest attempt, 2 red — BOTH
# driver-protocol representation artifacts with engine-identical values
# (source_mix_rebalance: a bare DECIMAL `0.25` oracle literal;
# array_funcs2: LIST output columns the driver's canonicalizer cannot
# sort) — and 13 never gated (the scalar/contrib tranche backlog).
#
# ROUND 6 spends the window on: (a) the 11 NEW registrations — three
# LANGUAGE plpgsql end-to-end queries (operators/plpgsql.py: guard,
# SELECT-INTO + nested IF, and FOR-IN-SELECT accumulator loops compiled
# to aggregates — first gate rows), MERGE with a DELETE action, and a
# COPY (FORMAT binary) statement round-trip, and LANGUAGE plpython3u
# via Arrow-batched pandas UDFs, plus DO anonymous blocks
# (driver-orchestrated DoStmt), MERGE INTO as SQL text, and the
# plain-CREATE/ALTER TABLE lifecycle, CREATE PROCEDURE/CALL, and the
# btree-index sorted layout (VERDICT r5 items 3+6+7);
#
# The one engine surface deliberately left engine-test-only: CREATE
# MODEL / PREDICT BY SQL text (ml_stmt.py) — MLlib's iterative/WLS
# fits cannot hash-match a closed-form SQL oracle (the db4ai_* gate
# rows carry the closed-form math; the statement plumbing is pinned
# by test_create_model_predict_by_sql_text); (b) the 3
# representation re-gates, now fixed at the source AND enforced for all
# 249 queries by test_oracle_parity's oracle-value scan; (c) the full
# 13-name never-gated backlog — taking evidence debt to ZERO; (d)
# re-gates for every query whose code path churned this round
# (create_function comment-aware statement split, pg_compat to_char RN
# range check, vector index_root relocation); (e) high-value sentinels
# across all families.
GATE_PRIORITY: list[str] = [
    # (a) new registrations — first-ever gate rows
    "plpgsql_guard_function",
    "plpgsql_select_into_nested_if",
    "plpgsql_for_loop_agg",
    "merge_delete_action",
    "copy_sql_binary_roundtrip",
    "plpython_function",
    "do_block_stmt",
    "merge_sql_text",
    "alter_table_lifecycle",
    "call_procedure_stmt",
    "btree_index_scan",
    # (b) representation re-gates (r5 reds + the latent decimal)
    "source_mix_rebalance",
    "array_funcs2",
    "fts_setweight_rank",
    # (c) the 13-name never-gated backlog — evidence debt to zero
    "bformat_string_funcs",
    "bformat_group_concat",
    "varbit_funcs",
    "regexp_oracle_funcs",
    "xml_funcs",
    "geo_earth_distance",
    "ltree_hierarchy",
    "json_agg_funcs",
    "pgcrypto_funcs",
    "fuzzystrmatch_unaccent",
    "pgstattuple_report",
    "pageinspect_stats",
    "fts_tsvector_ops",
    # (d) churned-code re-gates this round
    "create_function_sql",
    "formatting_funcs",
    "format_models2",
    "ann_route_topk",
    "ivf_search_probed",
    "ivf_append_then_search",
    "ivf_pq_search",
    "hnsw_search_exhaustive",
    "dedup_keep_best",
    # (e) high-value sentinels across families
    "tpch_q1",
    "tpch_q6",
    "tpch_q5",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "semdedup_keep",
    "dsir_importance_resample",
    "pack_sequences_report",
    "decontaminate_ngram_overlap",
    "text_gopher_quality_filter",
    "fts_bm25",
    "hybrid_rrf_search",
    "incremental_agg_merge",
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
