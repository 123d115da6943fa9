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
# ordering below is a rotation schedule.  After round 6 the registry
# stood at 256 queries, ALL gated at least once across r1-r6, 255
# green on their latest attempt, ONE red: source_mix_rebalance
# (hash_match=false) — root-caused this round to a THIRD
# representation-trap class: DuckDB's SUM over any integer type is
# HUGEINT, which pandas (the driver's transport) renders as float64
# ("1435.0") against Spark's int64 ("1435").  Fixed by CASTing the
# oracle SUM to BIGINT; tests/oracle_harness.py now compares pandas
# dtype KINDS on both sides (null-aware — nulls legitimately floatify
# both engines), and a full audit found no other null-free offender.
#
# ROUND 7 window (exactly 50): (a) the NEW registrations — named-
# partition DDL (operators/partition_ddl.py: PARTITION BY RANGE/LIST/
# HASH bounds grammar, write-side routing CASE with in-write
# raise_error validation, driver-side partition elimination →
# PartitionFilters, O(1) DROP/TRUNCATE/EXCHANGE PARTITION, MERGE/
# SPLIT PARTITIONS, INTERVAL auto-extension, two-level SUBPARTITION
# BY with both-key elimination, PARTITION/SUBPARTITION selector
# scans, pg_partitions) and PL/SQL PACKAGEs (operators/packages.py:
# spec/body DDL, members compiled via the plpgsql path under mangled
# names, pkg.member() call-site resolution), TIMECAPSULE flashback
# (operators/timecapsule.py: commit manifests over retained
# generations, CSN/TIMESTAMP snapshot scans, recyclebin + restore),
# stored GENERATED columns + AUTO_INCREMENT identity (+ serial
# pseudo-types), session TEMP tables, the column-store DDL dialect
# (WITH (ORIENTATION=COLUMN) / DISTRIBUTE BY HASH honored as write
# repartition) + SELECT INTO, GRANT/REVOKE ACLs with role membership,
# extended statistics, temperature-based source mixing, joined DML
# (UPDATE...FROM / DELETE...USING / ON DUPLICATE KEY UPDATE over
# recorded PRIMARY KEYs), and CREATE TYPE AS ENUM as a validated
# column type; (b) the
# source_mix_rebalance re-gate; (c) re-gates for every query whose
# code path churned this round (merge.py: INSERT-expression isolation
# via __ins_* columns, one-pass alias rewrite, first-match-wins clause
# order; plpython.py: verbatim bodies; ddl_tables.py: TableManager
# read()/spec-partitioning hooks touching the whole managed-table
# family incl. RLS/masking view registration); (d) rotation of the 31
# stalest rows — queries whose latest gate evidence is still round 1.
#
# The one engine surface deliberately left engine-test-only: CREATE
# MODEL / PREDICT BY SQL text (ml_stmt.py) — MLlib's iterative/WLS
# fits cannot hash-match a closed-form SQL oracle (the db4ai_* gate
# rows carry the closed-form math; the statement plumbing is pinned by
# test_create_model_predict_by_sql_text and
# test_predict_by_anchors_top_level_from).
# Registered AFTER this round's window froze (the 50 slots below are
# consumed by the stale-tail rotation the r8 verdict demanded):
# plpgsql_return_query (SETOF/RETURN QUERY table functions) and
# plpgsql_case_stmt (CASE ... END CASE statements), and
# decontaminate_bloom_prefilter (bloom semi-join reduction: distributed
# BIT_OR-packed sketch shipped as an 8 KB literal, probe pinned BELOW
# the verify join), and gist_box_overlap / gist_range_overlap /
# gist_knn_point (the GiST rtree analogue: Z-bucketed layout +
# bucket-MBR manifest + two-phase exact KNN, operators/gist_index.py),
# and do_block_for_loop (FOR loops in DO blocks/procedures: SELECT /
# bound-cursor / dynamic-EXECUTE sources, one aggregate statement per
# loop), and bpe_learn_merges / bpe_segment_tokens (distributed BPE
# vocabulary induction + corpus segmentation — corpus scanned once
# into a word-freq vocab, merge rounds as codegen folds on the vocab
# frame, apply via a vocab join), and bformat_convert_series (the
# regress-census compat batch: CONVERT/USING → CAST, generate_series
# FunctionScan → explode(sequence), last_insert_id, FOR UPDATE strip,
# ALTER INDEX/SEQUENCE), gin_array_ops (the GIN array-element
# opclass: @>/&&/<@/= index-only via per-doc element counts), and
# json_arrow_operators (->/->> chains composing into one JSONPath),
# and age_function (timestamp_age's calendar borrow cascade as one
# codegen'd struct expression, DuckDB's native age as the oracle) —
# all oracle-parity-verified locally this round; FRONT-LOAD them in
# r10's window as its first first-evers.
GATE_PRIORITY: list[str] = [
    # (a) round-9 new registrations — first-ever gate rows
    "plpgsql_exception_guard",
    "do_block_dynexecute",
    "do_block_exception_rollback",
    "chunk_documents_chars",
    "chunk_documents_words",
    "savepoint_rollback",
    # (b) churned-code re-gates this round: gin_index.py (incremental
    # delta maintenance, predicate-column routing, prefix phrases +
    # chains — gin_index_fts re-gates the shared routing the trgm
    # opclass also uses), schemas.py (creation targets never resolve
    # through search_path), plpgsql.py (EXCEPTION blocks + loop
    # shapes), ddl_tables.py (DEFAULT literal masking, SELECT INTO
    # w/o FROM → cstore_distribute_select_into)
    "gin_index_fts",
    "search_path_resolution",
    "plpgsql_while_loop",
    "cstore_distribute_select_into",
    # (c) rotation — the ENTIRE remaining stale tail: all 40 rows whose
    # last gate evidence is round 2 (computed from the union of
    # CORRECTNESS_r0N.json keys); after this round no row is older
    # than r3
    "agg_min_max_by",
    "agg_mode_percentile_disc",
    "agg_percentiles",
    "agg_rollup",
    "agg_stddev_var",
    "agg_string_array",
    "corpus_curation_pipeline",
    "embedding_dup_pairs_cosine",
    "hll_approx_distinct",
    "hll_union_reaggregate",
    "ivf_filtered_full",
    "ivf_knn_join_full",
    "ivf_search_exhaustive",
    "knn_cosine",
    "knn_hamming_binary",
    "knn_inner_product",
    "knn_jaccard_binary",
    "knn_join_exact",
    "knn_l1",
    "knn_l2",
    "knn_l2_filtered",
    "knn_l2_halfvec",
    "money_funcs",
    "multimodal_feature_stats",
    "null_ordering",
    "setop_except",
    "setop_intersect",
    "setop_union_distinct",
    "sparsevec_dot_topk",
    "to_number_parse",
    "train_test_split",
    "vector_avg_by_label",
    "vector_btree_compare",
    "vector_cast_roundtrip",
    "vector_ops",
    "window_first_last_value",
    "window_lag_lead",
    "window_moving_frames",
    "window_range_frame",
    "window_topn_per_group",
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
