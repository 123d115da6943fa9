"""Training-data-pipeline operators — the curation stages a 100 TB
LLM-corpus build runs after text analysis and dedup: deterministic
train/val/test splitting, stratified quota sampling, duplicate-cluster
resolution (connected components over near-dup pairs), and the composed
keep/drop curation pipeline.

Scale design:
  * split/sample assignments are pure hash arithmetic on short keys —
    map-side only, no shuffle, reproducible on any cluster (md5 hex is
    engine- and partitioning-independent, unlike rand() or zipWithIndex).
  * stratified sampling shuffles once on the stratum key; the per-stratum
    ordering key is a hash, so the sample is deterministic AND unbiased
    without a global sort.
  * connected components = iterative min-label propagation; each
    iteration is one shuffle on the (tiny) edge set, never on the corpus.
    Convergence is O(diameter) iterations and duplicate clusters are
    shallow in practice (pairs/triples), so this stays cheap at scale.
  * the curation pipeline composes filters BEFORE the dedup shuffle, so
    the expensive stage sees only quality-passing docs.

Reference anchor: the reference has no pipeline DSL — these are the
additive LLM-data operators (BASELINE.json north star) built from the
same relational primitives (groupBy/join/window) the §2 inventory maps.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .db4ai import _CENTROIDS, _sql_sqdist
from .dedup import connected_components_dedup
from ._util import scoped_persist
from .text import tokens

# 4-hex-nibble bucket in [0, 65536) from a doc_id — identical arithmetic
# in Spark (conv) and DuckDB (strpos-per-nibble): the split is a pure
# function of the row key, so re-running the pipeline on a re-partitioned
# (or re-ordered, or incrementally grown) corpus never reassigns a doc.
_B = "conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) % 100"
_SQL_B = (
    "(((strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[1:1]) - 1) * 4096"
    " + (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[2:2]) - 1) * 256"
    " + (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[3:3]) - 1) * 16"
    " + (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[4:4]) - 1)) % 100)"
)


@query(
    "train_test_split",
    f"""
    WITH assigned AS (
      SELECT doc_id, lang, n_chars,
             CASE WHEN {_SQL_B} < 90 THEN 'train'
                  WHEN {_SQL_B} < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id
    FROM assigned
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def train_test_split(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test split keyed on md5(doc_id).

    The assignment is map-side arithmetic (no shuffle, no RNG state);
    only the verification aggregate shuffles, on the tiny
    (split, lang) key space.
    """
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(_B)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # explicit BIGINT on both sides: DuckDB SUM(BIGINT) widens to
            # HUGEINT, which the gate's value-hash treats as a different
            # value representation even when the numbers are identical
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("split", "lang")
    )


@query(
    "stratified_sample_quota",
    """
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang, doc_id, n_chars, rn
    FROM ranked WHERE rn <= 25
    ORDER BY lang, rn
    """,
)
def stratified_sample_quota(spark, sf_dir):
    """Per-stratum quota sample: exactly 25 docs per lang, chosen by
    hash order — deterministic and unbiased without a global sort.

    One shuffle on the stratum key; the window's per-partition sort is
    over (hash, id), so the same 25 docs are drawn regardless of input
    partitioning or cluster size. At 100 TB the row_number window is
    the scalable form of per-group reservoir sampling: each stratum
    sorts locally after the hash partition, nothing global.
    """
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .select("lang", "doc_id", "n_chars", "rn")
        .orderBy("lang", "rn")
    )


# Shared near-dup edge set (word-3-gram Jaccard >= 0.5 pairs) — the same
# pair semantics as dedup_ngram_jaccard, reused as the input graph for
# cluster resolution.
_SQL_PAIRS = r"""
    t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      FROM t WHERE len(w) >= 3
    ), ex AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
      SELECT c.id_a, c.id_b
      FROM common c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
      WHERE c.n_common * 1.0 / (len(sa.s) + len(sb.s) - c.n_common) >= 0.5
    )
"""


def _jaccard_pairs(spark, sf_dir):
    """(id_a, id_b) word-3-gram Jaccard >= 0.5 pairs (shingle equi-join,
    map-side common-count — see dedup.dedup_ngram_jaccard)."""
    from .text import shingle_stream

    d = table(spark, sf_dir, "documents")
    # corpus-sized exploded shingle stream — disk-backed, not in-memory
    ex = (
        shingle_stream(d)
        .dropDuplicates(["doc_id", "shingle"])
        .transform(lambda _df: scoped_persist(_df, StorageLevel.DISK_ONLY))
    )
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = ex.select(F.col("doc_id").alias("id_a"), "shingle")
    b = ex.select(F.col("doc_id").alias("id_b"), F.col("shingle").alias("shingle_b"))
    common = (
        a.join(b, (a.shingle == b.shingle_b) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") * F.lit(1.0) / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    # sizes are per-doc aggregates (unbounded at corpus scale): no forced
    # broadcast — AQE picks the strategy from runtime sizes
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.5)
        .select("id_a", "id_b")
    )


@query(
    "dedup_cluster_resolve",
    f"""
    WITH RECURSIVE {_SQL_PAIRS},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(doc_id, lbl) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.doc_id = e.dst
    )
    SELECT doc_id,
           MIN(lbl) AS cluster_id,
           (doc_id = MIN(lbl)) AS is_kept
    FROM reach GROUP BY doc_id
    ORDER BY cluster_id, doc_id
    """,
)
def dedup_cluster_resolve(spark, sf_dir):
    """Resolve near-dup pairs into keep/drop clusters: connected
    components by iterative min-label propagation over the Jaccard pair
    graph; cluster_id = min doc_id of the component, is_kept marks the
    canonical representative.

    The oracle proves the fixpoint: a recursive CTE computes the min
    reachable id per node — exactly the min-label fixpoint the Spark
    loop converges to. Each Spark iteration shuffles only the edge set
    (pairs, not corpus); the reference's executor has the same shape in
    RecursiveUnion (executor/nodeRecursiveunion.cpp) driven to fixpoint.
    """
    pairs = scoped_persist(_jaccard_pairs(spark, sf_dir))
    nodes = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    labels = connected_components_dedup(pairs, nodes)
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_kept"),
    ).orderBy("cluster_id", "doc_id")


@query(
    "corpus_curation_pipeline",
    rf"""
    WITH toks AS (
      SELECT doc_id, lang, source, n_chars,
             string_split_regex(trim(text), '\s+') AS w,
             md5(text) AS h
      FROM documents
    ), quality AS (
      SELECT doc_id, lang, source, n_chars, h,
             len(w) AS n_tokens,
             len(list_distinct(w)) * 1.0 / len(w) AS unique_ratio
      FROM toks
      WHERE len(w) >= 20 AND len(list_distinct(w)) * 1.0 / len(w) > 0.3
    ), kept AS (
      SELECT * FROM quality
      WHERE doc_id = (SELECT MIN(q2.doc_id) FROM quality q2 WHERE q2.h = quality.h)
    ), assigned AS (
      SELECT lang, source, n_tokens,
             CASE WHEN {_SQL_B} < 90 THEN 'train'
                  WHEN {_SQL_B} < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM kept
    )
    SELECT split, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned
    GROUP BY split, source
    ORDER BY split, source
    """,
)
def corpus_curation_pipeline(spark, sf_dir):
    """The composed curation pipeline: quality filter → exact dedup
    (keep min doc_id per md5) → deterministic split → per-(split,
    source) token budget. One corpus scan; the quality filter runs
    BEFORE the dedup shuffle so the shuffle carries only passing docs,
    and the dedup key is the 32-char md5, never the document text.
    """
    d = table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    uniq_ratio = F.size(F.array_distinct(w)) * F.lit(1.0) / F.size(w)
    quality = (
        d.select(
            "doc_id",
            "lang",
            "source",
            F.size(w).alias("n_tokens"),
            F.md5(F.col("text").cast("binary")).alias("h"),
        )
        .filter((F.size(w) >= 20) & (uniq_ratio > 0.3))
    )
    keep_ids = quality.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    kept = quality.join(keep_ids, ["h", "doc_id"])
    bucket = F.expr(_B)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        kept.withColumn("split", split)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # BIGINT on both sides (DuckDB HUGEINT widening — see above)
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("split", "source")
    )


@query(
    "sample_cluster_balanced",
    f"""
    WITH t AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ), d AS (
      SELECT vec_id,
             {_sql_sqdist('e', _CENTROIDS[0])} AS d0,
             {_sql_sqdist('e', _CENTROIDS[1])} AS d1,
             {_sql_sqdist('e', _CENTROIDS[2])} AS d2,
             {_sql_sqdist('e', _CENTROIDS[3])} AS d3
      FROM t
    ), a AS (
      SELECT vec_id,
             CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
                  WHEN d1 <= d2 AND d1 <= d3 THEN 1
                  WHEN d2 <= d3 THEN 2 ELSE 3 END AS cluster
      FROM d
    ), ranked AS (
      SELECT vec_id, cluster,
             ROW_NUMBER() OVER (
               PARTITION BY cluster
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
      FROM a
    )
    SELECT cluster, vec_id, rn FROM ranked WHERE rn <= 25
    ORDER BY cluster, rn
    """,
)
def sample_cluster_balanced(spark, sf_dir):
    """Embedding-aware curation: cluster-balanced quota sampling — assign
    each embedding to its nearest centroid (the PREDICT BY kmeans step,
    first 8 dims against the db4ai warehouse centroids), then draw a
    deterministic hash-ordered quota of 25 PER CLUSTER. This is the
    diversity-preserving sampler a training-data pipeline uses instead
    of uniform sampling, which over-draws dense regions of embedding
    space. Same scale shape as stratified_sample_quota: one shuffle on
    the cluster key, per-partition window sort, no global sort."""
    from pyspark.sql import Window as W

    e8 = F.slice(F.col("embedding").cast("array<double>"), 1, 8)
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", e8.alias("e"))
    )
    dists = [
        F.aggregate(
            F.zip_with(
                F.col("e"),
                F.array(*[F.lit(x) for x in c]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"d{i}")
        for i, c in enumerate(_CENTROIDS)
    ]
    d = emb.select("vec_id", *dists)
    d0, d1, d2, d3 = (F.col(f"d{i}") for i in range(4))
    cluster = (
        F.when((d0 <= d1) & (d0 <= d2) & (d0 <= d3), 0)
        .when((d1 <= d2) & (d1 <= d3), 1)
        .when(d2 <= d3, 2)
        .otherwise(3)
    )
    w = W.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string").cast("binary")), F.col("vec_id")
    )
    return (
        d.select("vec_id", cluster.alias("cluster"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .select("cluster", "vec_id", "rn")
        .orderBy("cluster", "rn")
    )


# --- deterministic weighted sampling (exponential race / A-ES) -------------

_H8 = "conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)"
_SQL_H8 = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[{i}:{i}]) - 1)"
        f" * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    + ")"
)


@query(
    "sample_weighted_priority",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             -ln(({_SQL_H8} + 1) / 4294967297.0)
               / CAST(n_chars AS DOUBLE) AS k
      FROM documents
    )
    SELECT doc_id, n_chars, ROUND(k, 6) AS priority
    FROM keyed
    ORDER BY k, doc_id
    LIMIT 50
    """,
)
def sample_weighted_priority(spark, sf_dir):
    """Weighted sampling without replacement, deterministic: the
    exponential-race key k_i = -ln(u_i)/w_i (Efraimidis–Spirakis A-ES
    reformulated through Exp(w) order statistics) with u_i a uniform
    derived from md5(doc_id) and w_i = n_chars. The k smallest keys are
    a weight-proportional sample — here the importance-sampling draw a
    training pipeline uses to upweight long documents.

    Everything is map-side arithmetic on the row key (no RNG state, no
    shuffle): re-running on a re-partitioned or incrementally-grown
    corpus never changes the keys of existing docs, so the sample is
    reproducible and append-stable. The top-k is a TakeOrdered heap —
    at 100 TB the only cross-executor traffic is k rows per partition.
    """
    d = table(spark, sf_dir, "documents")
    u = (F.expr(_H8) + 1) / F.lit(4294967297.0)
    k = -F.log(u) / F.col("n_chars").cast("double")
    return (
        d.select("doc_id", "n_chars", k.alias("_k"))
        .orderBy(F.col("_k").asc(), F.col("doc_id").asc())
        .limit(50)
        .select("doc_id", "n_chars", F.round("_k", 6).alias("priority"))
    )


# --------------------------------------------------------------------------
# Benchmark decontamination — flag training docs sharing any word 5-gram
# with the held-out eval set (the industry-standard n-gram overlap check
# run before every serious pretraining job; additive like the rest of
# this module — the reference has no corpus tooling).
# --------------------------------------------------------------------------

_DECON_N = 4  # shingle width (words; production decon uses 8-13 — 4 keeps
# the sf0.01 gate result non-trivial on the synthetic token-soup corpus)
_SQL_TOKS = (
    "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"
)


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(w) - {_DECON_N} + 2),
               i -> array_to_string(w[i : i + {_DECON_N} - 1], ' '))) AS shingle
      FROM toks WHERE len(w) >= {_DECON_N}
    ), dsh AS (
      SELECT DISTINCT doc_id, shingle FROM sh
    ), eval_sh AS (
      SELECT DISTINCT shingle FROM dsh WHERE doc_id % 97 = 0
    )
    SELECT d.doc_id AS doc_id,
           COUNT(*) AS n_shared_shingles
    FROM dsh d JOIN eval_sh e ON d.shingle = e.shingle
    WHERE d.doc_id % 97 <> 0
    GROUP BY d.doc_id
    ORDER BY doc_id
    """,
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: training docs (doc_id % 97 != 0) that
    share ≥1 word-4-gram with the eval split (doc_id % 97 == 0), with
    the count of distinct shared shingles. Scale shape: shingles are
    generated by transform(sequence(...)) — pure codegen, no Python —
    each side deduped per doc BEFORE the join, and the join key is the
    shingle string; the eval side of a real run is a benchmark suite
    (tiny), so AQE broadcasts it — but no hint forces that, and a large
    eval set degrades to a shuffle equi-join, never a cross join. The
    per-doc aggregation is a short-key groupBy. The same shape at 100 TB
    reads the corpus once."""
    d = table(spark, sf_dir, "documents")
    w = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
        " ",
    )
    t = d.select("doc_id", w.alias("w")).filter(F.size("w") >= _DECON_N)
    # per-doc dedup via array_distinct BEFORE the explode — map-side and
    # local to the row, replacing the dropDuplicates((doc_id, shingle))
    # SHUFFLE of the whole shingle stream (identical result: the dedup
    # scope is the document either way); DISK_ONLY persist computes the
    # tokenize+explode once for its two consumers (eval side + train
    # side).  Measured 1.18 → 0.31 s at sf0.1 (guide §2.4: remove
    # shuffles outright).
    shingles = t.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - _DECON_N),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("w"), i + 1, _DECON_N)
                    ),
                )
            )
        ).alias("shingle"),
    ).transform(lambda _df: scoped_persist(_df, StorageLevel.DISK_ONLY))
    eval_sh = (
        shingles.filter(F.col("doc_id") % 97 == 0)
        .select("shingle")
        .distinct()
    )
    return (
        shingles.filter(F.col("doc_id") % 97 != 0)
        .join(eval_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Sequence packing — concat-and-chunk (GPT-style): documents concatenated
# in key order and sliced into fixed token windows; the packing report is
# pure prefix-sum arithmetic, so it is window-expressible and identical
# in any engine.
# --------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per packed sequence
_PACK_SHARDS = 4    # data-parallel packing shards (one packer per shard)
# Same md5 shard recipe as epoch_shuffle_shards (defined below): the
# packer partitions by the SAME key the epoch-shuffle writes the
# training files with, so packing runs where the data already lives.
_PACK_EK = "md5('epoch1:' || CAST(doc_id AS STRING))"
_PACK_EK_DUCK = "md5('epoch1:' || CAST(doc_id AS VARCHAR))"
_PACK_SHARD = f"conv(substring({_PACK_EK}, 1, 2), 16, 10) % {_PACK_SHARDS}"
_PACK_SHARD_DUCK = (
    f"(((strpos('0123456789abcdef', {_PACK_EK_DUCK}[1:1]) - 1) * 16"
    f" + (strpos('0123456789abcdef', {_PACK_EK_DUCK}[2:2]) - 1))"
    f" % {_PACK_SHARDS})"
)


@query(
    "pack_sequences_report",
    f"""
    WITH t AS (
      SELECT doc_id, CAST({_PACK_SHARD_DUCK} AS INT) AS shard,
             len({_SQL_TOKS}) AS n_tokens
      FROM documents
    ), pre AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - n_tokens AS tok_before
      FROM t
    ), placed AS (
      SELECT doc_id, shard, n_tokens,
             CAST(FLOOR(tok_before / {_PACK_BUDGET}) AS BIGINT) AS bin_id,
             CAST(FLOOR((tok_before + n_tokens - 1) / {_PACK_BUDGET}) AS BIGINT)
               AS bin_end
      FROM pre WHERE n_tokens > 0
    )
    SELECT shard, bin_id,
           COUNT(*) AS n_docs_starting,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
           CAST(SUM(CASE WHEN bin_end > bin_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddlers
    FROM placed
    GROUP BY shard, bin_id
    ORDER BY shard, bin_id
    """,
)
def pack_sequences_report(spark, sf_dir):
    """Concat-and-chunk sequence packing report, SHARDED: documents are
    assigned a deterministic packing shard (the same md5 key recipe the
    epoch shuffle writes training files with), laid end to end in
    doc_id order WITHIN each shard, and cut into {budget}-token
    training windows (the packing used when pretraining data is
    tokenized — no padding waste, docs may straddle window boundaries).
    Per (shard, window): docs starting in it, their token mass, and how
    many straddle into the next window.

    Scale shape: the running-sum window is PARTITIONED BY shard — one
    shuffle on the shard key, each shard's prefix sum runs in its own
    task, and at 100 TB the shard count scales with the cluster (a
    production packer runs one packer per training-file shard; the
    earlier global-ordering form funneled the whole corpus's counts
    through a single reducer — r4 scale flag, fixed here).
    test_plan_quality pins that no unpartitioned window remains."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    w = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
        " ",
    )
    t = d.select(
        "doc_id",
        F.expr(_PACK_SHARD).cast("int").alias("shard"),
        F.size(w).alias("n_tokens"),
    )
    win = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pre = t.withColumn(
        "tok_before", F.sum("n_tokens").over(win) - F.col("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    placed = pre.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("tok_before") / _PACK_BUDGET).alias("bin_id"),
        F.floor(
            (F.col("tok_before") + F.col("n_tokens") - 1) / _PACK_BUDGET
        ).alias("bin_end"),
    )
    return (
        placed.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs_starting"),
            F.sum("n_tokens").cast("bigint").alias("tokens_started"),
            F.sum(
                F.when(F.col("bin_end") > F.col("bin_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_straddlers"),
        )
        .orderBy("shard", "bin_id")
    )


# --------------------------------------------------------------------------
# PII scrubbing — regex redaction of emails/phones with an audit count
# (the safety pass every released corpus runs; pure regexp_replace
# codegen, no Python).
# --------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{4}\b"


@query(
    "pii_scrub_redact",
    rf"""
    WITH salted AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
           regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g') AS clean
    FROM salted ORDER BY doc_id
    """,
)
def pii_scrub_redact(spark, sf_dir):
    """PII scrub with audit counts: inject deterministic synthetic
    email/phone strings (the corpus fixture has none — the injection IS
    the test vector), count matches, redact with [EMAIL]/[PHONE]
    placeholders. All regexp_count/regexp_replace — whole-stage codegen,
    one map pass, trivially 100 TB-safe. Bounded to 50 docs at the gate
    because the full redacted text is part of the hash-checked output."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    salted = d.select("doc_id", t.alias("t"))
    return salted.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ).alias("clean"),
    ).orderBy("doc_id")


@query(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE {_SQL_PAIRS},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(doc_id, lbl) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.doc_id = e.dst
    ),
    clusters AS (
      SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc_id
    ),
    scored AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars
      FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
    )
    , ranked AS (
      SELECT cluster_id, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM scored
    )
    SELECT s.cluster_id,
           MAX(CASE WHEN r.rn = 1 THEN r.doc_id END) AS kept_doc,
           CAST(MAX(s.n_chars) AS BIGINT) AS kept_chars,
           COUNT(*) AS n_members
    FROM scored s JOIN ranked r
      ON r.cluster_id = s.cluster_id AND r.doc_id = s.doc_id
    GROUP BY s.cluster_id ORDER BY s.cluster_id
    """,
)
def dedup_keep_best(spark, sf_dir):
    """Canonical-document selection — the step a real pipeline runs
    AFTER cluster resolution: within each near-dup cluster keep the
    highest-quality member (here: most characters, ties to the smaller
    doc_id) instead of the arbitrary min-id representative. Shape: the
    component labels come from the same min-label propagation
    (edge-set-sized shuffles), the quality join touches one narrow
    column of the corpus, and the per-cluster argmax is a map-side
    combinable max_by — no window over the corpus. The recursive-CTE
    oracle recomputes the fixpoint and the argmax independently."""
    pairs = scoped_persist(_jaccard_pairs(spark, sf_dir))
    nodes = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    labels = connected_components_dedup(pairs, nodes)
    quality = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    scored = labels.join(quality, "doc_id")
    # max_by with a (quality DESC, doc_id ASC) struct key — deterministic
    best_key = F.struct(
        (-F.col("n_chars")).alias("neg_chars"), F.col("doc_id").alias("tie")
    )
    return (
        scored.groupBy("cluster_id")
        .agg(
            F.min_by("doc_id", best_key).alias("kept_doc"),
            F.max("n_chars").cast("bigint").alias("kept_chars"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .orderBy("cluster_id")
    )


@query(
    "source_mix_rebalance",
    r"""
    WITH per_doc AS (
      SELECT source,
             len(string_split_regex(trim(text), '\s+')) AS toks
      FROM documents
    ), per_src AS (
      SELECT source, COUNT(*) AS docs,
             CAST(SUM(toks) AS BIGINT) AS tokens
      FROM per_doc GROUP BY source
    ), tot AS (
      SELECT SUM(tokens) AS all_tokens FROM per_src
    )
    SELECT source, docs, tokens,
           ROUND(tokens * 1.0 / all_tokens, 6) AS current_frac,
           CAST(0.25 AS DOUBLE) AS target_frac,
           ROUND(LEAST(0.25 / (tokens * 1.0 / all_tokens), 4.0), 6)
             AS sample_weight
    FROM per_src CROSS JOIN tot
    ORDER BY source
    """,
)
def source_mix_rebalance(spark, sf_dir):
    """Domain-mix rebalancing — the sampling-weight computation a
    multi-source corpus build runs to hit a target token distribution
    (uniform across the four synthetic sources here): per-source token
    totals in one partial/final aggregation, one-row grand total
    re-entering via broadcast (the fts_bm25 stats shape), weight =
    target/current capped at 4x (upsampling a tiny source without
    bound re-reads it forever — the cap is the standard practice and
    keeps the weight finite if a source nearly vanishes). Token counts
    are exact integers, so the fractions are shuffle-order
    deterministic; the bare target literal is CAST to DOUBLE in the
    oracle because a DuckDB `0.25` is DECIMAL(3,2) and the gate hashes
    representations (registry DOUBLE convention). The SUM is CAST to
    BIGINT in the oracle because DuckDB's SUM(BIGINT) is HUGEINT, which
    pandas renders as float64 (1435.0 vs Spark's int64 1435) — the r6
    hash_match=false on this query, the third representation-trap
    class after decimal and list."""
    d = table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    per_src = d.select("source", toks.alias("toks")).groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("toks").alias("tokens")
    )
    tot = per_src.agg(F.sum("tokens").alias("all_tokens"))
    cur = F.col("tokens") * F.lit(1.0) / F.col("all_tokens")
    target = F.lit(0.25)
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "docs",
            "tokens",
            F.round(cur, 6).alias("current_frac"),
            target.alias("target_frac"),
            F.round(F.least(target / cur, F.lit(4.0)), 6).alias(
                "sample_weight"
            ),
        )
        .orderBy("source")
    )


@query(
    "source_mix_temperature",
    """
    WITH per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
               AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS all_tokens
            FROM per_src),
    p AS (
      SELECT source, docs, tokens,
             CAST(SQRT(tokens * 1.0 / all_tokens) AS DECIMAL(28,12))
               AS sd,
             tokens * 1.0 / all_tokens AS cur
      FROM per_src, tot
    ),
    z AS (SELECT CAST(SUM(sd) AS DOUBLE) AS z FROM p)
    SELECT source, docs, tokens,
           ROUND(cur, 6) AS current_frac,
           ROUND(CAST(sd AS DOUBLE) / z, 6) AS resampled_frac,
           ROUND(CAST(sd AS DOUBLE) / z / cur, 6) AS sample_weight
    FROM p, z ORDER BY source
    """,
)
def source_mix_temperature(spark, sf_dir):
    """Temperature-based domain mixing (the multilingual alpha-
    sampling rule: q_i ∝ p_i^α, here α = 0.5) — the OTHER standard
    source-rebalancing policy next to source_mix_rebalance's fixed
    targets: upsamples tail sources, downsamples heads, keeps the
    ranking.  α = 0.5 is deliberately √ (IEEE-correctly-rounded in
    both engines, unlike pow whose last bit is libm-dependent), and
    the normalizer Σ√p is summed in DECIMAL so the 4-row total is
    shuffle-order-free — determinism engineered at the operator level,
    like every weight in this family.  Scale: one partial/final agg
    over the corpus, a one-row broadcast re-entry, a 4-row cross join
    — nothing grows with corpus size except the first scan."""
    d = table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    per_src = d.select("source", toks.alias("toks")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("docs"), F.sum("toks").alias("tokens")
    )
    tot = per_src.agg(F.sum("tokens").alias("all_tokens"))
    p = per_src.crossJoin(F.broadcast(tot)).select(
        "source", "docs", "tokens",
        F.sqrt(F.col("tokens") * F.lit(1.0) / F.col("all_tokens"))
        .cast("decimal(28,12)").alias("sd"),
        (F.col("tokens") * F.lit(1.0) / F.col("all_tokens"))
        .alias("cur"),
    )
    z = p.agg(F.sum("sd").cast("double").alias("z"))
    return (
        p.crossJoin(F.broadcast(z))
        .select(
            "source", "docs", "tokens",
            F.round("cur", 6).alias("current_frac"),
            F.round(F.col("sd").cast("double") / F.col("z"), 6)
            .alias("resampled_frac"),
            F.round(
                F.col("sd").cast("double") / F.col("z") / F.col("cur"), 6
            ).alias("sample_weight"),
        )
        .orderBy("source")
    )


_EPOCH = 1
_N_SHARDS = 4
_EK = f"md5('epoch{_EPOCH}:' || CAST(doc_id AS STRING))"
_EK_DUCK = f"md5('epoch{_EPOCH}:' || CAST(doc_id AS VARCHAR))"
# shard from the first two hex nibbles (0..255) mod N — same arithmetic
# spelled with conv() in Spark and strpos-per-nibble in DuckDB
_SHARD = f"conv(substring({_EK}, 1, 2), 16, 10) % {_N_SHARDS}"
_SHARD_DUCK = (
    f"(((strpos('0123456789abcdef', {_EK_DUCK}[1:1]) - 1) * 16"
    f" + (strpos('0123456789abcdef', {_EK_DUCK}[2:2]) - 1)) % {_N_SHARDS})"
)


@query(
    "epoch_shuffle_shards",
    f"""
    WITH keyed AS (
      SELECT doc_id, {_EK_DUCK} AS ekey,
             CAST({_SHARD_DUCK} AS INT) AS shard
      FROM documents
    ), ranked AS (
      SELECT doc_id, ekey, shard,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ekey, doc_id)
                 AS pos
      FROM keyed
    )
    SELECT CAST({_EPOCH} AS INT) AS epoch, shard, CAST(pos AS INT) AS pos,
           doc_id, ekey
    FROM ranked WHERE pos <= 5
    ORDER BY shard, pos
    """,
)
def epoch_shuffle_shards(spark, sf_dir):
    """Deterministic training-order shuffle: every epoch assigns each
    document a pseudorandom sort key md5('epoch<N>:' || doc_id) and a
    data-parallel worker shard from the key's leading byte — the
    standard recipe for reproducible, seedable global shuffles of a
    training corpus (no RNG state, identical on any cluster size or
    retry; changing the epoch literal re-shuffles everything). ADDITIVE
    beyond the reference — this is the consumer-side op an LLM data
    pipeline runs after curation.

    Scale shape: key + shard are map-side expressions; the per-shard
    ordering is ROW_NUMBER partitioned by shard — ONE shuffle on the
    shard key, which at 100 TB is the same partitioning the sharded
    training files are written with (write.partitionBy(shard) +
    sortWithinPartitions(key)), so the shuffle does double duty as the
    output layout. The gate samples the first 5 positions per shard."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.expr(_EK).alias("ekey"),
        F.expr(_SHARD).cast("int").alias("shard"),
    )
    w = W.partitionBy("shard").orderBy("ekey", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("int"))
        .filter(F.col("pos") <= 5)
        .select(
            F.lit(_EPOCH).cast("int").alias("epoch"),
            "shard",
            "pos",
            "doc_id",
            "ekey",
        )
        .orderBy("shard", "pos")
    )


# --- DSIR: data selection via importance resampling -----------------------

_DSIR_V = 64          # hashed feature buckets (paper: 10^4; small here so
                      # every bucket is exercised at test scale)
_DSIR_K = 50          # resample size
# target seed set: every 10th doc stands in for the "high-quality" corpus
_DSIR_TARGET = "doc_id % 10 = 0"


def _duck_nib2(expr: str) -> str:
    """First two md5 nibbles of ``expr`` as an int (DuckDB spelling of
    Spark's conv(substring(md5(x),1,2),16,10))."""
    return (
        f"((strpos('0123456789abcdef', md5({expr})[1:1]) - 1) * 16"
        f" + (strpos('0123456789abcdef', md5({expr})[2:2]) - 1))"
    )


@query(
    "dsir_importance_resample",
    rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id, g FROM toks, unnest(w) AS t(g)
      UNION ALL
      SELECT doc_id, w[p] || ' ' || w[p + 1] AS g
      FROM toks, unnest(range(1, len(w))) AS r(p)
    ),
    counts AS (
      SELECT doc_id, {_duck_nib2('g')} % {_DSIR_V} AS b,
             COUNT(*) AS cnt
      FROM grams GROUP BY doc_id, b
    ),
    tgt AS (
      SELECT b, SUM(cnt) AS c FROM counts
      WHERE {_DSIR_TARGET} GROUP BY b
    ),
    raw AS (SELECT b, SUM(cnt) AS c FROM counts GROUP BY b),
    ratio AS (
      SELECT r.b,
             ROUND(ln((COALESCE(t.c, 0) + 1.0)
                      / ((SELECT SUM(c) FROM tgt) + {_DSIR_V}))
                   - ln((r.c + 1.0)
                        / ((SELECT SUM(c) FROM raw) + {_DSIR_V})),
                   6) AS lr
      FROM raw r LEFT JOIN tgt t USING (b)
    ),
    scored AS (
      SELECT c.doc_id,
             CAST(SUM(CAST(c.cnt * r.lr AS DECIMAL(18,6))) AS DOUBLE)
               AS score
      FROM counts c JOIN ratio r USING (b) GROUP BY c.doc_id
    ),
    keyed AS (
      SELECT doc_id, score,
             ROUND(-ln(-ln(({_SQL_H8} + 1) / 4294967297.0)), 6) AS gumbel
      FROM scored
    )
    SELECT doc_id, score, gumbel,
           ROUND(score + gumbel, 6) AS sample_key
    FROM keyed
    ORDER BY score + gumbel DESC, doc_id LIMIT {_DSIR_K}
    """,
)
def dsir_importance_resample(spark, sf_dir):
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023, arXiv:2302.03169): hashed n-gram features (unigrams +
    bigrams into V=64 buckets), Laplace-smoothed bucket
    distributions for a target seed set vs the raw corpus, per-document
    importance weight  log w = sum_b count_b * (log p_target(b) -
    log p_raw(b)),  then Gumbel-top-k resampling — the published recipe
    for biasing a raw crawl toward a quality domain without training a
    classifier.  Reference: no analogue (LLM-pipeline extension per
    BASELINE.json, beside the quality/dedup operators).

    Determinism: log-ratios rounded to 6 dp (absorbs any libm ulp skew
    between engines), per-doc score summed via the DECIMAL(18,6)
    convention, Gumbel noise derived from md5(doc_id) — the seeded,
    partitioning-independent form of the paper's random Gumbel keys.

    Scale: one map-side pass hashes grams to bucket ids and
    pre-aggregates (doc_id, bucket) counts — the shuffle carries at
    most V short rows per document, never token text; the two
    distribution tables are V rows (broadcast); scoring is one
    co-partitioned join + short-key groupBy; selection is a TakeOrdered
    heap.  This is exactly how DSIR runs over a 100 TB crawl."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim(F.col("text")), r"\s+")
    toks = d.select("doc_id", w.alias("w"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("w"),
                F.when(
                    F.size("w") >= 2,
                    F.expr(
                        "transform(sequence(1, size(w) - 1),"
                        " i -> concat(element_at(w, i), ' ',"
                        " element_at(w, i + 1)))"
                    ),
                ).otherwise(F.expr("array()")),
            )
        ).alias("g"),
    )
    counts = (
        grams.select(
            "doc_id",
            (F.expr("conv(substring(md5(g), 1, 2), 16, 10)")
             .cast("long") % _DSIR_V).alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # three consumers (target dist, raw dist, scoring) — persist so
        # the corpus text is tokenized/hashed ONCE, not re-scanned per
        # consumer; DISK_ONLY because counts is corpus-rows × ≤V and
        # must not compete for executor memory at 100 TB
        .transform(lambda _df: scoped_persist(_df, StorageLevel.DISK_ONLY))
    )
    tgt = (
        counts.filter(F.expr(_DSIR_TARGET))
        .groupBy("b").agg(F.sum("cnt").alias("tc"))
    )
    raw = counts.groupBy("b").agg(F.sum("cnt").alias("rc"))
    tgt_tot = tgt.agg(F.sum("tc").alias("tt"))
    raw_tot = raw.agg(F.sum("rc").alias("rt"))
    ratio = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(raw_tot))
        .select(
            "b",
            F.round(
                F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
                      / (F.col("tt") + _DSIR_V))
                - F.log((F.col("rc") + 1.0) / (F.col("rt") + _DSIR_V)),
                6,
            ).alias("lr"),
        )
    )
    scored = (
        counts.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("cnt") * F.col("lr")).cast("decimal(18,6)"))
            .cast("double")
            .alias("score")
        )
    )
    gumbel = F.round(
        -F.log(-F.log((F.expr(_H8) + 1) / F.lit(4294967297.0))), 6
    )
    keyed = scored.select("doc_id", "score", gumbel.alias("gumbel"))
    return (
        keyed.select(
            "doc_id", "score", "gumbel",
            F.round(F.col("score") + F.col("gumbel"), 6)
            .alias("sample_key"),
        )
        .orderBy((F.col("score") + F.col("gumbel")).desc(), "doc_id")
        .limit(_DSIR_K)
    )


# ------------------------------------------------------------------ chunking
# RAG / context-window chunking — fixed windows with overlap over each
# document, the preprocessing stage that turns documents into
# model-window-sized training/retrieval units.  Both variants are pure
# codegen: explode(sequence(0, n_chunks-1)) generates chunk indexes
# JVM-side, substring/slice cuts the window — no UDF, no shuffle beyond
# the explode's narrow dependency, and the chunk math is a pure
# function of the document so re-chunking a grown corpus never moves
# old chunks.

def chunk_by_chars(df, text_col: str, size: int, overlap: int,
                   id_col: str = "doc_id"):
    """Character-window chunks: windows of ``size`` chars starting
    every ``size - overlap`` chars while the start is inside the
    document (the last window may be short).  Returns (id, chunk_idx,
    chunk, chunk_len)."""
    if not 0 <= overlap < size:
        raise ValueError("chunk_by_chars: need 0 <= overlap < size")
    stride = size - overlap
    n = F.greatest(
        F.ceil(F.length(F.col(text_col)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    return (
        df.select(
            F.col(id_col),
            F.col(text_col).alias("__t"),
            F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.expr(f"substring(__t, chunk_idx * {stride} + 1, {size})")
            .alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk"))
    )


def chunk_by_words(df, text_col: str, n_words: int, overlap: int,
                   id_col: str = "doc_id"):
    """Word-window chunks over the whitespace token stream: windows of
    ``n_words`` tokens every ``n_words - overlap`` tokens (the
    fixed-token-window chunking retrieval pipelines use).  Returns
    (id, chunk_idx, chunk, n_tokens)."""
    if not 0 <= overlap < n_words:
        raise ValueError("chunk_by_words: need 0 <= overlap < n_words")
    stride = n_words - overlap
    ws = F.split(F.trim(F.regexp_replace(
        F.col(text_col), r"\s+", " ")), " ")
    n = F.greatest(
        F.ceil(F.size(ws) / F.lit(stride)), F.lit(1)
    ).cast("int")
    return (
        df.select(
            F.col(id_col),
            ws.alias("__w"),
            F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.expr(
                f"array_join(slice(__w, chunk_idx * {stride} + 1,"
                f" {n_words}), ' ')"
            ).alias("chunk"),
            F.expr(
                f"size(slice(__w, chunk_idx * {stride} + 1, {n_words}))"
            ).alias("n_tokens"),
        )
    )


@query(
    "chunk_documents_chars",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0
    ), n AS (
      SELECT doc_id, text,
             CAST(GREATEST(CEIL(length(text) / 150.0), 1) AS INT) AS nch
      FROM d
    ), ix AS (
      SELECT doc_id, text,
             unnest(generate_series(0, nch - 1)) AS chunk_idx
      FROM n
    ), c AS (
      SELECT doc_id, chunk_idx,
             substring(text, chunk_idx * 150 + 1, 200) AS chunk
      FROM ix
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           md5(chunk) AS chunk_md5,
           CAST(length(chunk) AS INT) AS chunk_len
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def chunk_documents_chars(spark, sf_dir):
    """Character-window chunking end-to-end: 200-char windows with
    50-char overlap (stride 150) over a deterministic corpus slice;
    the oracle derives the same windows with generate_series +
    substring, and the md5 of every chunk pins byte-exact window
    boundaries, not just counts.

    Scale: explode(sequence) is a narrow generated relation — chunking
    100 TB is map-side work with output ~size/stride × corpus, no
    shuffle, no UDF."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 17 == 0
    )
    return (
        chunk_by_chars(d, "text", size=200, overlap=50)
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int"),
            F.md5("chunk").alias("chunk_md5"),
            F.col("chunk_len").cast("int"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "chunk_documents_words",
    """
    WITH d AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                          ' ') AS ws
      FROM documents WHERE doc_id % 23 = 0
    ), n AS (
      SELECT doc_id, ws,
             CAST(GREATEST(CEIL(len(ws) / 24.0), 1) AS INT) AS nch
      FROM d
    ), ix AS (
      SELECT doc_id, ws,
             unnest(generate_series(0, nch - 1)) AS chunk_idx
      FROM n
    ), c AS (
      SELECT doc_id, chunk_idx,
             array_to_string(ws[chunk_idx * 24 + 1 : chunk_idx * 24 + 32],
                             ' ') AS chunk,
             len(ws[chunk_idx * 24 + 1 : chunk_idx * 24 + 32]) AS n_tokens
      FROM ix
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           md5(chunk) AS chunk_md5,
           CAST(n_tokens AS INT) AS n_tokens
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def chunk_documents_words(spark, sf_dir):
    """Word-window chunking end-to-end: 32-token windows, 8-token
    overlap (stride 24), md5-pinned chunk text against the oracle's
    list-slice formulation.  The window math runs on the whitespace
    token stream both sides, so boundaries are engine-independent."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 23 == 0
    )
    return (
        chunk_by_words(d, "text", n_words=32, overlap=8)
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int"),
            F.md5("chunk").alias("chunk_md5"),
            F.col("n_tokens").cast("int"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# --------------------------------------------------------------------------
# Bloom-prefiltered decontamination — the semi-join-reduction shape for
# membership tests at corpus scale: a constant-size mergeable bloom
# filter built over the eval split's shingles (seeded xxhash64 bit
# positions packed into longs with a BIT_OR aggregate — the same
# mergeable-sketch algebra as the Count-Min/HLL rows), broadcast as ONE
# row (~8 KB), probed map-side on the training corpus BEFORE the exact
# shingle equi-join.  The bloom only PREFILTERS (false positives pass);
# the exact join verifies, so the result is exact and oracle-checkable.
# At 100 TB this is the difference between shuffling every corpus
# shingle into the join and shuffling only the ~contaminated tail —
# the hand-rolled form of the runtime bloom filters Catalyst injects
# for selective joins (SCALE.md).
# --------------------------------------------------------------------------
_BLOOM_N = 5        # shingle width (words)
_BLOOM_BITS = 1 << 16   # 65536 bits = 1024 packed longs
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 3        # hash functions (seeded xxhash64)


def _bloom_shingles(d):
    w = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
        " ",
    )
    t = d.select("doc_id", w.alias("w")).filter(F.size("w") >= _BLOOM_N)
    return t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - _BLOOM_N),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("w"), i + 1, _BLOOM_N)
                ),
            )
        ).alias("shingle"),
    ).dropDuplicates(["doc_id", "shingle"])


def build_bloom(df, col: str):
    """One-row DataFrame holding the bloom as ARRAY<BIGINT>(_BLOOM_WORDS):
    per value, _BLOOM_K seeded-hash bit positions; per 64-bit word, a
    BIT_OR partial aggregate (mergeable across partitions — the classic
    distributed-sketch build, no driver collect)."""
    spark = df.sparkSession
    pos = df.select(
        F.explode(
            F.array(*[
                F.pmod(F.xxhash64(F.col(col), F.lit(i)),
                       F.lit(_BLOOM_BITS))
                for i in range(_BLOOM_K)
            ])
        ).alias("p")
    )
    words = pos.selectExpr(
        "CAST(p / 64 AS LONG) AS w",
        "SHIFTLEFT(CAST(1 AS BIGINT), CAST(p % 64 AS INT)) AS b",
    ).groupBy("w").agg(F.bit_or("b").alias("m"))
    dense = (
        spark.range(_BLOOM_WORDS)
        .join(words, F.col("id") == F.col("w"), "left")
        .select("id", F.coalesce("m", F.lit(0).cast("long")).alias("m"))
    )
    return dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("id", "m"))),
            lambda s: s["m"],
        ).alias("bloom")
    )


def _bloom_hit(bloom_name: str, value_name: str):
    """TRUE when every seeded bit position is set — the map-side probe
    (pure codegen expression over the bloom array)."""
    conds = []
    for i in range(_BLOOM_K):
        p = f"pmod(xxhash64({value_name}, {i}), {_BLOOM_BITS})"
        word = f"element_at({bloom_name}, CAST({p} / 64 AS INT) + 1)"
        bit = f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))"
        conds.append(f"(({word} & {bit}) != 0)")
    return F.expr(" AND ".join(conds))


def bloom_literal(bloom_df) -> str:
    """Materialize the one-row bloom as a SQL array literal (the sketch
    is CONSTANT-SIZE — 8 KB at these parameters — so pulling it to the
    driver is the broadcast-variable shape, not a data collect).  A
    literal, unlike a joined column, stays a plain Filter predicate
    that Catalyst pushes BELOW every join — exactly the prefilter
    position the pattern needs (a filter referencing a join output can
    never run before that join, and Catalyst happily reorders the
    verify join below it — observed on the joined form of this
    operator)."""
    words = bloom_df.first()["bloom"]
    return "array(" + ",".join(f"{w}L" for w in words) + ")"


@query(
    "decontaminate_bloom_prefilter",
    f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(1, len(w) - {_BLOOM_N} + 2),
               i -> array_to_string(w[i : i + {_BLOOM_N} - 1], ' ')))
               AS shingle
      FROM toks WHERE len(w) >= {_BLOOM_N}
    ), eval_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    ), contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
      WHERE s.doc_id % 97 <> 0
    )
    SELECT d.doc_id AS doc_id,
           CAST(c.doc_id IS NOT NULL AS BOOLEAN) AS contaminated
    FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    ORDER BY doc_id
    """,
)
def decontaminate_bloom_prefilter(spark, sf_dir):
    """Exact decontamination verdict per training doc, with the exact
    shingle join fed through a bloom prefilter: the eval split's
    5-gram bloom (65536 bits, 3 seeded hashes, BIT_OR-packed longs)
    is built distributed and shipped as an 8 KB constant (the
    broadcast-variable shape); training shingles probe it as a plain
    map-side Filter and only survivors reach the equi-join; the join
    removes the bloom's false positives, so the verdict equals the
    oracle's plain exact overlap.

    Scale: the bloom build is one short-key aggregation over the
    (tiny) eval split; the probe is pure codegen on the corpus scan
    with NO shuffle — and because it is a literal predicate, Catalyst
    keeps it BELOW the verify join (test_plan_quality pins the order);
    only ~contaminated shingles shuffle into the join.  False-positive
    rate at these parameters and the gate's eval size is ~2e-5."""
    d = table(spark, sf_dir, "documents")
    # three consumers of the shingle stream (bloom build via eval_sh,
    # the verify semi-join's eval side, the train probe side) — persist
    # DISK_ONLY so tokenize+explode runs once (the _jaccard_pairs
    # convention; measured 1.56 → 1.1 s at sf0.1)
    shingles = _bloom_shingles(d).transform(lambda _df: scoped_persist(_df, StorageLevel.DISK_ONLY))
    eval_sh = (
        shingles.filter(F.col("doc_id") % 97 == 0)
        .select("shingle").distinct()
    )
    bloom = bloom_literal(build_bloom(eval_sh, "shingle"))
    train = shingles.filter(F.col("doc_id") % 97 != 0)
    candidates = (
        train.filter(_bloom_hit(bloom, "shingle"))
        .select("doc_id", "shingle")
    )
    contaminated = (
        candidates.join(eval_sh, "shingle", "left_semi")
        .select("doc_id").distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        d.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id").distinct()
        .join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("hit", F.lit(False)).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def bloom_prefilter_stats(spark, sf_dir) -> dict:
    """EXPLAIN-grade evidence for the decontamination bloom prefilter
    (the r10 verdict's routing-evidence item): the sketch's exact
    byte size (constant — the broadcast-variable shape), the train
    shingle count, the candidates that survive the map-side probe,
    and the prune ratio the verify join never sees.  The sketch is
    ALWAYS _BLOOM_WORDS longs = 8 KB regardless of corpus size; the
    prune ratio is what makes the exact join affordable at 100 TB."""
    d = table(spark, sf_dir, "documents")
    shingles = _bloom_shingles(d)
    eval_sh = (
        shingles.filter(F.col("doc_id") % 97 == 0)
        .select("shingle").distinct()
    )
    bloom = bloom_literal(build_bloom(eval_sh, "shingle"))
    train = shingles.filter(F.col("doc_id") % 97 != 0)
    row = train.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(_bloom_hit(bloom, "shingle"), 1).otherwise(0))
        .alias("hits"),
    ).first()
    total, hits = int(row["total"]), int(row["hits"] or 0)
    return {
        "sketch_bytes": _BLOOM_WORDS * 8,
        "bloom_bits": _BLOOM_BITS,
        "hashes": _BLOOM_K,
        "train_shingles": total,
        "probe_survivors": hits,
        "prune_ratio": round(1.0 - hits / total, 6) if total else 0.0,
    }


# ------------------------------------------------------------------ BPE

# The DuckDB oracle replays the identical rounds as chained CTEs:
# w<k> = vocab after k merges, p<k+1> = that round's argmax pair.
# 32 rounds with a lineage cut every 8 proves the bounded-plan shape
# a real tokenizer run (30k+ merges) needs: each checkpoint
# materializes the vocab frame and truncates the fold chain, so plan
# depth is O(_BPE_CHECKPOINT_EVERY), never O(rounds).
_BPE_ROUNDS = 32
_BPE_CHECKPOINT_EVERY = 8


def _bpe_oracle_prefix(rounds: int) -> str:
    """The shared CTE chain: word-freq vocab, then per round k the
    arg-max pair p<k> and the merged vocab w<k>.  Every w<k> is
    referenced TWICE (by p<k+1> and w<k+1>), so each CTE is declared
    AS MATERIALIZED — inlining would re-expand the chain ~2^rounds
    times (at 32 rounds the planner exhausts file handles before it
    exhausts patience)."""
    head = """
    WITH words AS MATERIALIZED (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(trim(regexp_replace(
              lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY w
    ), w0 AS MATERIALIZED (
      SELECT word, freq,
             list_transform(range(1, length(word) + 1),
                            i -> substr(word, CAST(i AS INT), 1)) AS syms
      FROM words
    )"""
    parts = [head]
    for k in range(1, rounds + 1):
        parts.append(f""", p{k} AS MATERIALIZED (
      SELECT pr[1] AS l, pr[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq,
                   unnest(list_transform(range(1, len(syms)),
                          i -> [syms[i], syms[i + 1]])) AS pr
            FROM w{k - 1} WHERE len(syms) > 1)
      GROUP BY pr[1], pr[2]
      ORDER BY cnt DESC, l, r LIMIT 1
    )""")
        parts.append(f""", w{k} AS MATERIALIZED (
      SELECT word, freq,
        list_reduce(list_transform(syms, s -> [s]),
          (acc, x) -> CASE WHEN acc[-1] = p{k}.l AND x[1] = p{k}.r
                      THEN list_append(acc[1:len(acc) - 1],
                                       p{k}.l || p{k}.r)
                      ELSE list_concat(acc, x) END) AS syms
      FROM w{k - 1}, p{k}
    )""")
    return "".join(parts)


def _bpe_oracle(rounds: int) -> str:
    sel = "\n    UNION ALL ".join(
        f"SELECT {k} AS round, l, r, cnt FROM p{k}"
        for k in range(1, rounds + 1)
    )
    return f"{_bpe_oracle_prefix(rounds)}\n    {sel}\n    ORDER BY round"


@query("bpe_learn_merges", _bpe_oracle(_BPE_ROUNDS))
def bpe_learn_merges(spark, sf_dir):
    """Distributed BPE vocabulary induction (Sennrich et al. 2016;
    the subword tokenizer-training step of every LLM data pipeline):
    learn the first N merge rules over the corpus' word vocabulary —
    each round counts weighted adjacent symbol pairs, takes the
    arg-max pair (ties break lexicographically), and applies the
    merge as a greedy left-to-right fold over each word's symbols.

    Spark-first shape: the CORPUS is touched exactly once — one
    shuffle builds the (word, freq) vocabulary — and every round
    after that runs on the vocab frame: pair extraction is a codegen
    transform/explode, the weighted count is a short-key partial/
    final aggregate, the arg-max is TakeOrdered(1), and the merge
    application is a higher-order ``aggregate()`` fold (whole-stage
    codegen, no Python).  Only the N rule rows ever reach the driver.

    At 100 TB: |vocab| ≪ |corpus| (the heavy-tail dedupes into freq),
    so rounds cost O(|vocab|) each, and the vocab frame
    localCheckpoints every _BPE_CHECKPOINT_EVERY rounds — plan depth
    stays O(checkpoint interval) however many merges run (a real
    tokenizer run is 30k+; an unbounded fold chain is an analyzer/
    codegen blowup).  test_plan_quality pins the bounded plan."""
    rules, _vocab = _learn_bpe(spark, sf_dir)
    return spark.createDataFrame(
        rules, "round INT, l STRING, r STRING, cnt BIGINT"
    )


def _bpe_word_split():
    """Lazy Column (module import must not require a live session)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")),
        " ",
    )


# learned-tokenizer memo: (session, sf_dir, rounds) → (rules, vocab).
# A tokenizer is trained once and applied many times — learn and
# segment share one training run, exactly the production contract.
# The cached vocab frame is localCheckpoint-materialized, so reuse is
# a partition read, not a replay.  Keyed on applicationId (stable per
# SparkContext), NOT id(spark): a stopped session's id can be reused
# by a new one, which would serve checkpoint RDDs bound to the dead
# context.
_BPE_CACHE: dict[tuple[str, str, int], tuple[list, DataFrame]] = {}


def _learn_bpe(spark, sf_dir):
    """(rules, post-merge vocab frame) for _BPE_ROUNDS over the
    documents corpus — the shared core of bpe_learn_merges (reports
    the rules) and bpe_segment_tokens (applies the final vocab).

    Lineage control: every _BPE_CHECKPOINT_EVERY rounds the vocab
    frame localCheckpoints (eager) — the fold chain truncates to a
    materialized leaf, so the composed plan is O(interval) deep
    regardless of round count, and each round's arg-max job replays
    at most interval-1 folds."""
    key = (spark.sparkContext.applicationId, str(sf_dir), _BPE_ROUNDS)
    hit = _BPE_CACHE.get(key)
    if hit is not None:
        return hit
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_bpe_word_split()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "syms",
            F.expr(
                "transform(sequence(1, length(word)),"
                " i -> substr(word, i, 1))"
            ),
        )
        # |vocab| ≪ |corpus|: a handful of partitions keeps the 32
        # per-round arg-max jobs from paying 32-task scheduling
        # overhead each (at real scale, size this to |vocab|/2M rows)
        .repartition(4)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rules = []
    vocab = words
    checkpointed = False
    for rnd in range(1, _BPE_ROUNDS + 1):
        rows = (
            vocab.filter(F.size("syms") > 1)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS l,"
                        " element_at(syms, i + 1) AS r))"
                    )
                ).alias("pr"),
            )
            .groupBy("pr.l", "pr.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not rows:  # vocabulary fully merged: no pairs remain
            break
        top = rows[0]
        rules.append((rnd, top.l, top.r, int(top.cnt)))
        lq = top.l.replace("'", "\\'")
        rq = top.r.replace("'", "\\'")
        vocab = vocab.withColumn(
            "syms",
            F.expr(
                "aggregate(syms, cast(array() as array<string>),"
                " (acc, s) -> case when size(acc) > 0"
                f" and element_at(acc, -1) = '{lq}' and s = '{rq}'"
                " then concat(slice(acc, 1, size(acc) - 1),"
                f" array('{lq}{rq}'))"
                " else concat(acc, array(s)) end)"
            ),
        )
        checkpointed = rnd % _BPE_CHECKPOINT_EVERY == 0
        if checkpointed:
            vocab = vocab.localCheckpoint(eager=True)
    if not checkpointed:
        vocab = vocab.localCheckpoint(eager=True)
    words.unpersist()
    _BPE_CACHE[key] = (rules, vocab)
    return rules, vocab


@query(
    "bpe_segment_tokens",
    _bpe_oracle_prefix(_BPE_ROUNDS) + f""", occ AS (
      SELECT source, unnest(string_split_regex(trim(regexp_replace(
               lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS word
      FROM documents
    )
    SELECT o.source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(v.syms)) AS BIGINT) AS n_subwords,
           ROUND(CAST(SUM(len(v.syms)) AS DOUBLE) / COUNT(*), 6)
             AS subwords_per_word
    FROM occ o JOIN w{_BPE_ROUNDS} v ON o.word = v.word
    WHERE o.word <> ''
    GROUP BY o.source ORDER BY o.source""",
)
def bpe_segment_tokens(spark, sf_dir):
    """BPE segmentation applied corpus-wide — the tokenizer-apply
    step that follows merge learning (SentencePiece/GPT-2 BPE encode,
    public algorithm): per-source subword token statistics under the
    learned _BPE_ROUNDS merges.

    Spark-first shape: the merges fold ONCE PER DISTINCT WORD on the
    vocab frame (never per occurrence), and the corpus re-joins the
    segmented vocab on the word key — at 100 TB that join broadcasts
    or shuffles a |vocab|-sized relation against the token stream,
    which is exactly how production tokenizer-stat jobs avoid
    re-encoding every occurrence.  The oracle replays the rounds as
    chained list_reduce CTEs and joins the same way.  The learned
    vocab comes from the memoized training run (localCheckpointed —
    the returned plan joins a MATERIALIZED leaf, not a 32-fold
    chain)."""
    _rules, vocab = _learn_bpe(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    occ = (
        d.select(
            "source", F.explode(_bpe_word_split()).alias("word")
        )
        .filter(F.col("word") != "")
    )
    seg = vocab.select("word", F.size("syms").alias("n_syms"))
    return (
        occ.join(seg, "word")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_subwords"),
        )
        .select(
            "source",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_subwords").cast("long").alias("n_subwords"),
            F.round(
                F.col("n_subwords").cast("double") / F.col("n_words"), 6
            ).alias("subwords_per_word"),
        )
        .orderBy("source")
    )
