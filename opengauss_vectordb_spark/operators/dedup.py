"""Deduplication operators over `documents` — exact, MinHash-LSH, and
n-gram Jaccard. The large-scale training-data-pipeline surface.

Scale design (the point of each implementation):
  * exact:   groupBy(md5(text)) — one shuffle on a short hash key, never
             on the full document text.
  * minhash: per-doc signature is computed map-side from shingles (no
             shuffle); the LSH candidate join shuffles only
             (band, signature) pairs — tiny vs the corpus — and the
             band-bucket join replaces the O(n²) cross join.
  * jaccard: shingle-explode + equi-join on the shingle string, counting
             common shingles per pair map-side before the pair-level agg;
             candidate pruning keeps pair cardinality near-linear for
             real corpora.

Hashes are md5 hex strings (identical in every engine) so MIN() over
signatures and band-bucket equality are portable and deterministic — no
engine-specific hash seeds anywhere.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from ._util import scoped_persist
from .text import shingle_stream, shingles, tokens

N_BANDS = 4


@query(
    "dedup_exact",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
    FROM documents GROUP BY source ORDER BY source
    """,
)
def dedup_exact(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.col("text").cast("binary"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(h).alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct(h)).alias("n_dups"),
        )
        .orderBy("source")
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       n_bands: int = N_BANDS,
                       shingle_pairs: DataFrame | None = None) -> DataFrame:
    """(id, band, sig): per-band MinHash signature (b bands × r=1 rows).

    Banding is b=4 bands × r=2 rows: 8 independent 32-bit minhash
    functions (the 8-hex-char slices of two salted digests per shingle),
    a band's signature is the concat of its 2 minhashes, and docs
    sharing any band signature are LSH candidates. P(candidate) =
    1-(1-J²)^4 — steep around J≈0.5, near-zero for unrelated docs
    (r=1 flags ~J per band and floods the pair join on skewed corpora).

    Shape: explode shingles → hash → groupBy-min per function. All
    codegen'd relational ops; the shuffle carries 8 short strings per
    doc, so the signature build is one cheap pass even at 100 TB.
    """
    # callers that also shingle-verify can pass their cached (id,
    # shingle) stream so the corpus is tokenized ONCE per pipeline;
    # MIN over the distinct shingle set equals MIN over the multiset,
    # so a deduplicated stream yields identical signatures
    pairs = (
        shingle_pairs
        if shingle_pairs is not None
        else shingle_stream(docs, text_col, id_col, 3)
    )
    hashed = pairs.select(
        F.col(id_col),
        F.md5(F.col("shingle").cast("binary")).alias("_h1"),
        F.md5(F.concat(F.col("shingle"), F.lit("#")).cast("binary")).alias("_h2"),
    )
    mins = hashed.groupBy(id_col).agg(
        *[F.min(F.substring("_h1", 8 * j + 1, 8)).alias(f"_m{j}") for j in range(4)],
        *[F.min(F.substring("_h2", 8 * j + 1, 8)).alias(f"_m{j + 4}") for j in range(4)],
    )
    stack_args = ", ".join(
        f"{b}, concat(_m{2 * b}, _m{2 * b + 1})" for b in range(n_bands)
    )
    return mins.select(
        id_col, F.expr(f"stack({n_bands}, {stack_args}) AS (band, sig)")
    )


@query(
    "dedup_minhash_lsh",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shingles
      FROM t WHERE len(w) >= 3
    ), hs AS (
      SELECT doc_id, md5(s) AS h1, md5(s || '#') AS h2
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
    ), mins AS (
      SELECT doc_id,
             MIN(h1[1:8]) AS m0, MIN(h1[9:16]) AS m1,
             MIN(h1[17:24]) AS m2, MIN(h1[25:32]) AS m3,
             MIN(h2[1:8]) AS m4, MIN(h2[9:16]) AS m5,
             MIN(h2[17:24]) AS m6, MIN(h2[25:32]) AS m7
      FROM hs GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM mins
      UNION ALL SELECT doc_id, 1, m2 || m3 FROM mins
      UNION ALL SELECT doc_id, 2, m4 || m5 FROM mins
      UNION ALL SELECT doc_id, 3, m6 || m7 FROM mins
    )
    SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
    FROM bands a JOIN bands c ON a.band = c.band AND a.sig = c.sig
                             AND a.doc_id < c.doc_id
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    # materialize signatures once: both sides of the candidate self-join
    # read the same tiny (n_docs × n_bands) table instead of re-hashing
    # the corpus twice
    sigs = scoped_persist(minhash_signatures(d))
    a = sigs.select(
        F.col("doc_id").alias("id_a"), "band", F.col("sig").alias("sig_a")
    )
    # right-side columns renamed so the equi-condition references two
    # DISTINCT attributes — same-attribute self-join conditions make
    # Catalyst log "trivially true equals predicate" noise that buries
    # real warnings (VERDICT r3 item 10)
    b = sigs.select(
        F.col("doc_id").alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
    )
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("sig_a") == F.col("sig_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
        .orderBy("id_a", "id_b")
    )


# Document-frequency cap on shingles: a shingle occurring in f docs emits
# O(f²) pairs in the shingle equi-join, so one boilerplate-hot shingle at
# corpus scale is a job-killer. Dropping shingles with df > cap (from the
# numerator AND the per-doc set sizes — the MinHashLSH-standard mitigation)
# bounds the per-shingle fanout. 1000 never binds at test SFs, so parity
# exercises the cap plumbing without changing small-data results.
SHINGLE_DF_CAP = 1000


@query(
    "dedup_ngram_jaccard",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      FROM t WHERE len(w) >= 3
    ), ex0 AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), freq AS (
      SELECT shingle, COUNT(*) AS df FROM ex0 GROUP BY shingle
    ), ex AS (
      SELECT e.doc_id, e.shingle FROM ex0 e
      JOIN freq f ON f.shingle = e.shingle
      WHERE f.df <= {SHINGLE_DF_CAP}
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT c.id_a, c.id_b,
           ROUND(c.n_common * 1.0
                 / (sa.n_sh + sb.n_sh - c.n_common), 6) AS jaccard
    FROM common c
    JOIN sz sa ON sa.doc_id = c.id_a
    JOIN sz sb ON sb.doc_id = c.id_b
    WHERE c.n_common * 1.0 / (sa.n_sh + sb.n_sh - c.n_common) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard over a df-capped shingle universe. This is
    the ORACLE-OF-RECORD form: even capped, the shingle self-join is
    quadratic in per-shingle document frequency, so at corpus scale run
    the LSH-gated pipeline (dedup_lsh_verified) and reserve this for
    validation samples."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    # distinct (doc, shingle) stream, df-capped; sizes over the capped
    # set. The df filter is a window count over the shingle partition —
    # ONE shuffle on the shingle key, instead of a groupBy + join that
    # would scan the stream twice
    ex0 = shingle_stream(d).dropDuplicates(["doc_id", "shingle"])
    # each (doc, shingle) row carries its doc's capped set size n_sh
    # (second window over the doc partition): the self-join can then
    # (a) apply the similarity-join LENGTH FILTER inside the join —
    # J >= 0.5 forces max(n_a, n_b) <= 2 * min(n_a, n_b), so mismatched
    # pairs are dropped BEFORE the pair aggregation shuffle — and
    # (b) group on (id, n) directly, eliminating the two per-doc size
    # re-joins the un-annotated stream needed afterwards
    ex = (
        ex0.withColumn("_df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
        .filter(F.col("_df") <= SHINGLE_DF_CAP)
        .withColumn("n_sh", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
        .select("doc_id", "shingle", "n_sh")
        # exploded shingles are CORPUS-sized (one row per 3-gram): spill
        # the reuse to local disk, never pin it in executor memory
        .transform(lambda _df: scoped_persist(_df, StorageLevel.DISK_ONLY))
    )
    a = ex.select(F.col("doc_id").alias("id_a"), "shingle", F.col("n_sh").alias("n_a"))
    b = ex.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingle").alias("shingle_b"),
        F.col("n_sh").alias("n_b"),
    )
    common = (
        a.join(
            b,
            (a.shingle == b.shingle_b)
            & (F.col("id_a") < F.col("id_b"))
            & (F.greatest(F.col("n_a"), F.col("n_b"))
               <= 2 * F.least(F.col("n_a"), F.col("n_b"))),
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") * F.lit(1.0) / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.filter(jac >= 0.5)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_simhash_pairs",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents
    ), nib AS (
      SELECT doc_id, len(w) AS n_tokens,
             list_transform(range(1, 17),
               p -> list_sum(list_transform(w,
                      tok -> strpos('0123456789abcdef', md5(tok)[p:p]) - 1)))
               AS nibble_sums
      FROM t
    ), sh AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(range(1, 17),
                    p -> CASE WHEN nibble_sums[p] * 2 >= 15 * n_tokens
                              THEN CAST(2 AS BIGINT) ** (p - 1) ELSE 0 END))
                  AS BIGINT) AS simhash16
      FROM nib
    ), bands AS (
      SELECT doc_id, simhash16, b AS band,
             (simhash16 >> (4 * b)) & 15 AS nibble
      FROM sh CROSS JOIN unnest([0, 1, 2, 3]) AS u(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, a.simhash16 AS h_a,
                      c.doc_id AS id_b, c.simhash16 AS h_b
      FROM bands a JOIN bands c
        ON a.band = c.band AND a.nibble = c.nibble AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(h_a, h_b)) <= 1
    ORDER BY id_a, id_b
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pair generation — the banded-candidate form
    (Charikar SimHash + the Manku/Jain/Sarma banding trick): split the
    16-bit fingerprint into 4 nibble bands; any shared (band, nibble)
    makes a candidate pair (a hamming-≤k pair MUST agree on ≥1 band when
    k < bands), verified by exact XOR popcount ≤ 1 (16 bits saturate
    on a shared-vocabulary corpus, so the verify bar is tight). The join is on short
    integer keys — never on text — and candidate cardinality is bounded
    by band-bucket occupancy, the same near-linear shape as MinHash-LSH.
    """
    from .text import simhash_table

    sh = scoped_persist(simhash_table(spark, sf_dir))
    bands = sh.select(
        "doc_id",
        "simhash16",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash16"), 4 * b)
                        .bitwiseAND(F.lit(15))
                        .alias("nibble"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("_bn"),
    ).select(
        "doc_id",
        "simhash16",
        F.col("_bn.band").alias("band"),
        F.col("_bn.nibble").alias("nibble"),
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash16").alias("h_a"),
        "band",
        "nibble",
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash16").alias("h_b"),
        F.col("band").alias("band_b"),
        F.col("nibble").alias("nibble_b"),
    )
    cand = (
        a.join(
            b,
            (a.band == b.band_b)
            & (a.nibble == b.nibble_b)
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "h_a", "id_b", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.filter(hamming <= 1)
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


def connected_components_dedup(pairs: DataFrame, ids: DataFrame,
                               max_iter: int = 20) -> DataFrame:
    """Resolve duplicate pairs into keep/drop clusters: iterative
    min-label propagation (small-fixpoint union-find; each iteration is
    one shuffle on the pair edges). Returns (doc_id, cluster_id) where
    cluster_id = min doc_id of the duplicate group.

    Each iteration CHECKPOINTS its label table (localCheckpoint →
    lineage truncated to a leaf RDD): the labels plan feeds the next
    round twice, so an unmaterialized loop doubles the logical plan
    every iteration — O(2^k) analyzer/planner work that OOMs long
    before the data does — and the convergence-check action would
    re-execute the whole chain.  With the checkpoint, plan depth is
    constant per iteration (pinned in test_plan_quality) and each round
    computes only its own delta.  On a cluster, swap localCheckpoint
    for checkpoint() with a reliable checkpoint dir if executor loss
    during the loop must be survivable.

    r13 shape (guide §2.4/§5, OPTIMIZATION_r13.md): ONE action and ONE
    final aggregation exchange per iteration instead of two actions
    (eager checkpoint + convergence count) and three exchanges
    (join / groupBy / re-join).  The update min(own, min(neighbor
    labels)) is spelled as one groupBy over (neighbor contributions ∪
    own label) — the old left-outer re-join of nbr_min onto labels is
    gone — and the convergence count doubles as the materializing
    action of a LAZY localCheckpoint: a full (non-short-circuit) count
    over the checkpoint-marked frame computes every partition, so the
    checkpoint completes in the same job that answers "did anything
    change".  Identical fixpoint, identical per-iteration labels:
    min(own, min(nbrs)) and chg = new < own are exactly the old
    least()/coalesce() update."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .persist()
    )
    # lazy init checkpoint: iteration 1's convergence count is the
    # materializing job (same one-action-per-iteration rule as below);
    # the checkpoint still truncates lineage before iteration 2 reuses
    # the frame
    labels = ids.select(
        F.col("doc_id"), F.col("doc_id").alias("cluster_id")
    ).localCheckpoint(eager=False)
    for _ in range(max_iter):
        # neighbor contributions carry own=NULL; the own-label row
        # carries own=cluster_id (labels has one row per doc_id, so
        # max(own) per group IS the old label)
        contrib = (
            edges.join(labels, edges.dst == labels.doc_id)
            .select(
                F.col("src").alias("doc_id"),
                F.col("cluster_id").alias("cand"),
                F.lit(None).cast(labels.schema["cluster_id"].dataType).alias("own"),
            )
            .unionAll(
                labels.select(
                    "doc_id",
                    F.col("cluster_id").alias("cand"),
                    F.col("cluster_id").alias("own"),
                )
            )
        )
        new_labels = (
            contrib.groupBy("doc_id")
            .agg(
                F.min("cand").alias("cluster_id"),
                F.max("own").alias("_old"),
            )
            .select(
                "doc_id",
                "cluster_id",
                (F.col("cluster_id") < F.col("_old")).alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        # full count (not limit(1)) computes EVERY partition in this
        # one job, completing the lazy checkpoint as a side effect —
        # one action per iteration where r12 paid two
        changed = new_labels.filter(F.col("chg")).count()
        labels = new_labels.select("doc_id", "cluster_id")
        if changed == 0:
            break
    edges.unpersist()
    return labels


@query(
    "dedup_lsh_verified",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      FROM t WHERE len(w) >= 3
    ), hs AS (
      SELECT doc_id, md5(u) AS h1, md5(u || '#') AS h2
      FROM (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS u
            FROM t WHERE len(w) >= 3)
    ), mins AS (
      SELECT doc_id,
             MIN(h1[1:8]) AS m0, MIN(h1[9:16]) AS m1,
             MIN(h1[17:24]) AS m2, MIN(h1[25:32]) AS m3,
             MIN(h2[1:8]) AS m4, MIN(h2[9:16]) AS m5,
             MIN(h2[17:24]) AS m6, MIN(h2[25:32]) AS m7
      FROM hs GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM mins
      UNION ALL SELECT doc_id, 1, m2 || m3 FROM mins
      UNION ALL SELECT doc_id, 2, m4 || m5 FROM mins
      UNION ALL SELECT doc_id, 3, m6 || m7 FROM mins
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c ON a.band = c.band AND a.sig = c.sig
                               AND a.doc_id < c.doc_id
    ), ex AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), common AS (
      SELECT cd.id_a, cd.id_b, COUNT(*) AS n_common
      FROM cand cd
      JOIN ex a ON a.doc_id = cd.id_a
      JOIN ex b ON b.doc_id = cd.id_b AND b.shingle = a.shingle
      GROUP BY cd.id_a, cd.id_b
    )
    SELECT c.id_a, c.id_b,
           ROUND(c.n_common * 1.0
                 / (len(sa.s) + len(sb.s) - c.n_common), 6) AS jaccard
    FROM common c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE c.n_common * 1.0 / (len(sa.s) + len(sb.s) - c.n_common) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dedup_lsh_verified(spark, sf_dir):
    """The 100 TB dedup pipeline end-to-end (SCALE.md dedup section):
    MinHash-LSH generates candidate pairs (near-linear in corpus size),
    then ONLY those pairs get exact n-gram Jaccard verification —
    replacing the all-pairs shingle join with a candidate-gated one.

    Shape: the wide work is the two linear passes (signature build,
    shingle explode); the candidate table is usually far smaller, but on
    a duplicate-heavy corpus it is NOT bounded, so no broadcast is
    forced — AQE broadcasts it only when its runtime size qualifies."""
    d = table(spark, sf_dir, "documents")
    # Persist the tiny (n_docs × n_bands) signature table for the
    # candidate self-join's two sides — the same within-query reuse
    # dedup_minhash_lsh carries.  (r13: this query used to lean on the
    # CacheManager plan-match against the SIBLING query's cached sigs;
    # the query-scoped persist registry releases cross-query blocks by
    # design, so the reuse is now owned here.  Sharing a cached raw
    # SHINGLE stream across the signature+verify stages instead remains
    # a measured net loss: serializing ~10^6 short strings costs more
    # than re-running the fully-codegen'd tokenize+shingle pipeline.)
    sigs = scoped_persist(minhash_signatures(d))
    a = sigs.select(F.col("doc_id").alias("id_a"), "band", F.col("sig").alias("sig_a"))
    b = sigs.select(
        F.col("doc_id").alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("sig_a") == F.col("sig_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # corpus-sized exploded stream — disk-backed reuse (see above)
    ex = (
        shingle_stream(d)
        .dropDuplicates(["doc_id", "shingle"])
        .transform(lambda _df: scoped_persist(_df, StorageLevel.DISK_ONLY))
    )
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ea = ex.select(F.col("doc_id").alias("id_a"), "shingle")
    eb = ex.select(
        F.col("doc_id").alias("_idb"), F.col("shingle").alias("_shb")
    )
    common = (
        cand.join(ea, "id_a")
        .join(
            eb,
            (F.col("id_b") == F.col("_idb")) & (F.col("shingle") == F.col("_shb")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") * F.lit(1.0) / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.5)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# --- incremental (delta-vs-corpus) near-dup detection ----------------------

_DELTA_SOURCES = ("src0", "src1")
_DELTA_SQL = "('src0', 'src1')"


@query(
    "dedup_incremental_minhash",
    rf"""
    WITH t AS (
      SELECT doc_id, source IN {_DELTA_SQL} AS is_delta,
             string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents
    ), hs AS (
      SELECT doc_id, is_delta, md5(s) AS h1, md5(s || '#') AS h2
      FROM (SELECT doc_id, is_delta,
                   unnest(list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
            FROM t WHERE len(w) >= 3)
    ), mins AS (
      SELECT doc_id, is_delta,
             MIN(h1[1:8]) AS m0, MIN(h1[9:16]) AS m1,
             MIN(h1[17:24]) AS m2, MIN(h1[25:32]) AS m3,
             MIN(h2[1:8]) AS m4, MIN(h2[9:16]) AS m5,
             MIN(h2[17:24]) AS m6, MIN(h2[25:32]) AS m7
      FROM hs GROUP BY doc_id, is_delta
    ), bands AS (
      SELECT doc_id, is_delta, 0 AS band, m0 || m1 AS sig FROM mins
      UNION ALL SELECT doc_id, is_delta, 1, m2 || m3 FROM mins
      UNION ALL SELECT doc_id, is_delta, 2, m4 || m5 FROM mins
      UNION ALL SELECT doc_id, is_delta, 3, m6 || m7 FROM mins
    )
    SELECT a.doc_id AS new_id, MIN(b.doc_id) AS dup_of
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.sig = b.sig
                AND a.doc_id <> b.doc_id
                AND (NOT b.is_delta OR b.doc_id < a.doc_id)
    WHERE a.is_delta
    GROUP BY a.doc_id
    ORDER BY new_id
    """,
)
def dedup_incremental_minhash(spark, sf_dir):
    """Incremental dedup: a new batch (the delta — here sources src0/
    src1) deduplicated against the already-ingested corpus AND against
    earlier docs of the same batch, without ever comparing corpus ×
    corpus.

    This is THE steady-state shape of a training-data pipeline: corpus
    band signatures are a persisted table (built once, appended per
    batch — vector/maintenance.py's append pattern); per-batch cost is
    signature build over the delta plus a bucket join whose left side is
    only the delta's bands. The asymmetric predicate (corpus partner: any;
    delta partner: strictly-smaller doc_id) makes the batch idempotent —
    re-running it yields the same keep/drop decisions. Output is each
    duplicate new doc with its canonical partner MIN(doc_id).
    """
    d = table(spark, sf_dir, "documents")
    flags = d.select(
        "doc_id", F.col("source").isin(*_DELTA_SOURCES).alias("is_delta")
    )
    sigs = scoped_persist(minhash_signatures(d).join(flags, "doc_id"))
    a = sigs.filter(F.col("is_delta")).select(
        F.col("doc_id").alias("new_id"), "band", F.col("sig").alias("sig_a")
    )
    b = sigs.select(
        F.col("doc_id").alias("other_id"),
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
        F.col("is_delta").alias("other_delta"),
    )
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("sig_a") == F.col("sig_b"))
            & (F.col("new_id") != F.col("other_id"))
            & (~F.col("other_delta") | (F.col("other_id") < F.col("new_id"))),
        )
        .groupBy("new_id")
        .agg(F.min("other_id").alias("dup_of"))
        .orderBy("new_id")
    )


SPAN_K = 8  # tokens per exact span — the Lee-et-al-style repeated-span unit


@query(
    "dedup_repeated_spans",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id,
             md5(list_aggregate(w[p : p + {SPAN_K} - 1], 'string_agg', ' '))
                 AS h
      FROM toks, unnest(range(1, len(w) - {SPAN_K} + 2)) AS t(p)
      WHERE len(w) >= {SPAN_K}
    ), stats AS (
      SELECT h, count(DISTINCT doc_id) AS ndocs FROM grams GROUP BY h
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS total_grams,
           CAST(sum(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS shared_grams,
           ROUND(CAST(sum(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS dup_coverage
    FROM grams g JOIN stats s USING (h)
    GROUP BY g.doc_id
    HAVING dup_coverage >= 0.2
    ORDER BY dup_coverage DESC, g.doc_id
    """,
)
def dedup_repeated_spans(spark, sf_dir):
    """Exact repeated-span coverage — the substring-dedup signal of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., ACL 2022), the published scale-out alternative to their suffix
    array: a doc's fraction of K-token windows that also appear verbatim
    in some other document. Documents above a coverage threshold are the
    cross-doc boilerplate / template candidates the exact and MinHash
    paths (dedup_exact / dedup_minhash_lsh) both miss, because the
    duplication is span-level, not document-level.

    Scale shape: window gram-strings are hashed to md5 map-side and the
    text is dropped IMMEDIATELY — every shuffle moves (doc_id, 32-char
    hash) pairs, never token windows. One groupBy(h) builds the
    document-frequency side, one co-partitioned equi-join on h tags each
    position, one groupBy(doc_id) folds coverage: three short-key
    shuffles, all linear in corpus token count, no quadratic pair
    expansion anywhere (contrast dedup_ngram_jaccard's documented
    validation-only core)."""
    from pyspark import StorageLevel

    d = table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    # unhex(md5): the 16-byte binary digest halves every shuffle row vs
    # the 32-char hex string (guide §2.3 — narrower keys), and unhex is
    # injective so counts are unchanged; DISK_ONLY persist computes the
    # tokenize+hash explode ONCE for its two consumers (the df-stats
    # groupBy and the tagging join) instead of re-scanning the corpus —
    # the _jaccard_pairs convention.  Measured 1.79 → 1.30 s at sf0.1.
    grams = (
        d.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= SPAN_K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(w) - {SPAN_K} + 1),"
                    f" p -> unhex(md5(array_join(slice(w, p, {SPAN_K}),"
                    f" ' '))))"
                )
            ).alias("h"),
        )
        .transform(lambda _df: scoped_persist(_df, StorageLevel.DISK_ONLY))
    )
    stats = grams.groupBy("h").agg(
        F.count_distinct("doc_id").alias("ndocs")
    )
    shared = F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
    return (
        grams.join(stats, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            shared.cast("bigint").alias("shared_grams"),
            F.round(
                shared.cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_coverage"),
        )
        .filter(F.col("dup_coverage") >= 0.2)
        .orderBy(F.desc("dup_coverage"), "doc_id")
    )
