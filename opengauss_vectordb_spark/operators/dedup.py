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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .text import shingles, tokens

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
                       n_bands: int = N_BANDS) -> DataFrame:
    """(id, band, sig): per-band MinHash signature (b bands × r=1 rows).

    sig_b = MIN over shingles s of md5(b || ':' || s) — b salted hash
    functions; docs sharing a band signature are LSH candidates.
    """
    w = tokens(F.lower(F.col(text_col)))
    sh = shingles(w, 3)
    bands = F.sequence(F.lit(0), F.lit(n_bands - 1))
    return (
        docs.select(F.col(id_col), sh.alias("_sh"))
        .filter(F.size("_sh") > 0)
        .select(F.col(id_col), F.explode(bands).alias("band"), F.col("_sh"))
        .select(
            id_col,
            "band",
            F.array_min(
                F.transform(
                    "_sh",
                    lambda s: F.md5(
                        F.concat(F.col("band").cast("string"), F.lit(":"), s).cast(
                            "binary"
                        )
                    ),
                )
            ).alias("sig"),
        )
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
    ), bands AS (
      SELECT doc_id, b AS band,
             list_min(list_transform(shingles,
                      s -> md5(CAST(b AS VARCHAR) || ':' || s))) AS sig
      FROM sh, range(0, {N_BANDS}) r(b)
    )
    SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
    FROM bands a JOIN bands c ON a.band = c.band AND a.sig = c.sig
                             AND a.doc_id < c.doc_id
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    sigs = minhash_signatures(d)
    a = sigs.select(
        F.col("doc_id").alias("id_a"), "band", F.col("sig").alias("sig_a")
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"), "band", F.col("sig").alias("sig_b")
    )
    return (
        a.join(
            b,
            (a.band == b.band) & (F.col("sig_a") == F.col("sig_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_ngram_jaccard",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents WHERE doc_id < 250
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
    )
    SELECT c.id_a, c.id_b,
           ROUND(c.n_common * 1.0
                 / (len(sa.s) + len(sb.s) - c.n_common), 6) AS jaccard
    FROM common c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE c.n_common * 1.0 / (len(sa.s) + len(sb.s) - c.n_common) >= 0.08
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    w = tokens(F.lower(F.col("text")))
    sh = (
        d.select(F.col("doc_id"), F.array_distinct(shingles(w, 3)).alias("s"))
        .filter(F.size("s") > 0)
    )
    sizes = sh.select("doc_id", F.size("s").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("s").alias("shingle"))
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
    return (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(jac >= 0.08)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


def connected_components_dedup(pairs: DataFrame, ids: DataFrame,
                               max_iter: int = 20) -> DataFrame:
    """Resolve duplicate pairs into keep/drop clusters: iterative
    min-label propagation (small-fixpoint union-find; each iteration is
    one shuffle on the pair edges). Returns (doc_id, cluster_id) where
    cluster_id = min doc_id of the duplicate group."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    )
    labels = ids.select(F.col("doc_id"), F.col("doc_id").alias("cluster_id"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left_outer")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        if (
            new_labels.alias("n")
            .join(
                labels.alias("o"),
                (F.col("n.doc_id") == F.col("o.doc_id"))
                & (F.col("n.cluster_id") != F.col("o.cluster_id")),
            )
            .limit(1)
            .count()
            == 0
        ):
            labels = new_labels
            break
        labels = new_labels
    return labels
