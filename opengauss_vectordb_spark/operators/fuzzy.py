"""Fuzzy string matching (contrib/pg_trgm) and label-path hierarchies
(contrib/ltree).

pg_trgm: a string's trigram set is built per word, lowercased, with two
leading and one trailing pad space (``trgm.h:13-14`` LPADDING/RPADDING);
``similarity(a, b)`` is |A∩B| / |A∪B| over the distinct sets
(``trgm_op.cpp:482`` cnt_sml with DIVUNION defined at ``trgm.h:24``);
the ``%`` operator is ``similarity >= trgm_limit`` with the 0.3 default
(``trgm_op.cpp:16,579-583``).

ltree: dot-separated label paths with ``nlevel`` (``ltree_op.cpp:133``),
``subpath`` (:228), and the ``@>`` ancestor test ``ltree_isparent``
(:164). A path maps to an array of labels; every operator is array
arithmetic in whole-stage codegen.

Scale: trigram sets are built map-side per row (no shuffle); a fuzzy
JOIN at corpus scale explodes trigrams into an inverted index and
equi-joins on the trigram — exactly what pg_trgm's GIN index does
page-side — rather than comparing all pairs. The similarity search here
is a single column-pruned scan + TakeOrdered heap.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

TRGM_LIMIT = 0.3  # trgm_op.cpp:16 default similarity threshold


def trigrams(col: Column) -> Column:
    """show_trgm (trgm_op.cpp:443): distinct padded word trigrams."""
    words = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")),
                " "),
        lambda w: w != "",
    )
    return F.array_distinct(
        F.flatten(
            F.transform(
                words,
                lambda w: F.transform(
                    F.sequence(F.lit(1), F.length(w) + 1),
                    lambda i: F.concat(F.lit("  "), w, F.lit(" "))
                    .substr(i, F.lit(3)),
                ),
            )
        )
    )


def similarity(a: Column, b: Column) -> Column:
    """similarity(text, text) — trgm_op.cpp:552 over cnt_sml:482."""
    ta, tb = trigrams(a), trigrams(b)
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(ta) + F.size(tb) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


_TRGM_Q = "smal widgett"  # misspelled 'small widget' — the fuzzy probe

_SQL_TRGM = """
      list_distinct(flatten(list_transform(
        list_filter(string_split_regex(trim(regexp_replace(lower({col}),
            '[^a-z0-9]+', ' ', 'g')), ' '), w -> w != ''),
        w -> list_transform(range(1, length(w) + 2),
                            i -> substr('  ' || w || ' ',
                                        CAST(i AS INT), 3)))))
"""


@query(
    "trgm_similarity_topk",
    f"""
    WITH t AS (
      SELECT p_partkey, p_name,
             {_SQL_TRGM.format(col='p_name')} AS ta,
             {_SQL_TRGM.format(col=f"'{_TRGM_Q}'")} AS tb
      FROM part
    ), s AS (
      SELECT p_partkey, p_name,
             CAST(len(list_intersect(ta, tb)) AS DOUBLE)
               / (len(ta) + len(tb) - len(list_intersect(ta, tb))) AS sim
      FROM t
    )
    SELECT p_partkey, p_name, ROUND(sim, 6) AS sim,
           sim >= {TRGM_LIMIT} AS pct_match
    FROM s
    ORDER BY ROUND(sim, 6) DESC, p_partkey LIMIT 15
    """,
)
def trgm_similarity_topk(spark, sf_dir):
    """pg_trgm similarity search: rank part names against a misspelled
    probe string and flag the ``%`` operator's verdict at the 0.3
    default threshold (trgm_op.cpp:579-583). One column-pruned scan,
    trigram sets built map-side, TakeOrdered heap — the relational
    form of ``SELECT * FROM t ORDER BY sim DESC`` under a trigram GiST
    index (trgm_gist.cpp distance support)."""
    p = table(spark, sf_dir, "part")
    sim = similarity(F.col("p_name"), F.lit(_TRGM_Q))
    return (
        p.select(
            "p_partkey",
            "p_name",
            F.round(sim, 6).alias("sim"),
            (sim >= TRGM_LIMIT).alias("pct_match"),
        )
        .orderBy(F.desc("sim"), "p_partkey")
        .limit(15)
    )


@query(
    "ltree_hierarchy",
    """
    WITH t AS (
      SELECT n_name,
             'world.' || r_name || '.' || n_name AS path,
             string_split('world.' || r_name || '.' || n_name, '.') AS labels
      FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT n_name, path,
           CAST(len(labels) AS INT) AS nlevel,
           array_to_string(labels[1:2], '.') AS sub2,
           (len(labels) >= 2 AND labels[2] = 'ASIA') AS under_asia,
           list_contains(labels, 'ASIA') AS lquery_asia_anywhere
    FROM t ORDER BY n_name
    """,
)
def ltree_hierarchy(spark, sf_dir):
    """ltree label paths (contrib/ltree): build
    ``world.<region>.<nation>`` paths and evaluate nlevel
    (ltree_op.cpp:133), subpath(path, 0, 2) (:228), the ``@>`` ancestor
    test ``'world.ASIA' @> path`` (ltree_isparent :164 — prefix label
    equality), and the lquery ``'*.ASIA.*'`` match (lquery_op.cpp —
    here: label anywhere). Paths are label arrays; every operator is
    array arithmetic, no parsing at query time."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    t = n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_name",
        F.concat_ws(".", F.lit("world"), "r_name", "n_name").alias("path"),
    )
    labels = F.split(F.col("path"), r"\.")
    return t.select(
        "n_name",
        "path",
        F.size(labels).cast("int").alias("nlevel"),
        F.array_join(F.slice(labels, 1, 2), ".").alias("sub2"),
        ((F.size(labels) >= 2) & (labels[1] == "ASIA")).alias("under_asia"),
        F.array_contains(labels, "ASIA").alias("lquery_asia_anywhere"),
    ).orderBy("n_name")


_FUZZY_PROBES = [
    (0, "smal widgett"),
    (1, "blu rng"),
    (2, "hot roddd"),
    (3, "olde anvill"),
]

_SQL_PROBE_VALUES = ", ".join(
    f"({i}, '{s}')" for i, s in _FUZZY_PROBES
)


@query(
    "trgm_fuzzy_join",
    f"""
    WITH probes(probe_id, q) AS (VALUES {_SQL_PROBE_VALUES}),
    pt AS (
      SELECT probe_id, {_SQL_TRGM.format(col='q')} AS tq FROM probes
    ), names AS (
      SELECT DISTINCT p_name FROM part
    ), nt AS (
      SELECT p_name, {_SQL_TRGM.format(col='p_name')} AS tn FROM names
    ), scored AS (
      SELECT probe_id, p_name,
             CAST(len(list_intersect(tn, tq)) AS DOUBLE)
               / (len(tn) + len(tq) - len(list_intersect(tn, tq))) AS sim
      FROM pt CROSS JOIN nt
    ), ranked AS (
      SELECT probe_id, p_name, ROUND(sim, 6) AS sim,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY ROUND(sim, 6) DESC, p_name) AS rk
      FROM scored WHERE sim >= {TRGM_LIMIT}
    )
    SELECT probe_id, p_name, sim FROM ranked WHERE rk <= 3
    ORDER BY probe_id, sim DESC, p_name
    """,
)
def trgm_fuzzy_join(spark, sf_dir):
    """Fuzzy JOIN through a trigram inverted index — the scale shape of
    pg_trgm's GIN index (``trgm_gin.cpp``: query trigrams probe posting
    lists; candidates sharing trigrams are verified against the real
    similarity). Probe strings explode into (trigram, probe) rows,
    names into (trigram, name) posting rows; one equi-join on the
    trigram counts shared trigrams per (probe, name) pair, and the
    similarity is finished arithmetically from the precomputed set
    sizes — |A∩B| from the join, |A|+|B|−|A∩B| as the union. Pairs
    sharing NO trigram are never materialized, which is the entire
    point versus the all-pairs cross join (the DuckDB oracle does the
    quadratic form — correct at validation scale, impossible at 10^9
    names; % filter ≥ {TRGM_LIMIT} guarantees the candidate set
    contains every surviving pair because sim > 0 requires a shared
    trigram). Top-3 per probe via one window over the candidates."""
    from pyspark.sql import Window as W

    probes = spark.createDataFrame(_FUZZY_PROBES, "probe_id INT, q STRING")
    pt = probes.select(
        "probe_id", trigrams(F.col("q")).alias("tq")
    ).withColumn("qsize", F.size("tq"))
    names = (
        table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .select("p_name", trigrams(F.col("p_name")).alias("tn"))
        .withColumn("nsize", F.size("tn"))
    )
    postings = names.select(
        "p_name", "nsize", F.explode("tn").alias("g")
    )
    probe_postings = pt.select(
        "probe_id", "qsize", F.explode("tq").alias("g")
    )
    shared = (
        postings.join(probe_postings, "g")
        .groupBy("probe_id", "p_name", "qsize", "nsize")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sim = F.col("inter") / (
        F.col("qsize") + F.col("nsize") - F.col("inter")
    )
    w = W.partitionBy("probe_id").orderBy(
        F.desc("sim"), F.asc("p_name")
    )
    return (
        shared.select(
            "probe_id", "p_name", F.round(sim, 6).alias("sim")
        )
        .filter(F.col("sim") >= TRGM_LIMIT)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .drop("rk")
        .orderBy("probe_id", F.desc("sim"), "p_name")
    )
