"""IVF recall gates — the reference's own thresholds, verbatim
(BASELINE.md rows 5-7; `contrib/datavec/test/t/003_ivfflat_vector_build_
recall.pl:104-115`): 10k uniform 3-d vectors, k=20, 20 random queries,
lists=100; recall@20 ≥ 0.71 @ probes=1, ≥ 0.95 @ probes=10, and = 1.00
(L2) @ probes=lists. Ground truth = exact scan (t/012:12-46 pattern)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from opengauss_vectordb_spark.vector.exact import knn as exact_knn
from opengauss_vectordb_spark.vector.ivf import IvfIndex

N_VECS = 10_000
DIM = 3
K = 20
N_QUERIES = 20
LISTS = 100


@pytest.fixture(scope="module")
def ivf_setup(spark):
    rng = np.random.default_rng(42)
    vecs = rng.random((N_VECS, DIM)).astype("float32")
    queries = rng.random((N_QUERIES, DIM)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id BIGINT, v ARRAY<FLOAT>",
    ).cache()
    tmp = tempfile.mkdtemp(prefix="ivf_recall_")
    idx = IvfIndex.build(
        df, "v", os.path.join(tmp, "l2"), metric="l2", lists=LISTS, max_iter=30
    )
    yield df, idx, queries


def _recall(spark, df, idx, queries, probes):
    hits = total = 0
    for q in queries:
        qv = [float(x) for x in q]
        truth = {
            r.id for r in exact_knn(df, "v", qv, k=K, metric="l2", id_col="id").collect()
        }
        got = {
            r.id
            for r in idx.search(spark, qv, "v", k=K, probes=probes, id_col="id").collect()
        }
        hits += len(truth & got)
        total += len(truth)
    return hits / total


def test_recall_probes_1(spark, ivf_setup):
    df, idx, queries = ivf_setup
    assert _recall(spark, df, idx, queries, probes=1) >= 0.71


def test_recall_probes_10(spark, ivf_setup):
    df, idx, queries = ivf_setup
    assert _recall(spark, df, idx, queries, probes=10) >= 0.95


def test_recall_probes_all(spark, ivf_setup):
    df, idx, queries = ivf_setup
    assert _recall(spark, df, idx, queries, probes=LISTS) == 1.0


@pytest.fixture(scope="module")
def ivf_cosine_setup(spark, ivf_setup):
    df, _, queries = ivf_setup
    tmp = tempfile.mkdtemp(prefix="ivf_recall_cos_")
    idx = IvfIndex.build(
        df, "v", os.path.join(tmp, "cos"), metric="cosine", lists=LISTS,
        max_iter=30,
    )
    yield df, idx, queries


def _recall_metric(spark, df, idx, queries, probes, metric):
    hits = total = 0
    for q in queries:
        qv = [float(x) for x in q]
        truth = {
            r.id
            for r in exact_knn(df, "v", qv, k=K, metric=metric, id_col="id").collect()
        }
        got = {
            r.id
            for r in idx.search(spark, qv, "v", k=K, probes=probes,
                                id_col="id").collect()
        }
        hits += len(truth & got)
        total += len(truth)
    return hits / total


def test_cosine_recall_probes_all(spark, ivf_cosine_setup):
    # t/003_ivfflat_vector_build_recall.pl:109-115 — cosine at
    # probes=lists must reach >= 0.9925
    df, idx, queries = ivf_cosine_setup
    assert _recall_metric(spark, df, idx, queries, LISTS, "cosine") >= 0.9925


def test_cosine_recall_probes_10(spark, ivf_cosine_setup):
    # same harness shape at probes=10; reference L2 bar is 0.95 — cosine
    # on this distribution holds it too
    df, idx, queries = ivf_cosine_setup
    assert _recall_metric(spark, df, idx, queries, 10, "cosine") >= 0.95


# --------------------------------------------------------------------------
# High-dimensional gates: 128-d clustered vectors (IVF's operating regime —
# real embedding corpora are clusterable; uniform high-d data defeats ANY
# inverted-list index). Thresholds: the reference's probes=10 L2/cosine bar
# (t/003:104-115, ≥ 0.95) and the inner-product recall bar its HNSW suite
# publishes (t/012_hnsw_vector_build_recall.pl:94, ≥ 0.97) — adopted for
# the IVF substitute at probes=10 so the claim is apples-to-apples.
# --------------------------------------------------------------------------
DIM_HI = 128
N_HI = 8_000
N_CLUSTERS = 40
LISTS_HI = 40


@pytest.fixture(scope="module")
def hi_dim_setup(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(N_CLUSTERS, DIM_HI))
    assign = rng.integers(0, N_CLUSTERS, size=N_HI)
    vecs = (centers[assign] + 0.05 * rng.normal(size=(N_HI, DIM_HI))).astype(
        "float32"
    )
    qrows = rng.integers(0, N_HI, size=N_QUERIES)
    queries = (
        vecs[qrows] + 0.02 * rng.normal(size=(N_QUERIES, DIM_HI))
    ).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id BIGINT, v ARRAY<FLOAT>",
    ).cache()
    yield df, queries


def _hi_dim_index(spark, df, metric):
    tmp = tempfile.mkdtemp(prefix=f"ivf_recall128_{metric}_")
    return IvfIndex.build(
        df, "v", os.path.join(tmp, metric), metric=metric, lists=LISTS_HI,
        max_iter=20,
    )


def test_recall_128d_l2(spark, hi_dim_setup):
    df, queries = hi_dim_setup
    idx = _hi_dim_index(spark, df, "l2")
    assert _recall_metric(spark, df, idx, queries, 10, "l2") >= 0.95


def test_recall_128d_cosine(spark, hi_dim_setup):
    df, queries = hi_dim_setup
    idx = _hi_dim_index(spark, df, "cosine")
    assert _recall_metric(spark, df, idx, queries, 10, "cosine") >= 0.95


def test_recall_128d_inner_product(spark, hi_dim_setup):
    # the reference's IP bar (0.97) — IP top-k chases large-norm vectors,
    # the hardest of the three for an L2-ish partitioning
    df, queries = hi_dim_setup
    idx = _hi_dim_index(spark, df, "ip")
    assert _recall_metric(spark, df, idx, queries, 10, "ip") >= 0.97


def test_recall_curve_uniform_l2(spark, ivf_setup):
    """The documented probes↔recall operating curve for the HNSW
    substitute position (VERDICT r3 item 5): the table in SCALE.md
    (§ 'IVF probes vs recall') is produced by THIS test — re-run with
    `-s` to regenerate it. Measured on the reference's OWN recall
    corpus (t/003: 10k uniform 3-d, lists=100, k=20) so the curve is
    apples-to-apples with its published 0.71/0.95/1.00 bars; uniform
    data is the regime where the probes knob actually trades recall
    (on clusterable corpora — see the 128-d fixtures — k-means
    recovers the structure and probes=1 already scores 1.0, which is
    the HNSW-substitute's best case, not its operating curve). Pins
    monotone nondecreasing plus a floor per point so the doc can't
    silently rot."""
    df, idx, queries = ivf_setup
    floors = {1: 0.71, 2: 0.78, 5: 0.88, 10: 0.95, 20: 0.98}
    curve = {}
    for p in sorted(floors):
        curve[p] = _recall(spark, df, idx, queries, probes=p)
    print("\nprobes-vs-recall (10k uniform 3-d, k=20, lists=100):")
    for p, r in curve.items():
        print(f"  probes={p:>2}  recall@20={r:.4f}")
    vals = [curve[p] for p in sorted(curve)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:])), curve
    for p, floor in floors.items():
        assert curve[p] >= floor, (p, curve[p])


def test_pq_rerank_recall_128d(spark, hi_dim_setup):
    """PQ coarse-ADC + exact rerank must hold recall@10 ≥ 0.9 on the
    128-d clustered corpus while scanning 32×-compressed codes (M=16
    4-bit-codebook subspaces over 128 dims → 16 bytes vs 512)."""
    from pyspark.sql import functions as F

    from opengauss_vectordb_spark.vector.exact import knn as exact_knn
    from opengauss_vectordb_spark.vector.pq import PqCodebooks, pq_search

    df, queries = hi_dim_setup
    books = PqCodebooks.fit(df, "v", m=32, k=16)
    assert _pq_recall(df, books, queries) >= 0.9


def _pq_recall(df, books, queries, sample=8):
    from pyspark.sql import functions as F

    from opengauss_vectordb_spark.vector.exact import knn as exact_knn
    from opengauss_vectordb_spark.vector.pq import pq_search

    codes = df.withColumn("pq_codes", books.encode_udf()(F.col("v"))).cache()
    hits = total = 0
    # rerank must exceed cluster occupancy (~200 here): ADC separates
    # clusters sharply but ranks coarsely INSIDE one, so the shortlist
    # has to cover the query's cluster for the exact rerank to finish
    for q in queries[:sample]:
        qv = [float(x) for x in q]
        truth = {
            r.id
            for r in exact_knn(df, "v", qv, k=10, metric="l2", id_col="id").collect()
        }
        got = {
            r.id
            for r in pq_search(
                codes, books, qv, vec_col="v", k=10, rerank=300, id_col="id"
            ).collect()
        }
        hits += len(truth & got)
        total += len(truth)
    codes.unpersist()
    return hits / total


def test_pq_fit_unbiased_on_clustered_layout(spark, hi_dim_setup):
    """VERDICT r3 nit 2: PqCodebooks.fit must sample uniformly, not take
    the head — on a clustered layout (rows physically ordered by the
    cluster structure, as after an IVF partitionBy(list_id) ingest) a
    head-limit sample sees only a few clusters and the codebooks skew.
    Fit on a v[0]-sorted frame with sample_rows ≪ N and require the
    same recall bar as the unclustered fit."""
    from opengauss_vectordb_spark.vector.pq import PqCodebooks

    df, queries = hi_dim_setup
    clustered = df.orderBy(F.expr("v[0]")).coalesce(4)
    books = PqCodebooks.fit(clustered, "v", m=32, k=16, sample_rows=2_000)
    assert _pq_recall(df, books, queries) >= 0.9


def test_knn_join_large_batch_not_broadcast(spark, ivf_setup):
    """Scale guard (VERDICT r3 nit 1): the probe_map side of the batch
    ANN join is |queries| × probes rows each carrying the query vector —
    multi-GB at 1M queries, and Spark hard-caps broadcasts at 8 GB. For
    a large query batch the plan must NOT force a broadcast of the
    query side; the list_id equi-join shuffles (AQE may still choose a
    runtime broadcast only when the map proves genuinely small)."""
    from opengauss_vectordb_spark.plans.explain import physical_plan

    df, idx, _ = ivf_setup
    tmp = tempfile.mkdtemp(prefix="knn_join_big_")
    spark.range(100_000).select(
        F.col("id").alias("qid"),
        F.array(
            (F.rand(seed=1)).cast("double"),
            (F.rand(seed=2)).cast("double"),
            (F.rand(seed=3)).cast("double"),
        ).alias("qv"),
    ).write.mode("overwrite").parquet(tmp)
    big = spark.read.parquet(tmp)
    # model "probe map ≫ broadcast threshold" (the 1M×64-d regime) with
    # real parquet stats and a proportionally lowered threshold
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024))
    try:
        out = idx.knn_join(
            spark, big, "qv", "v", k=5, probes=2, query_id="qid", cand_id="id"
        )
        plan = physical_plan(out)
        # the centroid cross-join (BroadcastNestedLoopJoin over ≤ 32768
        # bounded rows) is exempt; the probe_map→candidates equi-join on
        # list_id must shuffle, not hash-broadcast the query side
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin [list_id" in plan or "ShuffledHashJoin" in plan
        # explicit small-batch guard still allows the hint
        small = big.limit(10)
        hinted = idx.knn_join(
            spark, small, "qv", "v", k=5, probes=2, query_id="qid",
            cand_id="id", broadcast_queries=10,
        )
        assert "BroadcastHashJoin" in physical_plan(hinted)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_point_lookup_recall_at_1(spark, ivf_setup):
    """Self-lookup recall@1 = 1.00 at probes=1 (BASELINE.md row 8;
    t/005_ivfflat_query_recall.pl:31-42): querying an indexed vector with
    itself must return that vector first — its nearest centroid is its
    own list by construction. Batch form: knn_join of a 200-vector
    sample against the index."""
    df, idx, _ = ivf_setup
    sample = df.filter((F.col("id") % 50) == 0).select(
        F.col("id").alias("qid"), F.col("v").alias("qv")
    )
    got = idx.knn_join(
        spark, sample, "qv", "v", k=1, probes=1, query_id="qid", cand_id="id"
    ).collect()
    assert len(got) == 200
    assert all(r.qid == r.id for r in got)
