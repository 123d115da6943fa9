"""Product quantization — the vector-COMPRESSION scale path (beyond the
reference's IVFFlat/HNSW float storage; the public-knowledge design is
Jégou et al.'s PQ, the same family datavec's roadmap and every large ANN
system use for >memory corpora).

Why it matters at 100 TB: a 64-d float32 embedding is 256 bytes; with
M=16 subspaces × K=16 centroids each vector becomes 16 4-bit codes =
8 bytes — a 32× storage/scan-bandwidth cut. Search is asymmetric
distance computation (ADC): per query build an M×K lookup table of
exact subspace distances driver-side (tiny numpy), then score every code
row JVM-side as Σ_m lut[m][code_m] — pure Catalyst expressions over the
codes column, no Python per row. A coarse ADC top-R then exact-reranks
the short list (two-stage, like the binary rerank in
vector/queries.py), which restores recall lost to quantization.

Division of labor (mirrors halfvec_quantize / IvfIndex.build):
  * codebook fit: bounded driver sample + numpy k-means per subspace
    (seeded — deterministic codebooks for the same input)
  * encode: Arrow-batched pandas UDF (a storage cast at ingest, not
    query-path work — vectorized argmin over the sample×K distance
    matrix per subspace)
  * score: JVM-side fold over zip_with(codes, LUT literal)
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd  # noqa: F401 — needed in module globals so the
# pandas_udf type-hint resolver can evaluate the "pd.Series" annotations
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .distance import as_double
from .ivf import _kmeans_fit


class PqCodebooks:
    """M per-subspace codebooks, each K centroids of dim d/M."""

    def __init__(self, codebooks: np.ndarray):
        # shape (M, K, sub_dim)
        self.codebooks = codebooks
        self.m, self.k, self.sub_dim = codebooks.shape

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        vec_col: str,
        m: int = 16,
        k: int = 16,
        sample_rows: int = 20_000,
        seed: int = 7,
    ) -> "PqCodebooks":
        """Train on a bounded UNIFORM sample (the IvfIndex.build
        convention, ivf.py). A head `.limit(n)` would be biased on any
        clustered layout — e.g. parquet written `partitionBy(list_id)`
        after IVF ingest, where the first rows all come from one or two
        lists — so sample by fraction across all partitions, then
        canonicalize the order so the seeded k-means is reproducible."""
        clean = df.filter(F.col(vec_col).isNotNull()).select(vec_col)
        n = clean.count()
        fraction = min(1.0, (sample_rows * 1.2) / max(n, 1))
        sample_df = (
            clean.sample(fraction=fraction, seed=seed)
            if fraction < 1.0
            else clean
        )
        rows = sample_df.limit(sample_rows).collect()
        X = np.array([list(r[0]) for r in rows], dtype=np.float64)
        # collect order is partition-order nondeterministic → canonicalize
        X = X[np.lexsort(X.T[::-1])]
        dim = X.shape[1]
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        sub = dim // m
        books = np.stack(
            [
                _kmeans_fit(X[:, j * sub : (j + 1) * sub], k, seed + j)
                for j in range(m)
            ]
        )
        return cls(books)

    # ------------------------------------------------------------ encode
    def encode_udf(self):
        """Arrow-batched encoder: vector → array<int> of M code indices
        (ingest-time storage cast; vectorized argmin per subspace)."""
        from pyspark.sql.functions import pandas_udf

        books = self.codebooks
        m, sub = self.m, self.sub_dim

        @pandas_udf("array<int>")
        def encode(v: "pd.Series") -> "pd.Series":
            def enc(a):
                if a is None:
                    return None
                x = np.asarray(a, dtype=np.float64)
                codes = []
                for j in range(m):
                    d = np.linalg.norm(
                        books[j] - x[j * sub : (j + 1) * sub], axis=1
                    )
                    codes.append(int(np.argmin(d)))
                return codes

            return v.map(enc)

        return encode

    # ------------------------------------------------------------- score
    def adc_lut(self, qvec: Sequence[float]) -> list[list[float]]:
        """Per-query lookup table: lut[m][c] = ||q_sub_m - codebook[m][c]||²
        (squared so the fold is additive; sqrt once at the end)."""
        q = np.asarray(list(qvec), dtype=np.float64)
        return [
            (
                np.linalg.norm(
                    self.codebooks[j] - q[j * self.sub_dim : (j + 1) * self.sub_dim],
                    axis=1,
                )
                ** 2
            ).tolist()
            for j in range(self.m)
        ]

    def adc_distance(self, codes: Column, qvec: Sequence[float]) -> Column:
        """Approximate L2 distance from stored codes — a JVM-side fold:
        zip the code array with the LUT literal and sum the looked-up
        subspace distances. No Python in the per-row path."""
        lut = F.array(
            *[
                F.array(*[F.lit(float(v)) for v in row])
                for row in self.adc_lut(qvec)
            ]
        )
        picked = F.zip_with(codes, lut, lambda c, tbl: F.element_at(tbl, c + 1))
        return F.sqrt(F.aggregate(picked, F.lit(0.0), lambda a, x: a + x))


def pq_search(
    df_codes: DataFrame,
    books: PqCodebooks,
    qvec: Sequence[float],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    k: int = 10,
    rerank: int = 100,
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage PQ search: coarse ADC top-``rerank`` (bounded heap over
    the 8-byte codes — the stage that scans the corpus touches ONLY
    compressed codes), then exact L2 rerank of the short list against
    the float vectors. At 100 TB the first stage reads ~3% of the bytes
    a float scan would.

    The coarse stage projects (id, codes) BEFORE ranking so column
    pruning drops the float vector from the wide scan (carrying it
    through the heap would read the full vectors and void the byte
    cut — pinned in test_plan_quality); the ``rerank`` survivors then
    join back to fetch their vectors, a k-row broadcast join."""
    from .distance import l2_distance

    coarse = (
        df_codes.filter(F.col(code_col).isNotNull())
        .select(id_col, code_col)
        .withColumn("_adc", books.adc_distance(F.col(code_col), qvec))
        .orderBy(F.col("_adc").asc_nulls_last(), F.col(id_col).asc())
        .limit(rerank)
        .select(id_col)
    )
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    vectors = df_codes.select(id_col, vec_col)
    return (
        vectors.join(F.broadcast(coarse), id_col)
        .withColumn(
            "distance", l2_distance(as_double(F.col(vec_col)), qlit)
        )
        .orderBy(F.col("distance").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "distance")
    )
