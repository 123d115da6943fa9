"""Engine facade — the user-facing entry point, converging the SQL and
DataFrame APIs on one session/catalog the way the reference's row and
vectorized engines converge on one planner (SURVEY.md §3).

    from opengauss_vectordb_spark.engine import Engine
    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.sql("SELECT ... FROM lineitem ...")      # Spark SQL + PG-name fns
    eng.table("orders").groupBy(...)             # DataFrame API
    eng.knn("embeddings", "embedding", qvec, 10) # ANN entry (index-routed)
    eng.models.create_model(...)                 # DB4AI surface
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from .catalog import DEFAULT_SF_DIR, register_views
from .catalog import table as _table
from .functions import register_pg_functions
from .ml import ModelWarehouse
from .plans.ann_rewrite import AnnCatalog


class Engine:
    def __init__(self, spark: SparkSession | None = None,
                 sf_dir: str = DEFAULT_SF_DIR):
        if spark is None:
            from .session import get_spark

            spark = get_spark()
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = register_views(spark, sf_dir)
        register_pg_functions(spark)
        self.ann = AnnCatalog()
        self.models = ModelWarehouse()

    def sql(self, query: str) -> DataFrame:
        """SQL entry: Spark SQL dialect + the PG/datavec-name function
        layer (l2_distance, nvl, decode, ... — functions/pg_compat.py)
        + Oracle-compat translation (ROWNUM→LIMIT per preprownum.cpp,
        FROM dual, SYSDATE) + datavec's vector operators
        (`embedding <-> '[...]'`, <#>, <=>, <+> —
        functions/sql_compat.py), so the reference's canonical ANN
        query text runs verbatim."""
        from .functions.sql_compat import translate

        return self.spark.sql(translate(query))

    def table(self, name: str) -> DataFrame:
        return _table(self.spark, self.sf_dir, name)

    def knn(
        self,
        table_name: str,
        vec_col: str,
        qvec: Sequence[float],
        k: int = 10,
        metric: str = "l2",
        id_col: str | None = None,
        probes: int | None = None,
    ) -> DataFrame:
        """ORDER BY distance LIMIT k — routed through a registered IVF
        index when one matches, exact scan otherwise."""
        return self.ann.topk(
            self.spark, table_name, self.table(table_name), vec_col, qvec, k,
            metric=metric, probes=probes, id_col=id_col,
        )

    def create_ivf_index(
        self, table_name: str, vec_col: str, path: str,
        metric: str = "l2", lists: int = 100, **kwargs,
    ):
        """CREATE INDEX ... USING ivfflat (datavec DDL analogue)."""
        from .vector.ivf import IvfIndex

        idx = IvfIndex.build(
            self.table(table_name), vec_col, path, metric=metric, lists=lists,
            **kwargs,
        )
        self.ann.register(table_name, vec_col, idx)
        return idx

    def create_hnsw_index(
        self, table_name: str, vec_col: str, path: str, id_col: str,
        metric: str = "l2", m: int = 16, ef_construction: int = 64,
        shards: int = 8, **kwargs,
    ):
        """CREATE INDEX ... USING hnsw (datavec's second access method;
        hnsw.h:33-36 defaults). The index is sharded graphs — see
        vector/hnsw.py; knn() routes through it once registered."""
        from .vector.hnsw import HnswIndex

        idx = HnswIndex.build(
            self.table(table_name), vec_col, path, id_col=id_col,
            metric=metric, m=m, ef_construction=ef_construction,
            shards=shards, **kwargs,
        )
        self.ann.register(table_name, vec_col, idx)
        return idx

    # -------------------------------------------------- pipeline verbs

    def dedup_pairs(self, verified: bool = False) -> DataFrame:
        """Near-duplicate candidate pairs over the ``documents`` table
        via MinHash-LSH banding (operators/dedup.py); ``verified=True``
        gates candidates through exact n-gram Jaccard (the 100 TB
        pipeline form)."""
        from .operators.dedup import dedup_lsh_verified, dedup_minhash_lsh

        fn = dedup_lsh_verified if verified else dedup_minhash_lsh
        return fn(self.spark, self.sf_dir)

    def zorder_write(self, df: DataFrame, path: str, col_a: str,
                     col_b: str) -> None:
        """Cluster a table by the Morton code of two keys so rectangle
        predicates prune multiplicatively (sources/zorder.py)."""
        from .sources.zorder import write_zordered

        write_zordered(df, path, col_a, col_b)

    def zorder_read(self, path: str, a_range: tuple, b_range: tuple
                    ) -> DataFrame:
        """Rectangle-pruned scan over a z-ordered layout; callers apply
        the exact predicate on top (pruning is a superset filter)."""
        from .sources.zorder import read_pruned

        return read_pruned(self.spark, path, a_range, b_range)

    def weighted_sample(self, df: DataFrame, weight_col: str, k: int,
                        id_col: str) -> DataFrame:
        """Deterministic weight-proportional sample without replacement:
        exponential-race keys -ln(u)/w with u derived from md5(id)
        (operators/pipeline.py sample_weighted_priority pattern)."""
        from pyspark.sql import functions as F

        h8 = F.expr(
            f"conv(substring(md5(cast({id_col} as string)), 1, 8), 16, 10)"
        )
        u = (h8 + 1) / F.lit(4294967297.0)
        key = -F.log(u) / F.col(weight_col).cast("double")
        return (
            df.withColumn("_k", key)
            .orderBy(F.col("_k").asc(), F.col(id_col).asc())
            .limit(k)
            .drop("_k")
        )
