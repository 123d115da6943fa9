"""IVF index maintenance — the batch analogue of datavec's insert-time
index repair and vacuum (`contrib/datavec/src/hnswinsert.cpp`,
`ivfvacuum.cpp`, WAL-covered in tests t/001, t/010).

Position (SURVEY.md §7): transactional in-place maintenance is replaced
by append-partition compaction and periodic rebuild — the append path
labels new vectors with the EXISTING centroids (exactly what ivfinsert
does: new tuples go to their nearest current list) and appends to the
partitioned layout; a rebuild refreshes centroids when drift accumulates.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .distance import as_double
from .ivf import IvfIndex, assign_lists_expr


def append_to_index(
    spark: SparkSession,
    index: IvfIndex,
    new_rows: DataFrame,
    vec_col: str,
    spill_epsilon: float = 1.44,
) -> None:
    """Insert-path parity: label new vectors with the index's existing
    centroids and append them to the partitioned data layout. No existing
    partitions are rewritten — each probe list gains one new file per
    append batch (compact() folds them)."""
    cents = np.array(
        [c for _, c in sorted(
            (r.list_id, list(r.centroid))
            for r in spark.read.parquet(os.path.join(index.path, "centroids")).collect()
        )],
        dtype=np.float64,
    )
    labeled = new_rows.filter(F.col(vec_col).isNotNull()).withColumn(
        "list_id",
        F.explode(
            assign_lists_expr(
                as_double(F.col(vec_col)), cents, index.metric, spill_epsilon
            )
        ),
    )
    (
        labeled.repartition("list_id")
        .write.mode("append")
        .partitionBy("list_id")
        .parquet(os.path.join(index.path, "data"))
    )


def compact(spark: SparkSession, index: IvfIndex, target_partitions: int = 1) -> None:
    """Vacuum analogue: rewrite the data layout to fold per-append small
    files into target_partitions files per list (read → coalesce →
    overwrite via a staging path for atomicity on object stores)."""
    data_path = os.path.join(index.path, "data")
    staged = data_path + ".compacting"
    df = spark.read.parquet(data_path)
    (
        df.repartition("list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(staged)
    )
    import shutil

    shutil.rmtree(data_path)
    os.rename(staged, data_path)


def rebuild(
    spark: SparkSession,
    index: IvfIndex,
    vec_col: str,
    **build_kwargs,
) -> IvfIndex:
    """Full rebuild (REINDEX): refit centroids on the current data and
    rewrite the layout — the answer to centroid drift after heavy
    appends (the reference's insert-time graph repair equivalent)."""
    current = spark.read.parquet(os.path.join(index.path, "data")).drop("list_id")
    return IvfIndex.build(
        current,
        vec_col,
        index.path,
        metric=index.metric,
        lists=index.lists,
        **build_kwargs,
    )
