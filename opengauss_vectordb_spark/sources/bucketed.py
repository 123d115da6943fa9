"""Bucketed (hash-clustered) table layout — shuffle-free co-located joins.

Reference counterpart: hash-distributed/bucketed tables with bucket
pruning (`src/gausskernel/optimizer/util/bucketpruning.cpp`) and the
Stream redistribute exchanges that hash-move rows between SMP threads
(`src/include/optimizer/streamplan.h:50`). In Spark the same idea is the
bucketed table: `write.bucketBy(n, key).sortBy(key).saveAsTable(...)`
pre-hashes AND pre-sorts rows into a fixed number of files per key, so an
equi-join between two tables bucketed the same way needs NO Exchange and
NO Sort at read time — the single biggest shuffle eliminator for a fact-
to-fact join at 100 TB (a lineitem⋈orders at that scale would otherwise
shuffle both sides every query; bucketing pays the shuffle ONCE at write
time and amortizes it over every subsequent join).

The driver's testdata is read-only parquet, so `bucketed_tables` builds
the bucketed copies into the session warehouse once per (sf_dir) and
caches them; tests/test_plan_quality.py pins the joined plan to zero
pre-join exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table

_BUILT: dict[tuple[str, str], str] = {}


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 8,
) -> None:
    """CREATE TABLE ... bucketed+sorted by key (hash-clustered layout)."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a stale location from a previous process isn't known to this
    # session's metastore, so overwrite alone can't reclaim it
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{name.lower()}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


def bucketed_tables(
    spark: SparkSession, sf_dir: str, buckets: int = 8
) -> tuple[str, str]:
    """Bucketed copies of orders/lineitem clustered on the join key;
    built once per sf_dir, returned as (orders_table, lineitem_table)."""
    tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    names = (f"orders_b{tag}", f"lineitem_b{tag}")
    key = (sf_dir, str(buckets))
    if _BUILT.get(key) != names[0]:
        write_bucketed(
            table(spark, sf_dir, "orders"), names[0], "o_orderkey", buckets
        )
        write_bucketed(
            table(spark, sf_dir, "lineitem"), names[1], "l_orderkey", buckets
        )
        _BUILT[key] = names[0]
    return names
