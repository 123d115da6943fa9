"""Sources/sinks beyond parquet — the reference's COPY + FDW surface.

Reference: COPY FROM/TO with formats text, csv, binary, fixed
(`optimizer/commands/copy.cpp:1614-1620`); foreign tables via file_fdw /
postgres_fdw / gc_fdw (`contrib/file_fdw`, `contrib/postgres_fdw`,
`executor/nodeForeignscan.cpp`).

Spark mapping: spark.read.csv/json/jdbc with explicit schemas (never
inferred — SURVEY.md §1.3 declares schemas like the reference catalog
does), plus a fixed-width reader built from substring projections (the
'fixed' COPY format has no Spark builtin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    delimiter: str = ",",
    header: bool = False,
    null_value: str = "",
) -> DataFrame:
    """COPY ... FROM ... (FORMAT csv) — explicit schema, no inference."""
    return (
        spark.read.schema(schema)
        .option("delimiter", delimiter)
        .option("header", header)
        .option("nullValue", null_value)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_text_copy(
    spark: SparkSession, path: str, schema: T.StructType | str,
    delimiter: str = "\t", null_value: str = r"\N",
) -> DataFrame:
    """COPY's default text format: tab-separated, \\N for NULL."""
    return read_csv(spark, path, schema, delimiter=delimiter, null_value=null_value)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: list[tuple[str, int, int, str]],
) -> DataFrame:
    """COPY ... (FORMAT fixed): fields = [(name, start_1based, width,
    spark_type_ddl)]. One substring projection per field over the raw
    line — stays in codegen, pushes nothing to Python."""
    raw = spark.read.text(path)
    cols = [
        F.trim(F.substring("value", start, width)).cast(dtype).alias(name)
        for (name, start, width, dtype) in fields
    ]
    return raw.select(*cols)


def read_jdbc(
    spark: SparkSession, url: str, table: str, properties: dict | None = None,
    partition_column: str | None = None, num_partitions: int = 8,
    lower_bound=None, upper_bound=None,
) -> DataFrame:
    """postgres_fdw/gc_fdw analogue. For big tables pass partition_column
    + bounds so the scan parallelizes across executors instead of one
    connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return reader.load()


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"):
    """COPY TO (FORMAT csv)."""
    df.write.mode(mode).option("header", header).csv(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
):
    """The engine's managed-table sink: partitioned parquet = the
    reference's range/list partitioned tables (nodePartIterator.cpp) —
    scans prune partitions on the partition columns for free."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str],
    mode: str = "overwrite",
):
    """Partition + cluster-on-write: sortWithinPartitions orders rows by
    the cluster columns inside each file, so parquet row-group min/max
    statistics become tight — the write-side analogue of the reference's
    cstore partial sort cluster-on-load (`storage/cstore/cstore_psort.cpp`)
    feeding its CU rough-check skipping. Range predicates on the cluster
    columns then skip whole row groups at scan time."""
    # sort key must PREFIX with the partition columns: FileFormatWriter
    # requires rows ordered by them and would otherwise insert its own
    # (non-stable) sort, destroying the cluster order
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .sortWithinPartitions(*partition_cols, *cluster_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
