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


# --------------------------------------------------------------- binary
# COPY ... (FORMAT binary) — the PG binary COPY wire format
# (copy.cpp:1614-1620 format list; the on-wire layout is the public
# PostgreSQL spec): 11-byte signature 'PGCOPY\n\377\r\n\0', int32 flags,
# int32 header-extension length; per tuple an int16 field count then per
# field int32 byte length (-1 = NULL) + payload (network byte order);
# int16 -1 trailer. Supported field types here: int4, int8, float8, text
# (utf-8), date (int4 days since 2000-01-01 — the PG binary date epoch).

_PGCOPY_SIG = b"PGCOPY\n\377\r\n\0"
_PG_DATE_EPOCH_ORD = 730120  # datetime.date(2000, 1, 1).toordinal()


def _pg_bin_field_builders(schema: T.StructType):
    import struct
    from datetime import date

    builders = []
    for f in schema.fields:
        t = f.dataType
        if isinstance(t, T.IntegerType):
            builders.append(lambda v: struct.pack(">i", int(v)))
        elif isinstance(t, T.LongType):
            builders.append(lambda v: struct.pack(">q", int(v)))
        elif isinstance(t, T.DoubleType):
            builders.append(lambda v: struct.pack(">d", float(v)))
        elif isinstance(t, T.StringType):
            builders.append(lambda v: str(v).encode("utf-8"))
        elif isinstance(t, T.DateType):
            builders.append(
                lambda v: struct.pack(
                    ">i",
                    (v if isinstance(v, date) else v.date()).toordinal()
                    - _PG_DATE_EPOCH_ORD,
                )
            )
        else:
            raise TypeError(
                f"COPY BINARY: unsupported field type {t} for {f.name!r}"
            )
    return builders


def pg_binary_encode(df: DataFrame) -> DataFrame:
    """COPY TO (FORMAT binary): each input partition becomes ONE row
    holding a complete PGCOPY stream (binary COPY has no in-stream row
    delimiter, so a stream is the unit of parallelism — mirroring one
    COPY file per worker). Arrow-batched via mapInArrow — NOT pandas,
    whose float columns collapse NaN and NULL into one sentinel: Arrow
    carries an explicit validity mask, so a genuine NaN double encodes
    as a normal 8-byte float8 payload (as real PG COPY BINARY does) and
    only true NULLs get the -1 length marker."""
    import struct

    schema = df.schema
    builders = _pg_bin_field_builders(schema)
    nf = struct.pack(">h", len(builders))

    def encode(batches):
        import pyarrow as pa

        chunks = [_PGCOPY_SIG + struct.pack(">ii", 0, 0)]
        for batch in batches:
            # to_pylist: Arrow null → None, NaN → float('nan') — distinct
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            for row in zip(*cols):
                parts = [nf]
                for v, build in zip(row, builders):
                    if v is None:
                        parts.append(struct.pack(">i", -1))
                    else:
                        payload = build(v)
                        parts.append(struct.pack(">i", len(payload)) + payload)
                chunks.append(b"".join(parts))
        chunks.append(struct.pack(">h", -1))
        yield pa.RecordBatch.from_arrays(
            [pa.array([b"".join(chunks)], type=pa.binary())], names=["stream"]
        )

    return df.mapInArrow(encode, "stream BINARY")


def pg_binary_decode(streams: DataFrame, schema: T.StructType | str) -> DataFrame:
    """COPY FROM (FORMAT binary): parse PGCOPY streams (one per row of
    ``streams.stream``) back into typed rows plus a `_row_bytes`
    bookkeeping column (encoded size of each tuple). File-granular
    parallelism: each stream parses independently on its executor.
    Arrow output (mapInArrow) so decoded NaN doubles stay NaN values —
    a pandas float column would silently turn them into NULLs."""
    import struct
    from datetime import date, timedelta

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    out_schema = T.StructType(
        list(schema.fields) + [T.StructField("_row_bytes", T.IntegerType())]
    )
    types = [f.dataType for f in schema.fields]

    def parse_field(t, payload):
        if isinstance(t, T.IntegerType):
            return struct.unpack(">i", payload)[0]
        if isinstance(t, T.LongType):
            return struct.unpack(">q", payload)[0]
        if isinstance(t, T.DoubleType):
            return struct.unpack(">d", payload)[0]
        if isinstance(t, T.StringType):
            return payload.decode("utf-8")
        if isinstance(t, T.DateType):
            return date(2000, 1, 1) + timedelta(
                days=struct.unpack(">i", payload)[0]
            )
        raise TypeError(f"COPY BINARY: unsupported field type {t}")

    def _pa_type(t):
        import pyarrow as pa

        if isinstance(t, T.IntegerType):
            return pa.int32()
        if isinstance(t, T.LongType):
            return pa.int64()
        if isinstance(t, T.DoubleType):
            return pa.float64()
        if isinstance(t, T.StringType):
            return pa.string()
        if isinstance(t, T.DateType):
            return pa.date32()
        raise TypeError(f"COPY BINARY: unsupported field type {t}")

    def decode(batches):
        import pyarrow as pa

        for batch in batches:
            rows = []
            for stream in batch.column(0).to_pylist():
                buf = bytes(stream)
                if buf[:11] != _PGCOPY_SIG:
                    raise ValueError("not a PGCOPY binary stream")
                off = 11
                flags, extlen = struct.unpack_from(">ii", buf, off)
                off += 8 + extlen
                while True:
                    (nfields,) = struct.unpack_from(">h", buf, off)
                    if nfields == -1:
                        break
                    start = off
                    off += 2
                    vals = []
                    for t in types:
                        (flen,) = struct.unpack_from(">i", buf, off)
                        off += 4
                        if flen == -1:
                            vals.append(None)
                        else:
                            vals.append(parse_field(t, buf[off : off + flen]))
                            off += flen
                    vals.append(off - start)
                    rows.append(vals)
            arrays = [
                # from_pandas=False (default): None → null, NaN → value
                pa.array([r[i] for r in rows], type=_pa_type(t))
                for i, t in enumerate(types)
            ]
            arrays.append(
                pa.array([r[-1] for r in rows], type=pa.int32())
            )
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in out_schema.fields]
            )

    return streams.mapInArrow(decode, out_schema)


def write_pg_binary(df: DataFrame, path: str) -> None:
    """COPY TO (FORMAT binary) sink: one .bin stream file per partition.
    LOCAL-FILESYSTEM-ONLY (executor-side open(); on a cluster point this
    at shared storage or swap in the Hadoop FileSystem API)."""
    import os

    os.makedirs(path, exist_ok=True)
    encoded = pg_binary_encode(df)

    def save(rows):
        import uuid

        for r in rows:
            with open(
                os.path.join(path, f"part-{uuid.uuid4().hex}.bin"), "wb"
            ) as fh:
                fh.write(bytes(r.stream))

    encoded.foreachPartition(save)


def read_pg_binary(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """COPY FROM (FORMAT binary) source: binaryFile scan (one task per
    stream file) → Arrow-batched PGCOPY parse."""
    raw = spark.read.format("binaryFile").load(
        path + "/*.bin" if "*" not in path else path
    )
    return pg_binary_decode(
        raw.select(F.col("content").alias("stream")), schema
    ).drop("_row_bytes")


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
