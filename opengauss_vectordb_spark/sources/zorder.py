"""Z-order (Morton) clustering — multi-dimensional data skipping for
scans with conjunctive range predicates on two keys.

A single-column sort prunes scans on that column only; bit-interleaving
two quantized keys into one Morton code keeps rows close in BOTH
dimensions, so a (user range × time range) rectangle touches a small set
of contiguous z-ranges. We partition the layout by the top bits of the
z-value (`zbucket`): a query rectangle maps to the zbuckets whose
bit-prefix rectangle intersects it — computed driver-side from layout
metadata (the IVF `_probe_lists` convention: tiny metadata math that
must reach the driver because it parameterizes partition pruning) — and
the parquet source prunes every other partition.

At 100 TB this is the difference between "scan the week" and "scan the
week × the one user shard": pruning multiplies across dimensions. The
same technique generalizes to >2 columns (interleave more streams) and
to file-level skipping via parquet row-group min/max on the z-column
(finer than directory pruning, same math).

All per-row work (quantize, interleave) is shiftleft/and/or Column
expressions — whole-stage codegen, no Python.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BITS = 8  # per-dimension quantization: 256 cells per axis
BUCKET_BITS = 6  # partition count = 2^6 = 64 zbuckets


def _quantize(col: Column, lo: float, hi: float, bits: int = BITS) -> Column:
    """Linear-scale a numeric column into [0, 2^bits) (clamped)."""
    span = max(hi - lo, 1e-12)
    cell = (col - F.lit(lo)) / F.lit(span) * F.lit(float(1 << bits))
    return F.least(
        F.greatest(cell.cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
    )


def z_interleave(a: Column, b: Column, bits: int = BITS) -> Column:
    """Morton code: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1.
    Unrolled shift/mask expressions (2×bits terms), all JVM-side."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = BITS,
    bucket_bits: int = BUCKET_BITS,
) -> None:
    """Cluster `df` by the Morton code of (col_a, col_b): compute the
    per-column min/max (one metadata aggregate), quantize, interleave,
    and write partitioned by the code's top `bucket_bits` bits. The
    stats JSON next to the data is the read path's pruning metadata."""
    stats = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    ).collect()[0]
    qa = _quantize(F.col(col_a), float(stats.a_lo), float(stats.a_hi), bits)
    qb = _quantize(F.col(col_b), float(stats.b_lo), float(stats.b_hi), bits)
    z = z_interleave(qa, qb, bits)
    zbucket = F.shiftright(z, 2 * bits - bucket_bits)
    (
        df.withColumn("zbucket", zbucket)
        .repartition("zbucket")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(os.path.join(path, "data"))
    )
    meta = {
        "col_a": col_a,
        "col_b": col_b,
        "bits": bits,
        "bucket_bits": bucket_bits,
        "a_lo": float(stats.a_lo),
        "a_hi": float(stats.a_hi),
        "b_lo": float(stats.b_lo),
        "b_hi": float(stats.b_hi),
    }
    with open(os.path.join(path, "zorder_meta.json"), "w") as f:
        json.dump(meta, f)


def _bucket_rect(bucket: int, bits: int, bucket_bits: int):
    """The (a, b) cell rectangle a zbucket's bit-prefix covers.

    The bucket id is the top `bucket_bits` interleaved bits; de-interleave
    them into per-axis prefixes, then the rectangle is [prefix << free,
    (prefix + 1) << free) per axis."""
    a_hi_bits = bucket_bits // 2
    b_hi_bits = bucket_bits - a_hi_bits
    a_prefix = b_prefix = 0
    # bucket bits from most-significant interleaved bit down: even
    # positions (2i) belong to a, odd (2i+1) to b — the top bit of the
    # z-value is b's MSB when bucket_bits is even
    pos = 2 * bits - 1
    for k in range(bucket_bits - 1, -1, -1):
        bit = (bucket >> k) & 1
        if pos % 2 == 1:
            b_prefix = (b_prefix << 1) | bit
        else:
            a_prefix = (a_prefix << 1) | bit
        pos -= 1
    a_free = bits - a_hi_bits
    b_free = bits - b_hi_bits
    return (
        a_prefix << a_free,
        ((a_prefix + 1) << a_free) - 1,
        b_prefix << b_free,
        ((b_prefix + 1) << b_free) - 1,
    )


def prune_buckets(
    path: str, a_range: tuple[float, float], b_range: tuple[float, float]
) -> list[int]:
    """Zbuckets whose rectangle intersects the query rectangle — driver-
    side metadata math over 2^bucket_bits buckets (64 here; bounded like
    IVF's centroid ranking)."""
    with open(os.path.join(path, "zorder_meta.json")) as f:
        meta = json.load(f)
    bits, bucket_bits = meta["bits"], meta["bucket_bits"]

    def cell(v, lo, hi):
        span = max(hi - lo, 1e-12)
        c = int((v - lo) / span * (1 << bits))
        return min(max(c, 0), (1 << bits) - 1)

    qa_lo = cell(a_range[0], meta["a_lo"], meta["a_hi"])
    qa_hi = cell(a_range[1], meta["a_lo"], meta["a_hi"])
    qb_lo = cell(b_range[0], meta["b_lo"], meta["b_hi"])
    qb_hi = cell(b_range[1], meta["b_lo"], meta["b_hi"])
    out = []
    for bucket in range(1 << bucket_bits):
        a0, a1, b0, b1 = _bucket_rect(bucket, bits, bucket_bits)
        if a1 >= qa_lo and a0 <= qa_hi and b1 >= qb_lo and b0 <= qb_hi:
            out.append(bucket)
    return out


def read_pruned(
    spark: SparkSession,
    path: str,
    a_range: tuple[float, float],
    b_range: tuple[float, float],
) -> DataFrame:
    """Scan only the zbuckets intersecting the query rectangle; callers
    still apply the exact predicate (pruning is a superset filter)."""
    buckets = prune_buckets(path, a_range, b_range)
    return (
        spark.read.parquet(os.path.join(path, "data"))
        .filter(F.col("zbucket").isin(buckets))
        .drop("zbucket")
    )


# --------------------------------------------------------------------------
# Gated query: z-ordered events layout, rectangle-pruned scan
# --------------------------------------------------------------------------

from ..catalog import table  # noqa: E402
from ..registry import query  # noqa: E402


def zorder_root(spark: SparkSession) -> str:
    """Layout root for z-ordered copies: under the session warehouse
    (the bucketed.py convention), overridable via the
    ``spark.graft.zorder.root`` conf — on a cluster point it at a
    shared/durable filesystem rather than any node-local tmp."""
    from urllib.parse import urlparse

    conf_root = spark.conf.get("spark.graft.zorder.root", None)
    if conf_root:
        return conf_root
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    return os.path.join(wh, "_zorder")


def _zorder_layout(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) the z-ordered events layout clustered by
    (user_id, epoch-day)."""
    import hashlib

    key = hashlib.md5(f"{sf_dir}|zorder-v1".encode()).hexdigest()[:10]
    path = os.path.join(zorder_root(spark), f"zorder_events_{key}")
    marker = os.path.join(path, "zorder_meta.json")
    if not os.path.exists(marker):
        ev = table(spark, sf_dir, "events").withColumn(
            "epoch_day",
            F.datediff(F.to_date(F.col("ts")), F.lit("1970-01-01")).cast(
                "long"
            ),
        )
        write_zordered(ev, path, "user_id", "epoch_day")
    return path


@query(
    "zorder_pruned_scan",
    """
    WITH b AS (
      SELECT MIN(user_id) AS a_lo, MAX(user_id) AS a_hi,
             MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS b_lo,
             MAX(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS b_hi
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events, b
    WHERE user_id >= FLOOR(a_lo + 0.40 * (a_hi - a_lo))
      AND user_id <= FLOOR(a_lo + 0.60 * (a_hi - a_lo))
      AND date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
            >= FLOOR(b_lo + 0.30 * (b_hi - b_lo))
      AND date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
            <= FLOOR(b_lo + 0.50 * (b_hi - b_lo))
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def zorder_pruned_scan(spark, sf_dir):
    """Rectangle query over the z-ordered layout: the (user × day)
    predicate prunes to the zbuckets whose Morton prefix intersects the
    rectangle (driver-side metadata math, like IVF's probe ranking),
    then the exact predicate runs inside the pruned scan. The oracle is
    the same rectangle over the flat table — the result is
    layout-independent, which is precisely the property a clustering
    layout must preserve. test_plan_quality pins that the pruned scan
    reads a strict subset of partitions with PartitionFilters."""
    import math

    path = _zorder_layout(spark, sf_dir)
    with open(os.path.join(path, "zorder_meta.json")) as f:
        meta = json.load(f)
    a_lo = math.floor(meta["a_lo"] + 0.40 * (meta["a_hi"] - meta["a_lo"]))
    a_hi = math.floor(meta["a_lo"] + 0.60 * (meta["a_hi"] - meta["a_lo"]))
    b_lo = math.floor(meta["b_lo"] + 0.30 * (meta["b_hi"] - meta["b_lo"]))
    b_hi = math.floor(meta["b_lo"] + 0.50 * (meta["b_hi"] - meta["b_lo"]))
    pruned = read_pruned(spark, path, (a_lo, a_hi), (b_lo, b_hi))
    return (
        pruned.filter(
            (F.col("user_id") >= a_lo)
            & (F.col("user_id") <= a_hi)
            & (F.col("epoch_day") >= b_lo)
            & (F.col("epoch_day") <= b_hi)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )
