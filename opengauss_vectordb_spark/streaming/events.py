"""Structured Streaming ingestion over the events schema — ADDITIVE
beyond reference parity (SURVEY.md §2.9: the reference has no event
streams; its time-series artifact is the TsStoreScan,
`vecnode/vectsstorescan.cpp`, which this module's time-partitioned sink
mirrors).

Patterns provided (the Spark-native streaming surface a user of the
reference's time-series store would need):
  * readStream over a parquet/json drop directory with an explicit schema
  * watermarked tumbling/sliding window aggregation (late data handled)
  * session windows via F.session_window
  * foreachBatch upsert sink writing time-partitioned parquet
All aggregations reuse the same window expressions as the batch queries
in batch_windows.py — Spark guarantees identical semantics, so the batch
oracles also validate the streaming transformations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators._util import dsum, dsum6

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """readStream over a drop directory (one file per micro-batch)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if fmt == "json":
        return reader.json(path)
    if fmt == "parquet":
        return reader.parquet(path)
    raise ValueError(f"unsupported stream format {fmt!r}")


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours",
                    sum6: bool = False) -> DataFrame:
    """Watermarked tumbling-window counts per event_type; late events
    beyond the watermark are dropped, in-watermark stragglers update
    their window (append-mode emits a window once it is final).

    ``sum6`` (ADVICE r12): this is a GENERIC helper over caller-supplied
    event frames, so the exact decimal accumulator (dsum) is the
    default — dsum6's scaled-long fast path silently rounds values with
    more than 6 true decimal digits and wraps beyond its |v| bound.
    Callers whose value column provably satisfies the dsum6
    preconditions (the engine's events table: 6 dp, |v| ≤ ~561) opt in
    with sum6=True for the ~3× cheaper aggregation."""
    total = (dsum6 if sum6 else dsum)(F.col("value"), "total_value")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), total)
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "total_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session windows (inactivity gap) per user — the streaming dual of
    batch_windows.events_session_windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, table_name: str, mode: str = "append"):
    """Drain all available input with trigger(availableNow) into an
    in-memory sink (the test harness; production uses parquet/foreachBatch)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def write_time_partitioned(stream_df: DataFrame, path: str, checkpoint: str):
    """Production sink: parquet partitioned by event date+hour — the
    TsStoreScan-style time-partitioned layout, so downstream scans prune
    on time predicates."""
    partitioned = stream_df.withColumn("event_date", F.to_date("ts")).withColumn(
        "event_hour", F.hour("ts")
    )
    return (
        partitioned.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("event_date", "event_hour")
        .trigger(availableNow=True)
        .start()
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream time-bounded join: each left event pairs with
    same-user right events in [left.ts, left.ts + window]. Watermarks on
    BOTH sides bound the join state (Spark retains only rows that can
    still match — the time condition plus watermark defines the state
    eviction horizon). This is the streaming runtime of the
    `events_interval_join` batch query: same predicate, same results,
    which is what lets the batch DuckDB oracle stand in for the
    streaming path."""
    lw = left.withWatermark("ts", watermark).alias("l")
    rw = right.withWatermark("ts", watermark).alias("r")
    return lw.join(
        rw,
        F.expr(
            f"""l.user_id = r.user_id
                AND r.ts >= l.ts
                AND r.ts < l.ts + INTERVAL {window}"""
        ),
    ).select(
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col("l.user_id").alias("user_id"),
    )


def dedup_stream(events: DataFrame, keys: list[str], watermark_col: str = "ts",
                 delay: str = "1 hour") -> DataFrame:
    """Streaming exact dedup within a watermark — the ingest-time side of
    the dedup pipeline (ADDITIVE; reference has no streaming, §2.9):
    duplicates arriving within `delay` of each other are dropped while
    state stays bounded by (keys in watermark window), so a 100 TB/day
    feed can dedup continuously without unbounded state growth. Batch
    re-dedup (`dedup_exact`) remains the exhaustive backstop across
    watermark horizons."""
    return events.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(keys)
