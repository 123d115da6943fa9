"""Multimodal columns — image/audio/video as opaque BINARY + typed
metadata (beyond-reference capability from the north star: the Spark-side
plumbing a 100 TB multimodal training pipeline needs).

Design:
  * payloads are BinaryType columns; metadata is a typed struct
    (modality, mime, width/height/duration, codec) so filters/partition
    pruning work without touching bytes
  * decode / feature-extract / resize / frame-sample run as Arrow-batched
    mapInPandas stages — the batch shape, schema contract, and
    partitioning are real and tested; the actual codec call is STUBBED
    (`_decode_stub`) because no image/audio libraries exist in this
    container. Swapping in PIL/ffmpeg is a one-function change.
  * partition strategy: repartition by a size-balanced key before the
    decode stage so one executor doesn't get all the 4K videos.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),  # image|audio|video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id BIGINT, modality STRING, n_bytes INT, feature ARRAY<FLOAT>"
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake corpus: payload = seeded pseudo-random bytes,
    metadata varied across modalities (the test stand-in for a real
    binary-file ingest via spark.read.format('binaryFile'))."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(((i * 7 + j * 13) % 251) for j in range(128 + (i % 5) * 64))
        rows.append(
            (
                i,
                payload,
                (modality, f"x/{modality}", 64 + i % 32, 48 + i % 16, 1000 * (i % 9)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, modality: str) -> list[float]:
    """STUB decode → 16-d feature vector. Deterministic whole-payload
    mixing standing in for PIL.Image.open / torchaudio.load / ffmpeg
    frame sampling (libraries not present in this container). Raises for
    unknown modalities, mirroring a real codec error path.

    The mix is pure integer arithmetic (position-weighted byte sums mod a
    prime, scaled to [0, 1) and stored at fp32) so the driver gate can
    recompute it exactly in ANSI SQL — unlike a crypto digest, which
    DuckDB cannot apply to constructed binary."""
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    import numpy as np

    return [
        float(
            np.float32(
                (sum(payload[j] * (j + 1) for j in range(k, len(payload), 16)) % 997)
                / 997.0
            )
        )
        for k in range(16)
    ]


def extract_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    The pandas iterator shape is the real contract: each batch arrives as
    a DataFrame with payload bytes + struct metadata, features leave as
    list columns; Spark handles Arrow transfer and schema enforcement.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    prepared = media.select(
        "media_id",
        F.col("meta.modality").alias("modality"),
        F.length("payload").cast("int").alias("n_bytes"),
        "payload",
    )
    # size-balanced redistribution before the expensive stage: hash on
    # media_id spreads large payloads uniformly across executors
    prepared = prepared.repartition("media_id")
    return prepared.mapInPandas(run, FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — must never deserialize payloads
    (column pruning keeps the binary column out of the scan)."""
    return (
        media.groupBy(F.col("meta.modality").alias("modality"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg(F.col("meta.width")).alias("avg_width"),
        )
        .orderBy("modality")
    )


# ---------------------------------------------------------------- queries

from ..registry import query  # noqa: E402


@query(
    "multimodal_feature_stats",
    """
    WITH m AS (
      SELECT i AS media_id,
             CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality,
             128 + (i % 5) * 64 AS n_bytes
      FROM range(0, 90) t(i)
    ), f AS (
      SELECT modality, n_bytes,
             list_sum(list_transform(range(0, 16), k ->
               CAST(CAST(list_sum(list_transform(range(0, n_bytes // 16),
                      r -> ((media_id*7 + (r*16+k)*13) % 251) * (r*16+k+1)))
                    % 997 AS DOUBLE) / 997.0 AS FLOAT))) AS feature_sum
      FROM m
    )
    SELECT modality,
           COUNT(*) AS n,
           CAST(SUM(CAST(feature_sum AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_feature_sum,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
    FROM f GROUP BY modality ORDER BY modality
    """,
)
def multimodal_feature_stats(spark, sf_dir):
    """Full decode→feature pipeline over the synthetic media corpus, then
    per-modality feature statistics. The oracle regenerates the corpus
    (payload byte j of doc i is ``(i*7 + j*13) % 251``) and replays the
    stub-decode arithmetic in SQL, so the Arrow mapInPandas path is
    value-checked end-to-end, not just row-counted."""
    media = synthetic_media(spark, n=90)
    feats = extract_features(media)
    fs = F.aggregate("feature", F.lit(0.0), lambda a, x: a + x)
    return (
        feats.withColumn("_fs", fs)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("_fs").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_feature_sum"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
        .orderBy("modality")
    )


@query(
    "multimodal_frame_sample",
    """
    WITH m AS (
      SELECT i AS media_id, 1000 * (i % 9) AS duration_ms
      FROM range(0, 90) t(i) WHERE i % 3 = 2
    )
    SELECT media_id,
           CAST(unnest(range(0, duration_ms, 2000)) AS BIGINT) AS frame_ms,
           CAST(len(range(0, duration_ms, 2000)) AS INT) AS n_sampled
    FROM m WHERE duration_ms > 0
    ORDER BY media_id, frame_ms
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing: per video row, the sampled frame
    timestamps (every 2000 ms across duration_ms) from METADATA ONLY —
    sequence + explode, payload bytes never touched, which is the point:
    a 100 TB video corpus plans its decode work (which frames, how many
    tasks) from the typed metadata column before any codec runs. The
    decode of each sampled frame would then be the mapInPandas stage
    extract_features demonstrates. Oracle regenerates the deterministic
    corpus metadata and the same range arithmetic."""
    media = synthetic_media(spark, n=90)
    v = (
        media.select(
            "media_id",
            F.col("meta.modality").alias("modality"),
            F.col("meta.duration_ms").alias("duration_ms"),
        )
        .filter((F.col("modality") == "video") & (F.col("duration_ms") > 0))
        .withColumn(
            "_frames",
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(2000)),
        )
    )
    return (
        v.select(
            "media_id",
            F.explode("_frames").alias("_f"),
            F.size("_frames").cast("int").alias("n_sampled"),
        )
        .select(
            "media_id",
            F.col("_f").cast("bigint").alias("frame_ms"),
            "n_sampled",
        )
        .orderBy("media_id", "frame_ms")
    )
