"""Custom stateful streaming operator via applyInPandasWithState —
the arbitrary-state API for semantics the built-in windows can't express
(ADDITIVE; the reference has no streaming, SURVEY.md §2.9).

Implemented operator: per-user running anomaly detector — maintains
(count, mean, M2) Welford state per user across micro-batches and emits
events whose value deviates more than `threshold` standard deviations
from that user's running mean at arrival time. This is genuinely
stateful-sequential (each event's verdict depends on all prior events of
that user), so neither window aggregation nor watermarked joins express
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = "count LONG, mean DOUBLE, m2 DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def anomaly_stream(events: DataFrame, threshold: float = 3.0,
                   min_history: int = 10) -> DataFrame:
    """events (streaming or batch-over-stream DF) → anomalous events.

    State: Welford (count, mean, M2) per user_id, carried across
    micro-batches by the state store. Within a batch, events are
    processed in (ts, event_id) order so results are deterministic.
    """
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            count, mean, m2 = state.get
        else:
            count, mean, m2 = 0, 0.0, 0.0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, row in pdf.iterrows():
                v = float(row["value"])
                if count >= min_history and m2 > 0:
                    std = math.sqrt(m2 / count)
                    z = (v - mean) / std if std > 0 else 0.0
                    if abs(z) > threshold:
                        out_rows.append(
                            (int(key[0]), int(row["event_id"]), v, z, count)
                        )
                count += 1
                delta = v - mean
                mean += delta / count
                m2 += delta * (v - mean)
        state.update((count, mean, m2))
        yield pd.DataFrame(
            out_rows, columns=["user_id", "event_id", "value", "zscore", "n_seen"]
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
