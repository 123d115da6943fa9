"""Streaming layer — ADDITIVE beyond reference parity.

The reference has no event-stream engine (SURVEY.md §2.9: its "Stream"
nodes are intra-query exchanges, `streamplan.h:50`); the closest artifact
is the time-series store scan (`vectsstorescan.cpp`). This package adds
what a Spark-native engine should have:

  batch_windows.py  tumbling/sliding/session window semantics as batch
                    queries over `events` (oracle-checkable)
  events.py         Structured Streaming ingestion: readStream +
                    watermark + windowed aggregation + foreachBatch sink
"""
