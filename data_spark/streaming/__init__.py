"""Incremental / streaming layer (SURVEY §2.9).

The reference implements streaming semantics by hand: cron-triggered
520 s loops over 1000-row batches, `loaded_*` log tables for
exactly-once, `context.last_graphed` markers, Firestore cursor docs.
Here the same semantics are:

- ``incremental.incremental_batches`` — batch high-watermark /
  processed-log anti-join loader (the reference's dominant pattern)
- ``jobs`` — true Structured Streaming: file-source → watermarked
  windowed aggregation, and a foreachBatch MERGE sink with the
  delete-then-insert amendment path
"""

from data_spark.streaming.incremental import (
    ProcessedLog,
    incremental_batches,
    load_unprocessed,
)
from data_spark.streaming.jobs import (
    merge_stream_sink,
    merge_upsert_sink,
    stream_event_time_join,
    stream_session_windows,
    stream_windowed_counts,
)

__all__ = [
    "ProcessedLog",
    "incremental_batches",
    "load_unprocessed",
    "merge_stream_sink",
    "merge_upsert_sink",
    "stream_event_time_join",
    "stream_session_windows",
    "stream_windowed_counts",
]
