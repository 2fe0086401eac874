"""Structured Streaming jobs (SURVEY §2.9 Spark mappings).

- ``stream_windowed_counts``: readStream → watermark → tumbling-window
  agg (the daily-dedup/day-node semantics as a real stream).
- ``merge_upsert_sink``: foreachBatch MERGE — each micro-batch is
  upserted into a keyed parquet target via operators.merge.merge_upsert
  (ES doc_as_upsert semantics), with optional amendment
  delete-then-insert (the FEC prev_file_num path).

Tested with file sources/sinks in tests/test_streaming.py; on a
cluster the same code runs against Kafka/object-store sources — only
the ``format`` changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from data_spark.operators.merge import delete_then_insert, merge_upsert


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str = "event_type",
) -> DataFrame:
    """File-source stream → watermarked tumbling-window counts.

    The watermark bounds state (late rows beyond it are dropped), which
    is the streaming analogue of the reference's `now-1d` lookback
    windows.
    """
    stream = spark.readStream.schema(schema).json(source_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n",
        )
    )


def stream_session_windows(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Watermarked session-window aggregation: events from the same key
    within ``gap`` of each other merge into one session row (start, end,
    n_events).

    This is the native stateful operator behind the batch sessionization
    query (e_sessionize's lag-based island detection): state holds one
    open session per key, sessions merge as late rows arrive, and the
    watermark both emits closed sessions and bounds state.
    """
    stream = spark.readStream.schema(schema).json(source_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_event_time_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    max_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream event-time join: right-side rows match a
    left row with the same ``key`` when they land inside
    ``[left_ts, left_ts + max_delay]`` (attribution-join shape: click
    within an hour of its impression).

    Both watermarks AND the time-range bound are load-bearing at scale:
    together they let Spark evict buffered join state once the watermark
    passes ``left_ts + max_delay`` — without the range condition the
    join state grows without bound. ``how='leftOuter'`` emits unmatched
    left rows after their state expires (requires the same bounds).

    Column names other than ``key`` must be disjoint between the sides.
    """
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, how).drop(r[key])


def merge_upsert_sink(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint: str,
    order_col: str | None = None,
    prev_key: str | None = None,
) -> StreamingQuery:
    """foreachBatch MERGE sink: micro-batch → upsert into a keyed
    parquet table (rewrite-on-merge — at cluster scale the rewrite
    becomes partition-scoped overwrite keyed by the merge key's
    partition).

    ``prev_key``: when set, rows carrying it first delete their
    predecessor (amendment delete-then-insert,
    load_graph_expenditures/cypher.py:40-75 semantics).
    """
    spark = stream.sparkSession

    def _merge(batch: DataFrame, batch_id: int) -> None:
        import os

        batch = batch.dropDuplicates(keys)
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            if prev_key is not None and prev_key in batch.columns:
                target = delete_then_insert(
                    target, batch.filter(F.col(prev_key).isNotNull()),
                    key=keys[0], prev_key=prev_key,
                )
                batch = batch.filter(F.col(prev_key).isNull()).drop(prev_key)
                target = target.drop(prev_key) if prev_key in target.columns else target
            merged = merge_upsert(target, batch, keys, order_col=order_col)
        else:
            merged = batch.drop(prev_key) if prev_key and prev_key in batch.columns else batch
        staging = f"{target_path}__batch{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        out = spark.read.parquet(staging)
        out.write.mode("overwrite").parquet(target_path)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
