"""Connector → table integration (SURVEY §3 ingestion loops).

``ingest_pages`` is the generic driver loop the reference implements
per-API: pull pages from any pagination iterator, batch them into
DataFrames, MERGE them into the keyed target table, and persist the
cursor to a control table after every page — so a crash resumes from
the last durable cursor with at-least-once fetch + idempotent (keyed)
writes = effectively exactly-once in the table.

Rows cross the driver only page-by-page (the API is the bottleneck at
1000 rows/request, BASELINE.md — not Spark); everything after
createDataFrame is distributed.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from data_spark.operators.merge import merge_upsert


class CursorStore:
    """Durable cursor (the reference's Firestore doc) as a JSON file
    next to the target table; swap for a small control table at scale."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict[str, Any] | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f)

    def save(self, cursor: dict[str, Any]) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cursor, f)
        os.replace(tmp, self.path)


def ingest_pages(
    spark: SparkSession,
    pages: Iterator[tuple[list[dict], dict]],
    target_path: str,
    keys: list[str],
    schema: StructType | str,
    cursor_store: CursorStore | None = None,
    pages_per_write: int = 5,
) -> int:
    """Drain a pagination iterator into a keyed parquet table.

    Buffers ``pages_per_write`` pages per MERGE (write amplification vs
    durability knob), persists the cursor only after the covering write
    lands. Returns total rows ingested.
    """
    total = 0
    buffer: list[dict] = []
    last_cursor: dict | None = None

    def flush() -> None:
        nonlocal buffer, last_cursor
        if not buffer:
            return
        batch = spark.createDataFrame(buffer, schema)
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, batch, keys)
        else:
            merged = batch.dropDuplicates(keys)
        staging = target_path + "__stage"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").parquet(target_path)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        if cursor_store is not None and last_cursor is not None:
            cursor_store.save(last_cursor)
        buffer = []

    n_pages = 0
    for rows, cursor in pages:
        buffer.extend(rows)
        total += len(rows)
        last_cursor = cursor
        n_pages += 1
        if n_pages % pages_per_write == 0:
            flush()
    flush()
    return total
