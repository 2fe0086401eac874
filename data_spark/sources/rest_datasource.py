"""Spark-native paginated-API source (Python DataSource API, Spark 4).

The reference implements its REST sources as driver-side cursor loops
(keyset / page-number / offset iterators — see sources/pagination.py,
which re-expresses them as plain Python iterators for the landing
tier). For APIs whose pages are ENUMERABLE UP FRONT (offset / page
number), Spark 4's Python DataSource API lets the engine own the read:
the planner enumerates one ``InputPartition`` per page and EXECUTORS
fetch pages in parallel — pagination becomes a partitioned scan
instead of a serial driver loop, with catalog schema, column order,
and filter pushdown handled by the engine.

This module ships the offline-testable core: a "paged directory"
endpoint layout (``_meta.json`` + ``page-NNNNN.json`` files) standing
in for the HTTP GET an executor would issue per page — the partition
planning, schema declaration, option handling, and cursor-range page
pruning are exactly what a network deployment reuses (swap
``_fetch_page`` for the HTTP call; sources/retry.py supplies the
escalation policy).

Page pruning: ``_meta.json`` may carry ``cursor_ranges`` — the
[min, max] of the cursor column per page (the paged analogue of
parquet footer min/max stats). ``pushFilters`` keeps every filter
(Spark re-applies them row-level) but uses cursor-column comparisons
to drop whole pages at PLANNING time, so a ``WHERE id >= X`` keyset
resume reads only the tail pages — verify via
``df.rdd.getNumPartitions()`` (tests/test_rest_datasource.py).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class PagePartition(InputPartition):
    def __init__(self, index: int, path: str):
        self.index = index
        self.path = path


def _load_meta(path: str) -> dict:
    with open(os.path.join(path, "_meta.json")) as f:
        return json.load(f)


class PagedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.meta = _load_meta(self.path)
        self.cursor_col = self.meta.get("cursor_col")
        self._bounds: list[tuple[str, float]] = []  # (op, value) on cursor_col

    # -- planning ---------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Record cursor-column bounds for page pruning; yield every
        filter back so Spark re-applies them row-level (pruning is a
        planning optimization, not a correctness contract)."""
        for f in filters:
            if (
                self.cursor_col
                and isinstance(
                    f,
                    (
                        EqualTo,
                        GreaterThan,
                        GreaterThanOrEqual,
                        LessThan,
                        LessThanOrEqual,
                    ),
                )
                and list(f.attribute) == [self.cursor_col]
                and isinstance(f.value, (int, float))
            ):
                self._bounds.append((type(f).__name__, float(f.value)))
            yield f

    def _page_survives(self, rng: Sequence[float]) -> bool:
        lo, hi = float(rng[0]), float(rng[1])
        for op, v in self._bounds:
            if op == "EqualTo" and not (lo <= v <= hi):
                return False
            if op == "GreaterThan" and hi <= v:
                return False
            if op == "GreaterThanOrEqual" and hi < v:
                return False
            if op == "LessThan" and lo >= v:
                return False
            if op == "LessThanOrEqual" and lo > v:
                return False
        return True

    def partitions(self) -> list[PagePartition]:
        n = int(self.meta["pages"])
        ranges = self.meta.get("cursor_ranges")
        parts = []
        for i in range(n):
            if ranges is not None and not self._page_survives(ranges[i]):
                continue
            parts.append(PagePartition(i, os.path.join(self.path, f"page-{i:05d}.json")))
        # an empty scan still needs one (empty) partition
        return parts or [PagePartition(-1, "")]

    # -- execution (runs on executors) ------------------------------------
    def _fetch_page(self, partition: PagePartition) -> list[dict]:
        """One page fetch. The network deployment issues the HTTP GET
        here (executor-side, with sources/retry.py escalation); the
        offline layout reads the landed page file."""
        if partition.index < 0:
            return []
        with open(partition.path) as f:
            return json.load(f)

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        names = self.schema.fieldNames()
        for rec in self._fetch_page(partition):
            yield tuple(rec.get(n) for n in names)


class PagedRestStreamReader(SimpleDataSourceStreamReader):
    """Cursor-tailing incremental reader: the stream offset is simply
    the next page index, so each microbatch drains the pages that
    appeared since the last committed offset — the engine-native form
    of the reference's durable-cursor resume (sources/pagination.py /
    streaming/incremental.py re-express the same contract by hand).
    Replays (``readBetweenOffsets``) re-fetch a closed page interval,
    giving exactly-once delivery into an idempotent sink."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"next_page": 0}

    def _page_rows(self, i: int) -> Iterator[tuple]:
        names = self.schema.fieldNames()
        with open(os.path.join(self.path, f"page-{i:05d}.json")) as f:
            for rec in json.load(f):
                yield tuple(rec.get(n) for n in names)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        end = int(_load_meta(self.path)["pages"])
        first = int(start["next_page"])
        # materialized, not a generator: the engine copy.copy()s the
        # prefetch-cache entry, which a generator cannot survive; a
        # microbatch is a bounded page interval so the list is too
        rows = [row for i in range(first, end) for row in self._page_rows(i)]
        return rows, {"next_page": max(first, end)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for i in range(int(start["next_page"]), int(end["next_page"])):
            yield from self._page_rows(i)


class PagedRestDataSource(DataSource):
    """``spark.read.format("paged_rest").option("path", dir).load()``
    for batch, ``spark.readStream.format("paged_rest")...`` for
    cursor-tailing incremental ingestion.

    Options: ``path`` (endpoint directory). Schema comes from
    ``_meta.json``'s DDL string unless the caller supplies one.
    """

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        return _load_meta(self.options["path"])["schema"]

    def reader(self, schema: StructType) -> PagedRestReader:
        return PagedRestReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> PagedRestStreamReader:
        return PagedRestStreamReader(schema, self.options)


def write_paged_endpoint(
    rows: list[dict],
    path: str,
    schema_ddl: str,
    page_size: int,
    cursor_col: str | None = None,
) -> None:
    """Lay a paged-directory endpoint down on disk (test/fixture side of
    the contract): page files plus ``_meta.json`` with page count,
    schema DDL, and per-page cursor min/max when ``cursor_col`` is
    given (rows must already be cursor-ordered for keyset semantics)."""
    os.makedirs(path, exist_ok=True)
    pages = [rows[i : i + page_size] for i in range(0, len(rows), page_size)] or [[]]
    meta: dict = {"pages": len(pages), "schema": schema_ddl}
    if cursor_col is not None:
        meta["cursor_col"] = cursor_col
        meta["cursor_ranges"] = [
            [min(r[cursor_col] for r in p), max(r[cursor_col] for r in p)]
            if p
            else [0, -1]
            for p in pages
        ]
    for i, p in enumerate(pages):
        with open(os.path.join(path, f"page-{i:05d}.json"), "w") as f:
            json.dump(p, f)
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(meta, f)
