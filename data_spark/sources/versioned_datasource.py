"""Streaming source OVER the versioned store (Python DataSource API,
Spark 4) — the Delta-streaming-source contract for this engine's
commit log: ``spark.readStream.format("versioned_table")
.option("path", table_path).load()`` tails the table, one micro-batch
per drained version range.

The version log IS the offset sequence: every commit (any branch)
takes the next dense global number through the manifest put-if-absent,
so a stream offset is just ``{"next_version": v}`` — resuming from a
checkpoint replays a CLOSED version interval, which is exactly-once
into an idempotent sink. Per-version semantics mirror Delta's source:

- the STARTING version (the head when the stream first runs, or
  ``starting_version``) is served as the initial snapshot — all rows
  visible at that version, tombstones applied;
- later ``append`` versions emit their new commit's rows;
- later ``merge`` versions emit the merge's INSERTED row versions
  (Delta ``ignoreChanges`` semantics: upserted rows re-emit, deleted
  rows are not retracted — the documented contract for CDC-shaped
  consumers; pair with a keyed idempotent sink);
- ``delete`` versions carry no new rows and are skipped
  (``ignore_deletes`` semantics — downstream joins against the store
  see deletes via merge-on-read reads, not the stream);
- layout-only versions (``optimize*``, ``purge``, compaction
  ``overwrite`` after the start, ``publish-*`` fast-forwards, restores)
  REWRITE existing rows: emitting them would duplicate the table into
  the stream. By default the source raises (the Delta default for
  non-append changes); ``skip_change_commits=true`` opts into skipping
  them (Delta ``skipChangeCommits``).

Branch commits are never emitted (main-only, like every default
reader); a branch's rows enter the stream at the ``publish-*``
fast-forward — which lists commit dirs the stream has NOT seen, so the
publish emits exactly the branch's audited commits (W-A-P composes
with streaming for free).

Executors read the parquet of each drained commit via pyarrow (hive
partitioning for spec'd commits, cast to the manifest-pinned dtype) —
the same Arrow batch path the multimodal tier uses. Schema is derived
driver-side from the head commit's footer plus the manifest spec.

Reference parity: the reference tails its warehouse with hand-rolled
processed-markers (…pubsub_laundromat/main.py-style incremental
batches; re-expressed in streaming/incremental.py). This source makes
the engine's own store tailable natively instead.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
    "binary": "binary",
    "large_binary": "binary",
}


def _arrow_field_ddl(field) -> str:
    t = str(field.type)
    if t in _ARROW_TO_DDL:
        return _ARROW_TO_DDL[t]
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("decimal"):
        return t
    if t.startswith("list<item: ") and t.endswith(">"):
        inner = t[len("list<item: ") : -1]
        if inner in _ARROW_TO_DDL:
            return f"array<{_ARROW_TO_DDL[inner]}>"
    raise ValueError(
        f"versioned_table source: unsupported arrow type {t!r} for "
        f"column {field.name!r} — supply .schema(...) explicitly"
    )


def _manifest(path: str, v: int) -> dict:
    with open(os.path.join(path, "_manifests", f"v{v}.json")) as f:
        return json.load(f)


def _versions(path: str) -> list[int]:
    vdir = os.path.join(path, "_manifests")
    if not os.path.isdir(vdir):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(vdir)
        if f.startswith("v") and f.endswith(".json")
    )


def _is_main(m: dict) -> bool:
    return m.get("branch", "main") == "main"


def _commit_rows(
    table_path: str, commit_dir: str, spec: dict | None, names: list[str]
) -> Iterator[tuple]:
    """Arrow read of one commit dir; hive partition values cast to the
    manifest-pinned dtype (strings parsed exactly — '007' stays '007'
    for a string spec column because the partition SCHEMA is forced to
    string before the cast)."""
    import pyarrow.compute  # noqa: F401
    import pyarrow.dataset as ds

    d = os.path.join(table_path, "data", commit_dir)
    if spec:
        import pyarrow as pa

        part_schema = pa.schema([(c, pa.string()) for c in spec])
        dataset = ds.dataset(
            d, format="parquet", partitioning=ds.partitioning(part_schema, flavor="hive")
        )
    else:
        dataset = ds.dataset(d, format="parquet")
    tbl = dataset.to_table()
    cols = {}
    for n in names:
        col = tbl.column(n).to_pylist() if n in tbl.column_names else [None] * len(tbl)
        if spec and n in spec:
            col = [_cast_part(v, spec[n]) for v in col]
        cols[n] = col
    for i in range(len(tbl)):
        yield tuple(cols[n][i] for n in names)


def _cast_part(v, dtype: str):
    if v is None:
        return None
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return int(v)
    if dtype in ("float", "double"):
        return float(v)
    if dtype == "boolean":
        return v if isinstance(v, bool) else str(v).lower() == "true"
    return str(v)


class VersionedStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.skip_change = (
            str(options.get("skip_change_commits", "false")).lower() == "true"
        )
        self.starting = options.get("starting_version")
        # Delta's maxFilesPerTrigger analogue: bound how many versions
        # one micro-batch drains, so a backlogged stream catches up in
        # bounded batches instead of one giant one (state, sink
        # transactions, and retry cost all scale with batch size)
        mv = options.get("max_versions_per_trigger")
        self.max_versions = int(mv) if mv is not None else None

    # -- offsets ---------------------------------------------------------

    def initialOffset(self) -> dict:
        if self.starting is not None:
            return {"next_version": int(self.starting), "snapshot_pending": True}
        vs = [v for v in _versions(self.path)]
        heads = [v for v in vs if _is_main(_manifest(self.path, v))]
        if not heads:
            raise FileNotFoundError(f"no main versions under {self.path}")
        return {"next_version": heads[-1], "snapshot_pending": True}

    # -- version draining ------------------------------------------------

    def _snapshot_rows(self, v: int) -> list[tuple]:
        """All rows visible at version v (tombstones applied) — the
        initial-snapshot batch. Driver-side pyarrow, like every other
        read of this source; the snapshot is one bounded batch."""
        m = _manifest(self.path, v)
        names = self.schema.fieldNames()
        specs = m.get("specs", {})
        deletes = m.get("deletes", [])
        out: list[tuple] = []
        tomb_cache: dict[str, set] = {}
        for i, c in enumerate(m["commits"]):
            applicable = [d for d in deletes if d["upto"] > i]
            rows = list(_commit_rows(self.path, c, specs.get(c), names))
            if applicable:
                keys, key_cols = set(), None
                for d in applicable:
                    kc, ks = self._tombstones(d["dir"], tomb_cache)
                    key_cols = key_cols or kc
                    keys |= ks
                if key_cols:
                    idx = [names.index(k) for k in key_cols]
                    rows = [r for r in rows if tuple(r[j] for j in idx) not in keys]
            out.extend(rows)
        return out

    def _tombstones(self, delete_dir: str, cache: dict) -> tuple[list, set]:
        if delete_dir not in cache:
            import pyarrow.dataset as ds

            tbl = ds.dataset(
                os.path.join(self.path, "deletes", delete_dir), format="parquet"
            ).to_table()
            key_cols = list(tbl.column_names)
            cols = [tbl.column(n).to_pylist() for n in key_cols]
            cache[delete_dir] = (key_cols, {tuple(vs) for vs in zip(*cols)} if cols else set())
        return cache[delete_dir]

    def _version_rows(self, v: int, prev_commits: set) -> list[tuple]:
        """Rows a POST-snapshot version contributes to the stream."""
        m = _manifest(self.path, v)
        if not _is_main(m):
            return []
        mode = m.get("mode", "")
        names = self.schema.fieldNames()
        specs = m.get("specs", {})
        if mode in ("append", "merge") or mode.startswith("publish-"):
            new = [c for c in m["commits"] if c not in prev_commits]
            rows: list[tuple] = []
            for c in new:
                rows.extend(_commit_rows(self.path, c, specs.get(c), names))
            return rows
        if mode == "delete":
            return []
        # overwrite / optimize / optimize-incr / purge / restore:
        # rewrites of existing rows — emitting would duplicate history
        if self.skip_change:
            return []
        raise ValueError(
            f"versioned_table stream: version {v} is a non-append change "
            f"(mode={mode!r}); set skip_change_commits=true to skip layout "
            "rewrites, or restart the stream from a newer starting_version"
        )

    def _main_commits_at(self, v: int) -> set:
        return set(_manifest(self.path, v).get("commits", []))

    def read(self, start: dict) -> tuple[list, dict]:
        latest = _versions(self.path)
        end = (latest[-1] + 1) if latest else int(start["next_version"])
        if self.max_versions is not None:
            first = int(start["next_version"])
            if start.get("snapshot_pending"):
                # the snapshot is its own (bounded-by-table) batch
                end = min(end, first + 1)
            else:
                end = min(end, first + self.max_versions)
        rows, off = self._read_interval(start, end)
        if off == dict(start):
            # no new versions: the engine probes the (empty) result with
            # next() to assert the offset legitimately failed to advance,
            # so hand it an iterator; advancing batches return the
            # materialized list (the prefetch cache copy.copy()s entries)
            return iter(rows), off
        return rows, off

    def _last_main_before(self, v: int) -> int:
        for u in reversed([x for x in _versions(self.path) if x < v]):
            if _is_main(_manifest(self.path, u)):
                return u
        return v - 1 if v > 0 else 0

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows, _ = self._read_interval(start, int(end["next_version"]))
        return rows

    def _read_interval(self, start: dict, end_v: int) -> tuple[list, dict]:
        first = int(start["next_version"])
        rows: list[tuple] = []
        nxt = first
        if start.get("snapshot_pending"):
            rows.extend(self._snapshot_rows(first))
            nxt = first + 1
        # prev tracks the last MAIN manifest's commit list, so a publish
        # fast-forward emits exactly the branch commits main never saw
        prev = None
        for v in range(nxt, end_v):
            if prev is None:
                prev = self._main_commits_at(self._last_main_before(v))
            rows.extend(self._version_rows(v, prev))
            m = _manifest(self.path, v)
            if _is_main(m):
                prev = set(m.get("commits", []))
        return rows, {"next_version": max(nxt, end_v)}


class VersionedTableDataSource(DataSource):
    """``spark.readStream.format("versioned_table").option("path", p)``
    — tail a versioned table's commit log as a stream (see module
    docstring for the per-version semantics). Batch reads should use
    :func:`data_spark.io.read_versioned` (engine-native scans); this
    source is registered for streaming."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        path = self.options["path"]
        vs = _versions(path)
        heads = [v for v in vs if _is_main(_manifest(path, v))]
        if not heads:
            raise FileNotFoundError(f"no main versions under {path}")
        m = _manifest(path, heads[-1])
        c0 = m["commits"][-1]
        spec = m.get("specs", {}).get(c0) or {}
        d = os.path.join(path, "data", c0)
        pfile = None
        for root, _dirs, files in os.walk(d):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    pfile = os.path.join(root, f)
                    break
            if pfile:
                break
        if pfile is None:
            raise FileNotFoundError(f"no parquet files under {d}")
        schema = pq.read_schema(pfile)
        parts = [
            f"{f.name} {_arrow_field_ddl(f)}"
            for f in schema
            if not f.name.startswith("_")
        ]
        parts += [f"{c} {dt}" for c, dt in spec.items()]
        return ", ".join(parts)

    def simpleStreamReader(self, schema: StructType) -> VersionedStreamReader:
        return VersionedStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(VersionedTableDataSource)
