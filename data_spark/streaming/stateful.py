"""Custom stateful streaming operators (SURVEY §2.9 "session/queue
state" → applyInPandasWithState).

``streaming_dedup`` keeps a per-key seen-marker in the state store and
emits only first occurrences across micro-batches — the streaming form
of the reference's `es.exists` pre-checks / deterministic-_id upserts
(exactly-once-ish idempotence).

TTL caveat: ``ttl_ms`` uses ProcessingTimeTimeout, which keeps an
``availableNow`` query alive indefinitely (Spark schedules empty
batches to advance the timeout clock — observed, not documented). Use
TTL only with long-running ``processingTime`` triggers; batch-style
drains should keep the default NoTimeout and bound state by periodic
checkpoint compaction instead.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def streaming_running_totals(
    stream: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches via Spark 4's
    ``transformWithStateInPandas`` — the successor stateful API
    (typed value state in the state store, RocksDB-backed on a
    cluster). Emits one updated (key, n, total) row per key per batch
    it appears in; state is two numbers per key regardless of traffic.

    The batch-mode oracle for this operator is a plain groupBy
    count/sum over everything ingested so far — asserted in
    tests/test_streaming.py across multiple availableNow drains.

    Environment note: the transformWithState protocol speaks protobuf
    to the state server; containers without ``google.protobuf`` cannot
    run it (the test skips there). ``streaming_dedup``'s
    applyInPandasWithState path has no such dependency and covers the
    same stateful-operator surface.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            prev = self._totals.get()
            n, total = (prev[0], prev[1]) if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=f"{key_col} string, n bigint, total double",
        outputMode="Update",
        timeMode="None",
    )


def streaming_dedup(
    stream: DataFrame,
    key_col: str,
    output_schema: str | StructType,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit the first row seen per key across micro-batches; later
    duplicates are dropped. State per key is one boolean — fixed-size
    regardless of row width. Optional ``ttl_ms`` expires keys after
    processing-time inactivity (see module TTL caveat)."""

    def dedup(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if not already:
            first = None
            for pdf in batches:
                if len(pdf) and first is None:
                    first = pdf.iloc[[0]]
            if first is not None:
                state.update((True,))
                if ttl_ms is not None:
                    state.setTimeoutDuration(ttl_ms)
                yield first
        else:
            for _ in batches:
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
