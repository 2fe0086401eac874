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
