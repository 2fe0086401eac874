"""Incremental aggregate maintenance: keep a per-key aggregate STATE
table (count / decimal sums / min / max) and fold batches of new rows
into it without rescanning history — the materialized-view-maintenance
shape (reference analogue: the warehouse re-aggregated masters on every
load; SURVEY §2.4 — here the same totals cost one pass over the delta).

Algebra: every maintained measure is a commutative monoid (count-add,
decimal-sum-add, min-least, max-greatest), so folding state ⊕ delta is
a union + one groupBy — no join, map-side combinable, and the law
``state(A) ⊕ state(B) == state(A ∪ B)`` holds exactly because sums
accumulate in DECIMAL (order-independent). Insert-only by design:
deletions would need retractable measures (count/sum retract fine;
min/max would need full recomputation of affected keys — documented,
not silently wrong).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Build the per-key state frame: (keys…, cnt, sum_<c>…, min_<c>…,
    max_<c>…). Sums are DECIMAL(38,6) so later merges are exact and
    order-independent."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("cnt")]
    for c in sum_cols:
        aggs.append(F.sum(F.col(c).cast("decimal(38,6)")).alias(f"sum_{c}"))
    for c in min_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
    for c in max_cols:
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_state(
    state: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold two state frames into one: union + a single groupBy re-fold
    of each monoid (cnt-add, sum-add, min/max). No join — the merge
    shuffles state rows (one per key per side), never fact rows, so a
    daily maintenance run at 100 TB moves KB per key regardless of
    history depth."""
    measures = [F.sum("cnt").cast("bigint").alias("cnt")]
    for c in sum_cols:
        measures.append(F.sum(f"sum_{c}").alias(f"sum_{c}"))
    for c in min_cols:
        measures.append(F.min(f"min_{c}").alias(f"min_{c}"))
    for c in max_cols:
        measures.append(F.max(f"max_{c}").alias(f"max_{c}"))
    return state.unionByName(other).groupBy(*keys).agg(*measures)


def maintain_aggregate(
    state: DataFrame,
    delta_rows: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Apply a batch of NEW rows to an existing state frame: aggregate
    the delta (one pass over the batch), then merge states."""
    delta_state = aggregate_state(delta_rows, keys, sum_cols, min_cols, max_cols)
    return merge_aggregate_state(
        state, delta_state, keys, sum_cols, min_cols, max_cols
    )
