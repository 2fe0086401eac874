"""Mergeable-sketch operators: HLL distinct-count rollups and KLL
quantile sketches (Apache DataSketches, exposed as Spark SQL aggregates).

The 100 TB pattern these exist for: build a SMALL sketch per partition
key (per day / per source), PERSIST the sketches, and answer
cross-partition questions by UNIONING sketches instead of re-scanning
facts — distinct-users-last-N-days becomes an N-row sketch merge.
Exact DISTINCT over a window of days re-shuffles the fact table every
time; the sketch rollup shuffles bytes.

Estimates are deterministic (DataSketches hashing is seed-fixed, and
HLL union is order-independent), but no SQL oracle can reproduce them
— DuckDB's approx_count_distinct uses a different HLL — so the gate
entries are rows-only and exactness-vs-tolerance lives in
tests/test_sketches.py, including the mergeability law (union of
per-day sketches == one global sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_distinct_rollup(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Per-day HLL sketches of ``key_col`` unioned into one running
    total per event_type: (event_type, n_days, est_distinct_total,
    est_distinct_max_day). Two aggs, both over sketch BYTES — the fact
    table is scanned once and never re-shuffled per question."""
    daily = (
        events.select(
            "event_type",
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(key_col).alias("k"),
        )
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("k", F.lit(lg_k)).alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
            F.max(F.hll_sketch_estimate("sk")).alias("est_max_day"),
        )
        .select(
            "event_type",
            "n_days",
            F.col("est_total").cast("bigint").alias("est_distinct_total"),
            F.col("est_max_day").cast("bigint").alias("est_distinct_max_day"),
        )
    )


def kll_value_quantiles(
    events: DataFrame,
    value_col: str = "value",
    k: int = 200,
) -> DataFrame:
    """Merged KLL quantile sketch of ``value_col`` per event_type:
    (event_type, est_p50, est_p90, n). The sketch is built with
    map-side partial aggregation, so the quantile estimate costs one
    narrow shuffle of sketch bytes — vs an exact percentile's full
    value shuffle. Rank error for k=200 is ~1.65%."""
    sk = F.kll_sketch_agg_double(value_col, F.lit(k))
    return (
        events.groupBy("event_type")
        .agg(
            F.count(value_col).cast("bigint").alias("n"),
            F.round(
                F.kll_sketch_get_quantile_double(sk, F.lit(0.5)), 6
            ).alias("est_p50"),
            F.round(
                F.kll_sketch_get_quantile_double(sk, F.lit(0.9)), 6
            ).alias("est_p90"),
        )
        .select("event_type", "n", "est_p50", "est_p90")
    )


# Portable Count-Min hash family: pure 64-bit (a·x + b) mod p mod w
# integer arithmetic every engine (and python) computes identically —
# the same idiom as the exact-MinHash constructions. Canonical
# constants for the streaming CMS state sink; the gate query
# a_cms_heavy_hitters carries its own copy inside its oracle spec.
CMS_P = 1_000_000_007
CMS_W = 64
CMS_AB = (
    (516575261, 423630757),
    (730421473, 842976263),
    (947217823, 298764511),
    (176064001, 785409629),
)


def cms_cells(key: F.Column) -> list[F.Column]:
    """The d cell indices of ``key`` (a BIGINT column), one per hash
    row."""
    return [
        ((F.lit(a) * key + F.lit(b)) % CMS_P) % CMS_W for a, b in CMS_AB
    ]
