"""Sketch-operator tests: accuracy vs exact answers, and the
mergeability law that justifies the per-day-sketch rollup pattern."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_spark.operators.sketches import daily_distinct_rollup, kll_value_quantiles


@pytest.fixture(scope="module")
def events(spark, sf_small):
    from data_spark.io import read_table

    return read_table(spark, sf_small, "events")


def test_hll_rollup_close_to_exact(events):
    est = {
        r.event_type: r.est_distinct_total
        for r in daily_distinct_rollup(events).collect()
    }
    exact = {
        r.event_type: r.cnt
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("cnt"))
        .collect()
    }
    assert set(est) == set(exact)
    for et, e in exact.items():
        assert abs(est[et] - e) / e < 0.05, (et, est[et], e)


def test_hll_union_of_days_equals_global_sketch(events):
    """Mergeability: union of per-day sketches estimates EXACTLY like
    one sketch built over all days (same lgK, same hashing)."""
    rolled = {
        r.event_type: r.est_distinct_total
        for r in daily_distinct_rollup(events, lg_k=12).collect()
    }
    direct = {
        r.event_type: int(r.est)
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).cast("bigint").alias("est")
        )
        .collect()
    }
    assert rolled == direct


def test_hll_rollup_day_bound(events):
    for r in daily_distinct_rollup(events).collect():
        assert r.est_distinct_max_day <= r.est_distinct_total * 1.05
        assert r.n_days >= 1


def test_kll_quantiles_close_to_exact(events):
    est = {r.event_type: (r.est_p50, r.est_p90) for r in kll_value_quantiles(events).collect()}
    exact = {
        r.event_type: (r.p50, r.p90)
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    for et in exact:
        # KLL bounds RANK error (~1.65% at k=200), not value error: the
        # estimate must land inside a generous exact-rank window
        est50, est90 = est[et]
        q = events.filter(F.col("event_type") == et).agg(
            F.expr("percentile(value, 0.45)").alias("lo50"),
            F.expr("percentile(value, 0.55)").alias("hi50"),
            F.expr("percentile(value, 0.85)").alias("lo90"),
            F.expr("percentile(value, 0.95)").alias("hi90"),
        ).collect()[0]
        assert q.lo50 <= est50 <= q.hi50, (et, est50, q.lo50, q.hi50)
        assert q.lo90 <= est90 <= q.hi90, (et, est90, q.lo90, q.hi90)
