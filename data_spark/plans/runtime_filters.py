"""Runtime bloom-filter join pruning (SURVEY §4 "push down and prune"
at the join level).

For a shuffle join with a selective build side, Catalyst can inject a
``bloom_filter_agg`` over the build keys and a ``might_contain`` probe
filter on the scan side BEFORE the shuffle — rows that cannot match
never leave the mappers. At 100 TB this is the difference between
shuffling the full fact table and shuffling only the ~matching slice;
it composes with AQE and costs one tiny aggregate on the dim side.

The feature is off by default; ``enable_runtime_bloom_filters``
configures the session thresholds so any selective-dim ⋈ fact pattern
in this engine benefits. Plan audit: tests/test_plans.py asserts the
filter is actually injected for a representative join (it silently
degrades to a plain join when thresholds say no, so the audit is the
only way to know it is live).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # build side may be up to this plan-size estimate
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # always consider the probe side, regardless of scan size estimate
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def enable_runtime_bloom_filters(spark: SparkSession) -> dict[str, str | None]:
    """Turn on runtime bloom-filter injection; returns the previous
    values so callers (tests) can restore them."""
    prev: dict[str, str | None] = {}
    for k, v in _CONF.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def restore_conf(spark: SparkSession, prev: dict[str, str | None]) -> None:
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
