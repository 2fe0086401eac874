"""Lineage truncation and partition sizing for the iterative tier.

Iterative operators (PageRank, connected components, BFS, fuzzy-dedup
label propagation) re-plan their frame every round; without truncation
the logical plan doubles per iteration and planning cost dwarfs
execution. Truncation has two grades:

- ``localCheckpoint`` (default): blocks live on executors. Fast — no
  distributed filesystem round-trip — but on a real cluster losing one
  executor mid-iteration kills the job, because the truncated lineage
  cannot be recomputed.
- reliable ``checkpoint`` (opt-in): blocks go to the SparkContext's
  checkpoint directory (HDFS/S3 on a cluster). Survives executor loss;
  costs one write+read of the frame per truncation.

The opt-in is the standard Spark switch: call
``spark.sparkContext.setCheckpointDir(path)`` on the session and every
``truncate_lineage`` call in the engine upgrades itself to the reliable
path. No per-operator flags — a 1000-executor job sets the dir once.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

# Target rows per partition for skinny iterative frames (two or three
# id/int columns — tens of bytes per row, so 1M rows ≈ 32-64 MB blocks).
ROWS_PER_EDGE_PARTITION = 1_000_000


def truncate_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint()`` when the session
    has a checkpoint dir configured, else ``localCheckpoint()``.

    Lazy by default (``eager=False``): the plan is cut immediately — the
    returned frame scans the marked RDD, so per-iteration plan growth and
    Catalyst barriers behave exactly as with an eager checkpoint — but the
    blocks materialize during the NEXT action instead of a dedicated job.
    In convergence loops that action is the fingerprint aggregate the loop
    runs anyway, and in one-shot barriers it is the query's own sink, so
    the dedicated materialization job is pure overhead (measured 5-19%
    of wall on the iterative graph tier at sf0.1, interleaved A/B).

    Pass ``eager=True`` only where the checkpoint must be POPULATED while
    an upstream ``.cache()`` is still alive — the materialize-before-
    unpersist sites (pagerank/HITS finals, k-means/PQ codebook loops).
    There a lazy mark would defer materialization past the ``unpersist()``,
    and every marked layer would recompute the base from source."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def sized_partitions(
    df: DataFrame,
    estimated_rows: int,
    floor: int = 8,
    rows_per_partition: int = ROWS_PER_EDGE_PARTITION,
) -> int:
    """Partition count for an iterative working set of ``estimated_rows``
    skinny rows: scale with the data, floor at ``floor`` (per-level
    frames are skinny — hundreds of near-empty tasks per iteration cost
    more in scheduling than they buy in parallelism), and never exceed
    the session's ``spark.sql.shuffle.partitions`` so cluster sizing is
    respected.

    The estimate can be loose (e.g. a parquet-metadata row count of the
    fact table that generates the edges): it only picks a bucket on a
    log-ish scale, and AQE coalescing cleans up the remainder.
    """
    conf_default = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    by_size = max(floor, math.ceil(estimated_rows / rows_per_partition))
    return min(conf_default, by_size)


def iteration_scope(spark):
    """Context manager: disable AQE for a fixed-iteration driver loop,
    restoring the previous setting on exit.

    Rationale (measured at sf0.1, 32-thread local): the iterative tier
    executes per-iteration actions (eager lineage truncation,
    convergence fingerprints) over SKINNY pre-partitioned frames whose
    join keys never change — there is nothing for AQE's runtime
    re-planning to discover, but each tiny stage still pays the
    re-optimization round trip, ~10-25% of g_components/g_hits wall
    time. The FINAL returned frame executes after the scope exits, so
    the caller's AQE setting governs the full-size plan.

    When NOT to use: loops whose per-iteration frames are fact-scale or
    skew-prone (AQE's skew-join splitting and coalescing win there) —
    i.e. use it where the loop already pre-partitions its working set.

    Concurrency caveat (VERDICT r12): this mutates SESSION conf (and
    restores it in ``finally``), so two gates sharing one SparkSession
    must not run concurrently inside/around a scope — the engine's own
    driver threads (io._run_concurrently, incremental tail jobs) only
    ever run plain actions under an already-entered scope, which is
    safe; what is not safe is entering/exiting scopes from two threads.
    """
    from contextlib import contextmanager

    @contextmanager
    def _scope():
        prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)

    return _scope()
