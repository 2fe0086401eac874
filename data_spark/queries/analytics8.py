"""Round-9 tier: Write-Audit-Publish branch workflow, partition-spec
evolution, paired-classifier testing, two-stage binary-quantized
retrieval, bounded spatial kNN join, and a streaming event-time join
gate (registered here; the join itself lives in streaming/jobs.py).

- ``m_wap_publish``: the full WAP lifecycle on the versioned store —
  write a batch to a branch, audit it there (tombstone the failing
  rows ON the branch), then atomically fast-forward main. Readers of
  main never see un-audited rows; the gate hashes the post-publish
  state against the oracle's equivalent predicate and ASSERTS main's
  mid-flight isolation in-query. Reference parity: the reference loads
  straight into the serving index and validates afterwards
  (upload/main.py load→validate→rollback); WAP closes that visibility
  gap.
- ``m_partition_evolution``: per-commit partition specs — one commit
  hive-partitioned on event_type, the next on a different spec —
  scanned together with manifest-stats pruning + Spark partition
  pruning, no history rewrite (Iceberg spec evolution).
- ``a_mcnemar_test``: McNemar's paired test comparing two deterministic
  document-quality classifiers against a reference label on the SAME
  documents — the right test when classifiers share their evaluation
  set (the off-diagonal disagreement cells are the only information).
  Statistic emitted as exact integers: b, c, and the (b-c)^2 numerator
  over the b+c denominator — no transcendental in either engine.
- ``v_bq_rerank``: two-stage retrieval — sign-bit binary quantization
  (64-bit Hamming codes from the leading embedding components) builds
  a cheap shortlist, exact e6-integer cosine rescoring reranks it.
  The modern memory-bound ANN recipe (BQ shortlist + rerank): the
  shortlist pass touches 8 bytes/vector instead of 4·d, the exact pass
  touches only shortlist·d.
- ``s_knn_grid_join``: bounded k-nearest-neighbor spatial join — for
  each query point the k nearest neighbors within radius r, exact via
  3x3 grid-cell candidate join (cell = r, so every point within r is
  in a neighboring cell) + per-query top-k window. The kNN variant of
  s_spatial_grid_join's radius join.

Scale posture: the WAP/evolution gates do O(batch) store work and
aggregate to tiny frames; McNemar is one scan to four counters;
v_bq_rerank is a broadcast-probe shortlist (integer XOR+popcount) then
a shortlist-sized exact join; the kNN join shuffles once on cell keys
and windows once per query point (candidates bounded by 9 cells).

Reference parity: the reference has no lakehouse/branching tier (its
store is a serving index refreshed in place) and no vector shortlist
path; these re-express the same pipeline intents Spark-first, cited
per-query below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.queries.common import run_scratch_dir, t

QUERIES = {}
ORACLE = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# m_wap_publish — write-audit-publish branch workflow
# ---------------------------------------------------------------------------

# final main state = base (custkey%3=0) plus the audited batch
# (custkey%3=1 minus the rows the audit tombstoned: orderkey%5=0)
_WAP_SQL = """
SELECT
    o_orderstatus,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
WHERE (o_custkey % 3 = 0)
   OR (o_custkey % 3 = 1 AND o_orderkey % 5 <> 0)
GROUP BY o_orderstatus
"""


@_q("m_wap_publish", _WAP_SQL)
def m_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish on the versioned store: the batch lands on a
    branch, the audit tombstones its failing rows on the branch, and
    ``publish_branch`` fast-forwards main in one manifest put-if-absent.
    Main's isolation during the audit window is asserted in-query (a
    reader mid-audit must see exactly the pre-batch rows); the final
    hash pins that publish delivered precisely base + audited batch.
    Reference: upload/main.py loads into the live index then validates
    (visible-bad-rows window); the branch gives the same load an
    isolated audit with atomic cutover."""
    from data_spark.io import (  # noqa: PLC0415
        delete_versioned,
        publish_branch,
        read_versioned,
        write_versioned,
    )

    base_dir = run_scratch_dir("wap", sf_dir)
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base = o.filter(F.col("o_custkey") % 3 == 0)
    batch = o.filter(F.col("o_custkey") % 3 == 1)

    v0 = write_versioned(base, base_dir, mode="overwrite")
    write_versioned(batch, base_dir, mode="append", branch="wap")

    # audit ON the branch: the failing rows never become visible on main
    staged = read_versioned(spark, base_dir, branch="wap")
    failing = staged.filter(
        (F.col("o_custkey") % 3 == 1) & (F.col("o_orderkey") % 5 == 0)
    ).select("o_orderkey")
    delete_versioned(failing, base_dir, branch="wap")

    # isolation assert: a main reader mid-audit sees only the base rows
    mid = read_versioned(spark, base_dir).count()
    expected = base.count()
    if mid != expected:
        raise AssertionError(
            f"WAP isolation broken: main saw {mid} rows mid-audit, expected {expected}"
        )

    publish_branch(base_dir, "wap", expect_main=v0)

    return (
        read_versioned(spark, base_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# m_partition_evolution — per-commit partition specs, one scan
# ---------------------------------------------------------------------------

_EVOLVE_SQL = """
SELECT
    event_type,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
WHERE event_id BETWEEN 100 AND 6000 AND value IS NOT NULL
GROUP BY event_type
"""


@_q("m_partition_evolution", _EVOLVE_SQL)
def m_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution: commit 0 is hive-partitioned on
    event_type, commit 1 on a different spec (a derived bucket), and
    the table reads as one — each commit planned under its own spec
    with manifest stats pruning the event_id probe at the file level
    (the prune range is residual-filtered, so it can narrow files,
    never answers). No rewrite happened to change the spec: that is
    the Iceberg spec-evolution contract, and the only sane way to
    re-partition a 100 TB table. Layout-pruning subsets are pinned in
    tests/test_branches.py; this gate pins answer invariance."""
    from data_spark.io import read_versioned, write_versioned  # noqa: PLC0415

    base_dir = run_scratch_dir("pevolve", sf_dir)
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            "value",
            F.pmod(F.col("event_id"), F.lit(7)).cast("int").alias("vb"),
        )
    )
    write_versioned(
        e.filter(F.col("event_id") % 2 == 0),
        base_dir,
        mode="overwrite",
        partition_by=["event_type"],
        stats_cols=["event_id"],
    )
    write_versioned(
        e.filter(F.col("event_id") % 2 == 1),
        base_dir,
        mode="append",
        partition_by=["vb"],
        stats_cols=["event_id"],
    )
    got = read_versioned(spark, base_dir, prune=("event_id", 100, 6000))
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
    )
