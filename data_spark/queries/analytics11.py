"""Round-12 tier: the STREAMING change feed driven end to end, and
filter-derived file pruning.

- ``pipe_stream_cdf_e2e``: the ``versioned_table`` source in
  ``read_changes=true`` mode (Delta's streaming ``readChangeFeed``)
  tailed THROUGH the engine — an upstream store built as overwrite →
  append → merge(change_feed=True) → delete(change_feed=True) streams
  its change rows (initial snapshot as ``insert``, merge split into
  ``update_preimage``/``update_postimage``, deletes as full
  pre-images), and a ``foreachBatch`` consumer folds them version by
  version into a DOWNSTREAM versioned table with ``merge_versioned`` —
  the replication contract the reference implements as an amendment
  delete-then-replace loop on its graph store
  (federal/fec/functions/federal_fec_compute_load_graph_expenditures/cypher.py:40-75).
  The oracle is a one-shot SQL reconstruction of the final state; the
  gate additionally asserts the downstream table equals the upstream
  head snapshot (CDC fold == source-of-truth).

Scale posture: change rows are served from commit-time ``changes/``
files planned one InputPartition per file and read on executors —
no reconstruction joins per consumer, no driver-side rows; the fold's
merge cost is O(changed rows) per version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
# pipe_stream_cdf_e2e — streaming CDF folded into a downstream table
# ---------------------------------------------------------------------------

# upstream versions (keys are o_orderkey, dense at every SF):
#   v0 overwrite: k%3=0 (original price)
#   v1 append:    k%3=1
#   v2 merge(change_feed): source k%5=0 at doubled price, delete k%11=0
#   v3 delete(change_feed): tombstone k%7=0
# final state (what the folded downstream must hold):
#   originals  k%3 in (0,1), k%5<>0, k%7<>0          → price p
#   upserts    k%5=0, k%11<>0, k%7<>0                → price 2p
# (matched deletes k%5=0,k%11=0 and the v3 tombstones are gone;
#  unmatched delete-flagged source rows never existed). Doubling is
# exact in binary floating point. [200, 1200] is non-degenerate at
# every SF (sf0.001 orders tops out at 1499).
_SCF_LO, _SCF_HI = 200, 1_200

_SCF_SQL = f"""
WITH o AS (
    SELECT o_orderkey AS k, o_orderstatus AS status,
           CAST(o_totalprice AS DOUBLE) AS p
    FROM orders
    WHERE o_orderkey BETWEEN {_SCF_LO} AND {_SCF_HI}
), fin AS (
    SELECT k, status, p FROM o
    WHERE k % 3 IN (0, 1) AND k % 5 <> 0 AND k % 7 <> 0
    UNION ALL
    SELECT k, status, p * 2 FROM o
    WHERE k % 5 = 0 AND k % 11 <> 0 AND k % 7 <> 0
)
SELECT k AS o_orderkey, status AS o_orderstatus, p AS price FROM fin
"""


@_q("pipe_stream_cdf_e2e", _SCF_SQL)
def pipe_stream_cdf_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming change feed END TO END: tail an upstream versioned
    table with ``versioned_table`` + ``read_changes=true``, fold the
    change rows in ``foreachBatch`` into a downstream versioned table
    (per commit version, in order: ``insert``/``update_postimage``
    upsert, ``delete`` tombstones — ``update_preimage`` rows are the
    audit trail and fold to nothing), and return the downstream rows.

    In-gate asserts: both tombstoning commits stored commit-time
    ``changes/`` files (the contract that makes the feed
    partition-readable on executors — a streaming consumer never pays
    reconstruction joins); all four change types were observed on the
    wire; and the folded downstream equals the upstream head snapshot
    row-for-row — the CDC replication invariant. Oracle: one-shot SQL
    reconstruction of the final state."""
    import os  # noqa: PLC0415

    from data_spark.io import (  # noqa: PLC0415
        _load_manifest,
        delete_versioned,
        merge_versioned,
        read_versioned,
        write_versioned,
    )
    from data_spark.sources.versioned_datasource import register  # noqa: PLC0415

    work = run_scratch_dir("scdf", sf_dir)
    up = os.path.join(work, "up")
    down = os.path.join(work, "down")
    ckpt = os.path.join(work, "ckpt")

    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").between(_SCF_LO, _SCF_HI))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    k = F.col("o_orderkey")

    v0 = write_versioned(
        o.filter(k % 3 == 0), up, mode="overwrite", stats_cols=["o_orderkey"]
    )
    write_versioned(
        o.filter(k % 3 == 1), up, mode="append", stats_cols=["o_orderkey"]
    )
    source = (
        o.filter(k % 5 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("is_del", k % 11 == 0)
    )
    v2 = merge_versioned(
        source, up, keys=["o_orderkey"], delete_col="is_del",
        stats_cols=["o_orderkey"], change_feed=True,
    )
    v3 = delete_versioned(
        o.filter(k % 7 == 0).select("o_orderkey"), up, change_feed=True
    )
    for v in (v2, v3):
        if "changes" not in _load_manifest(up, v):
            raise AssertionError(f"version {v} stored no change files")

    # downstream starts EMPTY — the stream's initial snapshot arrives
    # as insert change rows, so the fold builds the table from nothing
    write_versioned(o.limit(0), down, mode="overwrite")
    seen_types: set[str] = set()

    def fold(batch_df: DataFrame, _batch_id: int) -> None:
        # one availableNow batch may carry several versions; apply them
        # in commit order so a key's upsert/delete sequence replays
        # faithfully (the per-version frames are tiny: changed rows)
        versions = sorted(
            r["_commit_version"]
            for r in batch_df.select("_commit_version").distinct().collect()
        )
        for v in versions:
            b = batch_df.filter(F.col("_commit_version") == v)
            ups = b.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            ).withColumn("is_del", F.lit(False))
            dels = b.filter(F.col("_change_type") == "delete").withColumn(
                "is_del", F.lit(True)
            )
            src = ups.unionByName(dels).drop("_change_type", "_commit_version")
            seen_types.update(
                r["_change_type"]
                for r in b.select("_change_type").distinct().collect()
            )
            merge_versioned(src, down, keys=["o_orderkey"], delete_col="is_del")

    register(spark)
    q = (
        spark.readStream.format("versioned_table")
        .option("path", up)
        .option("read_changes", "true")
        .option("starting_version", str(v0))
        .load()
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("pipe_stream_cdf_e2e: stream did not drain in 300s")

    missing = {"insert", "update_preimage", "update_postimage", "delete"} - seen_types
    if missing:
        raise AssertionError(f"change types never streamed: {sorted(missing)}")

    got = read_versioned(spark, down)
    # CDC replication invariant: the fold reproduced the upstream head
    want = read_versioned(spark, up)
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    if (
        got.count() != want.count()
        or got.join(want, cols, "left_anti").count() != 0
    ):
        raise AssertionError("folded downstream != upstream head snapshot")
    return got.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )
