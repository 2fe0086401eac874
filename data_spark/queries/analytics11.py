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

from data_spark.queries.common import run_scratch_dir, t, table_rows
from data_spark.streaming.jobs import stream_state_scope

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
        # faithfully (the per-version frames are tiny: changed rows).
        # ONE distinct-pairs collect serves both the version schedule
        # and the change-type audit — the per-version
        # distinct-per-column collects this replaces were 1 + V driver
        # round trips per batch (guide §1.2: fewer passes first)
        # pin the micro-batch once: every consumer below (the pairs
        # collect plus two merge_versioned passes per version) would
        # otherwise re-run the Python-datasource partition read — a
        # JVM<->Python boundary crossing per action (guide §4). Lazy
        # mark (r13): the pairs collect right below is the pin's
        # materializing action, so the former dedicated checkpoint job
        # folds into it (guide §1.2)
        batch_df = batch_df.localCheckpoint(eager=False)
        pairs = (
            batch_df.select("_commit_version", "_change_type")
            .distinct()
            .collect()
        )
        seen_types.update(r["_change_type"] for r in pairs)
        for v in sorted({r["_commit_version"] for r in pairs}):
            b = batch_df.filter(F.col("_commit_version") == v)
            ups = b.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            ).withColumn("is_del", F.lit(False))
            dels = b.filter(F.col("_change_type") == "delete").withColumn(
                "is_del", F.lit(True)
            )
            src = ups.unionByName(dels).drop("_change_type", "_commit_version")
            merge_versioned(src, down, keys=["o_orderkey"], delete_col="is_del")

    register(spark)
    # shuffle partitions for the foreachBatch merges sized to the staged
    # stream volume (footer count), not the session constant
    with stream_state_scope(spark, table_rows(spark, sf_dir, "orders")):
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
    # CDC replication invariant: the fold reproduced the upstream head.
    # One signed-multiset pass (strictly stronger than the former
    # count-compare + one-sided anti-join, and 1 job instead of 3):
    # every (row, +1/-1) group must cancel exactly
    want = read_versioned(spark, up)
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    mismatch = (
        got.select(*cols)
        .withColumn("__side", F.lit(1))
        .unionByName(want.select(*cols).withColumn("__side", F.lit(-1)))
        .groupBy(*cols)
        .agg(F.sum("__side").alias("__d"))
        .filter(F.col("__d") != 0)
        .count()
    )
    if mismatch != 0:
        raise AssertionError("folded downstream != upstream head snapshot")
    return got.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )


# ---------------------------------------------------------------------------
# m_cdf_bloom_scatter — membership-pruned pre-image recovery where
# min/max bounds provably cannot prune
# ---------------------------------------------------------------------------

# the table is written ROUND-ROBIN (repartition(8) per commit), so every
# file's [min, max] envelope on o_orderkey spans ~the whole domain and
# bounds pruning keeps every file — the shape a merge/CDC workload
# reaches after enough scattered writes. The tombstoned/merged keys are
# a SMALL fixed stride across the domain (the regime membership pruning
# exists for); per-commit key blooms must bound the pre-image reads to
# the files actually containing them, asserted in-gate.
#   v0 overwrite: k%2=0   v1 append: k%2=1        (k <= 4800)
#   v2 delete:  keys 7+480j   (all odd -> all in v1's files)
#   v3 merge:   keys 11+480j matched at doubled price, plus two fresh
#               literal inserts beyond the domain
# feed from v1: delete pre-images (seq 1), merge pre/postimages and the
# unmatched inserts (seq 2). Keys are dense at every SF, so stride keys
# above the SF's max key simply do not exist — in BOTH engines.
_BLOOM_DEL = [7 + 480 * j for j in range(10)]
_BLOOM_MRG = [11 + 480 * j for j in range(10)]

_BLOOM_SQL = f"""
WITH o AS (
    SELECT o_orderkey AS k, o_orderstatus AS status,
           CAST(o_totalprice AS DOUBLE) AS p
    FROM orders WHERE o_orderkey <= 4800
), ch AS (
    SELECT k, status, p, 1 AS change_seq, 'delete' AS change_type
    FROM o WHERE k IN ({", ".join(map(str, _BLOOM_DEL))})
    UNION ALL
    SELECT k, status, p, 2, 'update_preimage'
    FROM o WHERE k IN ({", ".join(map(str, _BLOOM_MRG))})
    UNION ALL
    SELECT k, status, p * 2, 2, 'update_postimage'
    FROM o WHERE k IN ({", ".join(map(str, _BLOOM_MRG))})
    UNION ALL
    SELECT 6000001, 'XX', 1.5, 2, 'insert'
    UNION ALL
    SELECT 6000002, 'XX', 2.5, 2, 'insert'
)
SELECT k AS o_orderkey, status AS o_orderstatus, p AS price,
       CAST(change_seq AS BIGINT) AS change_seq, change_type
FROM ch
"""


@_q("m_cdf_bloom_scatter", _BLOOM_SQL)
def m_cdf_bloom_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF pre-image recovery through per-commit KEY BLOOMS on a table
    whose file layout defeats min/max pruning entirely: every commit is
    written round-robin, so each file's key envelope spans the whole
    domain and the recorded tombstone bounds overlap every file. The
    r11 design accepted a full prior-snapshot scan per version in this
    regime; with ``write_versioned(bloom_cols=...)`` the recovery scan
    must open only the files whose bloom admits a tombstoned key.

    In-gate asserts: (1) the bloom convention covers every commit
    (inheritance across append/merge), (2) bounds pruning provably
    keeps ALL files (every file's stats envelope overlaps the recorded
    tombstone bounds — the scatter premise, not an assumption), (3) the
    bloom keep-map opens at most 10 of the >=16 files. Correctness is
    the oracle: the feed's rows must hash-match a SQL reconstruction,
    and the keep-map can only ever change files OPENED (the key
    semi-join is the row residual)."""
    from data_spark.io import (  # noqa: PLC0415
        _bloom_keep_files,
        _load_manifest,
        branch_head,
        delete_versioned,
        merge_versioned,
        read_changes,
        write_versioned,
    )

    base_dir = run_scratch_dir("cdfbloom", sf_dir)
    o = (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") <= 4800)
    )
    k = F.col("o_orderkey")
    write_versioned(
        o.filter(k % 2 == 0).repartition(8),
        base_dir,
        mode="overwrite",
        stats_cols=["o_orderkey"],
        bloom_cols=["o_orderkey"],
    )
    v1 = write_versioned(
        o.filter(k % 2 == 1).repartition(8),
        base_dir,
        mode="append",
        stats_cols=["o_orderkey"],
    )
    tomb = spark.createDataFrame([(x,) for x in _BLOOM_DEL], "o_orderkey bigint")
    v2 = delete_versioned(tomb, base_dir)
    src = o.filter(k.isin(_BLOOM_MRG)).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    fresh = spark.createDataFrame(
        [(6000001, "XX", 1.5), (6000002, "XX", 2.5)],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
    merge_versioned(
        src.unionByName(fresh),
        base_dir,
        keys=["o_orderkey"],
        stats_cols=["o_orderkey"],
    )

    head = _load_manifest(base_dir, branch_head(base_dir, "main"))
    if sorted(head["bloom"]["dirs"]) != sorted(head["commits"]):
        raise AssertionError(
            f"bloom coverage gap: {head['bloom']['dirs']} vs {head['commits']}"
        )
    # the scatter premise, proven from manifest metadata: the delete's
    # recorded bounds overlap EVERY file's stats envelope, so bounds
    # pruning keeps all of them
    pre_m = _load_manifest(base_dir, v1)
    blo, bhi, nnull = _load_manifest(base_dir, v2)["deletes"][-1]["bounds"][
        "o_orderkey"
    ]
    n_files = 0
    for c in pre_m["commits"]:
        for rel, bounds in pre_m["stats"][c].items():
            mn, mx = bounds["o_orderkey"]
            n_files += 1
            if mx < blo or mn > bhi:
                raise AssertionError(
                    f"file {rel} [{mn},{mx}] escapes bounds [{blo},{bhi}] — "
                    "the layout is not scattered; the gate premise broke"
                )
    keep = _bloom_keep_files(spark, base_dir, pre_m, tomb)
    if keep is None:
        raise AssertionError("bloom probe refused to run")
    kept = sum(len(s) for s in keep.values())
    if not (1 <= kept <= 10) or n_files < 16 or kept >= n_files:
        raise AssertionError(
            f"bloom keep-map opened {kept} of {n_files} files — "
            "membership pruning did not bite"
        )

    ch = read_changes(spark, base_dir, from_version=v1)
    return ch.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
        (F.col("_commit_version") - F.lit(v1)).cast("bigint").alias("change_seq"),
        F.col("_change_type").alias("change_type"),
    )
