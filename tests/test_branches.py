"""Versioned-store branches (Write-Audit-Publish) and partition-spec
evolution.

Branch model: Iceberg's refs-into-one-metadata-log — every commit on
any branch takes the next global version number through the same
put-if-absent manifest publish, and a manifest carries a ``branch``
field (absent = main). Publish is a fast-forward: a new MAIN manifest
with the branch head's contents. Reference parity: the reference's
loaders write straight into the serving store (upload/main.py's
load-then-validate), so a bad batch is visible until rollback; WAP
gives the same pipeline an audit window with atomic cutover instead.

Partition-spec evolution: ``write_versioned(partition_by=...)`` records
a PER-COMMIT spec in the manifest; reads plan each commit under its own
spec (basePath-scoped scans), so changing the partitioning never
rewrites history — the Iceberg spec-evolution contract.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_spark.io import (
    branch_head,
    compact_versioned,
    delete_versioned,
    list_branches,
    publish_branch,
    purge_deletes,
    read_versioned,
    table_versions,
    write_versioned,
)


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumnRenamed("id", "k")
        .withColumn("grp", (F.col("k") % 3).cast("string"))
        .withColumn("x", F.col("k") * 10)
    )


def test_branch_commits_isolated_from_main(spark, tmp_path):
    tp = str(tmp_path / "t")
    v0 = write_versioned(_df(spark, 0, 10), tp, mode="overwrite")
    vb = write_versioned(_df(spark, 10, 25), tp, mode="append", branch="audit")
    assert (v0, vb) == (0, 1)
    assert list_branches(tp) == {"main": 0, "audit": 1}
    # main never resolves the branch commit
    assert read_versioned(spark, tp).count() == 10
    # the branch forked from main's head: base rows + batch
    assert read_versioned(spark, tp, branch="audit").count() == 25
    # explicit-version time travel can still inspect the branch manifest
    assert read_versioned(spark, tp, version=vb).count() == 25


def test_publish_branch_fast_forwards_main_atomically(spark, tmp_path):
    tp = str(tmp_path / "t")
    v0 = write_versioned(_df(spark, 0, 10), tp, mode="overwrite")
    write_versioned(_df(spark, 10, 20), tp, mode="append", branch="stage")
    vp = publish_branch(tp, "stage", expect_main=v0)
    assert branch_head(tp, "main") == vp
    assert read_versioned(spark, tp).count() == 20
    # history intact: the pre-publish main version still reads 10 rows
    assert read_versioned(spark, tp, version=v0).count() == 10
    # publish moved no data: the branch commit dir is shared, not copied
    dirs = os.listdir(os.path.join(tp, "data"))
    assert len([d for d in dirs if d.startswith("commit-")]) == 2


def test_publish_branch_expect_main_guard_rejects_moved_main(spark, tmp_path):
    tp = str(tmp_path / "t")
    v0 = write_versioned(_df(spark, 0, 10), tp, mode="overwrite")
    write_versioned(_df(spark, 10, 20), tp, mode="append", branch="stage")
    # main moves while the audit runs
    write_versioned(_df(spark, 90, 95), tp, mode="append")
    with pytest.raises(ValueError, match="main moved"):
        publish_branch(tp, "stage", expect_main=v0)
    # nothing was published
    assert read_versioned(spark, tp).count() == 15


def test_audit_deletes_on_branch_then_publish(spark, tmp_path):
    """The full WAP lifecycle: write to branch, audit finds bad rows
    and tombstones them ON the branch, publish cuts main over to the
    cleaned state in one manifest swap."""
    tp = str(tmp_path / "t")
    v0 = write_versioned(_df(spark, 0, 10), tp, mode="overwrite")
    write_versioned(_df(spark, 10, 30), tp, mode="append", branch="wap")
    staged = read_versioned(spark, tp, branch="wap")
    bad = staged.filter(F.col("k") >= 25).select("k", "grp", "x")
    delete_versioned(bad, tp, branch="wap")
    # branch sees the delete, main sees neither batch nor delete
    assert read_versioned(spark, tp, branch="wap").count() == 25
    assert read_versioned(spark, tp).count() == 10
    publish_branch(tp, "wap", expect_main=v0)
    got = read_versioned(spark, tp)
    assert got.count() == 25
    assert got.agg(F.max("k")).collect()[0][0] == 24


def test_interleaved_branch_and_main_commits_keep_dense_log(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_df(spark, 0, 5), tp, mode="overwrite")
    write_versioned(_df(spark, 5, 10), tp, mode="append", branch="b")
    write_versioned(_df(spark, 10, 15), tp, mode="append")  # main append
    write_versioned(_df(spark, 15, 20), tp, mode="append", branch="b")
    assert table_versions(tp) == [0, 1, 2, 3]
    # main chain: v0 + the v2 append = 10 rows, untouched by the branch
    assert read_versioned(spark, tp).count() == 10
    # branch chain: forked at v0, plus both branch batches = 15 rows
    # (the main append at v2 happened AFTER the fork, so it is not
    # visible on the branch — snapshot-fork semantics)
    assert read_versioned(spark, tp, branch="b").count() == 15
    # maintenance ops resolve MAIN's head, not the global head
    cv = compact_versioned(spark, tp)
    assert read_versioned(spark, tp, version=cv).count() == 10


def test_partition_spec_evolution_reads_every_layout(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(
        _df(spark, 0, 20), tp, mode="overwrite", partition_by=["grp"], stats_cols=["x"]
    )
    # spec change without rewriting the first commit
    write_versioned(_df(spark, 20, 40), tp, mode="append", stats_cols=["x"])  # flat
    write_versioned(
        _df(spark, 40, 60), tp, mode="append", partition_by=["grp"], stats_cols=["x"]
    )
    full = read_versioned(spark, tp)
    assert full.count() == 60
    # the partition column survives as a real column in every commit
    assert full.filter(F.col("grp").isNull()).count() == 0
    assert set(full.columns) == {"k", "grp", "x"}
    # exact content, not just counts
    assert full.agg(F.sum("x")).collect()[0][0] == sum(10 * k for k in range(60))


def test_stats_pruning_skips_files_inside_partitioned_commits(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(
        _df(spark, 0, 30), tp, mode="overwrite", partition_by=["grp"], stats_cols=["x"]
    )
    write_versioned(
        _df(spark, 30, 60), tp, mode="append", partition_by=["grp"], stats_cols=["x"]
    )
    full = read_versioned(spark, tp)
    pruned = read_versioned(spark, tp, prune=("x", 100, 180))
    want = {100, 110, 120, 130, 140, 150, 160, 170, 180}
    assert {r["x"] for r in pruned.collect()} == want
    # fewer files opened, and stats keys carried the grp=.../ prefix
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    from data_spark.io import _load_manifest

    m = _load_manifest(tp, 1)
    some_commit = m["commits"][0]
    assert any("grp=" in rel for rel in m["stats"][some_commit])


def test_partition_filter_prunes_directories_on_spec_commits(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(
        _df(spark, 0, 30), tp, mode="overwrite", partition_by=["grp"]
    )
    df = read_versioned(spark, tp).filter(F.col("grp") == "1")
    assert df.count() == 10
    # Spark's own partition pruning applies to the hive layout: the
    # scan plans a PartitionFilter on grp (inputFiles() reports the
    # pre-pruning listing, so assert on the physical plan)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in physical and "grp" in physical.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]


def test_purge_rewrites_covered_spec_commits_and_keeps_uncovered(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(
        _df(spark, 0, 20), tp, mode="overwrite", partition_by=["grp"], stats_cols=["x"]
    )
    delete_versioned(
        spark.createDataFrame([(3,)], "k long")
        .withColumn("grp", F.lit("0"))
        .withColumn("x", F.lit(30)),
        tp,
    )
    write_versioned(
        _df(spark, 20, 40), tp, mode="append", partition_by=["grp"], stats_cols=["x"]
    )
    before = {r["k"] for r in read_versioned(spark, tp).collect()}
    assert before == set(range(40)) - {3}
    pv = purge_deletes(spark, tp)
    after = read_versioned(spark, tp, version=pv)
    assert {r["k"] for r in after.collect()} == before
    # the uncovered (post-delete) commit kept its spec; the covered one
    # was rewritten flat with the partition column materialized
    from data_spark.io import _load_manifest

    m = _load_manifest(tp, pv)
    assert not m.get("deletes")
    assert len(m.get("specs", {})) == 1
    assert after.filter(F.col("grp").isNull()).count() == 0


def test_branch_manifests_carry_specs_through_publish(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_df(spark, 0, 10), tp, mode="overwrite")
    write_versioned(
        _df(spark, 10, 20), tp, mode="append", branch="b", partition_by=["grp"]
    )
    vp = publish_branch(tp, "b")
    from data_spark.io import _load_manifest

    assert len(_load_manifest(tp, vp).get("specs", {})) == 1
    got = read_versioned(spark, tp)
    assert got.count() == 20
    assert got.filter(F.col("grp").isNull()).count() == 0


def test_vacuum_protects_unpublished_branch_heads(spark, tmp_path):
    """A retention sweep below an un-published branch head must not
    delete the branch mid-audit (keep_branch_heads, default on)."""
    from data_spark.io import vacuum_versions

    tp = str(tmp_path / "t")
    write_versioned(_df(spark, 0, 5), tp, mode="overwrite")        # v0 main
    write_versioned(_df(spark, 5, 10), tp, mode="append", branch="wap")  # v1 branch
    write_versioned(_df(spark, 10, 15), tp, mode="overwrite")      # v2 main
    write_versioned(_df(spark, 15, 20), tp, mode="overwrite")      # v3 main
    removed = vacuum_versions(tp, keep_from=3)
    # the branch head (v1) and its fork parent's commits survive
    assert branch_head(tp, "wap") == 1
    assert read_versioned(spark, tp, branch="wap").count() == 10
    assert read_versioned(spark, tp).count() == 5
    # v0's commit was still reachable from the protected v1, v2's not
    assert len(removed) == 1
    # with the protection off, the branch is declared disposable
    removed2 = vacuum_versions(tp, keep_from=3, keep_branch_heads=False)
    assert branch_head(tp, "wap") is None
    assert removed2  # the branch's (and fork parent's) commits reclaimed
    assert read_versioned(spark, tp).count() == 5


def test_timestamp_time_travel_resolves_committed_at(spark, tmp_path):
    import json
    import os

    from data_spark.io import version_at_timestamp

    tp = str(tmp_path / "t")
    write_versioned(_df(spark, 0, 5), tp, mode="overwrite")   # v0
    write_versioned(_df(spark, 5, 12), tp, mode="append")     # v1
    write_versioned(_df(spark, 12, 20), tp, mode="append")    # v2
    # pin distinct commit instants (the stamp is manifest metadata)
    vdir = os.path.join(tp, "_manifests")
    for v, ts in ((0, 1000.0), (1, 2000.0), (2, 3000.0)):
        p = os.path.join(vdir, f"v{v}.json")
        m = json.load(open(p))
        m["committed_at"] = ts
        with open(p + ".n", "w") as f:
            json.dump(m, f)
        os.replace(p + ".n", p)
    assert version_at_timestamp(tp, 999.9) is None
    assert version_at_timestamp(tp, 1000.0) == 0
    assert version_at_timestamp(tp, 2500.0) == 1
    assert version_at_timestamp(tp, 9e9) == 2
    assert read_versioned(spark, tp, as_of=2500.0).count() == 12
    assert read_versioned(spark, tp, as_of=1500.0).count() == 5
    with pytest.raises(ValueError, match="committed at or before"):
        read_versioned(spark, tp, as_of=10.0)


def test_as_of_respects_branch(spark, tmp_path):
    import json
    import os

    from data_spark.io import version_at_timestamp

    tp = str(tmp_path / "t")
    write_versioned(_df(spark, 0, 5), tp, mode="overwrite")              # v0 main
    write_versioned(_df(spark, 5, 10), tp, mode="append", branch="b")    # v1 branch
    write_versioned(_df(spark, 10, 15), tp, mode="append")               # v2 main
    vdir = os.path.join(tp, "_manifests")
    for v, ts in ((0, 1000.0), (1, 2000.0), (2, 3000.0)):
        p = os.path.join(vdir, f"v{v}.json")
        m = json.load(open(p))
        m["committed_at"] = ts
        with open(p + ".n", "w") as f:
            json.dump(m, f)
        os.replace(p + ".n", p)
    # at t=2500 main's newest eligible manifest is still v0
    assert version_at_timestamp(tp, 2500.0) == 0
    assert version_at_timestamp(tp, 2500.0, branch="b") == 1
    assert read_versioned(spark, tp, as_of=2500.0).count() == 5
    assert read_versioned(spark, tp, as_of=2500.0, branch="b").count() == 10


def test_concurrent_branch_and_main_commits_race(spark, tmp_path):
    """A branch append racing a main append: optimistic concurrency
    commits BOTH as distinct versions, each on its own chain — the
    loser's retry re-resolves ITS branch head, so neither chain
    absorbs the other's rows."""
    import threading

    tp = str(tmp_path / "t")
    write_versioned(_df(spark, 0, 10), tp, mode="overwrite")

    barrier = threading.Barrier(2)
    results, errors = {}, []

    def committer(tag, branch, lo, hi):
        try:
            df = _df(spark, lo, hi)
            barrier.wait()
            kw = {"branch": branch} if branch else {}
            results[tag] = write_versioned(df, tp, mode="append", **kw)
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [
        threading.Thread(target=committer, args=("main", None, 100, 110)),
        threading.Thread(target=committer, args=("wap", "wap", 200, 210)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    assert sorted(results.values()) == [1, 2]
    # chains stayed separate regardless of which writer won version 1
    main_ks = {r["k"] for r in read_versioned(spark, tp).collect()}
    wap_ks = {r["k"] for r in read_versioned(spark, tp, branch="wap").collect()}
    assert main_ks == set(range(10)) | set(range(100, 110))
    # the branch forked from MAIN'S HEAD AT ITS COMMIT TIME: v0 when the
    # branch won the race, v1 (including the main append) when it lost
    # and its retry re-resolved the fork point — either is a consistent
    # snapshot fork, and the main append is never duplicated or lost
    base = set(range(10)) | set(range(200, 210))
    if results["wap"] < results["main"]:
        assert wap_ks == base
    else:
        assert wap_ks == base | set(range(100, 110))


def test_concurrent_publishes_serialize(spark, tmp_path):
    """Two branches publishing concurrently: the put-if-absent log
    serializes them — both land as main versions, the later one is
    main's head, and no version number is skipped or doubled."""
    import threading

    tp = str(tmp_path / "t")
    write_versioned(_df(spark, 0, 10), tp, mode="overwrite")
    write_versioned(_df(spark, 10, 20), tp, mode="append", branch="b1")
    write_versioned(_df(spark, 20, 30), tp, mode="append", branch="b2")

    barrier = threading.Barrier(2)
    results, errors = {}, []

    def publisher(b):
        try:
            barrier.wait()
            results[b] = publish_branch(tp, b)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=publisher, args=(b,)) for b in ("b1", "b2")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    assert sorted(results.values()) == [3, 4]
    assert table_versions(tp) == [0, 1, 2, 3, 4]
    winner = max(results, key=results.get)
    expect = set(range(10)) | (
        set(range(10, 20)) if winner == "b1" else set(range(20, 30))
    )
    assert {r["k"] for r in read_versioned(spark, tp).collect()} == expect
