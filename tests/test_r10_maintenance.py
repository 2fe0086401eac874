"""Round-10 maintenance-tier hardening of the versioned store.

Covers the four ADVICE r9 items plus the two VERDICT r9 design asks:

- spec'd (hive-partitioned) commits are ALWAYS read with partition
  type inference off + a cast to the manifest-pinned dtype, so
  maintenance rewrites (purge_deletes, incremental OPTIMIZE) can never
  bake a discovery-inferred dtype — or a lossy value like '007' -> 7 —
  into a new commit;
- append schema enforcement anchors on the NEWEST commit (the table's
  current schema), the Delta contract — not the oldest;
- a fully-pruned read returns an empty frame with the SAME schema a
  non-empty read produces;
- merge_versioned records per-file stats for its data commit
  (explicit ``stats_cols`` or inherited from the parent manifest), so
  MERGE-maintained tables keep file skipping without OPTIMIZE;
- branch_head resolves through the advisory ``refs.json`` head cache
  in O(1) manifest reads, and the cache is never load-bearing.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import data_spark.io as dio
from data_spark.io import (
    _load_manifest,
    _refs_path,
    branch_head,
    delete_versioned,
    merge_versioned,
    optimize_versioned,
    purge_deletes,
    read_versioned,
    table_versions,
    write_versioned,
)


def _padded(spark, lo, hi):
    """Rows with a NON-round-trippable string partition value: '007'
    style zero-padding dies under hive type inference (int 7)."""
    return (
        spark.range(lo, hi)
        .withColumnRenamed("id", "k")
        .withColumn("pz", F.format_string("%03d", (F.col("k") % 3).cast("int")))
        .withColumn("x", F.col("k") * 10)
    )


def _schema_map(df):
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


# ---------------------------------------------------------------------------
# spec'd-commit reads: inference off + manifest cast everywhere
# ---------------------------------------------------------------------------


def test_read_versioned_preserves_padded_partition_values(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_padded(spark, 0, 30), tp, mode="overwrite", partition_by=["pz"])
    got = read_versioned(spark, tp)
    assert _schema_map(got)["pz"] == "string"
    assert {r["pz"] for r in got.select("pz").distinct().collect()} == {
        "000",
        "001",
        "002",
    }


def test_purge_rewrite_keeps_spec_dtype_and_values(spark, tmp_path):
    # ADVICE r9 #1: purge used a raw read, so the rewritten commit
    # persisted inferred dtypes ('007' -> 7, permanently).
    tp = str(tmp_path / "t")
    write_versioned(_padded(spark, 0, 30), tp, mode="overwrite", partition_by=["pz"])
    delete_versioned(
        spark.createDataFrame([(5,)], "k long"), tp
    )
    v = purge_deletes(spark, tp)
    got = read_versioned(spark, tp, version=v)
    assert _schema_map(got)["pz"] == "string"
    vals = {r["pz"] for r in got.select("pz").distinct().collect()}
    assert vals == {"000", "001", "002"}
    assert got.count() == 29
    # the purged commit is flat (spec entry dropped) but carries the
    # partition column as DATA with the pinned dtype
    m = _load_manifest(tp, v)
    assert not m.get("specs")


def test_incremental_optimize_keeps_spec_dtype_across_union(spark, tmp_path):
    # ADVICE r9 #2: pending spec'd commits were read raw; a flat
    # pending commit's string column meeting an inferred int column
    # would fail or coerce in unionByName.
    tp = str(tmp_path / "t")
    write_versioned(
        _padded(spark, 0, 20), tp, mode="overwrite", partition_by=["pz"]
    )
    # flat append with the same columns (pz as a plain string column)
    write_versioned(_padded(spark, 20, 40), tp, mode="append")
    v = optimize_versioned(spark, tp, zorder_cols=["k"], incremental=True)
    got = read_versioned(spark, tp, version=v)
    assert _schema_map(got)["pz"] == "string"
    assert got.count() == 40
    assert {r["pz"] for r in got.select("pz").distinct().collect()} == {
        "000",
        "001",
        "002",
    }


def test_commit_stats_record_pinned_partition_dtype(spark, tmp_path):
    # stats for a spec COLUMN must hold the pinned dtype's values
    # (strings), not inference's ints — otherwise pruning comparisons
    # against string probes TypeError or misfire
    tp = str(tmp_path / "t")
    write_versioned(
        _padded(spark, 0, 30),
        tp,
        mode="overwrite",
        partition_by=["pz"],
        stats_cols=["pz", "x"],
    )
    m = _load_manifest(tp, 0)
    bounds = [
        b["pz"] for files in m["stats"].values() for b in [files[k] for k in files]
    ]
    assert all(isinstance(lo, str) and isinstance(hi, str) for lo, hi in bounds)
    pruned = read_versioned(spark, tp, prune=("pz", "001", "001"))
    assert {r["pz"] for r in pruned.collect()} == {"001"}


# ---------------------------------------------------------------------------
# append schema enforcement anchors on the newest commit
# ---------------------------------------------------------------------------


def test_append_enforcement_follows_evolved_schema(spark, tmp_path):
    # ADVICE r9 #3: enforcement was anchored on commits[0], rejecting
    # every post-evolution append in the NEW schema while letting the
    # stale original schema through — inverted vs the Delta contract.
    tp = str(tmp_path / "t")
    base = spark.range(0, 10).withColumnRenamed("id", "k")
    write_versioned(base, tp, mode="overwrite")
    evolved = (
        spark.range(10, 20)
        .withColumnRenamed("id", "k")
        .withColumn("extra", F.lit("e"))
    )
    write_versioned(evolved, tp, mode="append", allow_schema_evolution=True)
    # the evolved shape is now the table's current schema: appending it
    # again must pass without the evolution flag
    more = (
        spark.range(20, 30)
        .withColumnRenamed("id", "k")
        .withColumn("extra", F.lit("f"))
    )
    write_versioned(more, tp, mode="append")
    # and the STALE pre-evolution shape is now the one that's rejected
    with pytest.raises(ValueError, match="append schema"):
        write_versioned(
            spark.range(30, 40).withColumnRenamed("id", "k"), tp, mode="append"
        )
    got = read_versioned(spark, tp, merge_schema=True)
    assert got.count() == 30


# ---------------------------------------------------------------------------
# all-files-pruned fallback returns the spec-cast schema
# ---------------------------------------------------------------------------


def test_fully_pruned_read_keeps_manifest_schema(spark, tmp_path):
    # ADVICE r9 #4: the empty-frame fallback read commits[0] raw, so a
    # fully-pruned read of a spec-partitioned table returned inferred
    # dtypes, diverging from every non-empty read.
    tp = str(tmp_path / "t")
    write_versioned(
        _padded(spark, 0, 30),
        tp,
        mode="overwrite",
        partition_by=["pz"],
        stats_cols=["x"],
    )
    full = read_versioned(spark, tp)
    empty = read_versioned(spark, tp, prune=("x", 10_000, 20_000))
    assert empty.count() == 0
    assert _schema_map(empty) == _schema_map(full)
    assert _schema_map(empty)["pz"] == "string"


# ---------------------------------------------------------------------------
# merge commits carry per-file stats
# ---------------------------------------------------------------------------


def _kv(spark, lo, hi, tag):
    return (
        spark.range(lo, hi)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.concat(F.lit(tag), F.col("k").cast("string")))
        .withColumn("x", F.col("k") * 10)
    )


def test_merge_records_stats_and_prune_skips_merge_files(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(
        _kv(spark, 0, 100, "a").repartition(4, "k"),
        tp,
        mode="overwrite",
        stats_cols=["x"],
    )
    src = _kv(spark, 90, 200, "b").repartitionByRange(4, "k")
    v = merge_versioned(src, tp, keys=["k"], stats_cols=["x"])
    m = _load_manifest(tp, v)
    merge_commit = m["commits"][-1]
    assert merge_commit in m.get("stats", {}), "merge commit has no stats entry"
    # pruning must open a strict subset of the merge commit's files
    full = read_versioned(spark, tp, version=v)
    pruned = read_versioned(spark, tp, version=v, prune=("x", 1900, 1990))
    merge_files_full = [p for p in full.inputFiles() if merge_commit in p]
    merge_files_pruned = [p for p in pruned.inputFiles() if merge_commit in p]
    assert len(merge_files_pruned) < len(merge_files_full)
    assert {r["k"] for r in pruned.collect()} == set(range(190, 200))
    assert pruned.filter(~F.col("v").startswith("b")).count() == 0


def test_merge_inherits_parent_stats_columns(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 50, "a"), tp, mode="overwrite", stats_cols=["x"])
    v = merge_versioned(_kv(spark, 40, 80, "b"), tp, keys=["k"])  # no stats_cols
    m = _load_manifest(tp, v)
    merge_commit = m["commits"][-1]
    assert merge_commit in m.get("stats", {})
    cols = {
        c for files in [m["stats"][merge_commit]] for b in files.values() for c in b
    }
    assert cols == {"x"}


def test_merge_stream_sink_records_stats(spark, tmp_path):
    from data_spark.streaming.jobs import merge_stream_sink

    src_dir = str(tmp_path / "src")
    tp = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    batch = (
        _kv(spark, 0, 40, "a")
        .withColumn("seq_ts", F.col("k").cast("long"))
        .withColumn("seq_id", F.col("k").cast("long"))
        .withColumn("del", F.lit(False))
    )
    batch.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    q = merge_stream_sink(
        stream, tp, ck, keys=["k"], delete_col="del", stats_cols=["x"]
    )
    q.awaitTermination(120)
    v = table_versions(tp)[-1]
    m = _load_manifest(tp, v)
    assert m.get("stats"), "bootstrap commit has no stats"
    # second batch goes through merge_versioned
    batch2 = (
        _kv(spark, 30, 60, "b")
        .withColumn("seq_ts", F.col("k").cast("long") + 100)
        .withColumn("seq_id", F.col("k").cast("long"))
        .withColumn("del", F.lit(False))
    )
    batch2.write.mode("append").parquet(src_dir)
    q2 = merge_stream_sink(
        stream, tp, ck, keys=["k"], delete_col="del", stats_cols=["x"]
    )
    q2.awaitTermination(120)
    v2 = table_versions(tp)[-1]
    m2 = _load_manifest(tp, v2)
    assert m2["mode"] == "merge"
    assert m2["commits"][-1] in m2.get("stats", {})


# ---------------------------------------------------------------------------
# refs.json advisory head cache
# ---------------------------------------------------------------------------


def _count_manifest_loads(monkeypatch):
    calls = {"n": 0}
    real = dio._load_manifest

    def counting(table_path, version):
        calls["n"] += 1
        return real(table_path, version)

    monkeypatch.setattr(dio, "_load_manifest", counting)
    return calls


def test_branch_head_is_o1_with_fresh_refs(spark, tmp_path, monkeypatch):
    tp = str(tmp_path / "t")
    write_versioned(spark.range(0, 5), tp, mode="overwrite")
    for i in range(8):
        write_versioned(spark.range(i, i + 5), tp, mode="append")
    assert os.path.exists(_refs_path(tp))
    calls = _count_manifest_loads(monkeypatch)
    assert branch_head(tp, "main") == 8
    assert calls["n"] <= 2, f"expected O(1) head resolution, read {calls['n']} manifests"


def test_branch_head_survives_stale_and_corrupt_refs(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(spark.range(0, 5), tp, mode="overwrite")
    write_versioned(spark.range(5, 10), tp, mode="append", branch="b")
    write_versioned(spark.range(10, 15), tp, mode="append")
    # stale: point main at an old version — validation must still find
    # the true head by scanning newer manifests
    with open(_refs_path(tp), "w") as f:
        json.dump({"heads": {"main": 0, "b": 1}}, f)
    assert branch_head(tp, "main") == 2
    assert branch_head(tp, "b") == 1
    # corrupt: fall back to the full walk
    with open(_refs_path(tp), "w") as f:
        f.write("{not json")
    assert branch_head(tp, "main") == 2
    assert branch_head(tp, "b") == 1
    # missing: same
    os.remove(_refs_path(tp))
    assert branch_head(tp, "main") == 2
    # wrong-branch candidate: refs claims main's head is a branch commit
    with open(_refs_path(tp), "w") as f:
        json.dump({"heads": {"main": 1}}, f)
    assert branch_head(tp, "main") == 2


def test_refs_not_picked_up_as_version(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(spark.range(0, 5), tp, mode="overwrite")
    assert table_versions(tp) == [0]


# ---------------------------------------------------------------------------
# indexed merge-on-read for tombstone-heavy tables
# ---------------------------------------------------------------------------


def test_indexed_tombstone_read_equals_per_group_plan(spark, tmp_path, monkeypatch):
    """Above _TOMBSTONE_JOIN_THRESHOLD delete entries, read_versioned
    switches to the single-anti-join plan (each tombstone dir read once
    with its upto). Both plans must return identical rows — including
    upto scoping (a later re-insert of a deleted key survives) and
    NULL-key tombstones."""
    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 200, "a"), tp, mode="overwrite", stats_cols=["x"])
    # 12 merges, each tombstoning its keys against prior commits only
    for i in range(12):
        src = (
            _kv(spark, i * 10, i * 10 + 20, f"m{i}_")
            .withColumn("del", F.col("k") % 4 == 0)
        )
        merge_versioned(src, tp, keys=["k"], delete_col="del")
    assert len(_load_manifest(tp, 12)["deletes"]) == 12 > dio._TOMBSTONE_JOIN_THRESHOLD

    got = {tuple(r) for r in read_versioned(spark, tp).collect()}
    monkeypatch.setattr(dio, "_TOMBSTONE_JOIN_THRESHOLD", 10_000)
    expect = {tuple(r) for r in read_versioned(spark, tp).collect()}
    assert got == expect and len(got) > 0

    # upto scoping is visible in the data: keys deleted by merge i but
    # re-inserted by merge i+1 (k%4==0 overlaps across batches) survive
    ks = {r[0] for r in got}
    assert any(k % 4 == 0 for k in ks), "re-inserted deleted keys must survive"


def test_indexed_tombstone_read_with_prune_and_nulls(spark, tmp_path, monkeypatch):
    tp = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(None, "n0", 0)] + [(i, f"a{i}", i * 10) for i in range(1, 60)],
        "k bigint, v string, x bigint",
    )
    write_versioned(base, tp, mode="overwrite", stats_cols=["x"])
    # 10 single-key deletes incl. a NULL-key tombstone
    delete_versioned(spark.createDataFrame([(None,)], "k bigint"), tp)
    for i in range(1, 10):
        delete_versioned(spark.createDataFrame([(i * 5,)], "k bigint"), tp)
    got = sorted(
        tuple(r) for r in read_versioned(spark, tp, prune=("x", 100, 400)).collect()
    )
    monkeypatch.setattr(dio, "_TOMBSTONE_JOIN_THRESHOLD", 10_000)
    expect = sorted(
        tuple(r) for r in read_versioned(spark, tp, prune=("x", 100, 400)).collect()
    )
    assert got == expect
    ks = {r[0] for r in got}
    assert None not in ks and 15 not in ks and 11 in ks


# ---------------------------------------------------------------------------
# batch-watermark cache for the streaming replay guard
# ---------------------------------------------------------------------------


def test_batch_id_guard_scans_only_new_manifests(spark, tmp_path, monkeypatch):
    from data_spark.io import last_committed_batch_id

    tp = str(tmp_path / "t")
    write_versioned(spark.range(5), tp, mode="overwrite", meta={"batch_id": 0})
    for i in range(1, 6):
        write_versioned(spark.range(5), tp, mode="append", meta={"batch_id": i})
    assert last_committed_batch_id(tp) == 5  # full walk, writes the watermark
    wm = os.path.join(tp, "_manifests", "batch_watermark.json")
    assert os.path.exists(wm)
    calls = _count_manifest_loads(monkeypatch)
    assert last_committed_batch_id(tp) == 5
    assert calls["n"] == 0, f"no new versions but {calls['n']} manifests read"
    # a new commit: exactly one incremental manifest read
    write_versioned(spark.range(5), tp, mode="append", meta={"batch_id": 6})
    calls["n"] = 0
    assert last_committed_batch_id(tp) == 6
    assert calls["n"] == 1
    # meta-less maintenance commits don't hide the recorded high water
    write_versioned(spark.range(5), tp, mode="append")
    assert last_committed_batch_id(tp) == 6


def test_batch_id_guard_survives_corrupt_watermark(spark, tmp_path):
    from data_spark.io import last_committed_batch_id

    tp = str(tmp_path / "t")
    write_versioned(spark.range(5), tp, mode="overwrite", meta={"batch_id": 3})
    assert last_committed_batch_id(tp) == 3
    wm = os.path.join(tp, "_manifests", "batch_watermark.json")
    with open(wm, "w") as f:
        f.write("{broken")
    assert last_committed_batch_id(tp) == 3
    os.remove(wm)
    assert last_committed_batch_id(tp) == 3


# ---------------------------------------------------------------------------
# threshold-driven maintenance
# ---------------------------------------------------------------------------


def test_maintain_versioned_thresholds(spark, tmp_path):
    from data_spark.io import maintain_versioned, table_versions

    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 100, "a"), tp, mode="overwrite", stats_cols=["x"])
    # below both thresholds: no-op, no new version
    before = table_versions(tp)
    rep = maintain_versioned(spark, tp, max_delete_entries=2, max_commits=4)
    assert rep["purged"] is None and rep["collapsed"] is None
    assert table_versions(tp) == before

    for i in range(3):
        src = _kv(spark, 100 + i * 10, 110 + i * 10, "m")
        merge_versioned(src, tp, keys=["k"])
    delete_versioned(spark.createDataFrame([(1,), (2,)], "k bigint"), tp)
    expect = {tuple(r) for r in read_versioned(spark, tp).collect()}

    rep = maintain_versioned(spark, tp, max_delete_entries=2, max_commits=2)
    assert rep["purged"] is not None and rep["collapsed"] is not None
    m = _load_manifest(tp, rep["collapsed"])
    assert len(m["commits"]) == 1 and not m.get("deletes")
    got = {tuple(r) for r in read_versioned(spark, tp).collect()}
    assert got == expect
    # idempotent: a second call is a no-op
    head = rep["collapsed"]
    rep2 = maintain_versioned(spark, tp, max_delete_entries=2, max_commits=2)
    assert rep2["purged"] is None and rep2["collapsed"] is None
    assert rep2["head"] == head


def test_maintain_versioned_zorder_path_keeps_stats(spark, tmp_path):
    from data_spark.io import maintain_versioned

    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 50, "a"), tp, mode="overwrite")
    write_versioned(_kv(spark, 50, 100, "b"), tp, mode="append")
    write_versioned(_kv(spark, 100, 150, "c"), tp, mode="append")
    rep = maintain_versioned(
        spark, tp, max_commits=2, zorder_cols=["x"], stats_cols=["x"]
    )
    v = rep["collapsed"]
    m = _load_manifest(tp, v)
    assert len(m["commits"]) == 1 and m["commits"][0] in m.get("stats", {})
    # one 150-row table collapses to one file, so assert answer-level
    # pruning correctness (file-subset pruning is pinned elsewhere)
    pruned = read_versioned(spark, tp, version=v, prune=("x", 0, 100))
    assert {r["k"] for r in pruned.collect()} == set(range(0, 11))
