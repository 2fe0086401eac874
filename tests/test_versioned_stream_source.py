"""Streaming source over the versioned store (Spark 4 Python
DataSource): the commit log as the offset sequence, Delta-streaming-
source semantics per version (initial snapshot, append emission, merge
= ignoreChanges, delete skipped, layout rewrites raise unless
skip_change_commits). See data_spark/sources/versioned_datasource.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_spark.io import (
    delete_versioned,
    merge_versioned,
    optimize_versioned,
    publish_branch,
    read_versioned,
    write_versioned,
)
from data_spark.sources.versioned_datasource import register


def _kv(spark, lo, hi, tag):
    return (
        spark.range(lo, hi)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.concat(F.lit(tag), F.col("k").cast("string")))
        .withColumn("x", F.col("k") * 10)
    )


def _drain(spark, tp, ck, out, **options):
    register(spark)
    reader = spark.readStream.format("versioned_table").option("path", tp)
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _rows(spark, out):
    if not os.path.isdir(out):
        return set()
    df = spark.read.parquet(out)
    return {tuple(r) for r in df.collect()}


def test_initial_snapshot_applies_tombstones(spark, tmp_path):
    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    write_versioned(_kv(spark, 0, 50, "a"), tp, mode="overwrite")
    write_versioned(_kv(spark, 50, 80, "b"), tp, mode="append")
    delete_versioned(
        spark.createDataFrame([(k,) for k in range(0, 80, 7)], "k bigint"), tp
    )
    _drain(spark, tp, ck, out)
    expect = {tuple(r) for r in read_versioned(spark, tp).collect()}
    assert _rows(spark, out) == expect and len(expect) > 0


def test_appends_and_merge_emit_incrementally(spark, tmp_path):
    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    write_versioned(_kv(spark, 0, 30, "a"), tp, mode="overwrite")
    _drain(spark, tp, ck, out)
    assert len(_rows(spark, out)) == 30

    write_versioned(_kv(spark, 30, 40, "b"), tp, mode="append")
    src = _kv(spark, 25, 35, "m").withColumn("del", F.col("k") % 5 == 0)
    merge_versioned(src, tp, keys=["k"], delete_col="del")
    _drain(spark, tp, ck, out)
    got = _rows(spark, out)
    # the second drain added: the append's 10 rows + the merge's
    # non-deleted inserts (k in 25..34, k%5!=0 -> 8 rows). Upserted
    # keys re-emit (ignoreChanges semantics) — the old 'a'/'b' row
    # versions remain in the append-only sink by design.
    appended = {t for t in got if t[1].startswith("b")}
    merged = {t for t in got if t[1].startswith("m")}
    assert len(appended) == 10
    assert {t[0] for t in merged} == {k for k in range(25, 35) if k % 5 != 0}
    assert len(got) == 30 + 10 + 8


def test_delete_version_is_skipped(spark, tmp_path):
    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    write_versioned(_kv(spark, 0, 20, "a"), tp, mode="overwrite")
    _drain(spark, tp, ck, out)
    delete_versioned(spark.createDataFrame([(1,), (2,)], "k bigint"), tp)
    write_versioned(_kv(spark, 20, 25, "c"), tp, mode="append")
    _drain(spark, tp, ck, out)
    got = _rows(spark, out)
    assert len(got) == 25  # snapshot 20 + append 5; delete contributed nothing


def test_layout_rewrite_raises_unless_skipped(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 20, "a"), tp, mode="overwrite")
    ck1, out1 = str(tmp_path / "ck1"), str(tmp_path / "out1")
    _drain(spark, tp, ck1, out1)
    optimize_versioned(spark, tp, zorder_cols=["k"])
    write_versioned(_kv(spark, 20, 30, "b"), tp, mode="append")
    with pytest.raises(Exception, match="non-append change"):
        _drain(spark, tp, ck1, out1)
    # skip_change_commits: the optimize is skipped, the append flows
    ck2, out2 = str(tmp_path / "ck2"), str(tmp_path / "out2")
    _drain(spark, tp, ck2, out2, skip_change_commits="true")
    write_versioned(_kv(spark, 30, 35, "c"), tp, mode="append")
    _drain(spark, tp, ck2, out2, skip_change_commits="true")
    got = _rows(spark, out2)
    assert {t[0] for t in got} == set(range(35))


def test_publish_emits_only_branch_commits(spark, tmp_path):
    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    v0 = write_versioned(_kv(spark, 0, 20, "a"), tp, mode="overwrite")
    _drain(spark, tp, ck, out)
    # branch workflow entirely after the snapshot: W, A on branch, P
    write_versioned(_kv(spark, 20, 40, "w"), tp, mode="append", branch="wap")
    delete_versioned(
        spark.createDataFrame([(22,), (23,)], "k bigint"), tp, branch="wap"
    )
    publish_branch(tp, "wap", expect_main=v0)
    _drain(spark, tp, ck, out)
    got = _rows(spark, out)
    staged = {t[0] for t in got if t[1].startswith("w")}
    # the publish emits the branch's data commit (tombstones are delete
    # entries, skipped like main deletes) — branch rows appear exactly
    # once and only after publish
    assert staged == set(range(20, 40))
    assert len(got) == 40


def test_spec_partition_values_survive(spark, tmp_path):
    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    padded = (
        spark.range(0, 30)
        .withColumnRenamed("id", "k")
        .withColumn("pz", F.format_string("%03d", (F.col("k") % 3).cast("int")))
    )
    write_versioned(padded, tp, mode="overwrite", partition_by=["pz"])
    _drain(spark, tp, ck, out)
    got = _rows(spark, out)
    assert {t[1] for t in got} == {"000", "001", "002"}
    df = spark.read.parquet(out)
    assert dict(df.dtypes)["pz"] == "string"


def test_resume_from_checkpoint_is_exactly_once(spark, tmp_path):
    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    _drain(spark, tp, ck, out)
    # no new versions: a re-drain adds nothing
    _drain(spark, tp, ck, out)
    assert len(_rows(spark, out)) == 10
    write_versioned(_kv(spark, 10, 15, "b"), tp, mode="append")
    _drain(spark, tp, ck, out)
    assert len(_rows(spark, out)) == 15


def test_typed_columns_roundtrip_exactly(spark, tmp_path):
    """timestamp / date / decimal survive the executor-side Arrow read
    bit-exactly, and the inferred stream schema spells Spark DDL
    (arrow says decimal128(p, s); Spark wants decimal(p, s))."""
    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    df = spark.range(5).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 3600).alias("ts"),
        F.to_date(
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 86400)
        ).alias("d"),
        (F.col("id") * 1.5).cast("decimal(10,2)").alias("amt"),
    )
    write_versioned(df, tp, mode="overwrite")
    _drain(spark, tp, ck, out)
    got = spark.read.parquet(out)
    assert dict(got.dtypes) == {
        "k": "bigint", "ts": "timestamp", "d": "date", "amt": "decimal(10,2)"
    }
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, read_versioned(spark, tp).collect())
    )


def test_snapshot_plans_one_partition_per_file(spark, tmp_path):
    """The scale contract of the partition-based reader: the initial
    snapshot is planned as one InputPartition per data FILE from
    manifest metadata only — executors read the parquet; no row is
    materialized on the driver — and tombstones ride the snapshot
    partitions to an executor-side anti-join."""
    from data_spark.sources.versioned_datasource import VersionedStreamReader

    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 40, "a").repartition(4), tp, mode="overwrite")
    write_versioned(_kv(spark, 40, 60, "b").repartition(2), tp, mode="append")
    delete_versioned(
        spark.createDataFrame([(k,) for k in range(0, 60, 9)], "k bigint"), tp
    )
    schema = read_versioned(spark, tp).schema
    r = VersionedStreamReader(schema, {"path": tp})
    off = r.initialOffset()
    end = r.latestOffset()
    parts = r.partitions(off, end)
    assert len(parts) >= 6  # 4 + 2 files, one slice each
    # every snapshot slice carries the applicable tombstones (the
    # delete postdates both commits, so it applies to all slices)
    assert all(len(p.tombstones) == 1 for p in parts)
    batches = [b for p in parts for b in r.read(p)]
    got = {tuple(row) for b in batches for row in zip(*[c.to_pylist() for c in b.columns])}
    expect = {tuple(r_) for r_ in read_versioned(spark, tp).collect()}
    assert got == expect and len(expect) == 60 - 7


def test_max_versions_per_trigger_bounds_batches(spark, tmp_path):
    """The maxFilesPerTrigger analogue: each latestOffset advances the
    offset by at most N versions past the last planned batch (snapshot
    alone first), so a backlogged stream catches up in bounded
    batches. Asserted at the reader level — availableNow snapshots its
    end offset up front, which hides the cadence; rows must still
    drain completely end-to-end."""
    from data_spark.sources.versioned_datasource import VersionedStreamReader

    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    for i in range(5):
        write_versioned(_kv(spark, 10 + i * 5, 15 + i * 5, "b"), tp, mode="append")

    schema = read_versioned(spark, tp).schema
    r = VersionedStreamReader(
        schema,
        {"path": tp, "max_versions_per_trigger": "2", "starting_version": "0"},
    )
    off = r.initialOffset()
    spans, total = [], 0
    for _ in range(10):
        end = r.latestOffset()
        if end == off:
            break
        parts = r.partitions(off, end)
        n = sum(b.num_rows for p in parts for b in r.read(p))
        spans.append(int(end["next_version"]) - int(off["next_version"]))
        total += n
        off = end
    # snapshot batch (1 version) then ceil(5/2) capped batches: 1,2,2,1
    assert spans == [1, 2, 2, 1]
    assert total == 35
    # and the end-to-end drain still delivers everything
    _drain(spark, tp, ck, out, max_versions_per_trigger="2")
    assert {t[0] for t in _rows(spark, out)} == set(range(35))


def test_change_feed_stream_matches_batch_cdf(spark, tmp_path):
    """read_changes=true (the streaming readChangeFeed analogue): the
    drained feed must equal the initial snapshot tagged insert PLUS the
    batch io.read_changes over the streamed interval — merge/delete
    versions served from their commit-time changes/ files, executor-
    side like every other slice."""
    from data_spark.io import merge_versioned, read_changes

    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    v0 = write_versioned(_kv(spark, 0, 20, "a"), tp, mode="overwrite")
    write_versioned(_kv(spark, 20, 30, "b"), tp, mode="append")
    src = _kv(spark, 15, 35, "m").withColumn("del", F.col("k") % 6 == 0)
    merge_versioned(src, tp, keys=["k"], delete_col="del", change_feed=True)
    delete_versioned(
        spark.createDataFrame([(k,) for k in range(0, 35, 9)], "k bigint"),
        tp,
        change_feed=True,
    )

    register(spark)
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tp)
        .option("read_changes", "true")
        .option("starting_version", str(v0))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    snap = {
        (r.k, r.v, r.x, "insert", v0)
        for r in read_versioned(spark, tp, version=v0).collect()
    }
    feed = {
        (r.k, r.v, r.x, r._change_type, r._commit_version)
        for r in read_changes(spark, tp, from_version=v0).collect()
    }
    assert got == snap | feed
    types = {t for _k, _v, _x, t, _c in got}
    assert {"insert", "update_preimage", "update_postimage", "delete"} <= types


def test_change_feed_stream_requires_stored_files(spark, tmp_path):
    """A tombstoning version committed WITHOUT change_feed=True cannot
    be served by the streaming feed (pre-image reconstruction needs
    joins) — the stream fails with a pointer to batch read_changes."""
    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    v0 = write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    delete_versioned(spark.createDataFrame([(1,)], "k bigint"), tp)
    with pytest.raises(Exception, match="no stored change files"):
        _drain(
            spark, tp, ck, out,
            read_changes="true", starting_version=str(v0),
        )


def test_starting_timestamp_resolves_snapshot_version(spark, tmp_path):
    """Delta's startingTimestamp analogue: the stream's snapshot
    version is the latest main version committed at or before the
    given epoch — resolved from the committed_at stamp every manifest
    carries."""
    import time

    from data_spark.io import _load_manifest

    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    ts_after_v0 = _load_manifest(tp, 0)["committed_at"] + 0.001
    time.sleep(0.05)
    write_versioned(_kv(spark, 10, 20, "b"), tp, mode="append")
    _drain(spark, tp, ck, out, starting_timestamp=str(ts_after_v0))
    got = _rows(spark, out)
    # snapshot at v0 (10 rows) + the append drained incrementally
    assert {t[0] for t in got} == set(range(20))


def test_change_feed_stream_resumes_exactly_once(spark, tmp_path):
    """CDF-mode checkpoint resume: a second drain adds only the new
    versions' change rows, never replaying the snapshot or earlier
    stored change files."""
    from data_spark.io import merge_versioned

    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    v0 = write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    _drain(spark, tp, ck, out, read_changes="true", starting_version=str(v0))
    first = _rows(spark, out)
    assert {t[3] for t in first} == {"insert"} and len(first) == 10

    src = _kv(spark, 5, 12, "m").withColumn("del", F.col("k") % 4 == 0)
    merge_versioned(src, tp, keys=["k"], delete_col="del", change_feed=True)
    _drain(spark, tp, ck, out, read_changes="true", starting_version=str(v0))
    got = _rows(spark, out)
    assert first < got
    new = got - first
    # all new rows belong to the merge version; matched keys carry the
    # pre/post pair, the delete-flagged matched keys full pre-images
    assert {t[4] for t in new} == {v0 + 1}
    kinds = {t[3] for t in new}
    assert {"update_preimage", "update_postimage", "insert", "delete"} <= kinds
    # re-drain with no new versions: nothing added
    _drain(spark, tp, ck, out, read_changes="true", starting_version=str(v0))
    assert _rows(spark, out) == got


def test_change_feed_stream_over_partitioned_table(spark, tmp_path):
    """CDF mode over a hive-partitioned table: the snapshot's spec'd
    slices carry the insert tag (partition values keep the manifest-
    pinned dtype), and a later change_feed merge streams its stored —
    flat — change files; the drained feed equals snapshot-as-inserts
    plus the batch reader."""
    from data_spark.io import merge_versioned, read_changes

    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    padded = (
        spark.range(0, 30)
        .withColumnRenamed("id", "k")
        .withColumn("pz", F.format_string("%03d", (F.col("k") % 3).cast("int")))
    )
    v0 = write_versioned(padded, tp, mode="overwrite", partition_by=["pz"])
    src = (
        spark.range(20, 40)
        .withColumnRenamed("id", "k")
        .withColumn("pz", F.format_string("%03d", (F.col("k") % 3).cast("int")))
        .withColumn("del", F.col("k") % 8 == 0)
    )
    merge_versioned(src, tp, keys=["k"], delete_col="del", change_feed=True)

    register(spark)
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tp)
        .option("read_changes", "true")
        .option("starting_version", str(v0))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    snap = {
        (r.k, r.pz, "insert", v0)
        for r in read_versioned(spark, tp, version=v0).collect()
    }
    feed = {
        (r.k, r.pz, r._change_type, r._commit_version)
        for r in read_changes(spark, tp, from_version=v0).collect()
    }
    assert got == snap | feed
    # partition values survived as zero-padded strings on BOTH paths
    assert {t[1] for t in got} == {"000", "001", "002"}


@pytest.mark.slow
def test_bounded_available_now_catchup(spark, tmp_path):
    """VERDICT r11 item 5: a backlogged stream catches up in BOUNDED
    batches. A 20-version backlog with max_versions_per_trigger=5
    drains via drain_available_now_bounded in >= 4 engine batches (the
    Python source API makes each availableNow run one batch), every
    post-snapshot batch clamped through the checkpoint_location offset
    peek, and the final sink contents are identical to an unbounded
    one-shot drain."""
    from data_spark.sources.versioned_datasource import (
        drain_available_now_bounded,
        last_planned_offset,
    )

    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    v0 = write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    # snapshot-only first run: drain the head, then build the backlog
    runs0 = drain_available_now_bounded(
        spark, tp, out, ck, max_versions_per_trigger=5,
        source_options={"starting_version": str(v0)},
    )
    assert runs0 >= 1
    for i in range(20):
        write_versioned(_kv(spark, 10 + i * 5, 15 + i * 5, f"b{i}"), tp,
                        mode="append")
    runs = drain_available_now_bounded(
        spark, tp, out, ck, max_versions_per_trigger=5
    )
    assert runs >= 4, f"20-version backlog drained in {runs} run(s)"
    off = last_planned_offset(ck)
    assert off is not None and off["next_version"] == 21

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    # oracle: unbounded one-shot drain into a fresh sink
    ck2, out2 = str(tmp_path / "ck2"), str(tmp_path / "out2")
    _drain(spark, tp, ck2, out2, starting_version=str(v0))
    want = {tuple(r) for r in spark.read.parquet(out2).collect()}
    assert got == want and len(got) == 110


def test_checkpoint_location_clamps_restarted_stream(spark, tmp_path):
    """The checkpoint_location source option alone (no helper): after a
    drain + backlog, a restarted availableNow run recovers its position
    from the offset log and clamps its single batch to the bound
    instead of swallowing the whole backlog."""
    from data_spark.sources.versioned_datasource import last_planned_offset

    tp, ck, out = (str(tmp_path / d) for d in ("t", "ck", "out"))
    v0 = write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    _drain(spark, tp, ck, out, starting_version=str(v0))
    for i in range(8):
        write_versioned(_kv(spark, 10 + i * 3, 13 + i * 3, f"b{i}"), tp,
                        mode="append")
    _drain(
        spark, tp, ck, out,
        max_versions_per_trigger="3", checkpoint_location=ck,
    )
    off = last_planned_offset(ck)
    # clamped: planned exactly 3 of the 8 backlog versions
    assert off == {"next_version": 4, "snapshot_pending": False}
    got = {t[0] for t in _rows(spark, out)}
    assert got == set(range(0, 10)) | set(range(10, 19))
    # WITHOUT the option the same restart would have drained all 8:
    ck2, out2 = str(tmp_path / "ck2"), str(tmp_path / "out2")
    _drain(spark, tp, ck2, out2, starting_version=str(v0))
    write_versioned(_kv(spark, 100, 103, "z"), tp, mode="append")
    _drain(spark, tp, ck2, out2, max_versions_per_trigger="3")
    assert {t[0] for t in _rows(spark, out2)} >= set(range(100, 103))
