"""Change Data Feed over the versioned store (io.read_changes) —
Delta-CDF-shaped incremental consumption of the commit log: inserts,
full-pre-image deletes, and merge updates split into
update_preimage/update_postimage, replayable by version interval.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_spark.io import (
    compact_versioned,
    delete_versioned,
    merge_versioned,
    read_changes,
    read_versioned,
    write_versioned,
)


def _kv(spark, lo, hi, tag):
    return (
        spark.range(lo, hi)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.concat(F.lit(tag), F.col("k").cast("string")))
    )


def _by_type(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["_change_type"], set()).add((r["k"], r["v"]))
    return out


def test_appends_feed_as_inserts(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    write_versioned(_kv(spark, 10, 20, "b"), tp, mode="append")
    write_versioned(_kv(spark, 20, 30, "c"), tp, mode="append")
    ch = _by_type(read_changes(spark, tp, from_version=0))
    assert set(ch) == {"insert"}
    assert {k for k, _v in ch["insert"]} == set(range(10, 30))
    # interval scoping: only the second append
    ch2 = _by_type(read_changes(spark, tp, from_version=1, to_version=2))
    assert {k for k, _v in ch2["insert"]} == set(range(20, 30))


def test_delete_feeds_full_preimage_rows(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 20, "a"), tp, mode="overwrite")
    delete_versioned(spark.createDataFrame([(3,), (7,)], "k bigint"), tp)
    ch = _by_type(read_changes(spark, tp, from_version=0))
    assert ch == {"delete": {(3, "a3"), (7, "a7")}}


def test_merge_splits_updates_inserts_deletes(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    # keys 5..9 matched (updates), 10..14 unmatched (inserts),
    # matched key 6 and unmatched key 12 delete-flagged
    src = _kv(spark, 5, 15, "m").withColumn("del", F.col("k").isin(6, 12))
    merge_versioned(src, tp, keys=["k"], delete_col="del")
    ch = _by_type(read_changes(spark, tp, from_version=0))
    assert {k for k, _v in ch["update_preimage"]} == {5, 7, 8, 9}
    assert ch["update_postimage"] == {(k, f"m{k}") for k in (5, 7, 8, 9)}
    assert {k for k, _v in ch["insert"]} == {10, 11, 13, 14}
    assert ch["delete"] == {(6, "a6")}  # unmatched delete (12) never existed
    # the feed replays identically
    again = _by_type(read_changes(spark, tp, from_version=0))
    assert again == ch


def test_layout_versions_raise_unless_skipped(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    compact_versioned(spark, tp)
    write_versioned(_kv(spark, 10, 15, "b"), tp, mode="append")
    with pytest.raises(ValueError, match="layout"):
        read_changes(spark, tp, from_version=0)
    ch = _by_type(read_changes(spark, tp, from_version=0, skip_layout_versions=True))
    assert set(ch) == {"insert"}
    assert {k for k, _v in ch["insert"]} == set(range(10, 15))


def test_empty_interval_keeps_schema(spark, tmp_path):
    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    ch = read_changes(spark, tp, from_version=0, to_version=0)
    assert ch.count() == 0
    assert set(ch.columns) == {"k", "v", "_change_type", "_commit_version"}


def test_feed_composes_to_snapshot(spark, tmp_path):
    """Applying the feed to the from-snapshot reproduces the
    to-snapshot: the CDF invariant an incremental consumer relies on."""
    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 30, "a"), tp, mode="overwrite")
    write_versioned(_kv(spark, 30, 40, "b"), tp, mode="append")
    delete_versioned(spark.createDataFrame([(2,), (35,)], "k bigint"), tp)
    src = _kv(spark, 20, 45, "m").withColumn("del", F.col("k") % 9 == 0)
    merge_versioned(src, tp, keys=["k"], delete_col="del")

    base = {(r["k"], r["v"]) for r in read_versioned(spark, tp, version=0).collect()}
    final = {(r["k"], r["v"]) for r in read_versioned(spark, tp).collect()}
    ch = read_changes(spark, tp, from_version=0).collect()
    state = dict(base)
    # apply in version order: deletes/preimages remove, inserts/postimages add
    for v in sorted({r["_commit_version"] for r in ch}):
        for r in ch:
            if r["_commit_version"] == v and r["_change_type"] in (
                "delete",
                "update_preimage",
            ):
                state.pop(r["k"], None)
        for r in ch:
            if r["_commit_version"] == v and r["_change_type"] in (
                "insert",
                "update_postimage",
            ):
                state[r["k"]] = r["v"]
    assert set(state.items()) == final


def _feed_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_change_feed_files_match_reconstruction(spark, tmp_path):
    """change_feed=True materializes each version's change rows at
    commit time (the Delta CDF write-side approach); read_changes must
    serve them with EXACTLY the rows the reconstruction path derives —
    same flow on a twin table without change files as the oracle."""
    import os

    from data_spark.io import _load_manifest

    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    for tp, cf in ((ta, True), (tb, False)):
        write_versioned(_kv(spark, 0, 20, "a"), tp, mode="overwrite",
                        stats_cols=["k"])
        src = (
            _kv(spark, 10, 30, "m")
            .withColumn("is_del", F.col("k") % 4 == 0)
        )
        merge_versioned(src, tp, keys=["k"], delete_col="is_del",
                        change_feed=cf, stats_cols=["k"])
        delete_versioned(
            spark.createDataFrame([(k,) for k in range(0, 30, 7)], "k bigint"),
            tp,
            change_feed=cf,
        )
    # the CF table recorded change dirs; the twin did not
    assert "changes" in _load_manifest(ta, 1) and "changes" in _load_manifest(ta, 2)
    assert "changes" not in _load_manifest(tb, 1)
    assert os.path.isdir(os.path.join(ta, "changes"))
    got = _feed_rows(read_changes(spark, ta, from_version=0))
    want = _feed_rows(read_changes(spark, tb, from_version=0))
    assert got == want and len(got) > 0
    # and the stored-file path is what actually served: drop the twin's
    # reconstruction inputs equivalent — delete the CF table's
    # tombstone dirs; the feed must still read (stored files only)
    import shutil

    shutil.rmtree(os.path.join(ta, "deletes"))
    again = _feed_rows(read_changes(spark, ta, from_version=0))
    assert again == want


def test_vacuum_sweeps_unreferenced_change_dirs(spark, tmp_path):
    import os

    from data_spark.io import vacuum_versions

    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    src = _kv(spark, 5, 15, "m").withColumn("is_del", F.lit(False))
    merge_versioned(src, tp, keys=["k"], delete_col="is_del", change_feed=True)
    write_versioned(_kv(spark, 20, 25, "c"), tp, mode="append")
    ch_dirs = os.listdir(os.path.join(tp, "changes"))
    assert len(ch_dirs) == 1
    # keep everything: the referenced change dir survives
    vacuum_versions(tp, keep_from=0)
    assert os.listdir(os.path.join(tp, "changes")) == ch_dirs
    # drop history below the append: the merge's manifest goes away and
    # its change dir is reclaimed
    vacuum_versions(tp, keep_from=2)
    assert os.listdir(os.path.join(tp, "changes")) == []


def test_merge_feed_duplicate_key_multiplicity(spark, tmp_path):
    """ADVICE r11: appends never enforce key uniqueness, so a merge's
    pre-image side can hold N rows per key while the insert commit
    wrote exactly one — the feed must emit N update_preimages and ONE
    update_postimage (what was actually written), never N x M join
    fan-out. Both serving modes (stored change files and
    reconstruction) must agree."""
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "x")], "k bigint, v string"
    )
    src = spark.createDataFrame([(1, "NEW", False)], "k bigint, v string, is_del boolean")
    for cf in (True, False):
        tp = str(tmp_path / f"t{cf}")
        write_versioned(dup, tp, mode="overwrite", stats_cols=["k"])
        merge_versioned(src, tp, keys=["k"], delete_col="is_del", change_feed=cf)
        rows = sorted(
            (r["_change_type"], r["k"], r["v"])
            for r in read_changes(spark, tp, from_version=0).collect()
        )
        assert rows == [
            ("update_postimage", 1, "NEW"),
            ("update_preimage", 1, "a"),
            ("update_preimage", 1, "b"),
            ("update_preimage", 1, "c"),
        ], rows


def test_decimal_key_bounds_prune_is_numeric(spark, tmp_path):
    """ADVICE r11: decimal bounds used to serialize via str() and the
    Python overlap test compared them lexicographically ('100.50' >=
    '99.00' is False), silently dropping pre-image rows from the feed.
    Bounds are now directed-widened floats, so a decimal-keyed delete
    over a stats-maintained multi-file table feeds every pre-image."""
    df = (
        spark.range(1, 301)
        .select((F.col("id").cast("decimal(10,2)") + 0.25).alias("dk"),
                F.col("id").alias("v"))
        .repartition(8, "dk")
    )
    tp = str(tmp_path / "t")
    write_versioned(df, tp, mode="overwrite", stats_cols=["dk"])
    keys = spark.sql(
        "SELECT cast(x as decimal(10,2)) AS dk FROM values (99.25), (100.25), (250.25) t(x)"
    )
    delete_versioned(keys, tp, change_feed=False)
    ch = read_changes(spark, tp, from_version=0)
    assert sorted(r["v"] for r in ch.collect()) == [99, 100, 250]
    assert read_versioned(spark, tp).count() == 297


def test_nan_float_key_bounds_unrecordable(spark, tmp_path):
    """ADVICE r11: a NaN in a float key's min/max poisons every ordered
    bounds compare (all False -> every file skipped -> feed reports
    zero deletes). NaN-tainted columns are now skipped at bounds
    recording time, falling back to the unpruned pre-image scan."""
    from data_spark.io import _load_manifest

    df = spark.createDataFrame(
        [(float("nan"), "n"), (1.0, "a"), (2.0, "b"), (3.0, "c")],
        "fk double, v string",
    )
    tp = str(tmp_path / "t")
    write_versioned(df, tp, mode="overwrite", stats_cols=["fk"])
    delete_versioned(
        spark.createDataFrame([(float("nan"),), (1.0,)], "fk double"), tp
    )
    entry = _load_manifest(tp, 1)["deletes"][-1]
    assert not (entry.get("bounds") or {}), entry
    ch = read_changes(spark, tp, from_version=0)
    assert sorted(r["v"] for r in ch.collect()) == ["a", "n"]
    assert read_versioned(spark, tp).count() == 2


def test_merge_feed_across_schema_evolution(spark, tmp_path):
    """ADVICE r11 + VERDICT item 8: a schema-evolving merge commit's
    NEW columns must survive into its insert/update_postimage change
    rows, with pre-evolution pre-images surfacing NULLs — and a merge
    commit missing a parent column must surface NULLs, not raise."""
    tp = str(tmp_path / "t")
    write_versioned(
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"),
        tp, mode="overwrite", stats_cols=["k"],
    )
    wide = spark.createDataFrame(
        [(1, "A2", 9, False), (3, "C", 7, False)],
        "k bigint, v string, extra bigint, is_del boolean",
    )
    for cf in (True, False):
        t = str(tmp_path / f"cf{cf}")
        write_versioned(
            spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"),
            t, mode="overwrite", stats_cols=["k"],
        )
        merge_versioned(wide, t, keys=["k"], delete_col="is_del", change_feed=cf)
        rows = sorted(
            (r["_change_type"], r["k"], r["v"], r["extra"])
            for r in read_changes(spark, t, from_version=0).collect()
        )
        assert rows == [
            ("insert", 3, "C", 7),
            ("update_postimage", 1, "A2", 9),
            ("update_preimage", 1, "a", None),
        ], rows
    # narrow merge: source missing a parent column -> NULLs, no raise
    tn = str(tmp_path / "narrow")
    write_versioned(
        spark.createDataFrame([(1, "a", 5)], "k bigint, v string, w bigint"),
        tn, mode="overwrite", stats_cols=["k"],
    )
    import data_spark.io as dio

    tomb = spark.createDataFrame([(1,)], "k bigint")
    removed = read_versioned(spark, tn).join(tomb, "k", "left_semi")
    ins = spark.createDataFrame([(1, "A2")], "k bigint, v string")
    out = sorted(
        (r["_change_type"], r["k"], r["v"], r["w"])
        for r in dio._classify_merge_changes(removed, ins, ["k"]).collect()
    )
    assert out == [("update_postimage", 1, "A2", None),
                   ("update_preimage", 1, "a", 5)], out


def test_read_changes_on_vacuumed_interval_fails_loudly(spark, tmp_path):
    """VERDICT item 7: after vacuum drops the manifests (and change
    dirs) below the retention bound, a feed over the vacuumed interval
    must raise — never silently return an empty/partial feed."""
    from data_spark.io import vacuum_versions

    tp = str(tmp_path / "t")
    write_versioned(_kv(spark, 0, 10, "a"), tp, mode="overwrite")
    src = _kv(spark, 5, 15, "m").withColumn("is_del", F.lit(False))
    merge_versioned(src, tp, keys=["k"], delete_col="is_del", change_feed=True)
    write_versioned(_kv(spark, 20, 25, "c"), tp, mode="append")
    write_versioned(_kv(spark, 30, 33, "d"), tp, mode="append")
    vacuum_versions(tp, keep_from=2)
    with pytest.raises(ValueError, match="from_version"):
        read_changes(spark, tp, from_version=0)
    with pytest.raises(ValueError, match="from_version"):
        read_changes(spark, tp, from_version=1)
    # the surviving interval still serves
    assert read_changes(spark, tp, from_version=2).count() == 3


def test_scattered_bounds_commit_warning(spark, tmp_path, caplog):
    """VERDICT item 3: a tombstoning commit whose recorded key bounds
    cover ~the whole table stats envelope gets a commit-time
    maintenance hint (bounds pruning will skip nothing); a hot-tail
    merge stays silent. Metadata-only — no extra data reads."""
    import logging

    tp = str(tmp_path / "t")
    write_versioned(
        _kv(spark, 0, 1000, "a").repartition(8, "k"), tp,
        mode="overwrite", stats_cols=["k"],
    )
    # hot-tail merge: keys confined to the top ~2% of the range
    tail = _kv(spark, 980, 1000, "m").withColumn("is_del", F.lit(False))
    with caplog.at_level(logging.WARNING, logger="data_spark.io"):
        merge_versioned(tail, tp, keys=["k"], delete_col="is_del")
    assert not [r for r in caplog.records if "scattered" in r.message]
    caplog.clear()
    # scattered merge: keys span the full range
    scattered = (
        spark.range(0, 1000, 97).withColumnRenamed("id", "k")
        .withColumn("v", F.lit("s")).withColumn("is_del", F.lit(False))
    )
    with caplog.at_level(logging.WARNING, logger="data_spark.io"):
        merge_versioned(scattered, tp, keys=["k"], delete_col="is_del")
    assert [r for r in caplog.records if "scattered" in r.message]
    caplog.clear()
    # scattered delete too
    with caplog.at_level(logging.WARNING, logger="data_spark.io"):
        delete_versioned(
            spark.range(0, 1000, 499).withColumnRenamed("id", "k"), tp
        )
    assert [r for r in caplog.records if "scattered" in r.message]
