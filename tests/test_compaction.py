"""Small-file compaction (io.compact_files): content-preserving
bin-packing rewrite with rollback, plus the already-compact no-op."""

from __future__ import annotations

import os

import pytest

from data_spark.io import compact_files
from pyspark.sql import functions as F


def _parquet_files(path):
    return sorted(
        os.path.join(root, n)
        for root, _d, names in os.walk(path)
        for n in names
        if n.endswith(".parquet")
    )


@pytest.fixture()
def fragmented(spark, sf_small, tmp_path):
    src = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    path = str(tmp_path / "frag")
    src.repartition(40).write.parquet(path)
    return path, src


def test_compact_reduces_files_and_preserves_content(spark, fragmented):
    path, src = fragmented
    before = spark.read.parquet(path)
    n_rows = before.count()
    assert len(_parquet_files(path)) == 40

    stats = compact_files(spark, path, target_file_bytes=1 << 30)
    assert stats["rewritten"] is True
    assert stats["files_before"] == 40
    assert stats["files_after"] < 40

    after = spark.read.parquet(path)
    assert after.count() == n_rows
    # content-identical both ways (multiset equality)
    assert after.exceptAll(src).count() == 0
    assert src.exceptAll(after).count() == 0


def test_compact_noop_when_already_packed(spark, fragmented):
    path, _src = fragmented
    # a 1-byte target wants >= 40 files, so nothing to gain: no rewrite
    files_before = _parquet_files(path)
    stats = compact_files(spark, path, target_file_bytes=1)
    assert stats["rewritten"] is False
    assert _parquet_files(path) == files_before


def test_file_index_prunes_non_overlapping_files(spark, tmp_path):
    """Manifest pruning: a range-sorted multi-file dataset + file-level
    min/max index lets a bounded read open ONLY the overlapping files
    (checked via inputFiles) while returning exactly the full-scan
    answer."""
    from data_spark.io import build_file_index, read_index_pruned

    path = str(tmp_path / "facts")
    idx = str(tmp_path / "facts_idx")
    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    # 8 range-partitioned files => tight, disjoint k envelopes
    df.repartitionByRange(8, "k").sortWithinPartitions("k").write.mode(
        "overwrite"
    ).parquet(path)

    build_file_index(spark, path, ["k"], idx)
    index = spark.read.parquet(idx)
    n_files = index.count()
    assert n_files == 8
    assert index.columns == ["file_path", "n_rows", "k__min", "k__max"]
    # the index is per-FILE metadata: row counts fold back to the table
    assert index.agg(F.sum("n_rows")).first()[0] == 10000

    pruned = read_index_pruned(spark, path, idx, "k", 2000, 3000)
    opened = pruned.inputFiles()
    assert 0 < len(opened) < n_files  # pruning actually dropped files
    expect = sorted(
        (r["k"], r["v"])
        for r in spark.read.parquet(path)
        .filter((F.col("k") >= 2000) & (F.col("k") <= 3000))
        .collect()
    )
    got = sorted((r["k"], r["v"]) for r in pruned.collect())
    assert got == expect

    # fully out-of-range probe: zero files, empty result, schema kept
    empty = read_index_pruned(spark, path, idx, "k", 50000, 60000)
    assert empty.count() == 0
    assert empty.columns == ["k", "v"]
