"""Small-file compaction (io.compact_files): content-preserving
bin-packing rewrite with rollback, plus the already-compact no-op."""

from __future__ import annotations

import os

import pytest

from data_spark.io import compact_files


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
