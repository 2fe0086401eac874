"""Python DataSource API tests: partition-per-page parallel reads,
schema from endpoint metadata, and cursor-range page pruning under
filter pushdown."""

from __future__ import annotations

import pytest

from data_spark.sources.rest_datasource import (
    PagedRestDataSource,
    write_paged_endpoint,
)

ROWS = [{"id": i, "name": f"row{i}", "score": float(i) / 2} for i in range(95)]
DDL = "id bigint, name string, score double"


@pytest.fixture(scope="module")
def endpoint(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("paged") / "api")
    write_paged_endpoint(ROWS, path, DDL, page_size=10, cursor_col="id")
    spark.dataSource.register(PagedRestDataSource)
    return path


def _read(spark, path):
    return spark.read.format("paged_rest").option("path", path).load()


def test_reads_all_pages(spark, endpoint):
    df = _read(spark, endpoint)
    assert df.count() == 95
    assert [f.name for f in df.schema.fields] == ["id", "name", "score"]
    got = {r.id: (r.name, r.score) for r in df.collect()}
    assert got[42] == ("row42", 21.0)


def test_one_partition_per_page(spark, endpoint):
    df = _read(spark, endpoint)
    assert df.rdd.getNumPartitions() == 10  # ceil(95/10)


def test_keyset_resume_prunes_pages(spark, endpoint):
    df = _read(spark, endpoint).filter("id >= 70")
    # correctness: row-level filter still applied
    assert sorted(r.id for r in df.collect()) == list(range(70, 95))
    # planning: only the tail pages (70-79, 80-89, 90-94) are scanned
    assert df.rdd.getNumPartitions() == 3


def test_upper_bound_prunes_pages(spark, endpoint):
    df = _read(spark, endpoint).filter("id < 25")
    assert df.count() == 25
    assert df.rdd.getNumPartitions() == 3  # pages 0-2


def test_point_lookup_prunes_to_one_page(spark, endpoint):
    df = _read(spark, endpoint).filter("id = 57")
    rows = df.collect()
    assert len(rows) == 1 and rows[0].name == "row57"
    assert df.rdd.getNumPartitions() == 1


def test_contradictory_filter_yields_empty(spark, endpoint):
    df = _read(spark, endpoint).filter("id > 1000")
    assert df.count() == 0


def test_non_cursor_filters_do_not_prune(spark, endpoint):
    df = _read(spark, endpoint).filter("name = 'row3'")
    assert df.count() == 1
    assert df.rdd.getNumPartitions() == 10


def test_empty_endpoint(spark, tmp_path):
    path = str(tmp_path / "empty")
    write_paged_endpoint([], path, DDL, page_size=10, cursor_col="id")
    df = _read(spark, path)
    assert df.count() == 0


def test_stream_drains_and_resumes_exactly_once(spark, tmp_path):
    """availableNow drain, append pages, drain again: each page's rows
    arrive exactly once (cursor offset checkpointed between runs)."""
    import time

    path = str(tmp_path / "stream_api")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_paged_endpoint(ROWS[:30], path, DDL, page_size=10, cursor_col="id")
    spark.dataSource.register(PagedRestDataSource)

    def drain():
        q = (
            spark.readStream.format("paged_rest")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        for _ in range(100):
            if not q.isActive:
                break
            time.sleep(0.1)
        return sorted(r.id for r in spark.read.parquet(out).collect())

    assert drain() == list(range(30))
    # API grows by two pages; the resumed stream appends ONLY the new
    # rows (cursor offset recovered from the checkpoint)
    write_paged_endpoint(ROWS[:50], path, DDL, page_size=10, cursor_col="id")
    assert drain() == list(range(50))
