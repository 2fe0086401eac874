"""The composed incremental pipeline (pipelines/incremental_e2e) —
the COST side of the contract the pipe_incremental_e2e gate query
can't hash-check: batch-2 work must be O(|delta|), bounded by the
delta's own buckets, never O(|history|) (VERDICT r4 'Next round' #5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_spark.io import build_file_index, read_index_pruned
from data_spark.pipelines.incremental_e2e import run_batch
from data_spark.queries.common import t


@pytest.fixture()
def docs(spark, sf_small):
    return t(spark, sf_small, "documents").select("doc_id", "text", "lang", "source")


def test_second_batch_is_o_delta(spark, docs, tmp_path):
    """400-row history, then a 5-row delta: the delta's merge re-reads
    only its own buckets (~delta/num_buckets of the store), and the
    manifest refresh re-derives only those buckets' rows."""
    work = str(tmp_path / "wd")
    m1 = run_batch(spark, docs, work, batch_limit=400, num_buckets=64)
    assert m1["delta_rows"] == 400
    assert m1["merged_rows"] == 400
    assert m1["near_dups_dropped"] == 0
    assert m1["store_rows_read"] == 0  # no store existed yet
    assert m1["store_rows_total"] == 400

    m2 = run_batch(spark, docs, work, batch_limit=5, num_buckets=64)
    assert m2["delta_rows"] == 5
    # the sf0.001 corpus deliberately contains real near-dups, so some
    # of the 5 may legitimately be dropped against the 400-doc history
    merged = m2["merged_rows"]
    assert merged + m2["near_dups_dropped"] == 5
    assert 1 <= merged <= 5
    # THE measured O(delta) claim: <=|merged| of 64 buckets touched, so
    # the merge re-read at most ~merged/64 of the 400-row history (plus
    # skew headroom), never the whole store
    assert 1 <= m2["store_buckets_touched"] <= merged
    assert 0 < m2["store_rows_read"] <= 80
    assert m2["store_rows_total"] == 400 + merged

    # incremental manifest == full rebuild, file for file
    manifest = os.path.join(work, "store_manifest")
    rebuilt = os.path.join(work, "store_manifest_full")
    build_file_index(spark, os.path.join(work, "store"), ["doc_id"], rebuilt)
    inc = sorted(map(tuple, spark.read.parquet(manifest).collect()))
    full = sorted(map(tuple, spark.read.parquet(rebuilt).collect()))
    assert inc == full

    # and the manifest actually prunes: a tight doc_id range opens a
    # strict subset of the store's files
    all_files = {r[0] for r in spark.read.parquet(manifest).select("file_path").collect()}
    pruned = read_index_pruned(
        spark, os.path.join(work, "store"), manifest, "doc_id", 0, 3
    )
    opened = {
        r[0]
        for r in pruned.select(F.col("_metadata.file_path")).distinct().collect()
    }
    assert opened < all_files
    assert sorted(r["doc_id"] for r in pruned.select("doc_id").collect()) == [0, 1, 2, 3]


def test_near_dup_gate_blocks_history_dups(spark, docs, tmp_path):
    """Batch 2 consists only of near-dup variants of batch 1: the
    persistent index must drop every one WITHOUT the survivors' store
    or corpus text being rescanned, then the drained log makes batch 3
    a no-op (idempotent re-run)."""
    work = str(tmp_path / "wd")
    base = docs.filter(F.col("doc_id") < 50)
    variants = base.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat("text", F.lit(" v2 dup")).alias("text"),
        "lang",
        "source",
    )
    source = base.unionByName(variants)
    m1 = run_batch(spark, source, work, batch_limit=50)
    assert (m1["merged_rows"], m1["near_dups_dropped"]) == (50, 0)
    m2 = run_batch(spark, source, work, batch_limit=50)
    assert m2["delta_rows"] == 50
    assert m2["near_dups_dropped"] == 50
    assert m2["merged_rows"] == 0
    assert m2["store_rows_total"] == 50
    # dropped dups are logged as processed: they are never re-offered
    m3 = run_batch(spark, source, work, batch_limit=50)
    assert m3["delta_rows"] == 0
    assert m3["store_rows_total"] == 50

    # the store holds exactly the originals
    stored = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(work, "store")).select("doc_id").collect()
    )
    assert stored == list(range(50))


def test_fresh_docs_pass_the_gate(spark, docs, tmp_path):
    """Genuinely new content (disjoint shingle space) must NOT be
    dropped by the index probe — the gate errs in neither direction."""
    work = str(tmp_path / "wd")
    base = docs.filter(F.col("doc_id") < 40)
    fresh = base.select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.sha2(F.col("doc_id").cast("string"), 256).alias("text"),
        "lang",
        "source",
    )
    source = base.unionByName(fresh)
    run_batch(spark, source, work, batch_limit=40)
    m2 = run_batch(spark, source, work, batch_limit=40)
    assert m2["near_dups_dropped"] == 0
    assert m2["merged_rows"] == 40
    assert m2["store_rows_total"] == 80


def test_manifest_refresh_recovers_from_crashed_swap(spark, tmp_path):
    """The manifest swap is two renames; a crash between them leaves
    NO live manifest plus a __bak of the pre-refresh state (ADVICE r5).
    The next refresh must restore that backup, redo the delta, and
    sweep leftovers — never silently fall back to a full rebuild with
    stale rows or leave junk directories accumulating."""
    import shutil
    import uuid

    from data_spark.io import refresh_file_index_for_dirs

    path = str(tmp_path / "store")
    idx = str(tmp_path / "idx")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).alias("__kb")
    )
    df.write.partitionBy("__kb").parquet(path)
    refresh_file_index_for_dirs(spark, path, [], ["doc_id"], idx)  # bootstrap
    before = sorted(map(tuple, spark.read.parquet(idx).collect()))

    # rewrite bucket 1, then simulate a refresh that crashed BETWEEN the
    # two renames: manifest moved to __bak, fresh staging left behind
    shutil.rmtree(os.path.join(path, "__kb=1"))
    spark.range(200, 230).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("__kb")
    ).write.partitionBy("__kb").mode("append").parquet(path)
    os.rename(idx, f"{idx}__bak_{uuid.uuid4().hex[:8]}")
    os.makedirs(f"{idx}__staging_{uuid.uuid4().hex[:8]}")
    assert not os.path.exists(idx)

    refresh_file_index_for_dirs(spark, path, ["__kb=1"], ["doc_id"], idx)
    got = sorted(map(tuple, spark.read.parquet(idx).collect()))
    # rows for untouched buckets survive the recovery unchanged...
    untouched = [r for r in before if "__kb=1" not in r[0]]
    assert [r for r in got if "__kb=1" not in r[0]] == untouched
    # ...and bucket 1's rows describe the REWRITTEN files
    kb1 = [r for r in got if "__kb=1" in r[0]]
    assert kb1 and all(200 <= r[2] and r[3] <= 229 for r in kb1)
    # leftover staging/backup dirs are gone
    parent = os.path.dirname(idx)
    junk = [n for n in os.listdir(parent) if "__bak_" in n or "__staging_" in n]
    assert junk == []
