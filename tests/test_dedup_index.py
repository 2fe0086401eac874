"""Persistent MinHash-LSH near-dup index (operators/dedup_index.py):
probes must agree with the in-memory candidate operator, appends must
equal rebuilds, and the probe's bucket scan must be partition-pruned."""

from __future__ import annotations

import pytest

import re

from pyspark.sql import functions as F

from data_spark.operators.dedup import minhash_lsh_candidates
from data_spark.operators.dedup_index import (
    append_to_minhash_index,
    build_minhash_index,
    probe_near_dups,
)


def _docs(spark, sf_small, lo, hi):
    return spark.read.parquet(f"{sf_small}/documents.parquet").filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def test_probe_agrees_with_in_memory_candidates(spark, sf_small, tmp_path):
    """Indexed-corpus probe results == the cross pairs of the one-shot
    LSH candidate join over (corpus ∪ probes) at the same threshold."""
    corpus = _docs(spark, sf_small, 0, 200)
    probes = _docs(spark, sf_small, 200, 260)

    idx = str(tmp_path / "mh_idx")
    build_minhash_index(corpus, idx)

    got = {
        (r.probe_id, r.index_doc_id): r.est_jaccard
        for r in probe_near_dups(spark, idx, probes, threshold=0.3).collect()
    }

    both = corpus.unionByName(probes)
    cross = {}
    for r in minhash_lsh_candidates(both).collect():
        a, b = r.doc_a, r.doc_b
        if a < 200 <= b < 260:  # (index, probe) cross pairs only
            if r.est_jaccard >= 0.3:
                cross[(b, a)] = r.est_jaccard
    assert got == cross
    assert got  # sf0.001 documents contain planted near-dups


def test_append_equals_rebuild(spark, sf_small, tmp_path):
    """Probing (build(A) + append(B)) == probing build(A ∪ B)."""
    a = _docs(spark, sf_small, 0, 150)
    b = _docs(spark, sf_small, 150, 200)
    probes = _docs(spark, sf_small, 200, 230)

    incr = str(tmp_path / "mh_incr")
    build_minhash_index(a, incr)
    append_to_minhash_index(b, incr)

    full = str(tmp_path / "mh_full")
    build_minhash_index(a.unionByName(b), full)

    key = lambda rows: sorted(
        (r.probe_id, r.index_doc_id, r.est_jaccard) for r in rows
    )
    assert key(probe_near_dups(spark, incr, probes, 0.2).collect()) == key(
        probe_near_dups(spark, full, probes, 0.2).collect()
    )


def test_probe_bucket_scan_is_partition_pruned(spark, sf_small, tmp_path):
    """The buckets/ scan must carry a bucket_p partition filter built
    from the probe batch's own buckets."""
    corpus = _docs(spark, sf_small, 0, 200)
    probes = _docs(spark, sf_small, 200, 205)

    idx = str(tmp_path / "mh_pruned")
    build_minhash_index(corpus, idx)

    plan = (
        probe_near_dups(spark, idx, probes, threshold=0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
    assert pf and "bucket_p" in pf.group(1)


def test_delete_then_compact_excludes_docs(spark, sf_small, tmp_path):
    """Takedown flow: deleted docs stop appearing as index-side
    near-dup hits immediately (tombstone anti-join), compaction
    physically removes their bucket and signature rows, and probe
    results are unchanged by the rewrite."""
    import os

    from data_spark.operators.dedup_index import (
        build_minhash_index,
        compact_minhash_index,
        delete_from_minhash_index,
        probe_near_dups,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "mh")
    build_minhash_index(docs, idx, num_hashes=32, bands=8, shingle_width=3)

    # probe with copies of indexed docs so hits are guaranteed
    probes = docs.orderBy("doc_id").limit(30).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    before = probe_near_dups(spark, idx, probes, threshold=0.9).collect()
    assert before, "fixture must produce near-dup hits"
    victim = min(r.index_doc_id for r in before)

    delete_from_minhash_index(
        spark.createDataFrame([(victim,)], "doc_id long"), idx
    )
    after = probe_near_dups(spark, idx, probes, threshold=0.9).collect()
    assert victim not in {r.index_doc_id for r in after}
    kept = {(r.probe_id, r.index_doc_id) for r in before if r.index_doc_id != victim}
    assert {(r.probe_id, r.index_doc_id) for r in after} == kept

    report = compact_minhash_index(spark, idx)
    assert report["tombstones"] == 1 and report["affected_dirs"] >= 1
    assert not os.path.isdir(f"{idx}/tombstones")
    sig_ids = {r.doc_id for r in spark.read.parquet(f"{idx}/signatures").select("doc_id").collect()}
    assert victim not in sig_ids
    bucket_ids = {r.doc_id for r in spark.read.parquet(f"{idx}/buckets").select("doc_id").collect()}
    assert victim not in bucket_ids
    final = probe_near_dups(spark, idx, probes, threshold=0.9).collect()
    assert {(r.probe_id, r.index_doc_id) for r in final} == kept


@pytest.mark.slow
def test_crashed_compaction_leftovers_never_corrupt_the_buckets(spark, sf_small, tmp_path):
    """Same contract as the ANN index (ADVICE r7): staging/backup live
    outside buckets/, a probe restores a partition parked mid-swap, and
    partition discovery never sees a misparseable dir name."""
    import os

    from data_spark.io import _part_maintenance_roots
    from data_spark.operators.dedup_index import (
        build_minhash_index,
        compact_minhash_index,
        delete_from_minhash_index,
        probe_near_dups,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(300)
    idx = str(tmp_path / "mh")
    build_minhash_index(docs, idx)
    probe = docs.orderBy("doc_id").limit(20)

    delete_from_minhash_index(
        docs.orderBy("doc_id").limit(50).select("doc_id"), idx
    )
    expect = sorted(
        tuple(r) for r in probe_near_dups(spark, idx, probe, threshold=0.4).collect()
    )

    buckets_root = os.path.join(idx, "buckets")
    staging_root, bak_root = _part_maintenance_roots(buckets_root)
    os.makedirs(bak_root), os.makedirs(staging_root)
    parts = sorted(d for d in os.listdir(buckets_root) if d.startswith("bucket_p="))
    os.rename(os.path.join(buckets_root, parts[0]), os.path.join(bak_root, parts[0]))
    spark.range(3).write.parquet(os.path.join(staging_root, parts[1]))

    assert all(d.startswith(("bucket_p=", "_", ".")) for d in os.listdir(buckets_root))
    got = sorted(
        tuple(r) for r in probe_near_dups(spark, idx, probe, threshold=0.4).collect()
    )
    assert got == expect  # probe restored the parked partition

    report = compact_minhash_index(spark, idx)
    assert report["tombstones"] == 50
    assert not os.path.exists(staging_root) and not os.path.exists(bak_root)
    assert all(d.startswith(("bucket_p=", "_", ".")) for d in os.listdir(buckets_root))
    after = sorted(
        tuple(r) for r in probe_near_dups(spark, idx, probe, threshold=0.4).collect()
    )
    assert after == expect
    assert dict(spark.read.parquet(buckets_root).dtypes)["bucket_p"] in ("int", "bigint")
