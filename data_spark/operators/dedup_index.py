"""Persistent MinHash-LSH near-duplicate index: build once, probe many.

The corpus-dedup operators (operators/dedup.py) answer "which existing
documents duplicate each other" in one plan. Production training-data
pipelines also need the ONLINE question — "is this NEW batch a
near-dup of anything already ingested?" — answered without rescanning
or re-shingling the historical corpus. This module persists the LSH
structure:

    <index>/meta.json      — {num_hashes, bands, shingle_width}
    <index>/signatures/    — (doc_id, sig array<bigint>)
    <index>/buckets/       — (doc_id, band, bucket) hive-partitioned
                             by bucket_p = pmod(bucket, NUM_BUCKET_DIRS)

and probes it with a plan whose buckets/ scan is PARTITION-PRUNED to
the probe batch's bucket_p values (a probe batch touches at most
|probe|·bands buckets, so the collected partition set is metadata,
never corpus rows). Appends are O(|delta|): shingle/sign/bucket only
the delta and append into the partition dirs — the historical corpus
text is never read again.

Banding and signatures are byte-shared with the in-memory operator
(dedup.minhash_band_buckets / minhash_signatures), so index probes and
one-shot candidate joins agree exactly.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_spark.io import recover_partitioned_root
from data_spark.operators.dedup import minhash_band_buckets, minhash_signatures
from data_spark.plans.lineage import truncate_lineage

NUM_BUCKET_DIRS = 64


def _signed_buckets(
    docs: DataFrame,
    meta: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    # Lazily truncate the signature frame: shingle+sign is the expensive
    # pass (explode + num_hashes aggs over the corpus text) and every
    # caller consumes it at least twice (sig write + bucket write, or
    # probe sig-join + bucket collect/join). The mark materializes once
    # on the first action; without it each consumer re-shingles.
    sig = truncate_lineage(
        minhash_signatures(
            docs,
            text_col,
            id_col,
            num_hashes=meta["num_hashes"],
            shingle_width=meta["shingle_width"],
        )
    )
    buckets = minhash_band_buckets(
        sig, meta["bands"], meta["num_hashes"] // meta["bands"]
    ).withColumn("bucket_p", F.pmod(F.col("bucket"), F.lit(NUM_BUCKET_DIRS)))
    return sig, buckets.select("doc_id", "band", "bucket", "bucket_p")


def signed_batch(
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Sign + bucket ``docs`` once with the index's own parameters, for
    reuse across ``probe_near_dups`` and ``append_to_minhash_index``
    (their ``signed=`` argument): an ingest batch that probes first and
    appends the survivors pays ONE shingle+sign pass, not two."""
    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    return _signed_buckets(docs, meta, text_col, id_col)


def build_minhash_index(
    docs: DataFrame,
    index_path: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_width: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Shingle, sign, and bucket the corpus; persist signatures plus
    the bucket table partitioned by ``pmod(bucket, NUM_BUCKET_DIRS)``
    so probes prune to their buckets' directories."""
    meta = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_width": shingle_width,
    }
    sig, buckets = _signed_buckets(docs, meta, text_col, id_col)
    sig.write.mode("overwrite").parquet(os.path.join(index_path, "signatures"))
    (
        # cluster by the partition column first: without it every task
        # holds rows for ~all 64 bucket dirs and opens a file in each
        # (tasks × dirs small files, guide §6.2); clustered, each dir is
        # written by exactly one task (−20% wall, half the files)
        buckets.repartition(NUM_BUCKET_DIRS, "bucket_p")
        .write.mode("overwrite")
        .partitionBy("bucket_p")
        .parquet(os.path.join(index_path, "buckets"))
    )
    with open(os.path.join(index_path, "meta.json"), "w") as f:
        json.dump(meta, f)


def append_to_minhash_index(
    delta: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    signed: tuple[DataFrame, DataFrame] | None = None,
) -> None:
    """O(|delta|) maintenance: sign + bucket only the new documents and
    append into the existing partition layout — the indexed corpus is
    never re-read. ``signed``: pre-computed (sig, buckets) for exactly
    ``delta`` (see ``signed_batch``) to skip re-shingling."""
    presigned = signed is not None
    if presigned:
        sig, buckets = signed
    else:
        with open(os.path.join(index_path, "meta.json")) as f:
            meta = json.load(f)
        sig, buckets = _signed_buckets(delta, meta, text_col, id_col)

    def _write_sig():
        sig.write.mode("append").parquet(os.path.join(index_path, "signatures"))

    def _write_buckets():
        (
            # same dir-clustered write as build_minhash_index: one file
            # per touched bucket dir per append, not one per task per dir
            buckets.repartition(NUM_BUCKET_DIRS, "bucket_p")
            .write.mode("append")
            .partitionBy("bucket_p")
            .parquet(os.path.join(index_path, "buckets"))
        )

    if presigned:
        # caller-signed frames were already materialized by the probe
        # (their truncation marks are populated), so the two appends
        # only replay cheap anti-joins over pinned RDDs — overlap them
        # (guide §2.6). The self-signed path stays sequential: the sig
        # write is what materializes the shared shingle+sign truncation,
        # and racing two actions on the unmaterialized mark would
        # shingle the corpus twice.
        from data_spark.io import _run_concurrently  # noqa: PLC0415

        _run_concurrently(_write_sig, _write_buckets)
    else:
        _write_sig()
        _write_buckets()


def probe_near_dups(
    spark: SparkSession,
    index_path: str,
    probe_docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    signed: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Near-dup lookup for a probe batch against the indexed corpus:

    1. sign + bucket the probes (the only shingling this query does);
    2. collect the probes' distinct ``bucket_p`` values (bounded by
       |probe|·bands ints — metadata) and scan ONLY those bucket
       directories;
    3. equi-join on (band, bucket) → candidate (probe, index-doc)
       pairs, deduplicated;
    4. fetch candidate signatures (a join against the skinny signature
       table) and estimate Jaccard from matching minhash fraction.

    Returns (probe_id, index_doc_id, est_jaccard) with est_jaccard >=
    ``threshold``. Self-hits (same id) are excluded so a probe batch
    that was itself appended earlier reports only its OTHER dups.
    ``signed``: pre-computed (sig, buckets) for exactly ``probe_docs``
    (see ``signed_batch``) to skip re-shingling."""
    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    if signed is not None:
        sig, buckets = signed
    else:
        sig, buckets = _signed_buckets(probe_docs, meta, text_col, id_col)
    # sig is lazily truncated by _signed_buckets — the bucket collect
    # below materializes it; the rename projections need no extra copy
    psig = sig.withColumnRenamed("doc_id", "probe_id")
    pbuckets = truncate_lineage(buckets.withColumnRenamed("doc_id", "probe_id"))
    probed_dirs = [
        r["bucket_p"] for r in pbuckets.select("bucket_p").distinct().collect()
    ]
    # restore any partition a crashed compaction left missing (its
    # backups live OUTSIDE this root, so discovery never misparses them)
    recover_partitioned_root(os.path.join(index_path, "buckets"), restore_only=True)
    idx_buckets = spark.read.parquet(os.path.join(index_path, "buckets")).filter(
        F.col("bucket_p").isin(probed_dirs)
    )
    tomb = _tombstones(spark, index_path)
    if tomb is not None:
        idx_buckets = idx_buckets.join(tomb, "doc_id", "left_anti")
    cand = (
        pbuckets.join(
            idx_buckets.withColumnRenamed("doc_id", "index_doc_id"),
            ["band", "bucket"],
        )
        .filter(F.col("probe_id") != F.col("index_doc_id"))
        .select("probe_id", "index_doc_id")
        .dropDuplicates(["probe_id", "index_doc_id"])
    )
    isig = spark.read.parquet(os.path.join(index_path, "signatures")).select(
        F.col("doc_id").alias("index_doc_id"), F.col("sig").alias("isig")
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig"), F.col("isig"), lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / meta["num_hashes"]
    )
    return (
        cand.join(isig, "index_doc_id")
        .join(F.broadcast(psig), "probe_id")
        .select(
            "probe_id",
            "index_doc_id",
            F.round(est, 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Deletes: doc tombstones + probe-time anti-join + pruned compaction
# ---------------------------------------------------------------------------


def delete_from_minhash_index(ids: DataFrame, index_path: str, id_col: str = "doc_id") -> None:
    """O(|delete|) document removal (takedowns, recalled sources,
    re-curation): ids append into ``<index>/tombstones/``; probes
    anti-join them out immediately, ``compact_minhash_index`` reclaims
    the bucket rows later. The historical corpus is never re-shingled."""
    (
        ids.select(F.col(id_col).alias("doc_id"))
        .dropDuplicates()
        .write.mode("append")
        .parquet(os.path.join(index_path, "tombstones"))
    )


def _tombstones(spark: SparkSession, index_path: str) -> DataFrame | None:
    tp = os.path.join(index_path, "tombstones")
    if not os.path.isdir(tp):
        return None
    return spark.read.parquet(tp).dropDuplicates()


def compact_minhash_index(spark: SparkSession, index_path: str) -> dict:
    """Physically apply the tombstones: rewrite ONLY the ``bucket_p``
    directories that contain deleted docs (crash-safe staged swap per
    directory; the affected-dir list is one column-pruned semi-join),
    rewrite the skinny signature table, then clear the tombstones.
    O(affected dirs + signatures), never O(corpus text) — no shingling
    happens here.

    Staging/backup dirs live OUTSIDE the partitioned root (siblings of
    ``buckets/``) and leftovers are swept here and restored at probe
    time — a ``bucket_p=3__staging`` leftover INSIDE the root would be
    parsed by partition discovery as a partition value, flipping
    ``bucket_p`` to string and leaking stale rows (ADVICE r7)."""
    import shutil

    from data_spark.io import (
        partition_staging_dir,
        swap_partition_dir,
    )

    tp = os.path.join(index_path, "tombstones")
    buckets_root = os.path.join(index_path, "buckets")
    recover_partitioned_root(buckets_root)
    report = {"affected_dirs": 0, "dropped_dirs": 0, "tombstones": 0}
    if not os.path.isdir(tp):
        return report
    tomb = spark.read.parquet(tp).dropDuplicates().localCheckpoint(eager=True)
    report["tombstones"] = tomb.count()
    affected = [
        r["bucket_p"]
        for r in spark.read.parquet(buckets_root)
        .join(tomb, "doc_id", "left_semi")
        .select("bucket_p")
        .distinct()
        .collect()
    ]
    for p in affected:
        part_dir = os.path.join(buckets_root, f"bucket_p={p}")
        live = spark.read.parquet(part_dir).join(tomb, "doc_id", "left_anti")
        staging = partition_staging_dir(part_dir)
        live.write.mode("overwrite").parquet(staging)
        if spark.read.parquet(staging).isEmpty():
            shutil.rmtree(staging)
            shutil.rmtree(part_dir)
            report["dropped_dirs"] += 1
        else:
            swap_partition_dir(part_dir, staging)
    report["affected_dirs"] = len(affected)
    recover_partitioned_root(buckets_root)  # clear emptied maintenance roots

    # the signature table is unpartitioned — the ordinary staged table
    # swap applies (its backup naming lives beside sig_path, which is
    # not a partitioned root)
    from data_spark.io import _recover_table, _swap_table

    sig_path = os.path.join(index_path, "signatures")
    _recover_table(sig_path)
    live_sig = spark.read.parquet(sig_path).join(tomb, "doc_id", "left_anti")
    staging = f"{sig_path}__staging_{uuid.uuid4().hex[:8]}"
    live_sig.write.mode("overwrite").parquet(staging)
    _swap_table(sig_path, staging)
    shutil.rmtree(tp)
    return report
