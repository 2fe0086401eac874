"""Persistent ANN index lifecycle: build once, probe many.

``ivf_topk`` (similarity.py) trains and probes in one plan — right for
a gate query, wrong for production, where the expensive part (cell
assignment over the full corpus) should be PAID ONCE and reused by
every query batch. This module persists the IVF structure as two
parquet tables under one index directory:

    <index>/centroids/   — num_centroids tiny rows (cent_id, cent_v)
    <index>/cells/       — the corpus, hive-partitioned by cell=N

and probes it with a plan whose corpus scan is PARTITION-PRUNED to the
probed cells: the probe side collapses to a handful of cell ids, and
because ``cells/`` is partitioned on exactly that join key, Spark's
dynamic partition pruning (plus a static IN-filter we push explicitly)
reads only those directories. At 100 TB that is the difference between
an index probe and a table scan.

Same deterministic semantics as ``ivf_topk`` (cosine metric, lowest-id
default centroids, (sim DESC, id ASC) ordering), so a saved index
returns bit-identical results to the in-memory operator — asserted in
tests/test_ann_index.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.io import recover_partitioned_root
from data_spark.operators.similarity import cosine_similarity


def _nearest_cells(
    df: DataFrame, cents: DataFrame, key: str, vec: str, n: int
) -> DataFrame:
    sims = df.join(F.broadcast(cents)).select(
        key,
        vec,
        F.col("cent_id").alias("cell"),
        cosine_similarity(F.col(vec), F.col("cent_v")).alias("csim"),
    )
    w = Window.partitionBy(key).orderBy(F.desc("csim"), F.asc("cell"))
    return (
        sims.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn", "csim")
    )


def build_ivf_index(
    corpus: DataFrame,
    index_path: str,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> None:
    """Assign every corpus vector to its nearest centroid cell and
    persist (centroids table + cell-partitioned corpus). Default
    centroids are the deterministic lowest-id corpus vectors; pass a
    trained (cluster, cent) model for balanced cells."""
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    if centroids is not None:
        cents = centroids.select(
            F.col(centroids.columns[0]).alias("cent_id"),
            F.col(centroids.columns[1]).cast("array<double>").alias("cent_v"),
        )
    else:
        cents = (
            c.orderBy("cid")
            .limit(num_centroids)
            .select(F.col("cid").alias("cent_id"), F.col("cv").alias("cent_v"))
        )
    cents = cents.localCheckpoint(eager=True)  # one pass; reused by assignment
    cents.write.mode("overwrite").parquet(os.path.join(index_path, "centroids"))
    assigned = _nearest_cells(c, cents, "cid", "cv", 1)
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_path, "cells"))
    )


def ivf_index_topk(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a saved index: nearest ``nprobe`` cells per query against
    the tiny centroid table, then exact cosine rerank inside ONLY those
    cells. The probed cell ids are collected (≤ nprobe·num_centroids
    ints — index metadata, not data) and pushed as a partition filter,
    so the cells/ scan touches just the probed directories; the join
    itself then broadcasts the query side. Returns
    (qid, neighbor_id, rank) — bit-identical to ``ivf_topk`` with the
    same centroids."""
    cents = spark.read.parquet(os.path.join(index_path, "centroids"))
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    probes = _nearest_cells(q, cents, "qid", "qv", nprobe).select(
        "qid", "qv", "cell"
    )
    probes = probes.localCheckpoint(eager=True)
    probed_cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    # restore any partition a crashed compaction left missing (its
    # backups live OUTSIDE this root, so discovery never misparses them)
    recover_partitioned_root(os.path.join(index_path, "cells"), restore_only=True)
    cells = (
        spark.read.parquet(os.path.join(index_path, "cells"))
        # static partition filter from index METADATA (the collected ids
        # are bounded by nprobe·num_centroids, never corpus rows):
        # PartitionFilters prune the directory listing at plan time
        .filter(F.col("cell").isin(probed_cells))
    )
    cells = _anti_tombstones(spark, index_path, cells)
    cand = cells.join(F.broadcast(probes), "cell").select("qid", "qv", "cid", "cv")
    sims = cand.select(
        "qid", "cid", cosine_similarity(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("cid").alias("neighbor_id"), "rank")
    )


def append_to_ivf_index(
    delta: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign ONLY the delta vectors to
    their cells (broadcast against the saved centroid table) and append
    them into the existing cell partitions — O(|delta|), the corpus is
    never rescanned and untouched cell directories keep their files.
    Centroids are intentionally frozen (standard IVF practice: retrain
    offline when drift accumulates, then rebuild)."""
    spark = delta.sparkSession
    cents = spark.read.parquet(os.path.join(index_path, "centroids"))
    d = delta.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    assigned = _nearest_cells(d, cents, "cid", "cv", 1)
    (
        assigned.write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(index_path, "cells"))
    )


def _nearest_cells_l2(
    df: DataFrame, cents: DataFrame, key: str, vec: str, n: int
) -> DataFrame:
    """Nearest-``n`` cells by squared L2 — the metric PQ's ADC scoring
    uses, so cell probing and candidate scoring agree (the cosine
    variant above serves the cosine IVF index)."""
    from data_spark.operators.pq import _sqdist

    dists = df.join(F.broadcast(cents)).select(
        key,
        vec,
        F.col("cent_id").alias("cell"),
        _sqdist(F.col(vec), F.col("cent_v")).alias("cdist"),
    )
    w = Window.partitionBy(key).orderBy(F.asc("cdist"), F.asc("cell"))
    return (
        dists.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn", "cdist")
    )


def build_ivfpq_index(
    corpus: DataFrame,
    index_path: str,
    num_centroids: int = 8,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the full IVF-PQ structure — THE standard layout for
    billion-vector / 100 TB ANN (coarse cells bound the candidate set,
    PQ codes bound the bytes per candidate):

        <index>/centroids/  — num_centroids rows (cent_id, cent_v)
        <index>/codebooks/  — m·ksub rows (sub, code, cent)
        <index>/codes/      — (cid, sub, code) hive-partitioned by cell

    The corpus's RAW VECTORS ARE NOT STORED: each vector persists as m
    small-int codes inside its cell directory. Cells assign by squared
    L2 against the (default lowest-id) coarse centroids — the same
    metric ADC scoring uses. Codebooks train on the whole corpus
    (operators/pq.pq_fit, deterministic)."""
    from data_spark.operators.pq import pq_encode, pq_fit

    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    cents = (
        c.orderBy("cid")
        .limit(num_centroids)
        .select(F.col("cid").alias("cent_id"), F.col("cv").alias("cent_v"))
        .localCheckpoint(eager=True)
    )
    cents.write.mode("overwrite").parquet(os.path.join(index_path, "centroids"))

    codebooks = pq_fit(
        corpus, m=m, ksub=ksub, iterations=iterations, id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=True)
    codebooks.write.mode("overwrite").parquet(os.path.join(index_path, "codebooks"))

    assigned = _nearest_cells_l2(c, cents, "cid", "cv", 1).select("cid", "cell")
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    (
        codes.withColumnRenamed("id", "cid")
        .join(assigned, "cid")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_path, "codes"))
    )


def ivfpq_index_topk(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a saved IVF-PQ index: nearest ``nprobe`` cells per query
    (broadcast centroid table, L2), then ADC scoring over ONLY the
    probed cells' code partitions — the codes/ scan is partition-pruned
    by a static IN-filter built from index metadata, the per-query
    lookup table broadcasts, and the only data-proportional shuffle is
    the skinny (qid, cid) partial-sum aggregation with DECIMAL(38,12)
    accumulation. Raw vectors are never read (none are stored); compose
    with pq_shortlist_rerank against the source corpus for exact
    reranking. Returns (qid, neighbor_id, rank)."""
    from data_spark.operators.pq import _sqdist, _subvectors

    cents = spark.read.parquet(os.path.join(index_path, "centroids"))
    codebooks = spark.read.parquet(os.path.join(index_path, "codebooks"))
    mv = codebooks.agg(F.countDistinct("sub")).first()[0]
    dsub = len(codebooks.select("cent").first()[0])

    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    probes = _nearest_cells_l2(q, cents, "qid", "qv", nprobe).select("qid", "cell")
    probes = probes.localCheckpoint(eager=True)
    probed_cells = [r["cell"] for r in probes.select("cell").distinct().collect()]

    qsub = _subvectors(q, mv, dsub, "qid", "qv").withColumnRenamed("id", "qid")
    lut = qsub.join(F.broadcast(codebooks), "sub").select(
        "qid", "sub", "code", _sqdist(F.col("subv"), F.col("cent")).alias("dist")
    )
    recover_partitioned_root(os.path.join(index_path, "codes"), restore_only=True)
    codes = spark.read.parquet(os.path.join(index_path, "codes")).filter(
        F.col("cell").isin(probed_cells)
    )
    codes = _anti_tombstones(spark, index_path, codes)
    # restrict each query to ITS probed cells (the static filter above
    # prunes the union of all queries' cells at scan time)
    cand = codes.join(F.broadcast(probes), "cell")
    partial = (
        cand.join(F.broadcast(lut), ["qid", "sub", "code"])
        .groupBy("qid", "cid")
        .agg(F.sum(F.col("dist").cast("decimal(38,12)")).alias("adist"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adist"), F.asc("cid"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            F.col("cid").alias("neighbor_id"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def append_to_ivfpq_index(
    delta: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF-PQ maintenance: encode ONLY the delta against
    the saved codebooks, assign it to cells against the saved
    centroids, and append the new code rows into the cell partitions —
    O(|delta|), untouched cell directories keep their files. Both
    models are intentionally frozen (standard practice: retrain
    offline when drift accumulates, then rebuild)."""
    from data_spark.operators.pq import pq_encode

    spark = delta.sparkSession
    cents = spark.read.parquet(os.path.join(index_path, "centroids"))
    codebooks = spark.read.parquet(os.path.join(index_path, "codebooks"))
    d = delta.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    assigned = _nearest_cells_l2(d, cents, "cid", "cv", 1).select("cid", "cell")
    codes = pq_encode(delta, codebooks, id_col=id_col, vec_col=vec_col)
    (
        codes.withColumnRenamed("id", "cid")
        .join(assigned, "cid")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(index_path, "codes"))
    )


# ---------------------------------------------------------------------------
# Deletes: tombstones + probe-time anti-join + partition-pruned compaction
# ---------------------------------------------------------------------------


def delete_from_ann_index(ids: DataFrame, index_path: str, id_col: str = "vec_id") -> None:
    """O(|delete|) vector removal from a saved IVF or IVF-PQ index: the
    ids append into ``<index>/tombstones/`` and every probe anti-joins
    them out — no cell directory is touched (the index analogue of the
    versioned store's key tombstones). Schedule
    ``compact_ann_index`` to physically reclaim space; results are
    identical before and after."""
    (
        ids.select(F.col(id_col).alias("cid"))
        .dropDuplicates()
        .write.mode("append")
        .parquet(os.path.join(index_path, "tombstones"))
    )


def _anti_tombstones(spark: SparkSession, index_path: str, df: DataFrame) -> DataFrame:
    """Drop tombstoned ids from a candidate frame (no-op when the index
    has no tombstones — existing probe plans are unchanged)."""
    tp = os.path.join(index_path, "tombstones")
    if not os.path.isdir(tp):
        return df
    tomb = spark.read.parquet(tp).dropDuplicates()
    return df.join(tomb, "cid", "left_anti")


def compact_ann_index(spark: SparkSession, index_path: str, subdir: str) -> dict:
    """Physically apply an index's tombstones: find the cells that
    actually contain deleted ids (one column-pruned semi-join — the
    collected cell list is index metadata), rewrite ONLY those cell
    directories with the crash-safe staged swap, drop cells left empty,
    then clear the tombstones. Untouched cells keep their files, so the
    cost is O(affected cells), never O(index). ``subdir`` is "cells"
    for the IVF index and "codes" for IVF-PQ.

    Staging/backup dirs live OUTSIDE the partitioned root (siblings of
    ``subdir``) and leftovers are swept here and restored at probe
    time — a ``cell=3__staging`` leftover INSIDE the root would be
    parsed by partition discovery as a partition value, flipping the
    ``cell`` column to string and leaking stale rows (ADVICE r7).
    The whole compaction is idempotent until its final tombstone
    clear, so a crash at any point costs one redo."""
    import shutil

    from data_spark.io import (
        partition_staging_dir,
        recover_partitioned_root,
        swap_partition_dir,
    )

    tp = os.path.join(index_path, "tombstones")
    table_root = os.path.join(index_path, subdir)
    recover_partitioned_root(table_root)
    report = {"affected_cells": 0, "dropped_cells": 0, "tombstones": 0}
    if not os.path.isdir(tp):
        return report
    tomb = spark.read.parquet(tp).dropDuplicates().localCheckpoint(eager=True)
    report["tombstones"] = tomb.count()
    affected = [
        r["cell"]
        for r in spark.read.parquet(table_root)
        .join(tomb, "cid", "left_semi")
        .select("cell")
        .distinct()
        .collect()
    ]
    for cell in affected:
        cell_dir = os.path.join(table_root, f"cell={cell}")
        live = spark.read.parquet(cell_dir).join(tomb, "cid", "left_anti")
        staging = partition_staging_dir(cell_dir)
        live.write.mode("overwrite").parquet(staging)
        if spark.read.parquet(staging).isEmpty():
            shutil.rmtree(staging)
            shutil.rmtree(cell_dir)
            report["dropped_cells"] += 1
        else:
            swap_partition_dir(cell_dir, staging)
    report["affected_cells"] = len(affected)
    recover_partitioned_root(table_root)  # clear the emptied maintenance roots
    shutil.rmtree(tp)
    return report


def _bq_encode(
    vectors: DataFrame, id_col: str, vec_col: str, word_codes: bool
) -> DataFrame:
    from data_spark.operators.similarity import sign_bit_codes, sign_bit_words

    if word_codes:
        return sign_bit_words(vectors, id_col, vec_col).select(
            F.col(id_col).alias("cid"), "codes"
        )
    return sign_bit_codes(vectors, id_col, vec_col).select(
        F.col(id_col).alias("cid"), "code"
    )


def build_bq_index(
    corpus: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    word_codes: bool = False,
) -> None:
    """Persist sign-bit binary codes for the corpus — 8 bytes per
    vector, the memory-bound shortlist form (the third stored index
    family next to IVF cells and IVF-PQ codes). Probes scan codes, not
    vectors; the exact rerank joins back to wherever the full vectors
    live (they are NOT duplicated into the index).

    ``word_codes=True`` stores ``array<bigint>`` word codes
    (similarity.sign_bit_words) instead of one packed BIGINT —
    required beyond 64 dimensions (ceil(d/64)·8 bytes per vector);
    probes auto-detect the stored shape from the parquet schema."""
    _bq_encode(corpus, id_col, vec_col, word_codes).write.mode("overwrite").parquet(
        os.path.join(index_path, "bq_codes")
    )


def append_to_bq_index(
    new_vectors: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    word_codes: bool = False,
) -> None:
    """O(|new|) code append — the corpus is never re-encoded. The code
    shape (``word_codes``) must match the build; mixing shapes in one
    index would fail the probe's schema detection loudly."""
    _bq_encode(new_vectors, id_col, vec_col, word_codes).write.mode("append").parquet(
        os.path.join(index_path, "bq_codes")
    )


def bq_index_topk(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    shortlist: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage probe over the persisted codes: Hamming shortlist from
    ``bq_codes`` (tombstoned ids anti-joined like every other probe of
    this index family), exact integer-cosine rerank against ``corpus``.
    Same contract as similarity.bq_rerank_topk with the codes read from
    disk instead of recomputed."""
    from data_spark.operators.similarity import bq_rerank_topk

    codes = spark.read.parquet(os.path.join(index_path, "bq_codes"))
    codes = _anti_tombstones(spark, index_path, codes).withColumnRenamed(
        "cid", id_col
    )
    return bq_rerank_topk(
        corpus,
        queries,
        codes,
        k=k,
        shortlist=shortlist,
        id_col=id_col,
        vec_col=vec_col,
    )
