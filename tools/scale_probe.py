"""Scale probe: verify the dedup/ANN tier's cost grows sub-quadratically
in practice, not just in plan shape.

Two modes:

- ``python tools/scale_probe.py [multiplier] [sf_dir]`` — replicate the
  documents corpus N× and run the dedup stack on it: cost must scale
  with output-pair count, not corpus², and nothing cliffs (OOM /
  single-task collapse).
- ``python tools/scale_probe.py curve [query ...]`` — run registry
  queries at every available sf dir (sf0.001/sf0.01/sf0.1), time a WARM
  run of each (second execution, so Catalyst/codegen compile noise is
  excluded), and fit the scaling exponent b in t ≈ a·n^b by
  least-squares over log t vs log n. b < 2 on a 100× input range is the
  empirical sub-quadratic evidence for the LSH/IVF paths (an exact
  all-pairs op would show b → 2 as n² work dominates fixed overhead).

Prints one JSON line per operator/query.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from data_spark.operators.dedup import (  # noqa: E402
    exact_duplicate_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from data_spark.session import get_spark  # noqa: E402

#: table whose row count is the "n" of each curve query
_CURVE_DEFAULTS = {
    "d_ngram_jaccard": "documents",
    "d_minhash_lsh": "documents",
    "d_embed_near_dup_lsh": "embeddings",
    "v_ivf_topk": "embeddings",
    # ranking tier (round 3): the inverted-index joins must grow with
    # posting-list volume, not corpus²; PCA is one pass + O(d²) merge
    "d_tfidf_topterms": "documents",
    "d_bm25_search": "documents",
    "v_tfidf_cosine_pairs": "documents",
    "v_pca_project": "embeddings",
}


def curve(queries: list[str]) -> None:
    from data_spark.queries import QUERIES  # noqa: PLC0415

    sf_dirs = [
        d
        for d in (
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        )
        if os.path.isdir(d)
    ]
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in queries:
        n_table = _CURVE_DEFAULTS.get(name, "documents")
        points = []
        for sf_dir in sf_dirs:
            n = spark.read.parquet(f"{sf_dir}/{n_table}.parquet").count()
            fn = QUERIES[name]
            fn(spark, sf_dir).count()  # cold run: pay compile once
            start = time.perf_counter()
            rows = fn(spark, sf_dir).count()  # warm run is the datapoint
            points.append(
                {
                    "sf_dir": os.path.basename(sf_dir),
                    "n": n,
                    "rows_out": rows,
                    "warm_sec": round(time.perf_counter() - start, 4),
                }
            )
        # least-squares slope of log(t) vs log(n)
        xs = [math.log(p["n"]) for p in points]
        ys = [math.log(max(p["warm_sec"], 1e-4)) for p in points]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        print(
            json.dumps(
                {
                    "query": name,
                    "points": points,
                    "scaling_exponent": round(slope, 3),
                }
            ),
            flush=True,
        )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "curve":
        curve(sys.argv[2:] or list(_CURVE_DEFAULTS))
        return
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = base
    for i in range(1, mult):
        big = big.unionByName(base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000)))
    big = big.repartition(spark.sparkContext.defaultParallelism).cache()
    n = big.count()
    for name, fn in [
        ("exact", lambda df: exact_duplicate_groups(df)),
        ("minhash_lsh", lambda df: minhash_lsh_candidates(df)),
        ("ngram_jaccard", lambda df: ngram_jaccard_pairs(df, threshold=0.5)),
    ]:
        start = time.perf_counter()
        pairs = fn(big).count()
        print(
            json.dumps(
                {
                    "operator": name,
                    "docs": n,
                    "multiplier": mult,
                    "pairs": pairs,
                    "sec": round(time.perf_counter() - start, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
