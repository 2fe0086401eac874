"""Scale probe: run the dedup/similarity stack on an N× replicated
documents corpus to verify cost scales with output-pair count, not
corpus², and nothing cliffs (OOM / single-task collapse).

Usage: python tools/scale_probe.py [multiplier] [sf_dir]
Prints one JSON line per operator: rows in, pairs out, seconds.
"""

from __future__ import annotations

import json
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


def main() -> None:
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
