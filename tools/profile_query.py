"""Time individual registry queries in isolation (guide §1).

Usage: python tools/profile_query.py [--sf DIR] [--reps N] [--noop] query [query ...]

Per query: cold run + (reps-1) warm runs, reporting cold / min-warm /
median-warm, timed with the same count() action bench.py uses — or the
noop sink with ``--noop`` (computes every column, guide §1.4). Also
reports the number of Spark jobs the FIRST run scheduled (statusTracker
delta) so fixed per-job overhead is visible next to the seconds.
"""

from __future__ import annotations

import statistics
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_spark.queries import QUERIES  # noqa: E402
from data_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir, reps, noop = "/root/testdata/sf0.1", 5, False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif a == "--noop":
            noop = True
            i += 1
        else:
            names.append(a)
            i += 1
    spark = get_spark("profile", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup bench.py performs so numbers are comparable
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    def run(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return time.perf_counter() - t0

    tracker = spark.sparkContext.statusTracker()

    def max_job_id() -> int:
        # Job ids are a GLOBAL sequence; the max id seen in the default
        # group tracks it whenever the latest action ran group-less.
        # Counting len(getJobIdsForGroup(None)) instead (the r12 tool)
        # silently EXCLUDED jobs that carry a job group — Structured
        # Streaming tags every foreachBatch job with one, so streaming
        # gates undercounted, and a driver-thread change that drops the
        # group (threads don't inherit it) showed up as "+12 jobs" when
        # total work was unchanged (r13, pipe_stream_cdf_e2e 64->76
        # group-None jobs vs 79->78 total).
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        j0 = max_job_id()
        runs = [run(fn) for _ in range(reps)]
        j1 = max_job_id()
        warm = runs[1:] or runs
        print(
            f"{name:32s} cold={runs[0]:7.3f}  warm_min={min(warm):7.3f}  "
            f"warm_med={statistics.median(warm):7.3f}  jobs/run~{(j1 - j0) // reps}"
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
