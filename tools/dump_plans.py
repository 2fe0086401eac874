"""Dump ``explain("formatted")`` for registry queries to text files.

Usage: python tools/dump_plans.py <outdir> [sf_dir] [query ...]

One file per query: ``<outdir>/<query>.txt``. Queries with heavy
side-effecting construction (streaming drains, multi-commit pipelines)
still run their construction phase — plans reflect the RETURNED frame,
the same contract tools/plan_audit.py audits. Cache is cleared between
queries so a plan is what a fresh session would produce.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_spark.plans.report import explain_text  # noqa: E402
from data_spark.queries import QUERIES  # noqa: E402
from data_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    names = sys.argv[3:] or sorted(QUERIES)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.catalog.clearCache()
        try:
            text = explain_text(QUERIES[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - surfaced in the artifact
            text = f"ERROR {type(e).__name__}: {e}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(text)
        print(f"dumped {name}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
