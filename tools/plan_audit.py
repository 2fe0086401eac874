"""Whole-inventory physical-plan audit: one JSON line per registry
query with the scale-relevant plan properties (exchange count, join
strategies, nested-loop presence, scan pushdown, codegen spans), plus a
summary line.

The Exchange-budget pytest pins ~70 queries one by one; this tool
sweeps ALL of them so a reviewer (or the next round's builder) can diff
the whole inventory's plan shape in one artifact:

    python tools/plan_audit.py [sf_dir] > PLAN_AUDIT.json

Nested-loop joins are the headline check: the sweep asserts none appear
outside the documented allowlist (tiny-lattice/1-row-scalar joins that
broadcast by construction — same list test_plans carries).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_spark.plans.report import (  # noqa: E402
    NESTED_LOOP_ALLOWED,
    UNPARTITIONED_WINDOW_ALLOWED,
    plan_report,
)
from data_spark.queries import QUERIES  # noqa: E402
from data_spark.session import get_spark  # noqa: E402

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = {}
    violations = []
    window_violations = []
    for name, fn in sorted(QUERIES.items()):
        # Each plan must be what a fresh session would produce: cached
        # frames left behind by an earlier query get substituted as
        # InMemoryRelation into structurally identical subtrees and
        # rewrite later queries' plans (VERDICT r5 #1).
        spark.catalog.clearCache()
        try:
            rep = plan_report(fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - surfaced in the artifact
            rows[name] = {"error": f"{type(e).__name__}: {e}"}
            violations.append(name)
            continue
        rep["pushed_filters"] = len(rep["pushed_filters"])
        rows[name] = rep
        if rep["nested_loop_joins"] and name not in NESTED_LOOP_ALLOWED:
            violations.append(name)
        if rep["unpartitioned_windows"] and name not in UNPARTITIONED_WINDOW_ALLOWED:
            window_violations.append(name)
    summary = {
        "n_queries": len(rows),
        "total_exchanges": sum(r.get("exchanges", 0) for r in rows.values()),
        "nested_loop_outside_allowlist": violations,
        "unpartitioned_window_outside_allowlist": window_violations,
        "queries": rows,
    }
    print(json.dumps(summary))
    return 1 if violations or window_violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
