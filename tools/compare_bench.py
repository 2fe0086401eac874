"""Round-over-round bench comparison: per-query warm/cold deltas
between two BENCH_r*.json files (or any two bench.py outputs).

    python tools/compare_bench.py BENCH_r03.json BENCH_r04.json

Prints queries present in both (sorted by warm delta, regressions
first), then adds/removals, then totals — the diff the verdict's
"Performance vs last round" section is built from. A warm regression
above 20% on a shared query is flagged so it can be triaged as compile
noise (cold moved too) vs a real plan change (warm moved alone).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[dict, dict]:
    with open(path) as f:
        d = json.load(f)
    if "tail" in d and "queries" not in d:
        # driver-recorded BENCH_r*.json: the bench stdout line is stored
        # TRUNCATED in "tail". Regex-recover "name": number pairs in
        # order; since queries_warm prints after queries, a later pair
        # overwrites the cold one and the dict converges to warm values
        # (cold-only for names whose warm half was cut off).
        import re

        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', d["tail"])
        vals = {k: float(v) for k, v in pairs if k not in ("reps", "sf")}
        vals.pop("value", None)
        vals.pop("warm_total", None)
        return vals, vals
    # r1/r2 benches were single-run (no queries_warm): fall back to the
    # cold column so old rounds still compare
    return d.get("queries", {}), d.get("queries_warm", d.get("queries", {}))


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    cold_a, warm_a = load(sys.argv[1])
    cold_b, warm_b = load(sys.argv[2])
    shared = sorted(set(warm_a) & set(warm_b), key=lambda q: warm_a[q] - warm_b[q])
    flagged = []
    print(f"{'query':32s} {'warm_a':>8s} {'warm_b':>8s} {'delta':>8s} {'cold_b':>8s}")
    for q in shared:
        da = warm_b[q] - warm_a[q]
        mark = ""
        if warm_a[q] > 0.2 and da > max(0.2 * warm_a[q], 0.25):
            mark = "  <-- regression"
            flagged.append(q)
        print(
            f"{q:32s} {warm_a[q]:8.3f} {warm_b[q]:8.3f} {da:+8.3f}"
            f" {cold_b.get(q, float('nan')):8.3f}{mark}"
        )
    added = sorted(set(warm_b) - set(warm_a))
    removed = sorted(set(warm_a) - set(warm_b))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    ta = sum(warm_a[q] for q in shared)
    tb = sum(warm_b[q] for q in shared)
    print(
        f"shared warm total: {ta:.2f}s -> {tb:.2f}s "
        f"({(tb - ta) / ta * 100 if ta else 0:+.1f}%) over {len(shared)} queries"
    )
    if flagged:
        print(f"regressions: {flagged}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
