"""Interleaved A/B of registry queries between two code trees.

    python tools/ab_interleaved.py --a /tmp/wt_r13_base --b /root/repo \
        [--sf DIR] [--reps N] [--rounds K] query [query ...]

Alternates A and B subprocess runs of ``tools/profile_query.py`` (each a
fresh JVM) inside the same host window, so host drift hits both sides
equally (the r12 discipline; README "Bench environment variance").
Reports per side: min of the per-round min-warm values, plus every raw
round, and the first round's jobs/run. Output JSON on stdout.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys

LINE = re.compile(
    r"^(\S+)\s+cold=\s*([0-9.]+)\s+warm_min=\s*([0-9.]+)\s+"
    r"warm_med=\s*([0-9.]+)\s+jobs/run~(\d+)", re.M
)


def run_side(root: str, sf: str, reps: int, names: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "tools/profile_query.py", "--sf", sf, "--reps", str(reps)]
        + names,
        cwd=root, capture_output=True, text=True, timeout=3600,
    )
    res = {}
    for m in LINE.finditer(out.stdout):
        res[m.group(1)] = {
            "cold": float(m.group(2)), "warm_min": float(m.group(3)),
            "warm_med": float(m.group(4)), "jobs": int(m.group(5)),
        }
    if not res:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
    return res


def main() -> int:
    args = sys.argv[1:]
    a_root = b_root = None
    sf, reps, rounds = "/root/testdata/sf0.1", 3, 2
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--a":
            a_root = args[i + 1]; i += 2
        elif args[i] == "--b":
            b_root = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf = args[i + 1]; i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--rounds":
            rounds = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    assert a_root and b_root and names
    rounds_out = {"a": [], "b": []}
    for r in range(rounds):
        for side, root in (("a", a_root), ("b", b_root)):
            res = run_side(root, sf, reps, names)
            rounds_out[side].append(res)
            print(
                f"round {r} side {side}: "
                + " ".join(f"{n}={res.get(n, {}).get('warm_min')}" for n in names),
                file=sys.stderr,
            )
    summary = {}
    for n in names:
        s = {}
        for side in ("a", "b"):
            vals = [rr[n]["warm_min"] for rr in rounds_out[side] if n in rr]
            colds = [rr[n]["cold"] for rr in rounds_out[side] if n in rr]
            jobs = [rr[n]["jobs"] for rr in rounds_out[side] if n in rr]
            s[side] = {
                "warm_min": min(vals) if vals else None,
                "cold_min": min(colds) if colds else None,
                "jobs": jobs[0] if jobs else None,
                "raw": vals,
            }
        if s["a"]["warm_min"] and s["b"]["warm_min"]:
            s["speedup_warm"] = round(s["a"]["warm_min"] / s["b"]["warm_min"], 3)
        summary[n] = s
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
