"""Scale probe for the round-7 delete machinery: the O() claims as
measurements, not assertions (the SCALE_PROBE_r05 discipline).

For store histories spanning two orders of magnitude (default 50k /
500k / 5M rows, all synthetic in-Spark, nothing persisted outside
/tmp), measure WARM wall-clock of:

- ``delete_versioned`` of a FIXED 1,000-key tombstone — claimed
  O(tombstone): the exponent over history size should be ~0;
- one ``cdc_stream_sink``-shaped batch apply (newest-per-key reduce +
  tombstone + append of a FIXED 1,000-event batch) — claimed O(batch);
- the merge-on-read full read AFTER the delete — expected O(history)
  (it is a scan; the claim is only that deletes don't make it worse
  than a scan: read_after/read_before should stay ~1);
- ``purge_deletes`` — O(covered commits); with the fixed-size history
  split into 4 commits and tombstone keys drawn from ONE commit's key
  range, covered data is history/4 and the exponent tracks that.

Prints one JSON line per mode, then a summary with fitted exponents
(least-squares slope of log t vs log n).

    python tools/probe_deletes.py [n n n ...] > SCALE_PROBE_r07.json
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from data_spark.io import (  # noqa: E402
    delete_versioned,
    purge_deletes,
    read_versioned,
    write_versioned,
)
from data_spark.session import get_spark  # noqa: E402


def _fit_exponent(points: list[tuple[int, float]]) -> float:
    xs = [math.log(n) for n, _ in points]
    ys = [math.log(max(t, 1e-6)) for _, t in points]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return round(num / den, 3)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [50_000, 500_000, 5_000_000]
    spark = get_spark("probe_deletes")
    rows = []
    for n in ns:
        base = tempfile.mkdtemp(prefix=f"probe_del_{n}_")
        table = os.path.join(base, "t")
        # history in 4 commits, keys 0..n-1, deterministic payloads
        quarter = n // 4
        for i in range(4):
            df = (
                spark.range(i * quarter, (i + 1) * quarter)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") % 97).cast("double").alias("x"),
                )
            )
            write_versioned(df, table, "overwrite" if i == 0 else "append")
        t0 = time.time()
        read_versioned(spark, table).count()
        read_before = time.time() - t0

        # fixed 1k-key tombstone drawn from commit 0's range
        tomb = spark.range(0, 1000).select((F.col("id") * (quarter // 1000)).alias("k"))
        t0 = time.time()
        delete_versioned(tomb, table)
        delete_sec = time.time() - t0

        t0 = time.time()
        n_after = read_versioned(spark, table).count()
        read_after = time.time() - t0
        assert n_after < n

        # fixed 1k-event CDC batch (LWW reduce + tombstone + append)
        batch = spark.range(0, 1000).select(
            (F.col("id") + n).alias("k"),
            F.lit(1.0).alias("x"),
            F.lit("I").alias("op"),
            F.col("id").alias("seq"),
        )
        t0 = time.time()
        w = Window.partitionBy("k").orderBy(F.desc("seq"))
        latest = (
            batch.withColumn("__rk", F.row_number().over(w))
            .filter("__rk = 1")
            .drop("__rk")
        )
        delete_versioned(latest.select("k"), table)
        write_versioned(
            latest.filter("op <> 'D'").select("k", "x"), table, "append"
        )
        cdc_batch_sec = time.time() - t0

        t0 = time.time()
        purge_deletes(spark, table)
        purge_sec = time.time() - t0
        t0 = time.time()
        read_versioned(spark, table).count()
        read_purged = time.time() - t0

        row = {
            "n_history": n,
            "read_before_sec": round(read_before, 4),
            "delete_1k_sec": round(delete_sec, 4),
            "read_after_delete_sec": round(read_after, 4),
            "cdc_batch_1k_sec": round(cdc_batch_sec, 4),
            "purge_sec": round(purge_sec, 4),
            "read_after_purge_sec": round(read_purged, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(base, ignore_errors=True)

    summary = {
        "mode": "summary",
        "delete_exponent": _fit_exponent(
            [(r["n_history"], r["delete_1k_sec"]) for r in rows]
        ),
        "cdc_batch_exponent": _fit_exponent(
            [(r["n_history"], r["cdc_batch_1k_sec"]) for r in rows]
        ),
        "purge_exponent": _fit_exponent(
            [(r["n_history"], r["purge_sec"]) for r in rows]
        ),
        "mor_read_overhead": round(
            sum(r["read_after_delete_sec"] for r in rows)
            / max(sum(r["read_before_sec"] for r in rows), 1e-9),
            3,
        ),
        "claims": "delete/cdc ~O(1) in history (exponent ~0); purge tracks "
        "covered commits; merge-on-read read ~= plain read",
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
