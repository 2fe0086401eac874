"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir; compare row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_spark.session import get_spark  # noqa: E402
from __spark_entry__ import oracle_sql, queries  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], canon_rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(get_spark("correctness"), sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        # Driver-divergence guard: the driver canonicalizes via pandas,
        # where DuckDB HUGEINT/DECIMAL become float64 while Spark emits
        # int64/Decimal — a silent hash mismatch fetchall() masks — and
        # array/map/struct cells crash pandas sort_values outright
        # ("unhashable type: 'list'", the r2 driver-red class). Our
        # output convention is flat BIGINT/DOUBLE/VARCHAR only; enforce
        # it here so local green predicts driver green. Serialize
        # nested outputs with to_json in BOTH engines.
        risky = [
            f"{c}:{ty}" for c, ty in zip(dcols, dtypes)
            if ty == "HUGEINT"
            or ty.startswith("DECIMAL")
            or "[]" in ty
            or ty.startswith(("STRUCT", "MAP", "LIST", "JSON", "UNION"))
        ]
        risky += [
            f"{f.name}:{f.dataType.simpleString()}" for f in sdf.schema.fields
            if f.dataType.simpleString().startswith(
                ("decimal", "array", "map", "struct")
            )
        ]
        if risky:
            failures.append(name)
            print(f"FAIL {name}: driver-unsafe output types {risky} — cast to BIGINT/DOUBLE")
            continue
        sc, sk = frame_key(scols, srows)
        dc, dk = frame_key(dcols, drows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            continue
        if len(sk) != len(dk):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sk)} duck={len(dk)}")
            continue
        if sk != dk:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(sk, dk)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"   spark: {sk[bad][:300]}")
            print(f"   duck : {dk[bad][:300]}")
            continue
        print(f"ok   {name}: {len(sk)} rows hash-match")
    missing = sorted(only - set(qs)) if only else []
    for name in missing:
        print(f"FAIL {name}: not in registry")
    print(f"\n{ran - len(failures)}/{ran} pass"
          + (f" ({len(missing)} requested names missing)" if missing else ""))
    return 1 if failures or missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
