"""Shared helpers for the driver-checked query inventory.

Cross-engine determinism rules (Spark result must hash-equal the DuckDB
oracle, SURVEY §7.4 risk 3):

- **Sums of doubles** are order-dependent; both sides cast to
  DECIMAL(38,6) before SUM (exact, associative) and back to DOUBLE after.
- **Averages** = decimal-sum cast to double, divided by count (identical
  double operands ⇒ identical result).
- **Timestamps** are emitted as 'yyyy-MM-dd HH:mm:ss' strings (session tz
  is pinned to UTC; DuckDB timestamps are naive UTC).
- **LIMIT queries** always carry a unique tiebreak column so the selected
  set is engine-independent.
- **ROUND(double, 6) is for absorbing cross-engine DRIFT only** (sums
  the engines may reassociate). Never apply it to a quotient whose
  operands are already identical cross-engine: when the true value is
  decimal-exact at 7 digits ending in 5 (common for
  decimal_sum / small_count), Spark rounds the double's SHORTEST DECIMAL
  REPR half-up while DuckDB rounds the BINARY value — they split
  (measured: round(1.0391555, 6) → 1.039156 vs 1.039155). Identical
  operands → identical IEEE quotient → emit it UNROUNDED.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_spark.io import read_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def table_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count of a base table for SIZING decisions (partition
    counts, batch limits): parquet footer metadata when readable — no
    Spark job — else a count job. Equal to ``t(...).count()`` by the
    parquet contract (footer num_rows is exact)."""
    import os  # noqa: PLC0415

    from data_spark.io import _footer_row_count  # noqa: PLC0415

    n = _footer_row_count(os.path.join(sf_dir, f"{name}.parquet"))
    return n if n is not None else t(spark, sf_dir, name).count()


def dsum(col: Column) -> Column:
    """Order-independent SUM over doubles (exact decimal accumulation)."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def davg(col: Column) -> Column:
    """Order-independent AVG over doubles."""
    return dsum(col) / F.count(col)


def ts_str(col: Column) -> Column:
    """Timestamp → canonical string (UTC wall clock)."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# DuckDB-side equivalents (format with .format(expr=...)).
SQL_DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
SQL_DAVG = "(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}))"
SQL_TS = "strftime({expr}, '%Y-%m-%d %H:%M:%S')"


def stage_era_files(
    df: DataFrame, ts_col: str, eras: list, src_dir: str, staged: str
) -> None:
    """Stage ``df`` as ONE parquet file per time era under ``src_dir``
    (``era<i>.parquet``, mtimes forced ascending so a file stream
    replays them in event order) with a single partitioned write
    instead of one filtered scan+write per era (guide §1.2/§2.4).

    ``eras`` is the [lo, hi) list the per-era filters used; they tile
    the whole domain, so assignment is the chain of upper bounds with
    the last era as the catch-all — row-for-row identical to the
    original filters. ``partitionBy`` drops the helper column, so each
    staged file keeps ``df``'s schema; ``coalesce(1)`` keeps the
    one-file-per-era layout ``maxFilesPerTrigger=1`` relies on. An era
    with no rows still publishes an (empty, schema-carrying) file —
    exactly what its filtered write produced — so the stream's batch
    structure is unchanged."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    n = len(eras)
    w = F.when(F.col(ts_col) < F.lit(eras[0][1]), 0)
    for i in range(1, n - 1):
        w = w.when(F.col(ts_col) < F.lit(eras[i][1]), i)
    era_col = w.otherwise(n - 1)
    (
        df.withColumn("__era", era_col)
        .coalesce(1)
        .write.partitionBy("__era")
        .mode("overwrite")
        .parquet(staged)
    )
    empty_part = None
    for i in range(n):
        part_dir = os.path.join(staged, f"__era={i}")
        if os.path.isdir(part_dir):
            src_file = os.path.join(
                part_dir,
                next(p for p in os.listdir(part_dir) if p.endswith(".parquet")),
            )
        else:
            if empty_part is None:
                ep_dir = os.path.join(staged, "__empty")
                df.limit(0).coalesce(1).write.mode("overwrite").parquet(ep_dir)
                empty_part = os.path.join(
                    ep_dir,
                    next(
                        p for p in os.listdir(ep_dir) if p.endswith(".parquet")
                    ),
                )
            src_file = empty_part
        dst = os.path.join(src_dir, f"era{i}.parquet")
        shutil.copy(src_file, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def run_scratch_dir(prefix: str, sf_dir: str, max_age_s: int = 1800) -> str:
    """Per-RUN scratch directory for gate queries that materialize a
    versioned store on local disk (m_*, pipe_*, schema-evolution).

    Keyed on (prefix, hash(sf_dir)) like before, but with a unique
    run-<uuid> leaf so two concurrent executions over the same SF (the
    driver's correctness gate racing a local bench) can never rmtree or
    overwrite each other's live store. Stale sibling runs older than
    ``max_age_s`` are garbage-collected best-effort — a gate query runs
    in seconds, so a 30-minute horizon can only ever reap abandoned
    runs, never a live one.
    """
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415
    import time  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    parent = os.path.join(tempfile.gettempdir(), f"data_spark_{prefix}_{tag}")
    os.makedirs(parent, exist_ok=True)
    now = time.time()
    for name in os.listdir(parent):
        p = os.path.join(parent, name)
        try:
            if now - os.path.getmtime(p) > max_age_s:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    return os.path.join(parent, f"run-{uuid.uuid4().hex[:12]}")
