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
