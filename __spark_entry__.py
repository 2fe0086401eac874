"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full inventory from
``data_spark.queries`` for the sf0.01 DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_spark.queries import ORACLE, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-Q3-shaped join + agg + deterministic top-K
    (SURVEY §7.2 end-to-end slice: scan → filter → broadcast join →
    shuffle agg → top-K)."""
    return QUERIES["q3_top_orders"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (approximate operators are
    intentionally absent → rows-only check)."""
    return dict(ORACLE)
