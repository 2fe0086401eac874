"""Graph-algorithm gate queries (iterative — not SQL-expressible, so
these are rows-only driver checks; exactness is pytest-gated against
plain-Python reference iterations in tests/test_graph.py).

The graph is derived from the TPC-H-ish testdata: supplier→customer
edges wherever a supplier's lineitem belongs to a customer's order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_spark.graph.algorithms import connected_components, pagerank
from data_spark.queries.common import t

QUERIES = {}
ORACLE = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _supplier_customer_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )


@_q("g_pagerank")  # iterative — pytest oracle (tests/test_graph.py)
def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier→customer graph (6 iterations, two
    shuffles each, lineage truncated every 3). Rank values excluded from
    hashing anyway (rows-only check); determinism of the row set = the
    vertex set."""
    edges = _supplier_customer_edges(spark, sf_dir)
    return pagerank(edges, iterations=6)


@_q("g_components")  # iterative — pytest oracle (tests/test_graph.py)
def g_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (min-label propagation with early stop) of
    the same derived graph, summarized as component sizes."""
    edges = _supplier_customer_edges(spark, sf_dir)
    return (
        connected_components(edges)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
