"""Graph-algorithm gate queries (iterative — not SQL-expressible, so
these are rows-only driver checks; exactness is pytest-gated against
plain-Python reference iterations in tests/test_graph.py).

The graph is derived from the TPC-H-ish testdata: supplier→customer
edges wherever a supplier's lineitem belongs to a customer's order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_spark.graph.algorithms import connected_components, pagerank, triangle_count
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


@_q(
    "g_triangles",
    """
    WITH und AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS triangles
    FROM und e1
    JOIN und e2 ON e2.u = e1.v
    JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def g_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global triangle count over the part co-occurrence graph
    (parts sharing an order). The oracle counts id-ordered triangles
    (u < v < w); the engine uses degree-ordered orientation
    (graph/algorithms.triangle_count) — a different join order with a
    provably identical count, chosen because it bounds wedge fan-out by
    oriented out-degree (O(m^1.5) total) on skewed graphs."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return triangle_count(edges)


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


@_q(
    "g_clustering_coeff",
    """
    WITH und AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT u AS id FROM und UNION ALL SELECT v FROM und)
      GROUP BY id
    ), tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM und e1
      JOIN und e2 ON e2.u = e1.v
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ), per_node AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
      GROUP BY id
    )
    SELECT d.id, d.degree,
           COALESCE(p.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN 2.0 * COALESCE(p.n_triangles, 0) / (d.degree * (d.degree - 1))
                ELSE 0.0 END AS coeff
    FROM deg d LEFT JOIN per_node p ON d.id = p.id
    """,
)
def g_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient over the part
    co-occurrence graph (graph/algorithms.local_clustering). The oracle
    counts id-ordered triangles and attributes each to its three
    corners; the engine's degree-ordered orientation yields the same
    per-node counts with O(m^1.5) wedge work."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    from data_spark.graph.algorithms import local_clustering

    return local_clustering(edges)
