"""Embedding clustering operators: distributed Lloyd's k-means and
SemDeDup-style cluster-scoped semantic deduplication.

Both are pure DataFrame algebra (zip_with/aggregate dot products inside
codegen — no Python touches a vector). K-means is iterative like
graph.algorithms.pagerank: each Lloyd round is one broadcast join + two
aggregations, the loop runs on the driver, and centroid lineage is
truncated per round so planning cost stays O(1) per iteration.

Determinism: initialization is the k lowest-id vectors (no RNG), mean
updates use exact decimal accumulation, and argmin ties break on the
lower cluster id — the whole fit is a pure function of the input, so
tests can assert exact assignments against a plain-Python mirror.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.plans.lineage import truncate_lineage


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, cluster) nearest-centroid assignment: broadcast the k
    centroids against the corpus, argmin of squared L2 with lower
    cluster id breaking ties. Work is O(N·k·dim) inside codegen; the
    only shuffle is the per-id argmin (skinny: id, cluster, dist)."""
    scored = vecs.join(F.broadcast(centroids)).select(
        "id", "cluster", _sqdist(F.col("v"), F.col("cent")).alias("dist")
    )
    w = Window.partitionBy("id").orderBy(F.asc("dist"), F.asc("cluster"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", "cluster")
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over an array<float|double> column; returns the
    model as a DataFrame (cluster INT, cent array<double>).

    Per round: assignment (broadcast centroids, see :func:`_assign`),
    then the mean update as posexplode → groupBy(cluster, i) with
    map-side partial sums → one collect_list per cluster to rebuild the
    centroid arrays. Nothing proportional to N ever reaches the driver;
    the centroid table (k·dim values) is localCheckpoint-ed per round to
    truncate lineage. Empty clusters keep their previous centroid (the
    standard Lloyd fallback, and what keeps the model row count at k).

    Means accumulate in DECIMAL(38,9) and divide by count — exact and
    order-independent, so the fit is bit-reproducible across runs and
    partitionings.
    """
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).cache()
    centroids = (
        vecs.orderBy("id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("id")) - 1).alias("cluster"),
            F.col("v").alias("cent"),
        )
        .transform(truncate_lineage)
    )
    for _ in range(iterations):
        assigned = _assign(vecs, centroids)
        sums = (
            assigned.join(vecs, "id")
            .select("cluster", F.posexplode("v").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
        )
        new_cents = sums.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s.m
            ).alias("cent")
        )
        centroids = (
            centroids.select("cluster", F.col("cent").alias("prev"))
            .join(new_cents, "cluster", "left")
            .select("cluster", F.coalesce("cent", "prev").alias("cent"))
            # eager on the last round: the lazy marks must cascade while
            # the vecs cache is still alive
            .transform(lambda d, e=(_ == iterations - 1): truncate_lineage(d, eager=e))
        )
    # centroids materialized by the last round's eager truncate; free the
    # cached corpus so blocks don't accumulate across queries in a
    # long-lived session.
    vecs.unpersist()
    return centroids


def kmeans_predict(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) assignment of a corpus against a fitted model."""
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    return _assign(vecs, centroids)


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means partitions the
    corpus, then near-duplicate pairs (cosine ≥ threshold) are found
    ONLY within each cluster, and for every qualifying pair the larger
    id is marked dropped. Returns (id, cluster, keep BOOLEAN).

    This is the scale answer to exact embedding dedup's O(N²): the
    pairwise pass runs per cluster (Σ|cluster|² ≪ N² for balanced k),
    and the cluster self-join is an equi-join on the cluster id — hash
    join, no nested loop. Recall is bounded by clustering quality
    (near-dups split across clusters are missed) — the standard
    SemDeDup trade-off; raise k for speed, lower it for recall.

    The drop rule (larger id of any qualifying pair) is the greedy
    SemDeDup convention: deterministic, one anti-join, no iteration;
    min-id representatives of each duplicate neighborhood survive.
    """
    centroids = kmeans_fit(df, k, iterations, id_col, vec_col)
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    assigned = kmeans_predict(df, centroids, id_col, vec_col).join(vecs, "id")
    norms = assigned.select(
        "cluster", "id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("n")
    )
    a = norms.select(
        "cluster",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = norms.select(
        "cluster",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            _dot(F.col("va"), F.col("vb"))
            >= F.lit(threshold) * F.col("na") * F.col("nb")
        )
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        norms.select("id", "cluster")
        .join(dropped.withColumn("__drop", F.lit(True)), "id", "left")
        .select("id", "cluster", F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"))
    )
