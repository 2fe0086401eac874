"""Iterative graph algorithms on edge DataFrames.

The reference's graph side is Cypher queries over Neo4j (scans +
anti-patterns, graph/tables.py); ranking/centrality belongs to the same
surface but is iterative, so it cannot be a single SQL statement. Here
each iteration is declared as one join + one aggregation and the loop
runs on the driver — Catalyst plans every iteration, and lineage is
truncated periodically so planning cost stays O(1) per iteration instead
of growing with the unrolled loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over an edge list; returns (id, rank).

    Per iteration: contributions = links ⋈ ranks on the source id
    (links are pre-partitioned on that key and cached, so only the
    small ranks side shuffles), then one groupBy(dst) SUM — two
    shuffles per iteration, no driver-side data movement. Every
    ``checkpoint_every`` iterations the ranks DataFrame is
    ``localCheckpoint``-ed: without it the logical plan doubles per
    iteration and planning time eventually dwarfs execution.

    Simplified formulation (as in Spark's own PageRank example):
    rank = (1−d)/n + d·inflow; dangling-node mass is not redistributed.
    """
    verts = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .cache()
    )
    n = verts.count()
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    links = (
        edges.join(out_deg, src)
        .select(F.col(src).alias("id"), F.col(dst).alias("dst"), "deg")
        .repartition("id")
        .cache()
    )
    ranks = verts.select("id", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        inflow = (
            links.join(ranks, "id")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            verts.join(inflow.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components by iterative label propagation (min-id
    spreading); returns (id, component) where component is the smallest
    reachable vertex id.

    Each round every vertex adopts the minimum label among itself and
    its neighbors (one symmetric join + one MIN agg). Converges in
    O(graph diameter) rounds — the loop stops early when a round changes
    nothing, detected with a metadata-cheap count of changed labels.
    Lineage is truncated per round via localCheckpoint.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition("a")
        .cache()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.a == labels.id)
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Hitting the cap with labels still moving means components on
        # graphs with diameter > max_iterations would be silently split.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); raise max_iterations"
        )
    return labels
