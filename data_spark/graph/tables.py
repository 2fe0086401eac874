"""Node/edge table upserts with Cypher-MERGE semantics.

Node keys are whatever column list the label declares (composite keys
like Donor (name, zip_code) or Message (sha512, simhash) are just
multi-column dedup keys — SURVEY §7.4 risk 7). All upserts are one
shuffle on the key columns; batching (the reference's 1000-row UNWIND
transactions) is obsolete because the whole batch is a DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_nodes(
    existing: DataFrame | None,
    updates: DataFrame,
    key_cols: list[str],
    on_create_only: list[str] | None = None,
) -> DataFrame:
    """MERGE-node semantics: identity on ``key_cols``; newest write wins
    for props (``SET``), except ``on_create_only`` columns which keep
    their first-written value (``ON CREATE SET``)."""
    tagged_new = updates.withColumn("__gen", F.lit(1))
    if existing is None:
        unioned = tagged_new
    else:
        unioned = existing.withColumn("__gen", F.lit(0)).unionByName(
            tagged_new, allowMissingColumns=True
        )
    w = Window.partitionBy(*key_cols).orderBy(F.desc("__gen"))
    w_first = Window.partitionBy(*key_cols).orderBy(F.asc("__gen"))
    ranked = unioned.withColumn("__rn", F.row_number().over(w))
    for col in on_create_only or []:
        ranked = ranked.withColumn(col, F.first(col, ignorenulls=True).over(w_first))
    return ranked.filter(F.col("__rn") == 1).drop("__rn", "__gen")


def upsert_edges(
    existing: DataFrame | None,
    updates: DataFrame,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE-edge semantics: identity on the endpoint/rel columns
    (default: src_label, src_key, rel, dst_label, dst_key); newest write
    wins."""
    key_cols = key_cols or ["src_label", "src_key", "rel", "dst_label", "dst_key"]
    return upsert_nodes(existing, updates, key_cols)


@dataclass
class GraphTables:
    """A property graph as two DataFrames + its key registry."""

    nodes: DataFrame
    edges: DataFrame

    def merge(self, other: "GraphTables", node_keys: list[str], edge_keys: list[str] | None = None) -> "GraphTables":
        return GraphTables(
            nodes=upsert_nodes(self.nodes, other.nodes, node_keys),
            edges=upsert_edges(self.edges, other.edges, edge_keys),
        )


def anti_pattern_scan(
    nodes: DataFrame, edges: DataFrame, node_label: str, rel: str, limit: int | None = None
) -> DataFrame:
    """Graph anti-pattern (SURVEY S12/J7): nodes of ``node_label`` with
    no outgoing ``rel`` edge — `MATCH (a:X) WHERE NOT (a)-[:R]->() …` as
    a left_anti join against the edge table."""
    src = nodes.filter(F.col("label") == node_label)
    linked = edges.filter(F.col("rel") == rel).select(
        F.col("src_key").alias("key"), F.col("src_label").alias("label")
    )
    out = src.join(linked, on=["key", "label"], how="left_anti")
    return out.limit(limit) if limit else out
