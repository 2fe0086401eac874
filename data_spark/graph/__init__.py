"""Property-graph layer (SURVEY §2.1 S11/S12, §2.9 amendments).

The reference maintains a Neo4j graph via batched ``UNWIND … MERGE``
with per-label uniqueness constraints / composite node keys. Spark
restatement: the graph is two DataFrame tables —

  nodes(label, key, props…)  — ``key`` is the node-key struct/string
  edges(src_label, src_key, rel, dst_label, dst_key, props…)

maintained by MERGE-semantics upserts:
  - node identity = (label, node-key columns); last write wins on props
    (Cypher ``MERGE … SET``)
  - edge identity = (src, rel, dst [, edge-key]); ``ON CREATE SET``-only
    props (like the reference's uuid) are kept from the FIRST write

``fec`` in this package extracts the contribution graph (Candidate /
Committee / Donor / Contribution / Day nodes with the reference's node
keys) from the classified view layer.
"""

from data_spark.graph.tables import (
    GraphTables,
    upsert_edges,
    upsert_nodes,
)
from data_spark.graph.fec import contribution_graph

__all__ = ["GraphTables", "upsert_edges", "upsert_nodes", "contribution_graph"]
