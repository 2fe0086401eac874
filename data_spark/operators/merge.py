"""MERGE / upsert emulation (SURVEY §2.1 S10, §2.9).

Vanilla OSS Spark has no writer-level MERGE for parquet, so the engine
implements the reference's two mutation idioms as set operations:

- ``merge_upsert``: ES ``update + doc_as_upsert`` / Cypher ``MERGE…SET``
  ⇒ latest-write-wins per key: union target+updates, rank by version,
  keep rank 1. One shuffle on the merge key.
- ``delete_then_insert``: FEC amendment handling — an amendment carries
  ``prev_file_num`` and replaces the prior filing
  (load_graph_expenditures/cypher.py:40-75: DETACH DELETE + re-MERGE)
  ⇒ anti-join the target against the amendment's prev-keys, then union
  the amendments in.

Writing back: pair with io.validated_overwrite for the staged-swap
pattern; at cluster scale this is the foreachBatch body of a streaming
MERGE sink (data_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Last-write-wins MERGE: rows from ``updates`` replace same-key rows
    in ``target``; unmatched update rows are inserted.

    If ``order_col`` is given, the greatest value wins overall (ties →
    update wins); otherwise updates always win.
    """
    tagged_t = target.withColumn("__src", F.lit(0))
    tagged_u = updates.withColumn("__src", F.lit(1))
    unioned = tagged_t.unionByName(tagged_u, allowMissingColumns=True)
    order = [F.desc("__src")] if order_col is None else [F.desc(order_col), F.desc("__src")]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def delete_then_insert(
    target: DataFrame,
    amendments: DataFrame,
    key: str = "file_num",
    prev_key: str = "prev_file_num",
) -> DataFrame:
    """Amendment semantics: drop target rows whose ``key`` appears as an
    amendment's ``prev_key``, then append the amendments."""
    prev_keys = amendments.select(F.col(prev_key).alias(key)).where(
        F.col(key).isNotNull()
    ).distinct()
    survivors = target.join(prev_keys, on=key, how="left_anti")
    return survivors.unionByName(amendments.drop(prev_key), allowMissingColumns=True)
