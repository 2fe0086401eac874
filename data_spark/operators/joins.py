"""Join operators beyond vanilla equi-joins (SURVEY §2.3).

``suffix_containment_join`` is the engine-level rewrite SURVEY §4 calls
for: the reference matches Domain nodes to Sources where
``host = domain OR host ENDS WITH '.'+domain``
(news_sources_compute_merge_domains/cypher.py:13-20). Naively that is a
nested-loop theta join — O(hosts × domains). The rewrite explodes each
host into its dot-suffix chain (``a.b.c`` → [``a.b.c``, ``b.c``, ``c``])
and equi-joins on the suffix, which Spark executes as a hash join:
linear, shuffle-partitioned, broadcast-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname, including itself."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )


def suffix_containment_join(
    hosts: DataFrame,
    domains: DataFrame,
    host_col: str = "host",
    domain_col: str = "domain",
    how: str = "inner",
) -> DataFrame:
    """Join hosts to domains on exact-or-subdomain match via
    suffix-explosion equi-join. Output keeps all host columns plus the
    matched ``domain_col``."""
    exploded = hosts.withColumn("__suffix", F.explode(dot_suffixes(F.col(host_col))))
    joined = exploded.join(
        domains, exploded["__suffix"] == domains[domain_col], how
    ).drop("__suffix")
    return joined


def anti_join(df: DataFrame, done: DataFrame, on: str | list[str]) -> DataFrame:
    """New-rows-only anti-join (SURVEY J3: the incremental `LEFT JOIN
    loaded_x WHERE b.id IS NULL` pattern)."""
    return df.join(done, on=on, how="left_anti")


def semi_join(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """Key-set membership (SURVEY J8: es.exists probes, batched)."""
    return df.join(keys, on=on, how="left_semi")
