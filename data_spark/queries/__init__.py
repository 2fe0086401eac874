"""Driver-checked query inventory: name → callable(spark, sf_dir) →
DataFrame, plus the matching DuckDB oracle SQL (absent for approximate
operators, which are pytest-gated instead)."""

from data_spark.queries import documents, events, graphq, relational, relational2, vectors

QUERIES = {
    **relational.QUERIES,
    **relational2.QUERIES,
    **events.QUERIES,
    **documents.QUERIES,
    **vectors.QUERIES,
    **graphq.QUERIES,
}

ORACLE = {
    **relational.ORACLE,
    **relational2.ORACLE,
    **events.ORACLE,
    **documents.ORACLE,
    **vectors.ORACLE,
    **graphq.ORACLE,
}

__all__ = ["QUERIES", "ORACLE"]
