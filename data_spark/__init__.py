"""data_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of codefordemocracy/data.

The reference system (surveyed in SURVEY.md) is a serverless ELT pipeline
whose query semantics live in BigQuery SQL, Elasticsearch DSL, Cypher and
Python glue. This package re-expresses all of it as idiomatic Spark:

- ``data_spark.session``   — tuned SparkSession builder
- ``data_spark.io``        — table readers / validated writers (SURVEY S3/S4)
- ``data_spark.functions`` — scalar function library (SURVEY §2.8)
- ``data_spark.operators`` — dedup / joins / merge / similarity / text ops
- ``data_spark.queries``   — the driver-checked query inventory
- ``data_spark.fec``       — FEC relational-core domain pipeline (SURVEY §3.1)
- ``data_spark.graph``     — node/edge table upsert layer (SURVEY §2.1 S11)
- ``data_spark.streaming`` — incremental / watermark patterns (SURVEY §2.9)
"""

__version__ = "0.1.0"
