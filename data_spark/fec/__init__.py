"""FEC relational-core pipeline (SURVEY §3.1), Spark-first.

The reference's BigQuery flow — 13 bulk-file loads → master-table build
(DISTINCT ∪ + date/zip repair) → 9-view classification layer →
per-row nested-document assembly — becomes one lazily-optimized
DataFrame DAG here:

- ``schemas``  — explicit StructTypes for the bulk files
- ``master``   — contributions22 / expenditures22 master builds
- ``views``    — the classification/edge view layer ending in
                 ``contributions_elastic``
- ``docs``     — nested document envelopes (row/processed/context) and
                 linkage array grouping
"""
