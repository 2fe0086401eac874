"""Ingestion connectors (SURVEY §2.1 S13-S24).

The reference's REST/scrape sources are driver-side loops with cursor
state in Firestore. Here each pagination discipline is a resumable pure
iterator over an injectable ``fetch`` callable, with its cursor as a
plain dict that callers persist to a control table (small parquet) —
the Spark engine ingests whatever batches these yield via
``spark.createDataFrame`` and the incremental/merge sinks.

- ``pagination`` — keyset / page-number / deep-offset / count-resume /
  since-until timeline / opaque-token cursors
- ``xmlutil``   — XML quirk normalization (junk-prefix strip,
  singleton→list, key-pattern type coercion)
"""

from data_spark.sources.pagination import (
    keyset_pages,
    offset_pages,
    page_number_pages,
    timeline_pages,
    token_pages,
)
from data_spark.sources.xmlutil import coerce_by_key_pattern, ensure_list, strip_junk_prefix

__all__ = [
    "keyset_pages",
    "offset_pages",
    "page_number_pages",
    "timeline_pages",
    "token_pages",
    "coerce_by_key_pattern",
    "ensure_list",
    "strip_junk_prefix",
]
