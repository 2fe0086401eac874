"""Plan-level surface: SQL catalog/view layering and physical-plan
introspection.

- ``catalog``: temp-view registration for the testdata tables and the
  FEC view cascade, so the whole engine is reachable through
  ``spark.sql`` text as well as the DataFrame API (the reference's
  BigQuery view layer, SURVEY §2.1).
- ``report``: structured physical-plan inspection (broadcasts, pushed
  filters, exchange counts) backing the plan audits in tests and ad-hoc
  "is this the plan I want" checks.
"""

from data_spark.plans.catalog import register_fec_views, register_testdata_views, sql
from data_spark.plans.report import plan_report

__all__ = ["register_fec_views", "register_testdata_views", "sql", "plan_report"]
