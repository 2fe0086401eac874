"""Lobbying filings pipeline (house/senate unified ``processed`` shape,
SURVEY §2.1 doc model + §2.8 explode patterns).

- ``explode_activities``: filings → ``_nested`` side table, one row per
  activity with the parent filing copied alongside
  (house…disclosures/main.py:396-413).
- ``explode_contributions``: same for contribution filings, with
  money-string parsing and multi-format date repair — including the
  reference's invalid-date fix (02/31 → last valid day of month,
  house…contributions/main.py:253-296).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_spark.functions.dates import parse_date_multi
from data_spark.functions.text import parse_amount


def explode_activities(filings: DataFrame) -> DataFrame:
    """One row per activity, parent filing columns duplicated (the
    reference's *_nested index)."""
    parent = [c for c in filings.columns if c != "activities"]
    return filings.select(*parent, F.explode("activities").alias("activity")).select(
        *parent,
        F.col("activity.lobbyist.id").alias("lobbyist_id"),
        F.col("activity.lobbyist.name").alias("lobbyist_name"),
        F.col("activity.covered_position").alias("covered_position"),
        F.col("activity.issue_area_code").alias("issue_area_code"),
        F.col("activity.specific_issues").alias("specific_issues"),
    )


def _repair_invalid_day(date_str: Column) -> Column:
    """The reference repairs day-overflow dates (02/31/2008) by walking
    the day down until it parses (house…contributions/main.py:254-255).
    Declaratively: clamp the day to the month's last day when the
    verbatim parse fails but the clamped one succeeds."""
    direct = parse_date_multi(date_str)
    m = F.regexp_extract(date_str, r"^(\d{1,2})/(\d{1,2})/(\d{4})$", 1)
    y = F.regexp_extract(date_str, r"^(\d{1,2})/(\d{1,2})/(\d{4})$", 3)
    first_of_month = F.try_to_date(F.concat_ws("-", y, m, F.lit("01")))
    clamped = F.last_day(first_of_month).cast("timestamp")
    return F.coalesce(direct, clamped)


def explode_contributions(filings: DataFrame) -> DataFrame:
    """One row per reported contribution with parsed amount and
    repaired date; parent registrant/filing columns duplicated."""
    parent = [c for c in filings.columns if c != "contributions"]
    rows = filings.select(*parent, F.explode("contributions").alias("c"))
    return rows.select(
        *parent,
        F.col("c.lobbyist.id").alias("lobbyist_id"),
        F.col("c.lobbyist.name").alias("lobbyist_name"),
        F.col("c.contribution_type").alias("contribution_type"),
        F.col("c.contributor_name").alias("contributor_name"),
        F.col("c.payee_name").alias("payee_name"),
        F.col("c.recipient_name").alias("recipient_name"),
        parse_amount(F.col("c.amount").cast("string")).alias("amount"),
        F.date_format(_repair_invalid_day(F.col("c.date")), "yyyy-MM-dd").alias("date"),
    )
