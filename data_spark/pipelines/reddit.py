"""Reddit political-ads pipeline (reddit_ingest_get_ads/main.py:34-83).

Submissions carry their ad metadata as "Key: Value" lines inside HTML
selftext. The reference parses per-row in Python; here the whole parse
is column algebra:

  html → text (tag strip) → label fixups → line explode → key/value
  split → slugified keys → %m/%d/%Y|%m/%d/%y values normalized to ISO
  → map_from_entries per ad.

Output: (id, obj fields, processed map<string,string>).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_spark.functions.text import slugify_key


def _html_to_text(html: Column) -> Column:
    """Tag-strip + entity basics (the BeautifulSoup get_text stand-in
    for the reference's simple ad HTML)."""
    txt = F.regexp_replace(html, r"<br\s*/?>", "\n")
    txt = F.regexp_replace(txt, r"</p>", "\n")
    txt = F.regexp_replace(txt, r"<[^>]+>", "")
    txt = F.replace(txt, F.lit("&amp;"), F.lit("&"))
    txt = F.replace(txt, F.lit("&gt;"), F.lit(">"))
    return F.replace(txt, F.lit("&lt;"), F.lit("<"))


def _fixups(text: Column) -> Column:
    """The reference's literal label repairs (:47-52)."""
    t = F.replace(text, F.lit("Ad Buyer Information and Related Data:"), F.lit(""))
    t = F.replace(t, F.lit("Ad Duration:"), F.lit(""))
    t = F.replace(t, F.lit("Subreddits:\n\n"), F.lit("Subreddits:"))
    t = F.replace(t, F.lit("\nr/"), F.lit(", r/"))
    return F.replace(t, F.lit(":,"), F.lit(":"))


def _norm_value(v: Column) -> Column:
    """Values parseable as %m/%d/%Y or %m/%d/%y → 'YYYY-MM-DD'."""
    parsed = F.coalesce(
        F.try_to_timestamp(v, F.lit("M/d/yyyy")), F.try_to_timestamp(v, F.lit("M/d/yy"))
    )
    return F.when(parsed.isNotNull(), F.date_format(parsed, "yyyy-MM-dd")).otherwise(v)


def parse_ad_metadata(ads: DataFrame, id_col: str = "id", html_col: str = "selftext_html") -> DataFrame:
    """(id, processed map) per ad from its selftext HTML."""
    lines = ads.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(_fixups(_html_to_text(F.col(html_col))), "\n")
        ).alias("line"),
    ).filter(F.col("line").contains(": "))
    kv = lines.select(
        "id",
        slugify_key(F.split_part(F.col("line"), F.lit(": "), F.lit(1))).alias("key"),
        _norm_value(F.split_part(F.col("line"), F.lit(": "), F.lit(2))).alias("value"),
    ).filter(F.col("key") != "")
    return (
        kv.dropDuplicates(["id", "key"])
        .groupBy("id")
        .agg(F.map_from_entries(F.collect_list(F.struct("key", "value"))).alias("processed"))
    )
