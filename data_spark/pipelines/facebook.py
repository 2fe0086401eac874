"""Facebook ads pipeline (facebook_compute_load_graph/main.py:62-186).

Ad docs → ads (decomposed timestamps, bounds; spend only for USD),
creation/delivery Day rows (US-Eastern; delivery expanded one row per
day in [start, stop]), message identities (sha512 + simhash of the
creative body — the graph's composite Message node key), page nodes,
and region explode. The reference's two-format timestamp try/except
becomes a coalesce of try_to_timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_spark.functions.dates import day_range
from data_spark.functions.hashing import sha512_hex, simhash64


def _parse_ts(col: Column) -> Column:
    """'%Y-%m-%dT%H:%M:%S%z' falling back to bare '%Y-%m-%d'."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ssZ")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
    )


def _decomposed(ts: Column) -> Column:
    return F.struct(
        F.year(ts).alias("year"), F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"), F.hour(ts).alias("hour"),
        F.minute(ts).alias("minute"),
    )


def parse_ads(docs: DataFrame) -> dict[str, DataFrame]:
    """Flatten ad docs into ads / creation_days / delivery_days /
    messages / pages / regions."""
    o = docs.select(F.col("obj.*"))
    creation = _parse_ts(F.col("ad_creation_time"))
    start = _parse_ts(F.col("ad_delivery_start_time"))
    stop = _parse_ts(F.col("ad_delivery_stop_time"))
    usd = F.col("currency") == "USD"
    ads = o.select(
        F.col("id"),
        _decomposed(creation).alias("creation_time"),
        _decomposed(start).alias("delivery_start_time"),
        F.when(stop.isNotNull(), _decomposed(stop)).alias("delivery_stop_time"),
        F.col("impressions.lower_bound").alias("impressions_lower_bound"),
        F.col("impressions.upper_bound").alias("impressions_upper_bound"),
        F.when(usd, F.col("spend.lower_bound")).alias("spend_lower_bound"),
        F.when(usd, F.col("spend.upper_bound")).alias("spend_upper_bound"),
        F.col("potential_reach.lower_bound").alias("potential_reach_lower_bound"),
        F.col("potential_reach.upper_bound").alias("potential_reach_upper_bound"),
        F.col("ad_creative_link_caption").alias("creative_link_caption"),
    )
    est = F.from_utc_timestamp(creation, "America/New_York")
    creation_days = o.select(
        "id",
        F.year(est).alias("year"), F.month(est).alias("month"),
        F.dayofmonth(est).alias("day"),
    )
    est_start = F.from_utc_timestamp(start, "America/New_York")
    est_stop = F.from_utc_timestamp(stop, "America/New_York")
    delivery_days = (
        o.filter(stop.isNotNull())
        .select("id", F.explode(day_range(est_start, est_stop)).alias("d"))
        .select(
            "id",
            F.year("d").alias("year"), F.month("d").alias("month"),
            F.dayofmonth("d").alias("day"),
        )
    )
    messages = o.filter(F.col("ad_creative_body").isNotNull()).select(
        "id",
        sha512_hex(F.col("ad_creative_body")).alias("sha512"),
        simhash64(F.col("ad_creative_body")).cast("string").alias("simhash"),
    )
    pages = o.filter(F.col("page_id").isNotNull()).select(
        F.col("page_id"), F.upper(F.col("page_name")).alias("page_name")
    ).dropDuplicates(["page_id"])
    regions = o.select("id", F.explode("region_distribution").alias("r")).select(
        "id",
        F.col("r.region").alias("region"),
        F.col("r.percentage").try_cast("double").alias("percentage"),
    )
    return {
        "ads": ads,
        "creation_days": creation_days,
        "delivery_days": delivery_days,
        "messages": messages,
        "pages": pages,
        "regions": regions,
    }
