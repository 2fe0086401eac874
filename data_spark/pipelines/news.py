"""News-sources pipeline (SURVEY §3.3).

- ``score_allsides`` / ``score_mbfc``: the bias-score matrices
  (news_sources_ingest_get_crawls/main.py:93-118) as when-chains —
  including the compound flag logic that pushes questionable/
  conspiracy/hate/propaganda sources to ±3 and satire to NULL.
- ``merge_source_lists``: the allsides×MBFC full-outer domain merge
  with Source-name coalesce (:123-125) and the social-domain blocklist.
- ``source_bias``: average of present ratings + int flags
  (news_sources_compute_load_graph/main.py:43-72).
- ``dedup_articles``: keep-earliest-per-URL (SURVEY W2/A3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.functions.text import get_domain

BLOCKLIST = ["facebook.com", "instagram.com", "youtube.com", "medium.com"]


def _clean_domain(website: Column) -> Column:
    host = get_domain(F.regexp_replace(F.lower(F.trim(website)), r"^https?://", ""))
    host = F.split_part(host, F.lit(","), F.lit(1))
    return F.regexp_replace(host, r"^\.", "")


def score_allsides(df: DataFrame) -> DataFrame:
    """allsides crawl rows (Source, Bias, Website) → (domain, source,
    bias_score); 'mixed' rows dropped."""
    bias = F.lower(F.trim(F.col("Bias")))
    score = (
        F.when(bias == "left", -2.0)
        .when(bias == "lean left", -1.0)
        .when(bias == "center", 0.0)
        .when(bias == "lean right", 1.0)
        .when(bias == "right", 2.0)
    )
    return (
        df.filter(bias != "mixed")
        .select(
            _clean_domain(F.col("Website")).alias("domain"),
            F.trim(F.col("Source")).alias("allsides_source"),
            score.alias("allsides_bias_score"),
        )
        .filter(F.col("domain") != "")
    )


def score_mbfc(df: DataFrame) -> DataFrame:
    """MBFC crawl rows (Source, Bias, Images, Tags, Website) →
    (domain, source, bias_score, 5 flags) with the compound ±3/satire
    overrides."""
    bias = F.lower(F.trim(F.col("Bias")))
    images = F.lower(F.trim(F.coalesce(F.col("Images"), F.lit(""))))
    tags = F.lower(F.coalesce(F.col("Tags"), F.lit("")))
    base_score = (
        F.when(bias.contains("left-center bias"), -1.0)
        .when(bias.contains("left bias"), -2.0)
        .when(bias.contains("pro-science"), 0.0)
        .when(bias.contains("least biased"), 0.0)
        .when(bias.contains("right-center bias"), 1.0)
        .when(bias.contains("right bias"), 2.0)
    )
    questionable = (
        bias.contains("questionable source") | bias.contains("conspiracy-pseudoscience")
    ).cast("int")
    conspiracy = bias.contains("conspiracy-pseudoscience").cast("int")
    hate = tags.contains("hate").cast("int")
    propaganda = tags.contains("propaganda").cast("int")
    satire = bias.contains("satire").cast("int")
    leftish = images.contains("left") | tags.contains("left")
    rightish = images.contains("right") | tags.contains("right")
    flagged = (questionable == 1) | (conspiracy == 1) | (hate == 1) | (propaganda == 1)
    score = (
        F.when(satire == 1, F.lit(None).cast("double"))
        .when(flagged & leftish, -3.0)
        .when(flagged & rightish, 3.0)
        .otherwise(base_score)
    )
    return df.select(
        _clean_domain(F.col("Website")).alias("domain"),
        F.trim(F.col("Source")).alias("mbfc_source"),
        score.alias("mbfc_bias_score"),
        questionable.alias("factually_questionable_flag"),
        conspiracy.alias("conspiracy_flag"),
        satire.alias("satire_flag"),
        hate.alias("hate_group_flag"),
        propaganda.alias("propaganda_flag"),
    ).filter(F.col("domain") != "")


def merge_source_lists(allsides: DataFrame, mbfc: DataFrame) -> DataFrame:
    """Full-outer merge on domain, MBFC name preferred, social domains
    blocked, sorted by domain."""
    merged = allsides.join(mbfc, on="domain", how="full_outer")
    return (
        merged.select(
            "domain",
            F.coalesce(F.col("mbfc_source"), F.col("allsides_source")).alias("source"),
            "allsides_bias_score", "mbfc_bias_score",
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in [
                    "factually_questionable_flag", "conspiracy_flag", "satire_flag",
                    "hate_group_flag", "propaganda_flag",
                ]
            ],
        )
        .filter(~F.col("domain").isin(BLOCKLIST))
        .orderBy("domain")
    )


def source_bias(sources: DataFrame) -> DataFrame:
    """Average of the present bias ratings (1 rating → itself, 2 →
    mean, 0 → NULL), reference semantics from
    news_sources_compute_load_graph/main.py:43-58."""
    a = F.col("allsides_bias_score")
    m = F.col("mbfc_bias_score")
    n = a.isNotNull().cast("int") + m.isNotNull().cast("int")
    total = F.coalesce(a, F.lit(0.0)) + F.coalesce(m, F.lit(0.0))
    return sources.select(
        "domain", "source",
        F.when(n > 0, total / n).alias("bias_score"),
        "factually_questionable_flag", "conspiracy_flag", "satire_flag",
        "hate_group_flag", "propaganda_flag",
    )


def dedup_articles(articles: DataFrame, url_col: str = "url", ts_col: str = "last_indexed") -> DataFrame:
    """Keep-earliest-per-URL; later copies are the delete queue
    (news_articles_ingest_queue_duplicates/main.py:37-52)."""
    w = Window.partitionBy(url_col).orderBy(F.asc(ts_col))
    ranked = articles.withColumn("__rn", F.row_number().over(w))
    return ranked.withColumn("is_duplicate", F.col("__rn") > 1).drop("__rn")
