"""Twitter pipeline (SURVEY §3.2): tweet docs → 9 relation tables.

The reference's ``parse_tweet`` flattens each ES tweet doc into
tweets / tweeters / hashtags / mentions / annotations / links lists
plus quote/reply/retweet edges (twitter_compute_load_graph/main.py:
35-105,140-204). Here each relation is one explode+project over the
typed envelope:

- timestamps decompose in UTC and US-Eastern (the reference's EST day);
- summary = newline-collapsed text;
- usernames/hashtags/annotation text upper-cased as in the reference;
- links exclude twitter.com and are strip_url-normalized;
- referenced_tweets explode into typed edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, StringType, StructField, StructType, TimestampType,
)

from data_spark.functions.text import strip_url

_AUTHOR = StructType(
    [
        StructField("id", StringType()),
        StructField("username", StringType()),
        StructField("name", StringType()),
        StructField("verified", BooleanType()),
    ]
)
_ENTITIES = StructType(
    [
        StructField("hashtags", ArrayType(StructType([StructField("tag", StringType())]))),
        StructField(
            "mentions",
            ArrayType(
                StructType(
                    [StructField("id", StringType()), StructField("username", StringType())]
                )
            ),
        ),
        StructField(
            "annotations",
            ArrayType(
                StructType(
                    [
                        StructField("normalized_text", StringType()),
                        StructField("type", StringType()),
                        StructField("probability", DoubleType()),
                    ]
                )
            ),
        ),
        StructField(
            "urls",
            ArrayType(StructType([StructField("expanded_url", StringType())])),
        ),
    ]
)
_TWEET = StructType(
    [
        StructField("id", StringType()),
        StructField("text", StringType()),
        StructField("created_at", StringType()),
        StructField("author_id", StringType()),
        StructField("entities", _ENTITIES),
        StructField(
            "referenced_tweets",
            ArrayType(
                StructType([StructField("type", StringType()), StructField("id", StringType())])
            ),
        ),
    ]
)

#: envelope schema (FIXTURES.md §2 twitter_tweets, without the recursive
#: quoted/replied/retweeted copies — those arrive as separate rows)
TWEET_DOC_SCHEMA = StructType(
    [
        StructField(
            "obj",
            StructType([StructField("tweet", _TWEET), StructField("author", _AUTHOR)]),
        ),
        StructField(
            "context",
            StructType(
                [
                    StructField("last_indexed", TimestampType()),
                    StructField("last_graphed", TimestampType()),
                    StructField("primary", BooleanType()),
                ]
            ),
        ),
    ]
)


def _summary(text):
    # splitlines → drop empties → single-space join
    return F.trim(F.regexp_replace(text, "[\\r\\n\\u000B\\u000C\\u2028\\u2029]+", " "))


def parse_tweets(docs: DataFrame) -> dict[str, DataFrame]:
    """Flatten tweet docs into the relation tables the graph consumes."""
    tw = docs.select(F.col("obj.tweet").alias("t"), F.col("obj.author").alias("a"))
    ts = F.to_timestamp(F.col("t.created_at"))
    est = F.from_utc_timestamp(ts, "America/New_York")
    tweets = tw.select(
        F.col("t.id").alias("tweet_id"),
        F.year(ts).alias("year"), F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"), F.hour(ts).alias("hour"),
        F.minute(ts).alias("minute"),
        F.year(est).alias("est_year"), F.month(est).alias("est_month"),
        F.dayofmonth(est).alias("est_day"),
        _summary(F.col("t.text")).alias("summary"),
        F.concat(
            F.lit("twitter.com/"), F.col("a.username"), F.lit("/status/"), F.col("t.id")
        ).alias("url"),
        F.col("a.id").alias("user_id"),
        F.upper(F.col("a.username")).alias("username"),
    )
    tweeters = tw.select(
        F.col("a.id").alias("user_id"),
        F.upper(F.col("a.username")).alias("username"),
        F.col("a.name").alias("name"),
        F.col("a.verified").alias("verified"),
    ).dropDuplicates(["user_id"])
    hashtags = tw.select(
        F.col("t.id").alias("tweet_id"),
        F.explode("t.entities.hashtags").alias("h"),
    ).select("tweet_id", F.upper(F.col("h.tag")).alias("hashtag"))
    mentions = tw.select(
        F.col("t.id").alias("tweet_id"), F.explode("t.entities.mentions").alias("m")
    ).select("tweet_id", F.col("m.id").alias("user_id"), F.upper(F.col("m.username")).alias("username"))
    annotations = tw.select(
        F.col("t.id").alias("tweet_id"), F.explode("t.entities.annotations").alias("an")
    ).select(
        "tweet_id",
        F.upper(F.col("an.normalized_text")).alias("text"),
        F.col("an.type").alias("type"),
        F.col("an.probability").alias("probability"),
    )
    links = (
        tw.select(F.col("t.id").alias("tweet_id"), F.explode("t.entities.urls").alias("u"))
        .filter(~F.col("u.expanded_url").contains("twitter.com"))
        .select("tweet_id", strip_url(F.col("u.expanded_url")).alias("url"))
    )
    refs = tw.select(
        F.col("t.id").alias("tweet_id"), F.explode("t.referenced_tweets").alias("r")
    ).select("tweet_id", F.col("r.type").alias("type"), F.col("r.id").alias("referenced_tweet_id"))
    return {
        "tweets": tweets,
        "tweeters": tweeters,
        "hashtags": hashtags,
        "mentions": mentions,
        "annotations": annotations,
        "links": links,
        "quotes": refs.filter(F.col("type") == "quoted").drop("type"),
        "replies": refs.filter(F.col("type") == "replied_to").drop("type"),
        "retweets": refs.filter(F.col("type") == "retweeted").drop("type"),
    }


def hydrate_references(
    tweets: DataFrame,
    users: DataFrame,
    referenced: DataFrame,
) -> DataFrame:
    """Hydration join (SURVEY J5): resolve author_id against the
    ``includes.users`` table and referenced tweet ids against the
    ``includes.tweets`` table — the reference's nested-loop-over-
    includes becomes two broadcast lookup joins.

    tweets:     (tweet_id, author_id, referenced_tweet_id nullable)
    users:      (user_id, username, name, verified)
    referenced: (tweet_id, text, author_id) — the hydration pool
    """
    u = F.broadcast(users.withColumnsRenamed({"user_id": "author_id"}))
    r = F.broadcast(
        referenced.select(
            F.col("tweet_id").alias("referenced_tweet_id"),
            F.col("text").alias("referenced_text"),
            F.col("author_id").alias("referenced_author_id"),
        )
    )
    return tweets.join(u, "author_id", "left").join(r, "referenced_tweet_id", "left")


def extract_domains(links: DataFrame, domain_edges: DataFrame | None = None) -> DataFrame:
    """Domain extraction for links lacking a Domain edge (SURVEY §3.2
    step 5 / J7): anti-join then get_domain."""
    from data_spark.functions.text import get_domain

    pending = links
    if domain_edges is not None:
        pending = links.join(domain_edges, on="url", how="left_anti")
    return pending.select("url", get_domain(F.col("url")).alias("domain")).distinct()
