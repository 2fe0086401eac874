"""Document-pipeline tests: twitter flattening, facebook ad parsing,
news bias scoring/merge, lobbying explodes — against handwritten
fixtures exercising the reference's edge cases (FIXTURES.md §2)."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_spark.pipelines.facebook import parse_ads
from data_spark.pipelines.lobbying import explode_activities, explode_contributions
from data_spark.pipelines.news import (
    dedup_articles,
    merge_source_lists,
    score_allsides,
    score_mbfc,
    source_bias,
)
from data_spark.pipelines.twitter import TWEET_DOC_SCHEMA, extract_domains, parse_tweets


def _tweet_docs(spark):
    rows = [
        {
            "obj": {
                "tweet": {
                    "id": "111",
                    "text": "line one\n\nline two",
                    "created_at": "2020-11-07T01:30:00.000+0000",
                    "author_id": "u1",
                    "entities": {
                        "hashtags": [{"tag": "Vote"}, {"tag": "election"}],
                        "mentions": [{"id": "u2", "username": "other"}],
                        "annotations": [
                            {"normalized_text": "Georgia", "type": "Place", "probability": 0.9}
                        ],
                        "urls": [
                            {"expanded_url": "https://www.example.com/a?x=1"},
                            {"expanded_url": "https://twitter.com/other/status/5"},
                        ],
                    },
                    "referenced_tweets": [{"type": "quoted", "id": "999"}],
                },
                "author": {"id": "u1", "username": "someone", "name": "Some One", "verified": True},
            },
            "context": {"last_indexed": None, "last_graphed": None, "primary": True},
        },
        {
            "obj": {
                "tweet": {
                    "id": "222",
                    "text": "plain",
                    "created_at": "2020-11-06T22:00:00.000+0000",
                    "author_id": "u2",
                    "entities": None,
                    "referenced_tweets": None,
                },
                "author": {"id": "u2", "username": "other", "name": "Other", "verified": False},
            },
            "context": {"last_indexed": None, "last_graphed": None, "primary": False},
        },
    ]
    return spark.createDataFrame(rows, TWEET_DOC_SCHEMA)


def test_parse_tweets(spark):
    out = parse_tweets(_tweet_docs(spark))
    tweets = {r["tweet_id"]: r for r in out["tweets"].collect()}
    t1 = tweets["111"]
    assert t1["summary"] == "line one line two"
    assert t1["url"] == "twitter.com/someone/status/111"
    assert t1["username"] == "SOMEONE"
    assert (t1["year"], t1["month"], t1["day"], t1["hour"]) == (2020, 11, 7, 1)
    # 01:30 UTC = Nov 6 in US/Eastern (UTC-5 after DST end)
    assert (t1["est_year"], t1["est_month"], t1["est_day"]) == (2020, 11, 6)
    assert {r["hashtag"] for r in out["hashtags"].collect()} == {"VOTE", "ELECTION"}
    assert out["mentions"].collect()[0]["username"] == "OTHER"
    assert out["annotations"].collect()[0]["text"] == "GEORGIA"
    links = [r["url"] for r in out["links"].collect()]
    assert links == ["example.com/a"]  # twitter.com excluded, stripped
    assert out["quotes"].collect()[0]["referenced_tweet_id"] == "999"
    assert out["replies"].count() == 0
    assert out["tweeters"].count() == 2


def test_extract_domains_anti_join(spark):
    links = spark.createDataFrame([("example.com/a",), ("other.org/b",)], ["url"])
    existing = spark.createDataFrame([("example.com/a",)], ["url"])
    got = {r["domain"] for r in extract_domains(links, existing).collect()}
    assert got == {"other.org"}


def _ad_docs(spark):
    schema = """
    obj struct<
      id string, ad_creation_time string, ad_delivery_start_time string,
      ad_delivery_stop_time string, ad_creative_body string,
      ad_creative_link_caption string, currency string, funding_entity string,
      page_id string, page_name string,
      impressions struct<lower_bound string, upper_bound string>,
      spend struct<lower_bound string, upper_bound string>,
      potential_reach struct<lower_bound string, upper_bound string>,
      region_distribution array<struct<region string, percentage string>>>
    """
    rows = [
        {
            "obj": {
                "id": "a1",
                "ad_creation_time": "2021-03-01T12:00:00+0000",
                "ad_delivery_start_time": "2021-03-02",
                "ad_delivery_stop_time": "2021-03-04",
                "ad_creative_body": "vote for things",
                "ad_creative_link_caption": "example.com",
                "currency": "USD",
                "funding_entity": "PAC",
                "page_id": "p1",
                "page_name": "Page One",
                "impressions": {"lower_bound": "1000", "upper_bound": "4999"},
                "spend": {"lower_bound": "100", "upper_bound": "199"},
                "potential_reach": {"lower_bound": "10000", "upper_bound": "49999"},
                "region_distribution": [
                    {"region": "California", "percentage": "0.5"},
                    {"region": "Texas", "percentage": "0.5"},
                ],
            }
        },
        {
            "obj": {
                "id": "a2",
                "ad_creation_time": "2021-03-05",
                "ad_delivery_start_time": "2021-03-05",
                "ad_delivery_stop_time": None,
                "ad_creative_body": "vote for things",
                "ad_creative_link_caption": None,
                "currency": "EUR",
                "funding_entity": None,
                "page_id": "p1",
                "page_name": "Page One",
                "impressions": None,
                "spend": {"lower_bound": "5", "upper_bound": "9"},
                "potential_reach": None,
                "region_distribution": None,
            }
        },
    ]
    return spark.createDataFrame(rows, schema)


def test_parse_ads(spark):
    out = parse_ads(_ad_docs(spark))
    ads = {r["id"]: r for r in out["ads"].collect()}
    assert ads["a1"]["creation_time"]["hour"] == 12
    assert ads["a1"]["spend_lower_bound"] == "100"
    assert ads["a2"]["spend_lower_bound"] is None  # non-USD dropped
    assert ads["a2"]["delivery_stop_time"] is None
    # delivery day expansion only for ads with a stop time (EST days)
    dd = [(r["id"], r["day"]) for r in out["delivery_days"].collect()]
    assert {d for i, d in dd if i == "a1"} == {1, 2, 3}  # Mar 2-4 UTC → Mar 1-3 EST
    assert not [x for x in dd if x[0] == "a2"]
    # identical creative bodies share the (sha512, simhash) identity
    msgs = {r["id"]: (r["sha512"], r["simhash"]) for r in out["messages"].collect()}
    assert msgs["a1"] == msgs["a2"]
    assert out["pages"].count() == 1
    regions = {(r["region"], r["percentage"]) for r in out["regions"].collect()}
    assert regions == {("California", 0.5), ("Texas", 0.5)}


def test_news_scoring_and_merge(spark):
    allsides = spark.createDataFrame(
        [
            ("AP", "Center", "https://www.apnews.com"),
            ("SomeBlog", "Mixed", "http://someblog.com"),
            ("LeftSite", "Lean Left", "https://leftsite.org"),
        ],
        ["Source", "Bias", "Website"],
    )
    mbfc = spark.createDataFrame(
        [
            ("AP News", "least biased", "", "nan", "https://apnews.com"),
            ("Conspiracy Daily", "conspiracy-pseudoscience", "right images", "propaganda right",
             "https://conspiracy.example"),
            ("The Onion", "satire", "", "nan", "https://theonion.com"),
            ("FB", "least biased", "", "nan", "https://facebook.com"),
        ],
        ["Source", "Bias", "Images", "Tags", "Website"],
    )
    a = score_allsides(allsides)
    assert {r["domain"] for r in a.collect()} == {"apnews.com", "leftsite.org"}  # mixed dropped
    m = {r["domain"]: r for r in score_mbfc(mbfc).collect()}
    assert m["apnews.com"]["mbfc_bias_score"] == 0.0
    assert m["conspiracy.example"]["mbfc_bias_score"] == 3.0  # compound flag → +3
    assert m["conspiracy.example"]["conspiracy_flag"] == 1
    assert m["conspiracy.example"]["propaganda_flag"] == 1
    assert m["theonion.com"]["mbfc_bias_score"] is None  # satire → NULL
    merged = {r["domain"]: r for r in merge_source_lists(a, score_mbfc(mbfc)).collect()}
    assert "facebook.com" not in merged  # blocklist
    assert merged["apnews.com"]["source"] == "AP News"  # MBFC name preferred
    assert merged["leftsite.org"]["source"] == "LeftSite"  # allsides-only arm
    bias = {r["domain"]: r["bias_score"] for r in source_bias(
        merge_source_lists(a, score_mbfc(mbfc))).collect()}
    assert bias["apnews.com"] == 0.0  # mean of 0 and 0
    assert bias["leftsite.org"] == -1.0  # single rating
    assert bias["theonion.com"] is None  # no ratings


def test_dedup_articles_keep_earliest(spark):
    rows = [
        ("u1", "2024-01-01 10:00:00", 1),
        ("u1", "2024-01-02 10:00:00", 2),
        ("u2", "2024-01-03 10:00:00", 3),
    ]
    df = spark.createDataFrame(rows, ["url", "last_indexed", "doc"])
    got = {r["doc"]: r["is_duplicate"] for r in dedup_articles(df).collect()}
    assert got == {1: False, 2: True, 3: False}


def _filing_docs(spark):
    schema = """
    filing_id string, filing_year int, registrant_name string,
    activities array<struct<
      lobbyist struct<id string, name string>,
      covered_position string, issue_area_code string, specific_issues string>>,
    contributions array<struct<
      lobbyist struct<id string, name string>,
      contribution_type string, contributor_name string, payee_name string,
      recipient_name string, amount string, date string>>
    """
    rows = [
        {
            "filing_id": "f1",
            "filing_year": 2021,
            "registrant_name": "Firm A",
            "activities": [
                {"lobbyist": {"id": "l1", "name": "LOBBY ONE"}, "covered_position": "None",
                 "issue_area_code": "TAX", "specific_issues": "tax stuff"},
                {"lobbyist": {"id": "l2", "name": "LOBBY TWO"}, "covered_position": "Hill",
                 "issue_area_code": "ENV", "specific_issues": "env stuff"},
            ],
            "contributions": [
                {"lobbyist": {"id": "l1", "name": "LOBBY ONE"}, "contribution_type": "FECA",
                 "contributor_name": "X", "payee_name": "Y", "recipient_name": "Z",
                 "amount": "$1,234.56 ", "date": "02/31/2008"},
                {"lobbyist": {"id": "l1", "name": "LOBBY ONE"}, "contribution_type": "FECA",
                 "contributor_name": "X", "payee_name": "Y", "recipient_name": "W",
                 "amount": "500", "date": "11/07/2020"},
            ],
        }
    ]
    return spark.createDataFrame(rows, schema)


def test_lobbying_explodes(spark):
    filings = _filing_docs(spark)
    acts = explode_activities(filings.drop("contributions"))
    assert acts.count() == 2
    a = acts.collect()[0]
    assert a["filing_id"] == "f1" and a["registrant_name"] == "Firm A"  # parent copied
    assert {r["issue_area_code"] for r in acts.collect()} == {"TAX", "ENV"}

    cons = explode_contributions(filings.drop("activities"))
    rows = {r["recipient_name"]: r for r in cons.collect()}
    assert rows["Z"]["amount"] == 1234.56  # $,-stripped parse
    assert rows["Z"]["date"] == "2008-02-29"  # 02/31 repaired to last valid day
    assert rows["W"]["date"] == "2020-11-07"
