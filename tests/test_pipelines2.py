"""Reddit ad-metadata parsing and IRS 990 index preparation tests."""

from __future__ import annotations

from data_spark.pipelines.irs import prepare_index, route_filings
from data_spark.pipelines.reddit import parse_ad_metadata


def test_reddit_ad_metadata(spark):
    html = (
        "<p>Ad Buyer Information and Related Data:</p>"
        "<p>Ad-Buyer: Some PAC</p>"
        "<p>Campaign Start/End Date: 11/07/2020</p>"
        "<p>Target Audience: everyone</p>"
        "<p>no colon line</p>"
    )
    ads = spark.createDataFrame([("a1", html), ("a2", None)], "id string, selftext_html string")
    got = {r["id"]: r["processed"] for r in parse_ad_metadata(ads).collect()}
    p = got["a1"]
    assert p["ad_buyer"] == "Some PAC"  # slugified key: '-'→'_', non-alpha dropped
    assert p["campaign_start_end_date"] == "2020-11-07"  # date normalized
    assert p["target_audience"] == "everyone"
    assert "a2" not in got  # no html → no processed map


def test_irs_prepare_index_and_routing(spark):
    rows = [
        ("r1", "EFILE", "123", "201912", "11/07/2020 03:15:00 PM", "ORG ONE", "990", "d1",
         "202011079999999999"),
        ("r2", "EFILE", "456", "201312", "01/01/2013", "OLD ORG", "990", "d2",
         "201311079999999999"),  # pre-2014 → dropped
        ("r3", "EFILE", "789", "202012", "12/31/2020", "ORG TWO", "990EZ", "d3",
         "202112079999999999"),
    ]
    cols = [
        "return_id", "filing_type", "ein", "tax_period", "sub_date",
        "taxpayer_name", "return_type", "dln", "object_id",
    ]
    idx = prepare_index(spark.createDataFrame(rows, cols))
    got = {r["return_id"]: r for r in idx.collect()}
    assert set(got) == {"r1", "r3"}
    # 15:15 Eastern (EST, UTC-5) → 20:15 UTC
    assert got["r1"]["sub_date"] == "2020-11-07T20:15:00+0000"

    docs = spark.createDataFrame(
        [
            ("o1", {"IRS990": "{}", "ReturnHeader990x": "{}"}),
            ("o2", {"IRS990EZ": "{}"}),
            ("o3", {"IRS990PF": "{}"}),
        ],
        "object_id string, obj map<string,string>",
    )
    routed = {r["object_id"]: r["index"] for r in route_filings(docs).collect()}
    assert routed == {"o1": "990", "o2": "990ez", "o3": "990pf"}


def test_escalating_fetcher():
    from data_spark.sources.retry import EscalatingFetcher

    calls = []

    def basic(req):
        calls.append(("basic", req))
        if "hard" in req:
            raise RuntimeError("blocked")
        return f"basic:{req}"

    def proxy(req):
        calls.append(("proxy", req))
        if "impossible" in req:
            raise RuntimeError("blocked")
        return f"proxy:{req}"

    def proxy_js(req):
        calls.append(("proxy_js", req))
        return f"proxy_js:{req}"

    f = EscalatingFetcher([("basic", basic), ("proxy", proxy), ("proxy_js", proxy_js)],
                          reprobe_after=2)
    # easy site stays on the cheap tier
    assert f.fetch("easy.com", "page1")[0] == "basic"
    assert f.fetch("easy.com", "page2")[0] == "basic"
    # hard site escalates once, then remembers the winning tier
    assert f.fetch("hard.com", "hard-page1")[0] == "proxy"
    calls.clear()
    assert f.fetch("hard.com", "hard-page2")[0] == "proxy"
    assert calls == [("proxy", "hard-page2")]  # basic not retried
    # after reprobe_after successes, probe from tier 0 again
    assert f.fetch("hard.com", "ok-now")[0] == "basic"
    # impossible everywhere → last error surfaces
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        EscalatingFetcher([("basic", basic), ("proxy", proxy)]).fetch(
            "x.com", "hard-impossible"
        )


def test_hydrate_references(spark):
    from data_spark.pipelines.twitter import hydrate_references

    tweets = spark.createDataFrame(
        [("t1", "u1", "t9"), ("t2", "u2", None), ("t3", "u9", "t8")],
        "tweet_id string, author_id string, referenced_tweet_id string",
    )
    users = spark.createDataFrame(
        [("u1", "alice", "Alice", True), ("u2", "bob", "Bob", False)],
        "user_id string, username string, name string, verified boolean",
    )
    pool = spark.createDataFrame(
        [("t9", "quoted text", "u2")], "tweet_id string, text string, author_id string"
    )
    got = {r["tweet_id"]: r for r in hydrate_references(tweets, users, pool).collect()}
    assert got["t1"]["username"] == "alice"
    assert got["t1"]["referenced_text"] == "quoted text"
    assert got["t2"]["username"] == "bob" and got["t2"]["referenced_text"] is None
    # dangling refs survive as NULL arms (left joins)
    assert got["t3"]["username"] is None and got["t3"]["referenced_text"] is None
