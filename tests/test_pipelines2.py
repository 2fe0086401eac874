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
