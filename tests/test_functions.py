"""Golden-pair unit tests for the scalar function library
(FIXTURES.md §5 pairs + reference-semantics edge cases)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_spark import functions as dsf


def _one(spark, col_fn, value):
    df = spark.createDataFrame([(value,)], "x string")
    return df.select(col_fn(F.col("x")).alias("y")).collect()[0][0]


# FIXTURES.md §5 golden pairs + reference branch coverage
PROCESS_NAME_GOLDEN = [
    ("SMITH, JOHN MR", "JOHN SMITH"),
    ("DOE, JANE PHD", "JANE DOE"),
    ("ACME, INC", "ACME INC"),
    ("ACME, LLC", "ACME LLC"),
    ("SMITH, JOHN JR", "JOHN SMITH JR"),
    ("DR JOHN DOE", "JOHN DOE"),
    ("O'BRIEN, PAT JR", "PAT O'BRIEN JR"),
    ("Smith Jr., Bob, Esq.", "BOB SMITH JR"),
    ("WASHINGTON, GEORGE III", "GEORGE WASHINGTON III"),
    ("ADAMS, SAMUEL DR", "SAMUEL ADAMS"),
    ("plain name", "PLAIN NAME"),
    ("LEE, ANN MD", "ANN LEE"),
    ("KING, M L REV", "M L KING"),
]


@pytest.mark.parametrize("raw,expected", PROCESS_NAME_GOLDEN)
def test_process_name(spark, raw, expected):
    assert _one(spark, dsf.process_name, raw) == expected


CLEAN_ZIP_GOLDEN = [
    ("945", "00945"),
    ("0", ""),
    (None, ""),
    ("", ""),
    ("94530-1234", "94530-1234"),  # non-castable → zfill(5) no-op at len≥5
    ("00000", ""),  # int == 0
    ("945301234", "945301234"),  # zfill never truncates
    ("12", "00012"),
]


@pytest.mark.parametrize("raw,expected", CLEAN_ZIP_GOLDEN)
def test_clean_zip(spark, raw, expected):
    assert _one(spark, dsf.clean_zip, raw) == expected


STRIP_URL_GOLDEN = [
    ("https://www.example.com/a/b?q=1#frag", "example.com/a/b"),
    ("http://youtube.com/watch?v=abc123&t=9", "youtube.com/watch?v=abc123"),
    ("example.com/x?y=1", "example.com/x"),
    ("http://example.com/path#frag", "example.com/path"),
]


@pytest.mark.parametrize("raw,expected", STRIP_URL_GOLDEN)
def test_strip_url(spark, raw, expected):
    assert _one(spark, dsf.strip_url, raw) == expected


def test_get_domain(spark):
    assert _one(spark, dsf.get_domain, "www.example.com/a/b") == "example.com"
    assert _one(spark, dsf.get_domain, "sub.example.com/x") == "sub.example.com"


def test_parse_amount(spark):
    assert _one(spark, dsf.parse_amount, "$1,234.56 ") == 1234.56
    assert _one(spark, dsf.parse_amount, "nope") is None


def test_slugify_key(spark):
    assert _one(spark, dsf.slugify_key, "Paid for By/Some-Org!") == "paid_for_by_some_org"


DATE_GOLDEN = [
    ("11/07/2020 03:15:00 PM", "2020-11-07 15:15:00"),
    ("11/07/2020", "2020-11-07 00:00:00"),
    ("11/7/20", "2020-11-07 00:00:00"),
    ("11-07-2020", "2020-11-07 00:00:00"),
    ("2020-11-07", "2020-11-07 00:00:00"),
    ("7-Nov-20", "2020-11-07 00:00:00"),
    ("110720", "2020-11-07 00:00:00"),
    ("02/31/2008", None),  # invalid — repair handled at pipeline layer
    ("", None),
]


@pytest.mark.parametrize("raw,expected", DATE_GOLDEN)
def test_parse_date_multi(spark, raw, expected):
    got = _one(spark, dsf.parse_date_multi, raw)
    got_str = got.strftime("%Y-%m-%d %H:%M:%S") if got else None
    assert got_str == expected


def test_mmddyyyy(spark):
    got = _one(spark, dsf.mmddyyyy_to_date, "11072020")
    assert str(got) == "2020-11-07"
    assert _one(spark, dsf.mmddyyyy_to_date, "13992020") is None  # invalid month
    assert _one(spark, dsf.mmddyyyy_to_date, "notadate") is None


def test_to_utc_from_eastern(spark):
    df = spark.createDataFrame([("2020-11-07 12:00:00",)], ["x"])
    got = df.select(
        F.date_format(
            dsf.to_utc_from_eastern(F.to_timestamp(F.col("x"))), "yyyy-MM-dd HH:mm:ss"
        ).alias("y")
    ).collect()[0][0]
    assert got == "2020-11-07 17:00:00"  # EST = UTC-5 in November


def test_day_range(spark):
    df = spark.createDataFrame([("2020-01-30", "2020-02-02")], ["a", "b"])
    got = df.select(
        F.size(dsf.day_range(F.col("a"), F.col("b"))).alias("n")
    ).collect()[0][0]
    assert got == 4
    # null stop → single day
    df2 = spark.createDataFrame([("2020-01-30", None)], "a string, b string")
    assert df2.select(F.size(dsf.day_range(F.col("a"), F.col("b"))).alias("n")).collect()[0][0] == 1


def test_sha512_matches_reference_hash(spark):
    import hashlib

    text = "some ad creative body"
    expected = hashlib.sha512(text.encode()).hexdigest()
    assert _one(spark, dsf.sha512_hex, text) == expected


def test_simhash_near_duplicates_close(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumped over the lazy dog"),
            (3, "totally unrelated content about spark shuffles"),
        ],
        ["id", "t"],
    )
    rows = {
        r["id"]: r["sh"]
        for r in df.select("id", dsf.simhash64(F.col("t")).alias("sh")).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(rows[1], rows[2]) <= 16
    assert ham(rows[1], rows[3]) > 20


def test_minhash_similarity_tracks_jaccard(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words appear here now"),
        ],
        ["id", "t"],
    )
    sigs = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", dsf.minhash_signature(dsf.token_shingles(F.col("t"))).alias("sig")
        ).collect()
    }
    sim_close = sum(a == b for a, b in zip(sigs[1], sigs[2])) / 64
    sim_far = sum(a == b for a, b in zip(sigs[1], sigs[3])) / 64
    assert sim_close > 0.5
    assert sim_far < 0.2
