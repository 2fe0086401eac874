"""Connector-layer tests: pagination cursors resume correctly, XML
normalization handles singleton/junk/coercion quirks, multimodal
plumbing runs end-to-end with the stub decoder."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_spark.operators.multimodal import extract_features, wrap_binary
from data_spark.sources import (
    coerce_by_key_pattern,
    ensure_list,
    keyset_pages,
    offset_pages,
    page_number_pages,
    strip_junk_prefix,
    timeline_pages,
    token_pages,
)

DATA = [{"id": i, "v": i * 10} for i in range(95)]


def test_keyset_pages_resume():
    def fetch(cursor):
        last = cursor.get("last_key")
        rows = [r for r in DATA if last is None or r["id"] > last][:40]
        return rows, (rows[-1]["id"] if rows else last)

    pages = list(keyset_pages(fetch))
    assert [len(p) for p, _ in pages] == [40, 40, 15]
    # resume mid-stream from a persisted cursor
    resumed = list(keyset_pages(fetch, cursor=pages[0][1]))
    assert [len(p) for p, _ in resumed] == [40, 15]
    assert resumed[0][0][0]["id"] == 40


def test_page_number_pages_short_page_stops():
    def fetch(page):
        start = (page - 1) * 40
        return DATA[start : start + 40]

    pages = list(page_number_pages(fetch, page_size=40))
    assert [len(p) for p, _ in pages] == [40, 40, 15]
    # count-resume (S16): resume page computed from processed count
    resumed = list(page_number_pages(fetch, page_size=40, start_page=80 // 40 + 1))
    assert [len(p) for p, _ in resumed] == [15]


def test_offset_pages_cap():
    def fetch(offset):
        return DATA[offset : offset + 10]

    pages = list(offset_pages(fetch, step=10, max_offset=30))
    assert [len(p) for p, _ in pages] == [10, 10, 10, 10]  # capped at offset 30


def test_timeline_pages_bidirectional():
    tweets = [{"tid": i} for i in range(100, 130)]

    def fetch(cursor):
        if cursor["direction"] == "backward":
            upper = cursor["min_id"] if cursor["min_id"] is not None else 10**9
            older = [t for t in tweets if t["tid"] < upper]
            return sorted(older, key=lambda t: -t["tid"])[:10]
        newer = [t for t in tweets if t["tid"] > (cursor["max_id"] or 0)]
        return sorted(newer, key=lambda t: t["tid"])[:10]

    pages = list(timeline_pages(fetch, id_of=lambda t: t["tid"]))
    assert [len(p) for p, _ in pages] == [10, 10, 10, 0]  # 0-page = flip marker
    final = pages[-1][1]
    assert final["min_id"] == 100 and final["max_id"] == 129
    assert final["end"] is True  # backward drain completed


def test_token_pages():
    def fetch(token):
        start = int(token or 0)
        rows = DATA[start : start + 50]
        next_token = str(start + 50) if start + 50 < len(DATA) else None
        return rows, next_token

    pages = list(token_pages(fetch))
    assert [len(p) for p, _ in pages] == [50, 45]
    assert pages[-1][1]["after"] is None


def test_xml_normalization():
    assert strip_junk_prefix("junk--<xml>ok</xml>") == "<xml>ok</xml>"
    assert strip_junk_prefix("<xml/>") == "<xml/>"
    assert ensure_list(None) == []
    assert ensure_list({"a": 1}) == [{"a": 1}]
    assert ensure_list([1, 2]) == [1, 2]
    doc = {
        "TotalAmt": "123.45",
        "WeeklyHrs": "40",
        "SignedDt": "2020-11-07",
        "BadAmt": "n/a",
        "nested": [{"GrossAmt": "7"}],
        "Name": "X",
    }
    got = coerce_by_key_pattern(doc)
    assert got["TotalAmt"] == 123.45 and got["WeeklyHrs"] == 40.0
    assert got["SignedDt"] == "2020-11-07"
    assert got["BadAmt"] == "n/a"  # unparseable passes through
    assert got["nested"][0]["GrossAmt"] == 7.0
    assert got["Name"] == "X"


def test_multimodal_stub_pipeline(spark):
    docs = spark.createDataFrame(
        [(1, b"payload-one", "src0"), (2, b"payload-two", "src1"), (3, None, "src0")],
        "doc_id long, blob binary, source string",
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="image/fake")
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    feats = extract_features(media, decode_mode="fake").collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["nbytes"] == len(b"payload-one")
    assert len(by_id[1]["features"]) == 16
    assert all(0.0 <= v <= 1.0 for v in by_id[1]["features"])
    assert by_id[3]["features"] is None
    # deterministic across runs
    feats2 = {r["media_id"]: r["features"] for r in extract_features(media, "fake").collect()}
    assert feats2[2] == by_id[2]["features"]
    # strict mode is the real-decoder hook: raises cleanly
    with pytest.raises(Exception):
        extract_features(media, decode_mode="strict").collect()


def test_ingest_pages_end_to_end(spark, tmp_path):
    from data_spark.sources.ingest import CursorStore, ingest_pages
    from data_spark.sources.pagination import keyset_pages

    data = [{"id": i, "v": i * 10} for i in range(95)]

    def fetch(cursor):
        last = cursor.get("last_key")
        rows = [r for r in data if last is None or r["id"] > last][:20]
        return rows, (rows[-1]["id"] if rows else last)

    target = str(tmp_path / "ingested")
    store = CursorStore(str(tmp_path / "cursor.json"))
    n = ingest_pages(
        spark,
        keyset_pages(fetch),
        target,
        keys=["id"],
        schema="id long, v long",
        cursor_store=store,
        pages_per_write=2,
    )
    assert n == 95
    got = spark.read.parquet(target)
    assert got.count() == 95
    assert got.select("id").distinct().count() == 95
    assert store.load() == {"last_key": 94}

    # resume from the durable cursor: nothing new → no change
    resumed = ingest_pages(
        spark,
        keyset_pages(fetch, cursor=store.load()),
        target,
        keys=["id"],
        schema="id long, v long",
        cursor_store=store,
    )
    assert resumed == 0
    assert spark.read.parquet(target).count() == 95

    # overlapping refetch (at-least-once fetch) stays idempotent via MERGE
    again = ingest_pages(
        spark,
        keyset_pages(fetch, cursor={"last_key": 80}),
        target,
        keys=["id"],
        schema="id long, v long",
    )
    assert again == 14
    assert spark.read.parquet(target).count() == 95


def test_multimodal_resize_and_frames(spark):
    from data_spark.operators.multimodal import resize_images, sample_frames

    docs = spark.createDataFrame(
        [(1, b"payload-one", "src0"), (2, b"pp", "src1"), (3, None, "src0")],
        "doc_id long, blob binary, source string",
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="video/fake")

    resized = {r["media_id"]: r for r in resize_images(media, 8, 4).collect()}
    assert resized[1]["width"] == 8 and resized[1]["height"] == 4
    assert len(bytes(resized[1]["payload"])) == 8 * 4  # bounded by target dims
    assert resized[3]["payload"] is None
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 8, 4).collect() if r["payload"] is not None}
    assert again[2] == bytes(resized[2]["payload"])  # deterministic

    frames = sample_frames(media).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # n_frames = 2 + nbytes % 3: "payload-one" (11) → 2+2=4, "pp" (2) → 2+2=4
    assert len(by_id[1]) == 4 and len(by_id[2]) == 4
    assert 3 not in by_id  # null payload → no frames
    idxs = sorted(r["frame_idx"] for r in by_id[1])
    assert idxs == [0, 1, 2, 3]
    assert all(r["frame_ts_ms"] == r["frame_idx"] * 40 for r in frames)
    # frames differ from each other but are stable across runs
    assert len({bytes(r["frame"]) for r in by_id[1]}) == 4
    with pytest.raises(Exception):
        sample_frames(media, decode_mode="strict").collect()


def test_multimodal_strict_decode_with_pillow(spark):
    """Real decode path: runs only where Pillow is installed (skipped in
    this container). strict mode must decode real image bytes into
    features and produce a real PNG resize."""
    image_mod = pytest.importorskip("PIL.Image")
    import io

    from data_spark.operators.multimodal import resize_images

    buf = io.BytesIO()
    image_mod.new("RGB", (6, 6), color=(200, 10, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    docs = spark.createDataFrame(
        [(1, png, "src0")], "doc_id long, blob binary, source string"
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="image/png")

    feats = extract_features(media, decode_mode="strict").collect()
    assert len(feats) == 1 and len(feats[0]["features"]) == 16
    # decoded RGB of a solid-color image: first pixel bytes are the color
    assert feats[0]["features"][0] == pytest.approx(200 / 255.0)

    resized = resize_images(media, 3, 2, decode_mode="strict").collect()
    out = bytes(resized[0]["payload"])
    assert out.startswith(b"\x89PNG")
    with image_mod.open(io.BytesIO(out)) as im:
        assert im.size == (3, 2)
