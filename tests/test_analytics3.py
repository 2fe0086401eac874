"""Python-mirror exactness tests for the round-5 analytics additions
(data_spark/queries/analytics3.py): resource-allocation link
prediction, the CUSUM prefix-min closed form, the hashing-trick
quality classifier, versioned-store schema evolution, and Hamming
top-k over binary codes. The DuckDB oracles hash-check each query
against another SQL engine; these mirrors check the SEMANTICS against
from-scratch pure-Python implementations, so a shared SQL misreading
can't hide."""

from __future__ import annotations

import hashlib
import math
import os
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from data_spark.queries.analytics3 import (
    _QC_A,
    _QC_B,
    _QC_BUCKETS,
    _RA_MAX_DEG,
    _RA_SCALE,
    d_quality_classifier,
    e_cusum_changepoint,
    g_resource_alloc,
    m_schema_evolution,
    v_hamming_topk,
)
from data_spark.queries.analytics import _MH_P, _spark_simhash_sigs


# ---------------------------------------------------------------- RA index


def test_resource_alloc_matches_python_mirror(spark, sf_small):
    rows = g_resource_alloc(spark, sf_small).collect()

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    edges = {
        (r.l_suppkey, r.o_custkey)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    }
    by_cust = defaultdict(set)
    for s, c in edges:
        by_cust[c].add(s)

    scores: Counter = Counter()
    for c, supps in by_cust.items():
        d = len(supps)
        if d > _RA_MAX_DEG:
            continue  # hub witnesses are excluded by the operator contract
        contrib = math.floor(float(_RA_SCALE) / d)
        ss = sorted(supps)
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1 :]:
                scores[(s1, s2)] += contrib

    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = [((r.s1, r.s2), r.score) for r in rows]
    assert got == expect


# ------------------------------------------------------------------- CUSUM


def test_cusum_closed_form_equals_recursion(spark, sf_small):
    out = {
        (r.event_type, str(r.day)): (r.cusum_scaled, r.alarm)
        for r in e_cusum_changepoint(spark, sf_small).collect()
    }

    daily = (
        spark.read.parquet(f"{sf_small}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((str(r.day), r.x))

    n_alarm_checked = 0
    for et, pts in series.items():
        pts.sort()
        nd = len(pts)
        sx = sum(x for _, x in pts)
        h = 50 * sx
        s = 0  # the textbook recursion S_d = max(0, S_{d-1} + z_d)
        for day, x in pts:
            s = max(0, s + 10 * nd * x - 11 * sx)
            cus, alarm = out[(et, day)]
            assert cus == s, (et, day)
            assert alarm == (1 if s > h else 0)
            n_alarm_checked += 1
    assert n_alarm_checked == sum(len(v) for v in series.values())
    assert len(out) == n_alarm_checked


def test_cusum_fires_on_injected_level_shift(spark, tmp_path):
    # 40 quiet days at 10 events/day, then 20 days at 30/day: the shift
    # must raise alarms in the shifted regime and none before it.
    rows = []
    eid = 0
    for d in range(60):
        n = 10 if d < 40 else 30
        day = f"2024-{1 + d // 28:02d}-{1 + d % 28:02d}"
        for i in range(n):
            rows.append((eid, f"{day} 12:00:00", "burst", 0.0, "{}", eid))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string, value double, props string, user_id bigint"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    out = sorted(
        e_cusum_changepoint(spark, sf_dir).collect(), key=lambda r: str(r.day)
    )
    alarms = [r.alarm for r in out]
    assert sum(alarms) > 0, "level shift must trigger the detector"
    first = alarms.index(1)
    assert first >= 40, "no alarm before the shift"
    assert all(a == 1 for a in alarms[first:]), "drift alarm must latch upward here"


def test_cusum_composes_with_incremental_state(spark, sf_small):
    """The docstring claim, enforced: daily counts are a monoid, so the
    detector's input can be MAINTAINED (state ⊕ delta) instead of
    recomputed, and the closed form over the folded state equals the
    batch detector bit for bit."""
    from data_spark.operators.incremental_agg import (
        aggregate_state,
        merge_aggregate_state,
    )
    from data_spark.queries.analytics3 import cusum_from_daily

    e = (
        spark.read.parquet(f"{sf_small}/events.parquet")
        .select("event_id", "event_type", F.to_date("ts").alias("day"))
    )
    batch1 = e.filter(F.col("event_id") % 2 == 0)
    batch2 = e.filter(F.col("event_id") % 2 == 1)

    state = aggregate_state(batch1, ["event_type", "day"])
    folded = merge_aggregate_state(
        state, aggregate_state(batch2, ["event_type", "day"]), ["event_type", "day"]
    )
    incr = cusum_from_daily(folded.select("event_type", "day", F.col("cnt").alias("x")))
    batch = cusum_from_daily(
        e.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("x"))
    )
    k = lambda r: (r.event_type, str(r.day))
    got = {k(r): (r.cusum_scaled, r.alarm) for r in incr.collect()}
    want = {k(r): (r.cusum_scaled, r.alarm) for r in batch.collect()}
    assert got == want
    assert len(got) > 0


# -------------------------------------------------------------- classifier


def _tokens(text: str) -> list[str]:
    import re

    cleaned = re.sub(r"[^a-z0-9 ]+", " ", text.lower()).strip()
    return [w for w in re.split(r"\s+", cleaned) if w != ""]


def _bucket(term: str) -> int:
    h = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
    return h % _QC_BUCKETS


def test_quality_classifier_matches_python_mirror(spark, sf_small):
    rows = {r.doc_id: r for r in d_quality_classifier(spark, sf_small).collect()}
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    assert len(rows) == len(docs)
    for doc in docs:
        toks = _tokens(doc.text or "")
        score = sum(
            ((_QC_A * _bucket(w) + _QC_B) % _MH_P) % 2001 - 1000 for w in toks
        )
        r = rows[doc.doc_id]
        assert r.n_tokens == len(toks)
        assert r.score == score
        assert r.keep == (1 if score > 0 else 0)


def test_quality_classifier_keeps_tokenless_docs_as_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "hello world hello", "en", "a", 17),
            (2, "", "en", "a", 0),
            (3, "!!! ... ???", "en", "a", 11),
            (4, None, "en", "a", 0),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    rows = {r.doc_id: r for r in d_quality_classifier(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3, 4}, "no document silently vanishes"
    for did in (2, 3, 4):
        assert rows[did].n_tokens == 0
        assert rows[did].score == 0
        assert rows[did].keep == 0
    assert rows[1].n_tokens == 3


# --------------------------------------------------------- schema evolution


def test_schema_evolution_merge_read(spark, tmp_path):
    from data_spark.io import read_versioned, write_versioned

    base = str(tmp_path / "tbl")
    v0_df = spark.createDataFrame(
        [(1, "en"), (2, "de")], "doc_id bigint, lang string"
    )
    v1_df = spark.createDataFrame(
        [(3, "en", "long")], "doc_id bigint, lang string, quality_tier string"
    )
    assert write_versioned(v0_df, base, "overwrite") == 0
    # enforcement (r9) rejects the widened batch without the opt-in
    import pytest as _pytest

    with _pytest.raises(ValueError, match="allow_schema_evolution"):
        write_versioned(v1_df, base, "append")
    assert (
        write_versioned(v1_df, base, "append", allow_schema_evolution=True) == 1
    )

    # time travel to v0 keeps the ORIGINAL two-column schema
    old = read_versioned(spark, base, version=0)
    assert old.columns == ["doc_id", "lang"]
    assert old.count() == 2

    # merged read at latest: three columns, NULL backfill on v0 rows only
    merged = read_versioned(spark, base, merge_schema=True)
    assert set(merged.columns) == {"doc_id", "lang", "quality_tier"}
    got = {r.doc_id: r.quality_tier for r in merged.collect()}
    assert got == {1: None, 2: None, 3: "long"}


def test_schema_evolution_gate_census(spark, sf_small):
    out = {(r.lang, r.tier): r.n for r in m_schema_evolution(spark, sf_small).collect()}
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    expect: Counter = Counter()
    for d in docs:
        expect[(d.lang, "none")] += 1  # v0 rows: column did not exist yet
        expect[(d.lang, "long" if d.n_chars >= 400 else "short")] += 1
    assert out == dict(expect)


# ------------------------------------------------------------ hamming topk


def test_hamming_topk_matches_python_mirror(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    sigs = {r.doc_id: r.sig for r in _spark_simhash_sigs(docs).collect()}
    out = defaultdict(list)
    for r in v_hamming_topk(spark, sf_small).collect():
        out[r.qid].append((r.rank, r.neighbor_id, r.hamming))

    queries = {d: s for d, s in sigs.items() if d % 50 == 0}
    corpus = {d: s for d, s in sigs.items() if d % 50 != 0}
    assert queries, "query set must be non-empty at sf0.001"
    for qid, qsig in queries.items():
        ranked = sorted(
            ((bin(qsig ^ csig).count("1"), cid) for cid, csig in corpus.items())
        )[:5]
        expect = [(i + 1, cid, ham) for i, (ham, cid) in enumerate(ranked)]
        assert sorted(out[qid]) == expect, qid
    assert set(out) == set(queries)
