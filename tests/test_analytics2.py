"""Python-mirror exactness tests for the round-4 continuation
analytics: the cross-engine-exact Count-Min Sketch and the
fixed-iteration weighted Bellman-Ford SSSP (data_spark/queries/
analytics2.py). The DuckDB oracles hash-check these against another
SQL engine; these mirrors check them against a from-scratch pure-Python
implementation, so a shared-SQL-misreading bug can't hide."""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import Decimal

import pytest

import re

from data_spark.queries.analytics2 import (
    _CMS_AB,
    _CMS_P,
    _CMS_TOP,
    _CMS_W,
    _PMI_TOP,
    _PMI_VOCAB,
    _SSSP_ROUNDS,
    _SSSP_SOURCE,
    a_cms_heavy_hitters,
    d_pmi_bigrams,
    g_sssp_bellman,
)


def test_cms_matches_python_mirror(spark, sf_small):
    rows = a_cms_heavy_hitters(spark, sf_small).collect()
    assert len(rows) == _CMS_TOP

    events = (
        spark.read.parquet(f"{sf_small}/events.parquet").select("user_id").collect()
    )
    truth = Counter(r.user_id for r in events)
    regs = defaultdict(int)
    for u, cnt in truth.items():
        for i, (a, b) in enumerate(_CMS_AB):
            regs[(i, ((a * u + b) % _CMS_P) % _CMS_W)] += cnt

    for r in rows:
        expect_true = truth[r.user_id]
        expect_est = min(
            regs[(i, ((a * r.user_id + b) % _CMS_P) % _CMS_W)]
            for i, (a, b) in enumerate(_CMS_AB)
        )
        assert r.true_cnt == expect_true
        assert r.est_cnt == expect_est
        # the CMS guarantee: never an underestimate
        assert r.est_cnt >= r.true_cnt

    # the query must have picked the true top-K (cnt desc, id asc)
    expect_top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:_CMS_TOP]
    assert sorted((r.user_id, r.true_cnt) for r in rows) == sorted(expect_top)


def test_sssp_matches_python_bellman_ford(spark, sf_small):
    got = {r.node: r.dist for r in g_sssp_bellman(spark, sf_small).collect()}

    l = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    pairs = l.join(o, l.l_orderkey == o.o_orderkey).collect()
    wt = {}
    for r in pairs:
        key = (f"s{r.l_suppkey}", f"c{r.o_custkey}")
        q = Decimal(str(r.l_quantity)).quantize(Decimal("0.01"))
        if key not in wt or q < wt[key]:
            wt[key] = q
    adj = defaultdict(list)
    for (a, b), w in wt.items():
        adj[a].append((b, w))
        adj[b].append((a, w))

    dist = {_SSSP_SOURCE: Decimal("0.00")}
    for _ in range(_SSSP_ROUNDS):
        nxt = dict(dist)
        for node, d in dist.items():
            for b, w in adj[node]:
                cand = d + w
                if b not in nxt or cand < nxt[b]:
                    nxt[b] = cand
        dist = nxt

    assert set(got) == set(dist)
    for node, d in dist.items():
        assert got[node] == pytest.approx(float(d), abs=0), node


def test_pmi_bigrams_matches_python_mirror(spark, sf_small):
    rows = d_pmi_bigrams(spark, sf_small).collect()
    assert len(rows) == _PMI_TOP

    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("text")
        .collect()
    ]
    uni = Counter()
    bi = Counter()
    docs_words = []
    for txt in texts:
        words = [
            w
            for w in re.sub(r"[^a-z0-9 ]+", " ", (txt or "").lower()).strip().split()
        ]
        docs_words.append(words)
        uni.update(w for w in words if w)
    vocab_terms = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:_PMI_VOCAB]
    vocab = dict(vocab_terms)
    n_uni = sum(vocab.values())
    for words in docs_words:
        for a, b in zip(words, words[1:]):
            if a in vocab and b in vocab:
                bi[(a, b)] += 1
    n_bi = sum(bi.values())
    top = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:_PMI_TOP]

    got = {(r.w1, r.w2): r for r in rows}
    assert set(got) == {pair for pair, _ in top}
    for (w1, w2), n_ab in top:
        r = got[(w1, w2)]
        assert r.n_ab == n_ab
        assert r.n_a == vocab[w1] and r.n_b == vocab[w2]
        expect = round(
            (float(n_ab) * float(n_uni) * float(n_uni))
            / (float(n_bi) * float(vocab[w1]) * float(vocab[w2])),
            6,
        )
        assert r.lift == pytest.approx(expect, rel=1e-12)


def test_hll_set_algebra_inclusion_exclusion(spark, monkeypatch):
    """Known overlap: A = users 0..999, B = users 500..1499 (true
    |A|=|B|=1000, |A∪B|=1500, |A∩B|=500 — all in the raw-harmonic zone
    at m=256). The pair estimates must respect sketch-algebra
    invariants and land within HLL tolerance of the truth."""
    import datetime as dt

    import data_spark.queries.analytics2 as a2
    from data_spark.queries.analytics2 import a_hll_set_algebra

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, i, "a", 1.0) for i in range(1000)] + [
        (10_000 + i, t0, i, "b", 1.0) for i in range(500, 1500)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    monkeypatch.setattr(a2, "t", lambda s, d, n: ev)
    [r] = a_hll_set_algebra(spark, "x").collect()
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    # sketch-algebra invariants hold regardless of estimation error
    assert r["est_union"] <= r["est_a"] + r["est_b"]
    assert r["est_intersection"] >= 0.0
    # 256 registers -> ~6.5% standard error per estimate; the
    # inclusion-exclusion intersection compounds three of them
    assert abs(r["est_a"] - 1000) / 1000 < 0.20
    assert abs(r["est_b"] - 1000) / 1000 < 0.20
    assert abs(r["est_union"] - 1500) / 1500 < 0.20
    assert abs(r["est_intersection"] - 500) / 500 < 0.60


def test_market_basket_matches_python_mirror(spark, sf_small):
    from data_spark.queries.analytics2 import (
        _MB_MIN_SUPPORT,
        _MB_TOP,
        a_market_basket,
    )

    rows = a_market_basket(spark, sf_small).collect()
    assert len(rows) == _MB_TOP

    items = {
        (r.l_orderkey, r.l_partkey)
        for r in spark.read.parquet(f"{sf_small}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    }
    baskets = defaultdict(set)
    for o, p in items:
        baskets[o].add(p)
    n_orders = len(baskets)
    part_n = Counter(p for _, p in items)
    pair_n = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, pa in enumerate(ps):
            for pb in ps[i + 1:]:
                pair_n[(pa, pb)] += 1
    rules = []
    for (pa, pb), n_ab in pair_n.items():
        if n_ab < _MB_MIN_SUPPORT:
            continue
        lift = float(n_ab) * float(n_orders) / (
            float(part_n[pa]) * float(part_n[pb])
        )
        rules.append((-lift, pa, pb, n_ab))
    rules.sort()
    expect = rules[:_MB_TOP]

    got = [(-r.lift, r.part_a, r.part_b, r.n_ab) for r in rows]
    assert got == expect
    for r in rows:
        assert r.n_a == part_n[r.part_a] and r.n_b == part_n[r.part_b]
        assert r.confidence == pytest.approx(r.n_ab / r.n_a, rel=1e-12)
