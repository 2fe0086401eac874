"""Python-mirror exactness tests for the mining tier
(data_spark/queries/mining.py): synchronous label propagation,
item-based collaborative filtering, and calendar growth. The DuckDB
oracles hash-check these queries against another SQL engine; these
mirrors check them against from-scratch pure-Python implementations so
a shared misreading of the algorithm can't hide in both SQL dialects.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import Decimal

from data_spark.queries.mining import (
    _CF_MIN_SUPPORT,
    _CF_TOP,
    _LPA_ROUNDS,
    a_itemcf_recommend,
    a_yoy_growth,
    g_label_propagation,
)


def _edges(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    rows = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select("l_suppkey", "o_custkey")
        .distinct()
        .collect()
    )
    return {(f"s{r.l_suppkey}", f"c{r.o_custkey}") for r in rows}


def test_label_propagation_matches_python_mirror(spark, sf_small):
    got = {
        r.id: r.community for r in g_label_propagation(spark, sf_small).collect()
    }

    adj = defaultdict(set)
    for s, c in _edges(spark, sf_small):
        adj[s].add(c)
        adj[c].add(s)
    lbl = {v: v for v in adj}
    for _ in range(_LPA_ROUNDS):
        votes = {v: Counter(lbl[n] for n in adj[v]) for v in adj}
        # (count DESC, label ASC) argmax — the query's MIN(STRUCT(-c, l))
        lbl = {
            v: min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for v, c in votes.items()
        }
    assert got == lbl
    # after 3 rounds on a dense bipartite-ish graph the labels must have
    # coalesced well below one-community-per-node
    assert len(set(got.values())) < len(got)


def test_itemcf_matches_python_mirror(spark, sf_small):
    rows = a_itemcf_recommend(spark, sf_small).collect()
    assert len(rows) == _CF_TOP

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    items = {(r.l_orderkey, r.l_partkey) for r in li.collect()}
    cust_orders = defaultdict(set)
    for r in orders.collect():
        cust_orders[r.o_custkey].add(r.o_orderkey)
    target = min(cust_orders, key=lambda c: (-len(cust_orders[c]), c))
    seed = {p for (o, p) in items if o in cust_orders[target]}

    baskets = defaultdict(set)
    for o, p in items:
        baskets[o].add(p)
    pair_cnt = Counter()
    for parts in baskets.values():
        sp = sorted(parts)
        for i, pa in enumerate(sp):
            for pb in sp[i + 1 :]:
                pair_cnt[(pa, pb)] += 1
                pair_cnt[(pb, pa)] += 1
    score = Counter()
    links = Counter()
    for (pa, pb), n in pair_cnt.items():
        if n >= _CF_MIN_SUPPORT and pa in seed and pb not in seed:
            score[pb] += n
            links[pb] += 1
    expect = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:_CF_TOP]
    assert [(r.part, r.score) for r in rows] == expect
    for r in rows:
        assert r.n_seed_links == links[r.part]
        assert r.part not in seed


def test_yoy_growth_matches_python_mirror(spark, sf_small):
    rows = a_yoy_growth(spark, sf_small).collect()

    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    )
    monthly = defaultdict(Decimal)
    for r in orders.collect():
        monthly[r.o_orderdate.strftime("%Y-%m")] += Decimal(
            str(r.o_totalprice)
        ).quantize(Decimal("0.000001"))
    months = sorted(monthly)
    assert [r.month for r in rows] == months

    rev = {m: float(monthly[m]) for m in months}
    for i, r in enumerate(rows):
        assert abs(r.revenue - rev[r.month]) < 1e-6
        if i == 0:
            assert r.mom_pct is None
        else:
            assert abs(r.mom_pct - round(rev[r.month] / rev[months[i - 1]] - 1.0, 6)) < 1e-9
        if i < 12:
            assert r.yoy_pct is None
        else:
            # lag(12) over the dense spine is exactly the same calendar
            # month one year earlier — verify the alignment, not just
            # the ratio
            prev = months[i - 12]
            assert prev[5:] == r.month[5:]
            assert int(prev[:4]) == int(r.month[:4]) - 1
            assert abs(r.yoy_pct - round(rev[r.month] / rev[prev] - 1.0, 6)) < 1e-9
