"""Round-4 late additions: bucketed SMB join, blocked edit-distance
matching, k-core peeling, weighted median, duplicated-passage ratio,
CDC apply. The driver gate hash-checks all six against DuckDB; these
tests pin the semantic invariants a hash can't explain when it breaks,
plus the zero-shuffle plan property that IS the point of bucketing."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

import data_spark.queries.matching as mmod
from data_spark.queries.matching import (
    _KCORE_K,
    _KCORE_PEELS,
    a_weighted_median,
    bucketed_orders_lineitem,
    d_dup_passages,
    d_edit_distance_block,
    g_kcore_peel,
    m_cdc_apply,
)


def test_bucketed_smb_join_is_shuffle_free(spark, sf_small):
    """The whole reason to bucket: with both sides bucketed on the join
    key (same bucket count) the join stage needs NO exchange. Probe
    with auto-broadcast off so AQE can't hide the shuffle a broken
    bucketing would need."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, li = bucketed_orders_lineitem(spark, sf_small)
        joined = o.join(li, o.o_orderkey == li.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan[:2000]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the bucketed write preserved every row
    from data_spark.queries.common import t as read

    assert o.count() == read(spark, sf_small, "orders").count()
    assert li.count() == read(spark, sf_small, "lineitem").count()


def test_kcore_peel_matches_python_mirror(spark, sf_small):
    """Three peel rounds in plain Python over the collected edge set
    must reproduce the distributed survivors and degrees exactly."""
    from data_spark.queries.common import t as read

    l = read(spark, sf_small, "lineitem").select("l_orderkey", "l_suppkey")
    o = read(spark, sf_small, "orders").select("o_orderkey", "o_custkey")
    edges = {
        (f"s{r['l_suppkey']}", f"c{r['o_custkey']}")
        for r in l.join(o, l.l_orderkey == o.o_orderkey).collect()
    }
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    for _ in range(_KCORE_PEELS):
        deg: dict[str, int] = {}
        for a, _b in sym:
            deg[a] = deg.get(a, 0) + 1
        alive = {n for n, d in deg.items() if d >= _KCORE_K}
        sym = [(a, b) for a, b in sym if a in alive and b in alive]
    expect: dict[str, int] = {}
    for a, _b in sym:
        expect[a] = expect.get(a, 0) + 1
    got = {r["node"]: r["degree"] for r in g_kcore_peel(spark, sf_small).collect()}
    assert got == expect
    assert got, "peeled graph should not be empty at sf0.001"


def test_weighted_median_crosses_half_total_weight(spark, monkeypatch):
    rows = [
        # flag A: weights 1,1,10 → total 12; cum at 10→1, 20→2, 30→12;
        # first price with 2·cum ≥ 12 is 30
        ("A", 10.0, 1.0),
        ("A", 20.0, 1.0),
        ("A", 30.0, 10.0),
        # flag B: tied prices share one RANGE-cumulative → median 5
        ("B", 5.0, 1.0),
        ("B", 5.0, 1.0),
        ("B", 9.0, 1.0),
    ]
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    )
    monkeypatch.setattr(mmod, "t", lambda s, d, n: li)
    got = {r["flag"]: r["wmedian"] for r in a_weighted_median(spark, "x").collect()}
    assert got == {"A": 30.0, "B": 5.0}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_edit_block_catches_head_and_tail_mutations(spark, monkeypatch):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mid_mut = "alpha beta gamma delta orange zeta eta theta iota kappa"
    # head mutated → only the tail-key pass can block these together
    head_mut = "omega beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [(1, base), (2, mid_mut), (3, head_mut), (4, other)])
    monkeypatch.setattr(mmod, "t", lambda s, d, n: docs)
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in d_edit_distance_block(spark, "x").collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    texts = {1: base, 2: mid_mut, 3: head_mut}
    assert got == {
        (a, b): lev(texts[a], texts[b]) for a, b in ((1, 2), (1, 3), (2, 3))
    }
    assert all(4 not in pair for pair in got)


def test_dup_passage_ratio_flags_shared_spans(spark, monkeypatch):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-gram
    docs = _docs(
        spark,
        [
            (1, shared + " uniq1a uniq1b uniq1c"),
            (2, shared + " uniq2a uniq2b uniq2c"),
            (3, "solo1 solo2 solo3 solo4 solo5 solo6 solo7 solo8 solo9"),
        ],
    )
    monkeypatch.setattr(mmod, "t", lambda s, d, n: docs)
    got = {
        r["doc_id"]: (r["n_shingles"], r["dup_ratio"])
        for r in d_dup_passages(spark, "x").collect()
    }
    # docs 1/2: 4 shingles each (positions 1-4), only the first shared
    assert got[1] == (4, 0.25) and got[2] == (4, 0.25)
    assert got[3] == (2, 0.0)


def test_cdc_apply_last_writer_wins_and_tombstones(spark, monkeypatch):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # key 1: I then U → final price 20 via the newer op
        (2, 1, 10.0, t0),
        (4, 1, 20.0, t0 + dt.timedelta(days=1)),  # orderkey 4 % 2 == 0 → U
        # key 2: newest op is a delete (orderkey 11 % 11 == 0) → absent
        (3, 2, 30.0, t0),
        (11, 2, 40.0, t0 + dt.timedelta(days=2)),
        # key 3: same-ts tie broken by orderkey desc → price 60
        (5, 3, 50.0, t0),
        (7, 3, 60.0, t0),
    ]
    o = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderdate timestamp"
    )
    monkeypatch.setattr(mmod, "t", lambda s, d, n: o)
    got = {
        r["key"]: (r["final_price"], r["last_op"])
        for r in m_cdc_apply(spark, "x").collect()
    }
    assert got == {1: (20.0, "U"), 3: (60.0, "I")}
    assert 2 not in got


def test_bucketed_point_lookup_prunes_buckets(spark, sf_small):
    """Bucket pruning: an equality filter on the bucket key reads ONE
    of the 8 buckets — at 100 TB a point lookup touches 1/8th of the
    files before row-group statistics even apply. (Auto-bucketed-scan
    is forced on: Spark's planner otherwise skips bucketed reading for
    filter-only plans, silently giving up the pruning.)"""
    o, _li = bucketed_orders_lineitem(spark, sf_small)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            o.filter(o.o_orderkey == 42)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:1500]


def test_dq_audit_counts_injected_violations(spark, monkeypatch):
    """Each rule must count exactly the violations planted in a
    synthetic trio of tables."""
    import data_spark.queries.quality as qmod
    from data_spark.queries.quality import dq_constraint_audit

    orders = spark.createDataFrame(
        [
            (1, 10, "O"), (1, 10, "F"),          # dup orderkey → 1 violation
            (2, 99, "P"),                          # orphan custkey
            (3, 10, "X"),                          # bad status
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string",
    )
    lineitem = spark.createDataFrame(
        [(1, None, 0.5, 1.0), (2, dt.datetime(2024, 1, 1), 1.5, 0.0)],
        "l_orderkey bigint, l_shipdate timestamp, l_discount double, l_quantity double",
    )
    customer = spark.createDataFrame([(10,)], "c_custkey bigint")
    frames = {"orders": orders, "lineitem": lineitem, "customer": customer}
    monkeypatch.setattr(qmod, "t", lambda s, d, n: frames[n])
    got = {r["rule"]: r["n_violations"] for r in dq_constraint_audit(spark, "x").collect()}
    assert got == {
        "orderkey_unique": 1,
        "custkey_fk_orphans": 1,
        "shipdate_not_null": 1,
        "discount_in_range": 1,
        "quantity_positive": 1,
        "orderstatus_domain": 1,
    }


def test_spatial_grid_join_matches_brute_force(spark, sf_small):
    """The grid join must find EXACTLY the brute-force pair set (grid
    banding is lossless for radius <= cell size)."""
    from data_spark.queries.common import t as read
    from data_spark.queries.quality import _SP_MOD, _SP_R2, s_spatial_grid_join

    import hashlib

    keys = [r["c_custkey"] for r in read(spark, sf_small, "customer").collect()]

    def coord(prefix, k):
        return int(hashlib.md5(f"{prefix}{k}".encode()).hexdigest()[:15], 16) % _SP_MOD

    pts = {k: (coord("x", k), coord("y", k)) for k in keys}
    expect = {
        (a, b): (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
        for a in keys
        for b in keys
        if a < b
        and (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2 <= _SP_R2
    }
    got = {
        (r["id_a"], r["id_b"]): r["dist2"]
        for r in s_spatial_grid_join(spark, sf_small).collect()
    }
    assert got == expect


def test_bom_rollup_two_levels(spark, monkeypatch):
    import data_spark.queries.quality as qmod
    from data_spark.queries.quality import h_bom_rollup

    # hierarchy under node 1: children 10..19? keep tiny: node 1 has
    # children 10, 11; node 10 has children 100, 101
    part = spark.createDataFrame(
        [(1, 1.0), (10, 2.0), (11, 4.0), (100, 8.0), (101, 16.0)],
        "p_partkey bigint, p_retailprice double",
    )
    monkeypatch.setattr(qmod, "t", lambda s, d, n: part)
    got = {
        r["part_key"]: (r["n_children"], r["n_grandchildren"], r["subtree_price"])
        for r in h_bom_rollup(spark, "x").collect()
    }
    assert got[1] == (2, 2, 1.0 + 2.0 + 4.0 + 8.0 + 16.0)
    assert got[10] == (2, 0, 2.0 + 8.0 + 16.0)
    assert got[11] == (0, 0, 4.0)
    assert got[100] == (0, 0, 8.0)


def test_incremental_agg_split_invariance(spark, sf_small):
    """The maintenance law: folding any split of the data into state
    must equal the one-shot aggregate — including a 3-way incremental
    chain (state ⊕ delta1 ⊕ delta2)."""
    from data_spark.operators.incremental_agg import (
        aggregate_state,
        maintain_aggregate,
    )
    from data_spark.queries.common import t as read

    o = read(spark, sf_small, "orders")
    kw = dict(
        keys=["o_orderpriority"],
        sum_cols=["o_totalprice"],
        min_cols=["o_totalprice"],
        max_cols=["o_totalprice"],
    )
    full = {
        r["o_orderpriority"]: (
            r["cnt"], r["sum_o_totalprice"], r["min_o_totalprice"], r["max_o_totalprice"]
        )
        for r in aggregate_state(o, **kw).collect()
    }
    state = aggregate_state(o.filter(F.col("o_orderkey") % 3 == 0), **kw)
    state = maintain_aggregate(state, o.filter(F.col("o_orderkey") % 3 == 1), **kw)
    state = maintain_aggregate(state, o.filter(F.col("o_orderkey") % 3 == 2), **kw)
    got = {
        r["o_orderpriority"]: (
            r["cnt"], r["sum_o_totalprice"], r["min_o_totalprice"], r["max_o_totalprice"]
        )
        for r in state.collect()
    }
    assert got == full
