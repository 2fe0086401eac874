"""Python-mirror exactness tests for the mining tier
(data_spark/queries/mining.py): synchronous label propagation,
item-based collaborative filtering, and calendar growth. The DuckDB
oracles hash-check these queries against another SQL engine; these
mirrors check them against from-scratch pure-Python implementations so
a shared misreading of the algorithm can't hide in both SQL dialects.
"""

from __future__ import annotations

import pytest

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
            assert abs(r.mom_pct - (rev[r.month] / rev[months[i - 1]] - 1.0)) < 1e-12
        if i < 12:
            assert r.yoy_pct is None
        else:
            # lag(12) over the dense spine is exactly the same calendar
            # month one year earlier — verify the alignment, not just
            # the ratio
            prev = months[i - 12]
            assert prev[5:] == r.month[5:]
            assert int(prev[:4]) == int(r.month[:4]) - 1
            assert abs(r.yoy_pct - (rev[r.month] / rev[prev] - 1.0)) < 1e-12


def test_global_row_number_total_and_partition_invariant(spark, sf_small):
    from pyspark.sql import functions as F

    from data_spark.operators.order import global_row_number

    d = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]+", " ")).alias("nt"),
    )
    expect = [
        r.doc_id
        for r in d.orderBy("nt", "doc_id").select("doc_id").collect()
    ]
    for n_parts in (1, 3, 16):
        ranked = global_row_number(d, ["nt", "doc_id"], num_partitions=n_parts)
        rows = ranked.orderBy("rn").select("doc_id", "rn").collect()
        assert [r.rn for r in rows] == list(range(1, len(expect) + 1))
        assert [r.doc_id for r in rows] == expect


@pytest.mark.slow
def test_sorted_neighborhood_matches_python_mirror(spark, sf_small):
    import re

    from data_spark.queries.mining import (
        _SN_MAX_DIST,
        _SN_WINDOW,
        d_sorted_neighborhood,
    )

    got = {
        (r.doc_a, r.doc_b): (r.gap, r.dist)
        for r in d_sorted_neighborhood(spark, sf_small).collect()
    }

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    norm = {
        d.doc_id: re.sub(r"[^a-z0-9 ]+", " ", d.text.lower()).strip()
        for d in docs
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    order = sorted(norm, key=lambda i: (norm[i], i))
    expect = {}
    for i, da in enumerate(order):
        for gap in range(1, _SN_WINDOW + 1):
            if i + gap >= len(order):
                break
            db = order[i + gap]
            d_ = lev(norm[da], norm[db])
            if d_ <= _SN_MAX_DIST:
                expect[(da, db)] = (gap, d_)
    assert got == expect
    # the blocking result must include at least one adjacent near-dup
    assert any(gap == 1 for gap, _ in got.values())


def test_containment_pairs_matches_python_mirror(spark, sf_small):
    import re
    from collections import Counter

    from data_spark.queries.mining import (
        _CT_MAX_DF,
        _CT_MIN,
        _CT_N,
        d_containment_pairs,
    )

    rows = d_containment_pairs(spark, sf_small).collect()

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    shingles = {}
    for d in docs:
        words = [
            w
            for w in re.sub(r"[^a-z0-9 ]+", " ", d.text.lower()).strip().split()
            if w
        ]
        if len(words) >= _CT_N:
            shingles[d.doc_id] = {
                " ".join(words[i : i + _CT_N])
                for i in range(len(words) - _CT_N + 1)
            }
    df_cnt = Counter(s for ss in shingles.values() for s in ss)
    guarded = {
        i: {s for s in ss if df_cnt[s] <= _CT_MAX_DF}
        for i, ss in shingles.items()
    }
    ids = sorted(guarded)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            common = len(guarded[a] & guarded[b])
            if not common:
                continue
            na, nb = len(guarded[a]), len(guarded[b])
            if common / na >= _CT_MIN or common / nb >= _CT_MIN:
                expect[(a, b)] = (common, na, nb)
    assert {(r.doc_a, r.doc_b): (r.n_common, r.n_a, r.n_b) for r in rows} == expect
    for r in rows:
        assert abs(r.cont_a - round(r.n_common / r.n_a, 6)) < 1e-12
        assert abs(r.cont_b - round(r.n_common / r.n_b, 6)) < 1e-12


def test_rake_matches_python_mirror(spark, sf_small):
    import re
    from collections import Counter, defaultdict as dd
    from decimal import Decimal

    from data_spark.queries.mining import (
        _RAKE_MAX_LEN,
        _RAKE_STOP,
        _RAKE_TOP,
        d_rake_keywords,
    )

    rows = d_rake_keywords(spark, sf_small).collect()
    assert len(rows) == _RAKE_TOP

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    phrases = []
    for d in docs:
        words = re.sub(r"[^a-z0-9 ]+", " ", d.text.lower()).strip().split()
        run = []
        for w in words + [None]:
            if w is None or w in _RAKE_STOP or w == "":
                if run and len(run) <= _RAKE_MAX_LEN:
                    phrases.append(" ".join(run))
                run = []
            else:
                run.append(w)
    freq, deg = Counter(), Counter()
    for p in phrases:
        ws = p.split()
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    score_w = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
    n_occ = Counter(phrases)
    scored = {
        p: sum(score_w[w] for w in p.split()) / 1_000_000 for p in n_occ
    }
    expect = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:_RAKE_TOP]
    assert [(r.phrase, r.score) for r in rows] == expect
    for r in rows:
        assert r.n_occ == n_occ[r.phrase]


def test_winsorize_matches_python_mirror(spark, sf_small):
    from collections import defaultdict as dd

    from data_spark.queries.mining import d_winsorize

    rows = {r.source: r for r in d_winsorize(spark, sf_small).collect()}

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "source", "n_chars"
    ).collect()
    by_src = dd(list)
    for r in docs:
        by_src[r.source].append(r.n_chars)

    def q_cont(vals, q):
        s = sorted(vals)
        idx = (len(s) - 1) * q
        lo, hi = int(idx // 1), min(int(idx // 1) + 1, len(s) - 1)
        frac = idx - lo
        return (1 - frac) * s[lo] + frac * s[hi]

    assert set(rows) == set(by_src)
    for src, vals in by_src.items():
        r = rows[src]
        p05, p95 = q_cont(vals, 0.05), q_cont(vals, 0.95)
        assert abs(r.p05 - p05) < 1e-9 and abs(r.p95 - p95) < 1e-9
        assert r.n == len(vals)
        assert r.n_clip_low == sum(1 for v in vals if v < p05)
        assert r.n_clip_high == sum(1 for v in vals if v > p95)
        wm = sum(min(max(float(v), p05), p95) for v in vals) / len(vals)
        assert abs(r.wins_mean - wm) < 1e-5
        # the winsorized mean is pulled inside the clip bounds
        assert p05 <= r.wins_mean <= p95


def test_ppr_matches_python_mirror(spark, sf_small):
    from collections import defaultdict as dd

    from data_spark.queries.mining import (
        _PPR_DAMPING,
        _PPR_ITERATIONS,
        _PPR_SOURCE,
        g_ppr_personalized,
    )

    got = {
        r.id: r.rank_e8 / 1e8
        for r in g_ppr_personalized(spark, sf_small).collect()
    }

    out = dd(list)
    nodes = set()
    for s, c in _edges(spark, sf_small):
        out[s].append(c)
        nodes.update((s, c))
    rank = {v: 1.0 if v == _PPR_SOURCE else 0.0 for v in nodes}
    for _ in range(_PPR_ITERATIONS):
        inflow = dd(float)
        for u, nbrs in out.items():
            share = rank[u] / len(nbrs)
            for v in nbrs:
                inflow[v] += share
        rank = {
            v: ((1.0 - _PPR_DAMPING) if v == _PPR_SOURCE else 0.0)
            + _PPR_DAMPING * inflow[v]
            for v in nodes
        }
    assert set(got) == nodes
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-6
    # mass concentrates at the restart node
    assert max(got, key=got.get) == _PPR_SOURCE
    # customers of s1 outrank customers never reached from it
    assert got[_PPR_SOURCE] > 0.1


def test_seasonal_index_matches_python_mirror(spark, sf_small):
    from collections import defaultdict as dd
    from decimal import Decimal

    from data_spark.queries.mining import a_seasonal_index

    rows = {r.moy: r for r in a_seasonal_index(spark, sf_small).collect()}
    assert set(rows) == set(range(1, 13))

    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    monthly = dd(Decimal)
    for r in orders:
        monthly[r.o_orderdate.strftime("%Y-%m")] += Decimal(
            str(r.o_totalprice)
        ).quantize(Decimal("0.000001"))
    months = sorted(monthly)
    ratios = dd(list)
    for i, m in enumerate(months):
        lo, hi = i - 5, i + 6
        if lo < 0 or hi >= len(months):
            continue
        tsum = float(sum(monthly[months[j]] for j in range(lo, hi + 1)))
        ratios[int(m[5:])].append(
            Decimal(str(round(float(monthly[m]) / (tsum / 12), 6)))
        )
    for moy, rs in ratios.items():
        r = rows[moy]
        assert r.n_years == len(rs)
        assert abs(r.seasonal_index - float(sum(rs)) / len(rs)) < 1e-9
    # a seasonal index is a ratio around 1
    assert all(0.5 < r.seasonal_index < 2.0 for r in rows.values())


def test_multitouch_attrib_matches_python_mirror(spark, sf_small):
    from collections import defaultdict as dd
    from datetime import timedelta

    from data_spark.queries.mining import _MT_WINDOW_DAYS, j_multitouch_attrib

    rows = {r.click_day: r for r in j_multitouch_attrib(spark, sf_small).collect()}

    events = spark.read.parquet(f"{sf_small}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    clicks = dd(list)
    purchases = []
    for e in events:
        if e.event_type == "click":
            clicks[e.user_id].append(e)
        elif e.event_type == "purchase":
            purchases.append(e)
    credit = dd(int)
    touches = dd(int)
    for p in purchases:
        qual = [
            c
            for c in clicks[p.user_id]
            if c.ts <= p.ts and c.ts > p.ts - timedelta(days=_MT_WINDOW_DAYS)
        ]
        if not qual:
            continue
        share = 1_000_000 // len(qual)
        for c in qual:
            day = c.ts.strftime("%Y-%m-%d")
            credit[day] += share
            touches[day] += 1
    assert set(rows) == set(credit)
    for day, r in rows.items():
        assert r.n_touches == touches[day]
        assert abs(r.credit - credit[day] / 1_000_000) < 1e-12
    # every purchase hands out at most one unit of credit in total
    assert sum(r.credit for r in rows.values()) <= len(purchases) + 1e-6


def test_phonetic_key_goldens_cross_engine(spark):
    """Golden phonetic keys (classic soundex examples where the
    simplified spec agrees) checked on BOTH engines: the Spark column
    chain and the paired DuckDB SQL must encode identically for every
    input, including the degenerate ones."""
    import duckdb

    from data_spark.functions.text import phonetic_key, phonetic_key_sql
    from pyspark.sql import functions as F

    cases = {
        "robert": "R163",
        "rupert": "R163",
        "pfister": "P236",
        "tymczak": "T522",
        "honeyman": "H555",
        "smith": "S530",
        "smyth": "S530",
        "a": "A000",
        "": "",
        "123": "",
        "O'Brien": "O165",
    }
    df = spark.createDataFrame([(w,) for w in cases], "w string")
    got = {r.w: r.k for r in df.select("w", phonetic_key(F.col("w")).alias("k")).collect()}
    assert got == cases

    con = duckdb.connect()
    for w, expect in cases.items():
        lit = "'" + w.replace("'", "''") + "'"
        val = con.sql(f"SELECT {phonetic_key_sql(lit)} AS k").fetchone()[0]
        assert (val or "") == expect, (w, val, expect)


def test_bpe_train_matches_python_mirror(spark, sf_small):
    import re
    from collections import Counter

    from data_spark.queries.mining import _BPE_ROUNDS, _BPE_SEP, d_bpe_train

    rows = d_bpe_train(spark, sf_small).collect()
    assert [r.rnd for r in sorted(rows, key=lambda r: r.rnd)] == list(
        range(1, _BPE_ROUNDS + 1)
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    words = Counter()
    for d in docs:
        for w in re.sub(r"[^a-z0-9 ]+", " ", d.text.lower()).strip().split():
            if w:
                words[w] += 1
    sep = _BPE_SEP
    vocab = {sep + sep.join(w) + sep: n for w, n in words.items()}

    expect = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        pair_cnt = Counter()
        for s, n in vocab.items():
            toks = [x for x in s.split(sep) if x]
            for a, b in zip(toks, toks[1:]):
                pair_cnt[(a, b)] += n
        (a, b), cnt = min(
            pair_cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expect.append((rnd, a, b, a + b, cnt))
        # the query's merge semantics: python str.replace IS
        # leftmost-non-overlapping, same as both engines' replace
        vocab = {
            s.replace(f"{sep}{a}{sep}{b}{sep}", f"{sep}{a}{b}{sep}"): n
            for s, n in vocab.items()
        }
    got = [
        (r.rnd, r.left_tok, r.right_tok, r.merged, r.cnt)
        for r in sorted(rows, key=lambda r: r.rnd)
    ]
    assert got == expect
    # merge counts are non-increasing across rounds (the most frequent
    # pair is consumed each round)
    cnts = [c for *_, c in got]
    assert cnts == sorted(cnts, reverse=True)


def test_bpe_apply_compression_law(spark, sf_small):
    from data_spark.queries.mining import d_bpe_apply

    rows = d_bpe_apply(spark, sf_small).collect()
    assert rows
    for r in rows:
        # tokens never exceed chars, and merging never drops below 1
        assert 1 <= r.n_tokens <= r.n_chars
    # the 5 learned merges must actually compress the weighted corpus
    total_chars = sum(r.n_chars * r.n_occurrences for r in rows)
    total_toks = sum(r.n_tokens * r.n_occurrences for r in rows)
    assert total_toks < total_chars


def test_max_drawdown_matches_python_mirror(spark, sf_small):
    from collections import defaultdict as dd
    from decimal import Decimal

    from data_spark.queries.mining import w_max_drawdown

    rows = {r.user_id: r.max_drawdown for r in w_max_drawdown(spark, sf_small).collect()}

    events = spark.read.parquet(f"{sf_small}/events.parquet").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    series = dd(list)
    for e in events:
        series[e.user_id].append((e.ts, e.event_id, Decimal(str(e.value))))
    assert set(rows) == set(series)
    for u, evs in series.items():
        cum = Decimal(0)
        peak = None
        best = Decimal(0)
        for _, _, v in sorted(evs, key=lambda x: (x[0], x[1])):
            cum += v
            peak = cum if peak is None else max(peak, cum)
            best = max(best, peak - cum)
        assert abs(rows[u] - float(best)) < 1e-9
        assert rows[u] >= 0.0


def test_gini_matches_python_mirror(spark, sf_small):
    from collections import defaultdict as dd
    from decimal import Decimal

    from data_spark.queries.mining import a_gini_revenue

    r = a_gini_revenue(spark, sf_small).collect()[0]

    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    ).collect()
    per = dd(Decimal)
    for o in orders:
        per[o.o_custkey] += Decimal(str(o.o_totalprice)).quantize(
            Decimal("0.000001")
        )
    xs = [x for _, x in sorted(per.items(), key=lambda kv: (kv[1], kv[0]))]
    n = len(xs)
    total = float(sum(xs))
    s_ix = float(sum(Decimal(i + 1) * x for i, x in enumerate(xs)))
    gini = 2.0 * s_ix / (n * total) - (n + 1.0) / n
    assert r.n_customers == n
    assert abs(r.total - total) < 1e-6
    assert abs(r.gini - gini) < 1e-12
    assert 0.0 <= r.gini < 1.0


def test_incr_join_maintain_law(spark, sf_small):
    from decimal import Decimal

    from pyspark.sql import functions as F

    from data_spark.queries.mining import m_incr_join_maintain

    got = {
        r.o_orderpriority: (r.n_lines, r.sum_price)
        for r in m_incr_join_maintain(spark, sf_small).collect()
    }
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    l = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    direct = {
        r.o_orderpriority: (r.n, float(r.s))
        for r in o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("s"),
        )
        .collect()
    }
    assert set(got) == set(direct)
    for k, (n, s) in direct.items():
        assert got[k][0] == n
        assert abs(got[k][1] - s) < 1e-6


def test_median_via_rank_matches_sorted_selection(spark, sf_small):
    from data_spark.queries.mining import a_median_via_rank

    r = a_median_via_rank(spark, sf_small).collect()[0]
    xs = sorted(
        x.l_extendedprice
        for x in spark.read.parquet(f"{sf_small}/lineitem.parquet")
        .select("l_extendedprice")
        .collect()
    )
    n = len(xs)
    lo, hi = xs[(n + 1) // 2 - 1], xs[(n + 2) // 2 - 1]
    assert r.n_rows == n
    assert r.x_lo == lo and r.x_hi == hi
    assert r.median == lo + 0.5 * (hi - lo)
    # sanity: the selected median sits inside the data range
    assert xs[0] <= r.median <= xs[-1]


def test_global_row_number_edge_cases(spark):
    from data_spark.operators.order import global_row_number

    empty = spark.createDataFrame([], "k string, v long")
    assert global_row_number(empty, ["k", "v"]).count() == 0

    one = spark.createDataFrame([("a", 1)], "k string, v long")
    rows = global_row_number(one, ["k", "v"], num_partitions=4).collect()
    assert [(r.k, r.v, r.rn) for r in rows] == [("a", 1, 1)]


def test_global_row_number_balances_skewed_keys(spark):
    """A constant primary order key must NOT collapse the range
    partitioning: the unique tiebreak column keeps partitions balanced,
    which is the whole point of the two-phase rank vs a single-partition
    window (a skewed ORDER BY key is exactly when it matters)."""
    from pyspark.sql import functions as F

    from data_spark.operators.order import global_row_number

    n, parts = 20_000, 8
    df = spark.range(n).select(
        F.lit("same").alias("k"), F.col("id").alias("v")
    )
    ranked = global_row_number(df, ["k", "v"], num_partitions=parts)
    rows = ranked.select("v", "rn").collect()
    assert sorted((r.v, r.rn) for r in rows) == [(i, i + 1) for i in range(n)]
    # balance: the ranged frame must not funnel into one partition
    sizes = [
        r["cnt"]
        for r in df.repartitionByRange(parts, F.col("k"), F.col("v"))
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    assert len(sizes) == parts
    assert max(sizes) < n * 0.5


def test_walk_sample_matches_python_mirror(spark, sf_small):
    from collections import defaultdict as dd

    from data_spark.queries.mining import (
        _WALK_A,
        _WALK_B,
        _WALK_C,
        _WALK_P,
        _WALK_STEPS,
        g_walk_sample,
    )

    rows = {
        r.start: tuple(r[f"hop{t}"] for t in range(1, _WALK_STEPS + 1))
        for r in g_walk_sample(spark, sf_small).collect()
    }

    adj = dd(set)
    for s, c in _edges(spark, sf_small):
        se = int(s[1:]) * 2
        ce = int(c[1:]) * 2 + 1
        adj[se].add(ce)
        adj[ce].add(se)

    def lbl(e):
        return f"s{e // 2}" if e % 2 == 0 else f"c{e // 2}"

    expect = {}
    for start in adj:
        cur, hops = start, []
        for t in range(1, _WALK_STEPS + 1):
            cur = min(
                adj[cur],
                key=lambda v: ((_WALK_A * cur + _WALK_B * v + _WALK_C * t) % _WALK_P, v),
            )
            hops.append(lbl(cur))
        expect[lbl(start)] = tuple(hops)
    assert rows == expect
    # walks traverse real edges and alternate graph sides (bipartite)
    for start, hops in rows.items():
        sides = [start[0]] + [h[0] for h in hops]
        assert all(a != b for a, b in zip(sides, sides[1:]))


@pytest.mark.slow
def test_er_score_fusion_matches_python_mirror(spark, sf_small):
    import re

    from data_spark.queries.mining import (
        _FUSE_MAX_DIST,
        _FUSE_MIN_SCORE_E6,
        _FUSE_WINDOW,
        d_er_score_fusion,
    )

    rows = {
        (r.doc_a, r.doc_b): (r.dist, r.score_e6)
        for r in d_er_score_fusion(spark, sf_small).collect()
    }

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    norm = {
        d.doc_id: re.sub(r"[^a-z0-9 ]+", " ", d.text.lower()).strip()
        for d in docs
    }

    def phonetic(word):
        s = re.sub(r"[^a-z]", "", word.lower())
        if not s:
            return ""
        head, tail = s[0], re.sub(r"[hw]", "", s[1:])
        table = str.maketrans(
            "abcdefghijklmnopqrstuvwxyz", "01230120022455012623010202"
        )
        digits = (head + tail).translate(table)
        for d_ in "123456":
            digits = re.sub(f"{d_}{d_}+", d_, digits)
        rest = digits[1:].replace("0", "")
        return head.upper() + (rest[:3] + "000")[:3]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    order = sorted(norm, key=lambda i: (norm[i], i))
    expect = {}
    for i, da in enumerate(order):
        for off in range(1, _FUSE_WINDOW + 1):
            if i + off >= len(order):
                break
            db = order[i + off]
            na, nb = norm[da], norm[db]
            if abs(len(na) - len(nb)) > _FUSE_MAX_DIST:
                continue
            dist = lev(na, nb)
            if dist > _FUSE_MAX_DIST:
                continue
            mx, mn = max(len(na), len(nb)), min(len(na), len(nb))
            pk_eq = int(
                phonetic(na.split(" ")[0] if na else "")
                == phonetic(nb.split(" ")[0] if nb else "")
            )
            score = (
                600000 * (mx - dist) // mx + 300000 * mn // mx + 100000 * pk_eq
            )
            if score >= _FUSE_MIN_SCORE_E6:
                expect[(da, db)] = (dist, score)
    assert rows == expect
    # every fused match clears the 0.70 bar and never exceeds 1.0
    assert all(
        _FUSE_MIN_SCORE_E6 <= s <= 1_000_000 for _, s in rows.values()
    )


def test_benford_digits_matches_python_mirror(spark, sf_small):
    import math
    from collections import Counter

    from data_spark.queries.mining import _BENFORD_E6, dq_benford_digits

    rows = {r.digit: r for r in dq_benford_digits(spark, sf_small).collect()}
    assert set(rows) == set(range(1, 10))

    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_totalprice"
    ).collect()
    cnt = Counter(
        int(str(int(math.floor(o.o_totalprice)))[0])
        for o in orders
        if o.o_totalprice >= 1
    )
    tot = sum(cnt.values())
    for d in range(1, 10):
        r = rows[d]
        assert r.n == cnt.get(d, 0)
        assert r.observed_e6 == cnt.get(d, 0) * 1_000_000 // tot
        # the expected lattice is the exact Benford table
        assert r.expected_e6 == _BENFORD_E6[d]
        assert abs(r.expected_e6 - round(math.log10(1 + 1 / d) * 1e6)) <= 1
        assert r.abs_dev_e6 == abs(r.observed_e6 - r.expected_e6)
    # micro-unit shares sum to ~1 (floor loss < 9 units)
    assert 1_000_000 - 9 <= sum(r.observed_e6 for r in rows.values()) <= 1_000_000
