"""Python-mirror exactness and law tests for the round-6 continuation
tier (data_spark/queries/analytics5.py): C4-style duplicated-span
removal with document reassembly, and the deterministic bootstrap CI.
The DuckDB oracles hash-check each query against another SQL engine;
these mirrors check the SEMANTICS against from-scratch pure-Python
implementations, so a shared SQL misreading can't hide."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict
from decimal import Decimal

from data_spark.queries.analytics5 import (
    _LO_IDX,
    _HI_IDX,
    _MIN_SPAN,
    _N_BOOT,
    bootstrap_daily_total_ci,
    chunk_dedup_rewrite,
)


def _tokens(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9 ]+", " ", text.lower()).split() if w]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _chunks(text: str, mod: int = 16) -> list[list[str]]:
    """Content-defined chunks: a boundary falls AFTER a token whose
    portable hash ≡ 0 (mod mod)."""
    out, cur = [], []
    for tok in _tokens(text):
        cur.append(tok)
        if _h60(tok) % mod == 0:
            out.append(cur)
            cur = []
    if cur:
        out.append(cur)
    return out


def _mirror_rewrite(docs: dict[int, str], min_span: int = _MIN_SPAN):
    """Pure-python chunk_dedup_rewrite: global first-occurrence-wins on
    the chunk md5 for chunks of >= min_span tokens, then reassemble."""
    chunk_rows = []  # (doc_id, chunk_id, text, md5, n_tokens)
    for doc_id in sorted(docs):
        for cid, toks in enumerate(_chunks(docs[doc_id])):
            txt = " ".join(toks)
            chunk_rows.append(
                (doc_id, cid, txt, hashlib.md5(txt.encode()).hexdigest(), len(toks))
            )
    first = {}
    for doc_id, cid, txt, dig, n in chunk_rows:  # already (doc_id, cid) sorted
        first.setdefault(dig, (doc_id, cid))
    out = {}
    for doc_id in sorted(docs):
        rows = [r for r in chunk_rows if r[0] == doc_id]
        if not rows:
            continue
        kept = [r for r in rows if first[r[3]] == (r[0], r[1]) or r[4] < min_span]
        cleaned = " ".join(r[2] for r in kept)
        out[doc_id] = {
            "n_chunks": len(rows),
            "n_dropped": len(rows) - len(kept),
            "orig_tokens": sum(r[4] for r in rows),
            "kept_tokens": sum(r[4] for r in kept),
            "cleaned_md5": hashlib.md5(cleaned.encode()).hexdigest(),
        }
    return out


def _rewrite_df(spark, docs: dict[int, str], **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id bigint, text string"
    )
    return {r.doc_id: r.asDict() for r in chunk_dedup_rewrite(df, **kw).collect()}


def test_chunk_rewrite_matches_python_mirror(spark):
    docs = {
        1: "the quick brown fox jumps over the lazy dog near the old river bank today",
        2: "something fresh first then the quick brown fox jumps over the lazy dog near the old river bank today and a new tail",
        3: "entirely unrelated text with its own words flowing along quietly here",
        4: "the quick brown fox jumps over the lazy dog near the old river bank today",
    }
    got = _rewrite_df(spark, docs)
    want = _mirror_rewrite(docs)
    assert set(got) == set(want)
    for doc_id, w in want.items():
        g = got[doc_id]
        for k, v in w.items():
            assert g[k] == v, (doc_id, k, g[k], v)


def test_identical_doc_fully_deduped_first_occurrence_kept(spark):
    docs = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu",
        2: "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu",
    }
    got = _rewrite_df(spark, docs)
    # doc 1 keeps everything; doc 2 loses every chunk of >= _MIN_SPAN tokens.
    assert got[1]["n_dropped"] == 0
    assert got[1]["kept_tokens"] == got[1]["orig_tokens"] == 12
    mirror = _mirror_rewrite(docs)
    assert got[2]["n_dropped"] == mirror[2]["n_dropped"] > 0
    assert got[2]["kept_tokens"] == mirror[2]["kept_tokens"] < 12


def test_short_repeats_are_language_not_duplication(spark):
    # With min_span above every chunk size, nothing is ever dropped even
    # for byte-identical docs.
    docs = {
        1: "red green blue red green blue",
        2: "red green blue red green blue",
    }
    got = _rewrite_df(spark, docs, min_span=99)
    for doc_id in (1, 2):
        assert got[doc_id]["n_dropped"] == 0
        assert got[doc_id]["kept_tokens"] == got[doc_id]["orig_tokens"]
    # And the reassembled text is the original (cleaned fingerprint matches
    # the md5 of the space-joined token stream).
    want = hashlib.md5(b"red green blue red green blue").hexdigest()
    assert got[1]["cleaned_md5"] == want == got[2]["cleaned_md5"]


def test_chunk_rewrite_shift_robust(spark):
    # Prefix insertion shifts every offset; content-defined boundaries
    # still isolate the repeated passage, so it is detected and removed.
    # "india" hashes ≡ 0 (mod 16) — a boundary token — so everything
    # after it chunks identically in both docs despite the shift.
    passage = "wolves howl india across the frozen valley under a silver moon tonight"
    docs = {1: passage, 2: "breaking news update " + passage}
    got = _rewrite_df(spark, docs)
    mirror = _mirror_rewrite(docs)
    assert got[2]["n_dropped"] == mirror[2]["n_dropped"] >= 1
    assert got[2]["kept_tokens"] == mirror[2]["kept_tokens"] < got[2]["orig_tokens"]


def _orders_df(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderdate timestamp, o_totalprice double"
    )


def _mirror_bootstrap(day_totals: list[Decimal], n_boot: int = _N_BOOT):
    n = len(day_totals)
    boots = []
    for b in range(1, n_boot + 1):
        s = Decimal(0)
        for slot in range(1, n + 1):
            idx = _h60(f"{b}:{slot}") % n  # 0-based into the date-ordered days
            s += day_totals[idx]
        boots.append(s)
    boots.sort()
    return {
        "n_days": n,
        "n_boot": n_boot,
        "point_total_cents": int(sum(day_totals) * 100),
        "lo95_total_cents": int(boots[_LO_IDX - 1] * 100),
        "hi95_total_cents": int(boots[_HI_IDX - 1] * 100),
    }


def test_bootstrap_matches_python_mirror(spark):
    import datetime as dt

    rows = []
    day_totals = defaultdict(Decimal)
    k = 0
    for d in range(7):
        date = dt.datetime(2024, 3, 1 + d)
        for j in range(3):
            k += 1
            price = 100.25 + 13 * d + j
            rows.append((k, date, price))
            day_totals[date] += Decimal(str(price))
    got = bootstrap_daily_total_ci(_orders_df(spark, rows)).collect()[0].asDict()
    want = _mirror_bootstrap([day_totals[d] for d in sorted(day_totals)])
    assert got == want
    assert got["lo95_total_cents"] <= got["hi95_total_cents"]


def test_bootstrap_partition_invariant(spark):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 11)), float(50 + (i * 37) % 900) + 0.75)
        for i in range(200)
    ]
    base = _orders_df(spark, rows)
    a = bootstrap_daily_total_ci(base.repartition(1)).collect()
    b = bootstrap_daily_total_ci(base.repartition(7)).collect()
    assert a == b


def test_hll_sliding_window_equals_oneshot_per_window(spark, tmp_path):
    """Law: the register-MAX over the trailing 7-day window of DAILY
    registers equals the one-shot register build over the window's raw
    facts (HLL mergeability specialized to the sliding case), so the
    per-day estimate matches a from-scratch python HLL over exactly
    those days — and in the linear-counting regime it tracks the true
    distinct count closely."""
    import datetime as dt
    import math

    from data_spark.queries.analytics5 import _HLL_M, _HLL_W, a_hll_sliding_7d

    rows = []
    eid = 0
    for d in range(12):
        ts = dt.datetime(2024, 5, 1 + d)
        for u in range(100 + 7 * d):
            eid += 1
            # users overlap across days: ids drawn from a rolling range
            rows.append((eid, ts, (3 * d + u) % 211, "click", 1.0, None))
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    got = {
        (r.event_type, str(r.day)): r
        for r in a_hll_sliding_7d(spark, sf).collect()
    }

    def h60(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    by_day = defaultdict(set)
    for _, ts, u, *_ in rows:
        by_day[ts.date()].add(u)
    days = sorted(by_day)
    for d in days:
        window_users = set()
        for back in range(7):
            window_users |= by_day.get(d - dt.timedelta(days=back), set())
        regs = {}
        for u in window_users:
            h = h60(u)
            b, rest = h % _HLL_M, h // _HLL_M
            rho = (_HLL_W + 1) if rest == 0 else (_HLL_W + 1) - rest.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        used = len(regs)
        s_used = sum(1 << (_HLL_W + 1 - r) for r in regs.values())
        denom = s_used + (_HLL_M - used) * (1 << (_HLL_W + 1))
        alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
        raw = alpha * _HLL_M * _HLL_M * float(1 << (_HLL_W + 1)) / denom
        if raw <= 2.5 * _HLL_M and used < _HLL_M:
            est = _HLL_M * math.log(_HLL_M / (_HLL_M - used))
        else:
            est = raw
        r = got[("click", str(d))]
        assert r.buckets_used == used
        assert r.denom_scaled == denom
        assert abs(r.est_distinct - round(est, 4)) < 1e-9
        # linear-counting regime: estimate within 15% of truth
        assert abs(est - len(window_users)) / len(window_users) < 0.15


def test_weighted_jaccard_matches_python_mirror(spark):
    """Exact multiset Jaccard: engine pairs equal a from-scratch python
    Σmin/Σmax over the df-guarded vocabulary, repeated tokens count
    proportionally (two docs sharing one copy of a token score lower
    than two docs sharing all its copies), and the max_df guard drops
    ubiquitous tokens from the measure in BOTH engines."""
    from collections import Counter

    from data_spark.queries.analytics5 import weighted_jaccard_pairs

    docs = {
        1: "spark spark spark rows table join join filter",
        2: "spark spark spark rows table join join merge",
        3: "spark rows cats dogs birds fish mice deer",
        4: "unrelated words entirely different content here now",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id bigint, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.inter_w, r.union_w, r.jacc_micro)
        for r in weighted_jaccard_pairs(df, max_df=3, min_micro=1).collect()
    }

    tf = {i: Counter(_tokens(t)) for i, t in docs.items()}
    docfreq = Counter(tok for c in tf.values() for tok in c)
    guarded = {
        i: Counter({t: n for t, n in c.items() if docfreq[t] <= 3})
        for i, c in tf.items()
    }
    want = {}
    ids = sorted(docs)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            inter = sum((guarded[x] & guarded[y]).values())
            union = sum((guarded[x] | guarded[y]).values())
            if inter:
                want[(x, y)] = (inter, union, 10**6 * inter // union)
    assert got == want
    # multiset semantics: (1,2) share 3x spark + 2x join etc. -> high;
    # (1,3) share only 1x spark + 1x rows -> much lower
    assert got[(1, 2)][2] > got[(1, 3)][2]


def test_welch_t_matches_python_mirror(spark, tmp_path):
    """Welch t² from exact integer sufficient statistics equals a
    from-scratch python Welch computation (6-dp rounded), and the
    planted mean shift dominates every same-mean pair."""
    import os

    from data_spark.queries.analytics5 import a_welch_t

    rows = []
    doc = 0
    # en/es share a mean; fr is shifted well above both
    for lang, base in (("en", 100), ("es", 100), ("fr", 220)):
        for j in range(40):
            doc += 1
            rows.append((doc, "x", lang, "s", base + (j * 7) % 25))
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got = {(r.lang_a, r.lang_b): r for r in a_welch_t(spark, sf).collect()}

    by_lang = defaultdict(list)
    for _, _, lang, _, n in rows:
        by_lang[lang].append(n)

    def welch(xs, ys):
        nx, ny = len(xs), len(ys)
        mx, my = sum(xs) / nx, sum(ys) / ny
        vx = (sum(v * v for v in xs) - sum(xs) ** 2 / nx) / (nx - 1)
        vy = (sum(v * v for v in ys) - sum(ys) ** 2 / ny) / (ny - 1)
        return (mx - my) ** 2 / (vx / nx + vy / ny)

    for (a, b), r in got.items():
        want = welch(by_lang[a], by_lang[b])
        assert abs(r.t2 - round(want, 6)) < 1e-6, (a, b, r.t2, want)
        assert r.n_a == len(by_lang[a]) and r.n_b == len(by_lang[b])
    # the shifted language dominates: both fr pairs far exceed en-es
    assert got[("en", "fr")].t2 > 100 * got[("en", "es")].t2
    assert got[("es", "fr")].t2 > 100 * got[("en", "es")].t2


def test_bh_guard_raises_on_cardinality_drift(spark, sf_small, monkeypatch):
    """a_benjamini_hochberg bakes its 21 offline-solved thresholds in;
    if the observed hypothesis count ever drifts from len(thresholds),
    the query must raise loudly instead of producing a wrong-m BH
    decision."""
    import pytest as _pytest

    from data_spark.queries import analytics7

    monkeypatch.setattr(
        analytics7, "_BH_THRESHOLDS", analytics7._BH_THRESHOLDS[:-1]
    )
    with _pytest.raises(Exception, match="baked-in BH thresholds"):
        analytics7.a_benjamini_hochberg(spark, sf_small).collect()
