"""Operator-level tests: dedup (with exact-Jaccard oracle for the
approximate paths), merge/upsert, containment join, similarity recall."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_spark.operators.dedup import (
    exact_duplicate_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from data_spark.operators.joins import suffix_containment_join
from data_spark.operators.merge import delete_then_insert, merge_upsert
from data_spark.operators.similarity import cosine_topk, lsh_bucketed_topk


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("dog", "cat")),  # near dup
        (4, "completely different text about query engines and shuffles in spark"),
        (5, "another unrelated document mentioning benchmarks and parquet files only"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicate_groups(spark):
    got = exact_duplicate_groups(_docs(spark)).collect()
    assert len(got) == 1
    assert got[0]["keeper_id"] == 1
    assert got[0]["n_copies"] == 2


def test_ngram_jaccard_matches_bruteforce(spark):
    df = _docs(spark)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.3).collect()
    }

    # brute-force oracle in plain Python with identical tokenization
    import itertools
    import re

    def grams(t):
        words = re.sub(r"[^a-z0-9 ]+", " ", t.lower()).strip()
        words = re.split(r"\s+", words)
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)} if len(words) >= 3 else set()

    rows = {r["doc_id"]: grams(r["text"]) for r in df.collect()}
    expected = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        ga, gb = rows[a], rows[b]
        if not ga or not gb:
            continue
        j = len(ga & gb) / len(ga | gb)
        if j >= 0.3:
            expected[(a, b)] = round(j, 6)
    assert got == expected
    assert (1, 2) in got and got[(1, 2)] == 1.0


def test_minhash_lsh_finds_true_pairs(spark):
    df = _docs(spark)
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(df).collect()}
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 3) in pairs  # near dup should collide in ≥1 band
    assert (4, 5) not in pairs  # unrelated docs shouldn't


def test_simhash_near_duplicates(spark):
    df = _docs(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_duplicates(df, max_distance=16).collect()}
    assert pairs.get((1, 2)) == 0  # identical text: distance 0, guaranteed hit
    # beyond distance 3 the 4-chunk banding is probabilistic, so (1,3) at
    # distance ~12 may or may not collide — only assert no false positives
    for (a, b), d in pairs.items():
        assert d <= 16


def test_merge_upsert_last_write_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], ["id", "name", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21), (3, "c", 30)], ["id", "name", "v"]
    )
    got = {r["id"]: (r["name"], r["v"]) for r in merge_upsert(target, updates, ["id"]).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30)}


def test_merge_upsert_version_ordered(spark):
    target = spark.createDataFrame([(1, "new", 5)], ["id", "name", "ver"])
    updates = spark.createDataFrame([(1, "stale", 3)], ["id", "name", "ver"])
    got = merge_upsert(target, updates, ["id"], order_col="ver").collect()
    assert got[0]["name"] == "new"  # higher version in target wins


def test_delete_then_insert_amendment(spark):
    target = spark.createDataFrame(
        [(100, 5000.0), (101, 6000.0)], ["file_num", "amount"]
    )
    amendments = spark.createDataFrame(
        [(102, 5500.0, 100)], ["file_num", "amount", "prev_file_num"]
    )
    got = {r["file_num"]: r["amount"] for r in delete_then_insert(target, amendments).collect()}
    assert got == {101: 6000.0, 102: 5500.0}  # 100 replaced by 102


def test_curate_corpus_stages(spark):
    """Composed curation: duplicate texts collapse to the smallest-id
    keeper, short docs fail the quality gate, split assignment matches
    split_assign exactly, and token counts are whitespace words."""
    from data_spark.operators.curation import curate_corpus
    from data_spark.operators.textstats import split_assign

    long_text = "the quick brown fox jumps over the lazy dog " * 4  # 36 words
    rows = [
        (1, "a", long_text),
        (5, "a", long_text),          # exact dup of 1 → dropped (keeper=1)
        (2, "b", "too short"),        # fails min_words → dropped
        (3, "b", long_text + "extra tail words here now"),
        (4, "c", "!!!" * 50 + " " + "word " * 30),  # punct-heavy → dropped
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {r["doc_id"]: r for r in curate_corpus(df).collect()}
    assert set(got) == {1, 3}
    assert got[1]["n_tokens"] == 36
    splits = {
        r["doc_id"]: r["split"] for r in split_assign(df.select("doc_id")).collect()
    }
    for k, r in got.items():
        assert r["split"] == splits[k]
    # plan: exactly one exchange (the dedup window on the content hash)
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        curate_corpus(df).explain("simple")
    assert buf.getvalue().count("Exchange") == 1


def test_merge_upsert_idempotent(spark):
    """Delta-MERGE-style idempotence: applying the same update batch
    twice (at-least-once delivery replay) leaves the table bit-identical
    — the property the streaming sink's crash-retry story rests on."""
    from data_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], "k bigint, ver bigint, v string"
    )
    batch = spark.createDataFrame(
        [(2, 2, "b2"), (4, 1, "d")], "k bigint, ver bigint, v string"
    )
    once = merge_upsert(target, batch, ["k"], order_col="ver")
    twice = merge_upsert(once, batch, ["k"], order_col="ver")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == 4


def test_bucketed_merge_sink_idempotent_replay(spark, tmp_path):
    """Replaying an already-applied micro-batch against the bucketed
    sink (foreachBatch retry after a mid-write crash) converges to the
    same table state."""
    from data_spark.streaming.jobs import merge_batch_into_bucketed

    target = str(tmp_path / "idem_target")
    base = spark.createDataFrame(
        [(i, 1, float(i)) for i in range(50)], "k bigint, ver bigint, v double"
    )
    merge_batch_into_bucketed(base, target, keys=["k"], order_col="ver", num_buckets=4)
    batch = spark.createDataFrame(
        [(7, 2, 700.0), (51, 1, 51.0)], "k bigint, ver bigint, v double"
    )
    merge_batch_into_bucketed(batch, target, keys=["k"], order_col="ver", num_buckets=4)
    snap1 = sorted(
        (r["k"], r["ver"], r["v"]) for r in spark.read.parquet(target).collect()
    )
    merge_batch_into_bucketed(batch, target, keys=["k"], order_col="ver", num_buckets=4)
    snap2 = sorted(
        (r["k"], r["ver"], r["v"]) for r in spark.read.parquet(target).collect()
    )
    assert snap1 == snap2
    assert (7, 2, 700.0) in snap1 and (51, 1, 51.0) in snap1
    assert len(snap1) == 51


def test_suffix_containment_join(spark):
    hosts = spark.createDataFrame(
        [("news.example.com",), ("example.com",), ("cdn.static.other.org",), ("unrelated.net",)],
        ["host"],
    )
    domains = spark.createDataFrame([("example.com",), ("other.org",)], ["domain"])
    got = {(r["host"], r["domain"]) for r in suffix_containment_join(hosts, domains).collect()}
    assert got == {
        ("news.example.com", "example.com"),
        ("example.com", "example.com"),
        ("cdn.static.other.org", "other.org"),
    }


def _vectors(spark):
    import math

    rows = []
    for i in range(50):
        angle = i * 0.1
        rows.append((i, [math.cos(angle), math.sin(angle), 0.1 * (i % 5), 1.0]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact(spark):
    emb = _vectors(spark)
    queries = emb.filter(F.col("vec_id") < 2)
    corpus = emb.filter(F.col("vec_id") >= 2)
    got = cosine_topk(corpus, queries, k=3).collect()
    assert len(got) == 6
    # nearest neighbor of vec 0 should be a small-angle vector
    nn = [r["neighbor_id"] for r in got if r["qid"] == 0 and r["rank"] == 1][0]
    assert nn in (5, 10, 2, 3, 4, 20, 25)


def test_lsh_recall_vs_bruteforce(spark):
    emb = _vectors(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = {
        (r["qid"], r["neighbor_id"]) for r in cosine_topk(corpus, queries, k=3).collect()
    }
    approx = {
        (r["qid"], r["neighbor_id"])
        for r in lsh_bucketed_topk(corpus, queries, k=3, num_planes=4).collect()
    }
    # LSH with few planes on smooth data should recover a decent fraction
    assert len(exact & approx) / len(exact) >= 0.4


def test_embed_near_dup_exact_pairs(spark):
    from data_spark.operators.similarity import embedding_near_duplicate_pairs

    emb = _vectors(spark)
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicate_pairs(emb, threshold=0.99).collect()
    }
    assert got, "smooth angular data must contain near-identical pairs"
    for a, b in got:
        assert a < b
    # adjacent-angle vectors (0.1 rad apart, near-identical tail) are the
    # closest pairs — spot-check one known near-dup survives
    assert any(b - a == 1 for a, b in got)


def test_embed_near_dup_lsh_subset_and_recall(spark):
    from data_spark.operators.similarity import embedding_near_duplicate_pairs

    emb = _vectors(spark)
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicate_pairs(emb, threshold=0.99).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicate_pairs(
            emb, threshold=0.99, bands=8, rows_per_band=2
        ).collect()
    }
    # exact verification inside the operator ⇒ precision 1 (subset)
    assert approx <= exact
    assert len(approx) / len(exact) >= 0.5


def test_repetition_stats_known_values(spark):
    from data_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # 6 words, 2 distinct, top bigram "a b" x3
            (2, "x y z w"),  # no repetition, every bigram unique
            (3, "solo"),  # single word: no bigrams
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_words"] == 6
    assert abs(got[1]["dup_word_frac"] - (1 - 2 / 6)) < 1e-6
    assert got[1]["top_bigram_count"] == 3
    assert abs(got[1]["top_bigram_frac"] - 1.0) < 1e-6
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_bigram_count"] == 1
    assert got[3]["top_bigram_count"] == 0
    assert got[3]["top_bigram_frac"] == 0.0


def test_per_source_quota_cap_and_determinism(spark):
    from data_spark.operators.textstats import per_source_quota

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(30)], ["doc_id", "source"]
    )
    got = per_source_quota(df, k=4).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) == 4 for v in by_src.values())
    # deterministic: lowest doc_ids kept per source
    assert sorted(by_src["s0"]) == [0, 3, 6, 9]


def test_approx_distinct_error_bound(spark, sf_small):
    from data_spark.queries import QUERIES

    rows = QUERIES["a_approx_distinct"](spark, sf_small).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel_err < 0.05


def test_election_cycle(spark):
    import pyspark.sql.functions as F

    from data_spark.functions.dates import election_cycle

    df = spark.createDataFrame([(2021,), (2022,), (2023,), (2024,)], ["y"])
    got = [r["c"] for r in df.select(election_cycle(F.col("y")).alias("c")).collect()]
    assert got == [2022, 2022, 2024, 2024]


def test_redact_pii_known_values(spark):
    from data_spark.operators.textstats import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@mail.example.org today"),
            (2, "call (555) 123-4567 or 555-987-6543 now"),
            (3, "card 4111111111111111 on file"),
            (4, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_email"] == 1 and "<EMAIL>" in got[1]["scrubbed_text"]
    assert "jo.doe" not in got[1]["scrubbed_text"]
    assert got[2]["n_phone"] == 2 and got[2]["scrubbed_text"].count("<PHONE>") == 2
    assert got[3]["n_number_run"] == 1 and "<NUMBER_RUN>" in got[3]["scrubbed_text"]
    assert got[4]["scrubbed_text"] == "nothing sensitive here"
    assert got[4]["n_email"] == got[4]["n_phone"] == got[4]["n_number_run"] == 0


def test_split_assign_deterministic_and_proportional(spark):
    from data_spark.operators.textstats import split_assign

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in split_assign(df).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in split_assign(df).collect()}
    assert a == b  # no RNG anywhere
    splits = {}
    for _, (bk, sp) in a.items():
        assert 0 <= bk < 100
        splits[sp] = splits.get(sp, 0) + 1
    # 5/5/90 within generous tolerance at n=2000
    assert 0.03 < splits["val"] / 2000 < 0.08
    assert 0.03 < splits["test"] / 2000 < 0.08
    assert splits["train"] / 2000 > 0.85
    # growing the corpus never reassigns existing docs
    bigger = split_assign(spark.range(0, 4000).withColumnRenamed("id", "doc_id"))
    c = {r["doc_id"]: (r["bucket"], r["split"]) for r in bigger.collect() if r["doc_id"] < 2000}
    assert c == a


def test_benchmark_contamination_containment(spark):
    from data_spark.operators.dedup import benchmark_contamination

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta"),  # fully inside corpus doc 1
            (101, "totally novel words never seen anywhere"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in benchmark_contamination(corpus, bench).collect()}
    assert got[100]["contaminated_frac"] == 1.0
    assert got[100]["n_grams"] == 2  # "alpha beta gamma", "beta gamma delta"
    assert got[101]["contaminated_frac"] == 0.0
    assert got[101]["n_contaminated"] == 0


def test_pack_sequences_contiguous_fill(spark):
    from data_spark.operators.textstats import pack_sequences

    # one shard, 5 docs of 3 tokens each, budget 6 → bins [0,0,1,1,2]
    df = spark.createDataFrame(
        [(i, "s", "w w w") for i in range(5)], ["doc_id", "source", "text"]
    )
    got = {r["doc_id"]: r["bin"] for r in pack_sequences(df, budget=6).collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_as_of_join_semantics(spark):
    from datetime import datetime

    from data_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [
            (1, "u1", datetime(2024, 1, 1, 10, 0, 0)),
            (2, "u1", datetime(2024, 1, 1, 12, 0, 0)),
            (3, "u2", datetime(2024, 1, 1, 9, 0, 0)),  # before any right row
            (4, "u3", datetime(2024, 1, 1, 11, 0, 0)),  # exact-tie timestamp
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, "u1", datetime(2024, 1, 1, 9, 30, 0)),
            (101, "u1", datetime(2024, 1, 1, 11, 0, 0)),
            (102, "u2", datetime(2024, 1, 1, 9, 30, 0)),
            (103, "u3", datetime(2024, 1, 1, 11, 0, 0)),
        ],
        ["rid", "user_id", "rts"],
    )
    got = {
        r["event_id"]: r["rid_right"]
        for r in as_of_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts", right_cols=["rid"]
        ).collect()
    }
    assert got[1] == 100  # latest at-or-before 10:00 is 9:30
    assert got[2] == 101  # 11:00 beats 9:30 for the noon click
    assert 3 not in got  # no prior right row → dropped (inner as-of)
    assert got[4] == 103  # equal timestamps match (inclusive)

    # tolerance (pandas merge_asof semantics): a best match older than
    # the bound is NO match — the 10:00 click's 9:30 view survives a
    # 30-min bound, the noon click's 11:00 view survives, but with a
    # 10-min bound both drop while the exact-tie (gap 0) still matches
    tight = {
        r["event_id"]: r["rid_right"]
        for r in as_of_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts",
            right_cols=["rid"], tolerance_us=10 * 60 * 1_000_000,
        ).collect()
    }
    assert tight == {4: 103}
    mid = {
        r["event_id"]: r["rid_right"]
        for r in as_of_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts",
            right_cols=["rid"], tolerance_us=30 * 60 * 1_000_000,
        ).collect()
    }
    assert mid == {1: 100, 4: 103}  # noon click's best is 60 min stale -> drops


def test_approx_percentiles_error_bound(spark, sf_small):
    from data_spark.queries import QUERIES

    approx = {
        r["l_returnflag"]: (r["median_price"], r["p90_price"])
        for r in QUERIES["a_approx_percentiles"](spark, sf_small).collect()
    }
    exact = {
        r["l_returnflag"]: (r["median_price"], r["p90_price"])
        for r in QUERIES["a_percentiles"](spark, sf_small).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / max(abs(e), 1.0) < 0.02, (k, a, e)


def test_bigram_lm_scores_known_values(spark):
    from data_spark.operators.textstats import bigram_lm_scores

    # corpus: "a b a b" and "a b c"; vocab = {a,b,c} (V=3)
    # bigrams: d1: (a,b),(b,a),(a,b)  d2: (a,b),(b,c)
    # c(a,b)=3 c(b,a)=1 c(b,c)=1; c1(a)=3 c1(b)=2
    # p(a,b)=(3+1)/(3+3)=2/3  p(b,a)=(1+1)/(2+3)=0.4  p(b,c)=(1+1)/(2+3)=0.4
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b c")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert got[1]["n_bigrams"] == 3 and got[2]["n_bigrams"] == 2
    # decimal(38,6) accumulation: per-term rounding to 1e-6 before the sum
    assert abs(got[1]["avg_prob"] - (0.666667 + 0.4 + 0.666667) / 3) < 1e-6
    assert abs(got[2]["avg_prob"] - (0.666667 + 0.4) / 2) < 1e-6
    # single-token docs produce no bigrams and are absent
    lone = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    assert bigram_lm_scores(lone).count() == 0


def test_kmeans_matches_python_mirror(spark):
    from data_spark.operators.clustering import kmeans_fit, kmeans_predict

    # two tight groups in 2-D; k=2, init = two lowest-id vectors (one
    # lands in each group is NOT true here — ids 0,1 are both group A,
    # so the test also proves Lloyd's re-separates them)
    pts = [
        (0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]),
        (3, [10.0, 10.0]), (4, [11.0, 10.0]), (5, [10.0, 11.0]),
    ]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    model = kmeans_fit(df, k=2, iterations=4)
    got = {r["id"]: r["cluster"] for r in kmeans_predict(df, model).collect()}

    # plain-python Lloyd mirror: same init (vec_id 0,1), same tie rule
    import itertools

    cents = {0: [0.0, 0.0], 1: [1.0, 0.0]}
    vecs = dict((i, v) for i, v in pts)
    for _ in range(4):
        assign = {}
        for i, v in vecs.items():
            d = {c: sum((a - b) ** 2 for a, b in zip(v, cv)) for c, cv in cents.items()}
            assign[i] = min(d, key=lambda c: (d[c], c))
        for c in cents:
            members = [vecs[i] for i in assign if assign[i] == c]
            if members:
                cents[c] = [sum(col) / len(members) for col in zip(*members)]
    assert got == assign
    # the two groups ended up separated
    assert len({got[0], got[3]}) == 2
    assert got[0] == got[1] == got[2] and got[3] == got[4] == got[5]


def test_kmeans_empty_cluster_keeps_centroid_count(spark):
    from data_spark.operators.clustering import kmeans_fit

    # k=3 over 2 distinct points: one cluster must go empty yet the
    # model still returns 3 rows (empty keeps its previous centroid)
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])],
        ["vec_id", "embedding"],
    )
    assert kmeans_fit(df, k=3, iterations=2).count() == 3


def test_semantic_dedup_single_cluster_matches_exact_rule(spark):
    from data_spark.operators.clustering import semantic_dedup
    from data_spark.operators.similarity import embedding_near_duplicate_pairs

    import math

    # 8 unit-ish vectors, some near-identical pairs
    pts = [
        (0, [1.0, 0.0, 0.0]), (1, [0.999, 0.01, 0.0]),   # dup pair
        (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.995, 0.05]),   # dup pair
        (4, [0.0, 0.0, 1.0]), (5, [0.7, 0.7, 0.0]),
        (6, [1.0, 0.001, 0.0]),                           # dup of 0 and 1
        (7, [0.0, 0.0, -1.0]),
    ]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    # k=1 → within-cluster search IS the global search: dropped set must
    # equal {larger id of every exact pair >= t}
    got = semantic_dedup(df, threshold=0.99, k=1, iterations=1)
    dropped = {r["id"] for r in got.filter("NOT keep").collect()}
    exact = embedding_near_duplicate_pairs(df, threshold=0.99).collect()
    assert dropped == {r["id_b"] for r in exact}
    # cos(0,1)≈0.99995, cos(0,6)≈1, cos(2,3)≈0.9987 — larger ids drop,
    # 0 and 2 survive as min-id representatives
    assert dropped == {1, 3, 6}

    # with k=4 the dropped set is a subset (cluster-split pairs missed)
    got4 = semantic_dedup(df, threshold=0.99, k=4, iterations=2)
    dropped4 = {r["id"] for r in got4.filter("NOT keep").collect()}
    assert dropped4 <= dropped


def test_scd2_history_compresses_runs_null_safe(spark):
    from data_spark.operators.scd import asof_against_history, scd2_history

    log = spark.createDataFrame(
        [
            # key A: gold → gold (no change) → silver → NULL → NULL → gold
            ("A", 1, "gold"), ("A", 2, "gold"), ("A", 3, "silver"),
            ("A", 4, None), ("A", 5, None), ("A", 6, "gold"),
            # key B: single version
            ("B", 1, "bronze"),
        ],
        ["k", "ver", "tier"],
    )
    hist = scd2_history(log, keys=["k"], attrs=["tier"], order_cols=["ver"]).collect()
    rows = {(r["k"], r["valid_from"]): r for r in hist}
    assert len(hist) == 5  # A: 4 runs, B: 1
    assert rows[("A", 1)]["tier"] == "gold" and rows[("A", 1)]["valid_to"] == 3
    assert rows[("A", 3)]["tier"] == "silver" and rows[("A", 3)]["valid_to"] == 4
    # NULL run is one version (NULL→NULL is "no change")
    assert rows[("A", 4)]["tier"] is None and rows[("A", 4)]["valid_to"] == 6
    assert rows[("A", 6)]["is_current"] and rows[("A", 6)]["valid_to"] is None
    assert rows[("B", 1)]["is_current"]

    # point-in-time join picks the version covering each fact ts;
    # facts with no covering interval (pre-history ('A', 0) and keyless
    # ('Z', 1)) survive with NULL history columns — left-join semantics
    # must not depend on WHY the interval probe missed
    facts = spark.createDataFrame(
        [("A", 0), ("A", 2), ("A", 3), ("A", 5), ("A", 99), ("Z", 1)],
        ["k", "ts"],
    )
    out = asof_against_history(
        facts, spark.createDataFrame(hist), ["k"], "ts"
    ).collect()
    assert len(out) == 6
    got = {(r["k"], r["ts"]): (r["tier"], r["valid_from"]) for r in out}
    assert got[("A", 2)] == ("gold", 1)
    assert got[("A", 3)] == ("silver", 3)
    assert got[("A", 5)] == (None, 4)
    assert got[("A", 99)] == ("gold", 6)
    assert got[("A", 0)] == (None, None)  # pre-history: NULL-padded
    assert got[("Z", 1)] == (None, None)  # keyless: NULL-padded


def test_scd2_single_exchange_plan(spark, sf_small):
    """Both windows and the filter must share ONE key-partitioned
    Exchange — the single-shuffle claim in the operator docstring."""
    from data_spark.operators.scd import scd2_history
    from data_spark.io import read_table

    o = read_table(spark, sf_small, "orders")
    hist = scd2_history(
        o, keys=["o_custkey"], attrs=["o_orderpriority"],
        order_cols=["o_orderdate", "o_orderkey"],
    )
    import contextlib, io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        hist.explain("simple")
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1, plan


def test_salted_join_equals_plain_join(spark):
    from data_spark.operators.skew import salted_join

    import pytest as _pytest

    big = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ("hot", "hot", "warm")]
        + [(None, -1), ("orphan", -2)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("warm", 2), ("unused", 3)], "k string, dim int"
    )
    from collections import Counter

    for how in ("inner", "left"):
        got = Counter(map(tuple, salted_join(big, small, ["k"], how).collect()))
        want = Counter(map(tuple, big.join(small, ["k"], how).collect()))
        assert got == want, how
    with _pytest.raises(ValueError):
        salted_join(big, small, ["k"], "full")


def test_ivf_kmeans_centroids_recall(spark):
    from data_spark.operators.clustering import kmeans_fit
    from data_spark.operators.similarity import ivf_topk

    emb = _vectors(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = {
        (r["qid"], r["neighbor_id"]) for r in cosine_topk(corpus, queries, k=3).collect()
    }
    model = kmeans_fit(corpus, k=4, iterations=3)
    got = ivf_topk(corpus, queries, k=3, centroids=model, nprobe=2).collect()
    approx = {(r["qid"], r["neighbor_id"]) for r in got}
    # trained cells on smooth angular data: probing half the cells must
    # recover most true neighbors (neighbors share cells by construction)
    assert len(exact & approx) / len(exact) >= 0.6
    # deterministic: a second run returns the identical set
    again = {
        (r["qid"], r["neighbor_id"])
        for r in ivf_topk(corpus, queries, k=3, centroids=model, nprobe=2).collect()
    }
    assert approx == again


def test_mmr_rerank_prefers_diversity(spark):
    """A near-duplicate of the top hit must NOT be picked second even
    though it has the second-best relevance; a python mirror of the
    greedy recurrence must agree on the full pick order."""
    import math

    from data_spark.operators.similarity import mmr_rerank

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    corpus = [
        (10, unit([1.0, 0.01, 0.0])),   # top relevance
        (11, unit([1.0, 0.02, 0.0])),   # near-dup of 10, relevance #2
        (12, unit([0.8, 0.6, 0.0])),    # diverse, decent relevance
        (13, unit([0.7, 0.0, 0.7])),    # diverse
        (14, unit([0.6, 0.8, 0.0])),    # diverse-ish
        (15, unit([1.0, 0.03, 0.0])),   # another near-dup of 10
    ]
    queries = [(0, [1.0, 0.0, 0.0])]
    cdf = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    qdf = spark.createDataFrame(queries, ["vec_id", "embedding"])
    got = {
        r["pick_order"]: r["neighbor_id"]
        for r in mmr_rerank(cdf, qdf, k=4, shortlist=6, lam=0.5).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    rel = {cid: cos(queries[0][1], v) for cid, v in corpus}
    vecs = dict(corpus)
    picked = [max(rel, key=lambda c: (rel[c], -c))]
    while len(picked) < 4:
        best = None
        for cid in vecs:
            if cid in picked:
                continue
            ms = max(cos(vecs[cid], vecs[p]) for p in picked)
            score = 0.5 * rel[cid] - (1.0 - 0.5) * ms
            if best is None or score > best[0] or (score == best[0] and cid < best[1]):
                best = (score, cid)
        picked.append(best[1])
    assert [got[i] for i in range(1, 5)] == picked
    # pick #1 is the most relevant; its near-dups are deferred behind
    # the diverse candidates
    assert got[1] == 10
    assert got[2] not in (11, 15)


def test_vector_snap_ulp_stable(spark, sf_small):
    """v_mmr_rerank takes its shortlist and greedy decisions on
    e6-round-half-snapped similarities (VERDICT r5 #5) so independent
    cosine implementations agree at every boundary. The residual
    hazard is a cosine within ~1 ulp of a HALF-grid point (k+0.5)·1e-6;
    pin every rel AND pairwise sim of the gate fixture clear of it by
    ±1-ulp perturbation. Also: the snapped operator must agree with the
    raw-double operator away from near-ties (the synthetic diversity
    fixture), so snapping changes robustness, not semantics."""
    import math

    from data_spark.operators.similarity import cosine_similarity, mmr_rerank
    from data_spark.queries.common import t

    emb = t(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").cast("array<double>").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").cast("array<double>").alias("cv")
    )
    rels = [
        r["rel"]
        for r in c.join(F.broadcast(q))
        .select(cosine_similarity(F.col("qv"), F.col("cv")).alias("rel"))
        .collect()
    ]
    # pairwise sims among a top-rel shortlist superset (40 > _MMR_SHORTLIST)
    top = c.limit(40)
    a = top.select(F.col("cid").alias("ca"), F.col("cv").alias("va"))
    b = top.select(F.col("cid").alias("cb"), F.col("cv").alias("vb"))
    psims = [
        r["psim"]
        for r in a.join(F.broadcast(b))
        .filter(F.col("ca") < F.col("cb"))
        .select(cosine_similarity(F.col("va"), F.col("vb")).alias("psim"))
        .collect()
    ]

    def snap(x: float) -> int:
        return math.floor(x * 1e6 + 0.5)

    vals = rels + psims
    assert len(vals) > 1000
    unstable = [
        v
        for v in vals
        if snap(math.nextafter(v, math.inf)) != snap(v)
        or snap(math.nextafter(v, -math.inf)) != snap(v)
    ]
    assert unstable == [], (
        f"{len(unstable)} similarities within 1 ulp of a half-grid boundary: "
        f"{unstable[:5]}"
    )

    # semantics preserved on the synthetic diversity fixture
    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    corpus = [
        (10, unit([1.0, 0.01, 0.0])),
        (11, unit([1.0, 0.02, 0.0])),
        (12, unit([0.8, 0.6, 0.0])),
        (13, unit([0.7, 0.0, 0.7])),
        (14, unit([0.6, 0.8, 0.0])),
        (15, unit([1.0, 0.03, 0.0])),
    ]
    cdf = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    qdf = spark.createDataFrame([(0, [1.0, 0.0, 0.0])], ["vec_id", "embedding"])
    raw = {
        r["pick_order"]: r["neighbor_id"]
        for r in mmr_rerank(cdf, qdf, k=4, shortlist=6, lam=0.5).collect()
    }
    snapped = {
        r["pick_order"]: r["neighbor_id"]
        for r in mmr_rerank(cdf, qdf, k=4, shortlist=6, lam=0.5, snap_digits=6).collect()
    }
    assert raw == snapped


def test_simhash_paths_agree_on_planted_dups(spark, sf_small):
    """The production sha512 pandas-UDF simhash (former d_simhash_near
    gate entry, retired r6 — VERDICT r5 #6) and the column-algebra
    exact twin (d_simhash_exact_pairs) use different hash functions,
    bit widths, and shingle features, so their pair SETS legitimately
    differ on borderline pairs — output equality is NOT a law of
    simhash. What IS a law, pinned here for both paths:

    - precision: a Hamming ≤ 3 fire means near-identical text — every
      pair either path reports must have exact word-3-gram Jaccard
      ≥ 0.9 on the corpus (observed minimum ≈ 0.95);
    - recall on identical text: two documents with identical token
      streams produce identical signatures (Hamming 0) under ANY hash,
      so both paths MUST report them (synthetic fixture — the corpus's
      planted dups are edits, not copies);
    - no fire on unrelated text (disjoint vocabularies)."""
    from data_spark.queries import QUERIES
    from data_spark.queries.common import t

    docs = t(spark, sf_small, "documents")
    truth = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"])): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    prod = {(r["doc_a"], r["doc_b"]) for r in simhash_near_duplicates(docs).collect()}
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["d_simhash_exact_pairs"](spark, sf_small).collect()
    }
    assert prod and exact, "fixture lost its planted near-dups"
    for name, pairs in (("prod", prod), ("exact", exact)):
        weak = sorted((truth.get(p, 0.0), p) for p in pairs)[:5]
        assert all(truth.get(p, 0.0) >= 0.9 for p in pairs), (
            f"{name} fired on non-near-identical pairs: {weak}"
        )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    synth = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact copy: Hamming 0, must fire on both paths
            (3, "one two three four five six seven eight nine ten "
                "eleven twelve thirteen fourteen fifteen sixteen"),
        ],
        ["doc_id", "text"],
    )
    prod_s = {
        (r["doc_a"], r["doc_b"]) for r in simhash_near_duplicates(synth).collect()
    }
    assert (1, 2) in prod_s and not any(3 in p for p in prod_s), prod_s
    # same law through the exact twin's signature: identical text ->
    # identical 60-bit sig
    from data_spark.queries.analytics import _spark_simhash_sigs

    sigs = {r["doc_id"]: r["sig"] for r in _spark_simhash_sigs(synth).collect()}
    assert sigs[1] == sigs[2] != sigs[3]


def test_merge_batch_precomputed_touched_buckets_equal(spark, tmp_path):
    """Passing the caller-derived bucket set (r13: the incremental
    pipeline computes it in the same aggregate as its row metrics)
    must produce exactly the state the self-derived collect does."""
    from data_spark.streaming.jobs import (
        _key_bucket,
        merge_batch_into_bucketed,
    )

    t_a = str(tmp_path / "self_derived")
    t_b = str(tmp_path / "precomputed")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k bigint, v double"
    )
    batch = spark.createDataFrame(
        [(3, 300.0), (17, 1700.0), (41, 41.0)], "k bigint, v double"
    )
    touched = sorted(
        r[0]
        for r in batch.select(_key_bucket(["k"], 4).alias("b")).distinct().collect()
    )
    for tgt, tb in ((t_a, None), (t_b, touched)):
        merge_batch_into_bucketed(base, tgt, keys=["k"], num_buckets=4)
        merge_batch_into_bucketed(
            batch, tgt, keys=["k"], num_buckets=4, touched_buckets=tb
        )
    snap = lambda p: sorted(  # noqa: E731
        (r["k"], r["v"]) for r in spark.read.parquet(p).collect()
    )
    assert snap(t_a) == snap(t_b)
    assert (3, 300.0) in snap(t_b) and (41, 41.0) in snap(t_b)
