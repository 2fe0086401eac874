"""Text-analysis operators for corpus curation: token accounting,
quality scoring, language ID. All pure column algebra (no UDFs) so the
hot path stays in whole-stage codegen.

Tokenization is shared with the DuckDB oracles in
data_spark.queries.documents — change one, change both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dsum(col: Column) -> Column:
    """Order-independent SUM over doubles (exact decimal accumulation —
    same convention as queries.common.dsum, inlined to keep the
    operator layer free of query-layer imports)."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")

EN_STOPWORDS = ["the", "a", "an", "of", "to", "and", "in", "is", "it", "that"]
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "y", "en"],
    "fr": ["le", "la", "de", "et", "est", "un"],
}


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens of the raw text (token accounting unit)."""
    return F.split(F.trim(text), r"\s+")


def _count_in(words: Column, vocab: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def token_stats(df: DataFrame, text_col: str = "text", by: str = "source") -> DataFrame:
    """Per-group token accounting: (n_docs, total_tokens, total_chars,
    max_tokens)."""
    n_tokens = F.size(_ws_tokens(F.col(text_col)))
    return (
        df.select(by, n_tokens.alias("n_tokens"), F.col("n_chars"))
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-filter features per document: word count, punctuation
    ratio, stopword ratio."""
    text = F.col(text_col)
    n_words = F.size(_ws_tokens(text))
    punct = F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))
    punct_ratio = punct.cast("double") / F.greatest(F.length(text), F.lit(1))
    low_words = _ws_tokens(F.lower(text))
    stop_ratio = _count_in(low_words, EN_STOPWORDS).cast("double") / F.greatest(
        n_words, F.lit(1)
    )
    return df.select(
        id_col,
        n_words.alias("n_words"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition features (Gopher/RefinedWeb-style
    quality rules): duplicate-word fraction and the fraction of words
    covered by the most frequent word bigram.

    Bigram counting runs explode → groupBy(doc, bigram) → groupBy(doc)
    MAX so partial aggregation stays map-side; all expressions are
    column algebra inside codegen. Words are materialized in a prior
    projection (HOF lambdas re-evaluate argument expressions per
    element).
    """
    base = df.select(F.col(id_col).alias("doc_id"), _ws_tokens(F.col(text_col)).alias("__w"))
    n_words = F.size(F.col("__w"))
    bigrams = F.transform(
        F.when(n_words >= 2, F.sequence(F.lit(1), n_words - 1)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("__w"), i), F.element_at(F.col("__w"), i + 1)
        ),
    )
    top = (
        base.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    stats = base.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(
            1 - F.size(F.array_distinct(F.col("__w"))).cast("double") / n_words, 6
        ).alias("dup_word_frac"),
    )
    return stats.join(top, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "dup_word_frac",
        F.coalesce(F.col("top_bigram_count"), F.lit(0)).alias("top_bigram_count"),
        F.round(
            F.coalesce(
                2.0 * F.col("top_bigram_count") / F.col("n_words"), F.lit(0.0)
            ),
            6,
        ).alias("top_bigram_frac"),
    )


def per_source_quota(
    df: DataFrame, k: int, by: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Per-source document cap (corpus curation quota): keep the first
    ``k`` docs per source in deterministic ``id_col`` order. One window
    over a ``by``-partitioned shuffle; no global sort."""
    w = Window.partitionBy(by).orderBy(F.asc(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# PII-shaped patterns (curation scrub): email, NANP-style phone, 16-digit
# card-like number runs. Deliberately conservative — high precision over
# recall, the standard trade-off for pretraining scrubbing.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}"),
    ("number_run", r"\d{16}"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Regex PII redaction: replace each pattern class with a
    ``<CLASS>`` token and count the hits per class. Chained
    ``regexp_replace`` stays inside codegen — one pass per pattern, no
    UDFs, trivially data-parallel at any scale."""
    text = F.col(text_col)
    hit_counts = []
    scrubbed = text
    for name, pat in PII_PATTERNS:
        hit_counts.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return df.select(id_col, scrubbed.alias("scrubbed_text"), *hit_counts)


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
    seed: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash: stable across
    runs, engines, and partitionings (no RNG — pure function of the id
    and the seed string), so a document never migrates between splits
    when the corpus grows. Bucket = first 32 md5 bits mod 100 (md5, not
    xxhash64, so any engine reproduces the exact same assignment)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(100))
    split = (
        F.when(bucket < val_pct, "val")
        .when(bucket < val_pct + test_pct, "test")
        .otherwise("train")
    )
    return df.select(id_col, bucket.alias("bucket"), split.alias("split"))


def pack_sequences(
    df: DataFrame,
    budget: int,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for training prep: assign each document to a
    token-budget bin by running prefix-sum fill in deterministic
    ``id_col`` order WITHIN each shard.

    Sharding is the scale decision: a single global packing order would
    funnel the prefix sum through one partition; per-shard windows keep
    it an ordinary partitioned shuffle, and training readers consume
    (shard, bin) pairs. Bin ids are ``floor(tokens_before / budget)`` —
    contiguous fill, so every bin except a shard's last holds ≥ budget
    tokens once its first overflowing doc lands.
    """
    n_tokens = F.size(_ws_tokens(F.col(text_col)))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        df.select(id_col, shard_col, n_tokens.alias("n_tokens"))
        .withColumn("bin", F.floor((cum - F.col("n_tokens")) / budget))
        .select(id_col, shard_col, "n_tokens", "bin")
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    CCNet/Gopher-style "perplexity filter" shape: train token statistics
    on the corpus itself, score every document against them, filter the
    tail. Returns (doc_id, n_bigrams, avg_prob) for every document with
    ≥ 2 tokens, where avg_prob is the mean add-one-smoothed conditional
    bigram probability (c(w1,w2)+1)/(c(w1)+|V|).

    Cross-engine determinism: scored in probability space, not
    log-space — ln() is libm-dependent and could differ between engines
    in the last ulp, while counts are integers and one division is
    IEEE-exact; the mean uses the decimal-sum convention
    (queries.common). A production pipeline would use log-space to
    avoid underflow on long documents; the plan shape is identical.

    Scale: tokens explode once (O(corpus tokens)); bigram/unigram count
    tables aggregate with map-side partials and are Zipf-bounded
    (≪ corpus size); the score join shuffles on (w1, w2) — or
    broadcasts when the model fits — and |V| rides along as a 1-row
    broadcast. No UDFs anywhere.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_ws_tokens(F.col(text_col))).alias("pos", "w"),
    )
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("w1", F.lag("w").over(w_ord))
        .filter(F.col("w1").isNotNull())
        .select("doc_id", "w1", F.col("w").alias("w2"))
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uc = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = tok.agg(F.countDistinct("w").alias("vs"))
    p = (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("vs"))
    return (
        big.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (_dsum(p) / F.count(F.lit(1))).alias("avg_prob"),
        )
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language identification: count per-language marker
    words, argmax with en ≥ es ≥ fr precedence, 'unknown' when no
    markers hit."""
    words = _ws_tokens(F.lower(F.col(text_col)))
    scores = {lang: _count_in(words, markers) for lang, markers in LANG_MARKERS.items()}
    pred = (
        F.when(
            (scores["en"] >= scores["es"]) & (scores["en"] >= scores["fr"]) & (scores["en"] > 0),
            "en",
        )
        .when((scores["es"] >= scores["fr"]) & (scores["es"] > 0), "es")
        .when(scores["fr"] > 0, "fr")
        .otherwise("unknown")
    )
    return df.select(id_col, "lang", pred.alias("predicted_lang"))


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    target: int = 200,
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-LM alpha-
    sampling rule): per-source quotas proportional to p_s^alpha, so
    low-resource sources are up-weighted relative to their share.
    q_s = floor(target * n_s^alpha / sum n^alpha), then the first q_s
    docs per source in keyed-permutation order are kept.

    Scale shape: the quota table is one tiny per-source agg (broadcast
    back), selection is one ``by``-partitioned window — same plan
    family as per_source_quota, but the cap comes from the corpus
    distribution instead of a constant.

    Determinism: n_s^alpha uses double pow identically in both engines;
    floor() keeps the quota integral, and the permutation
    ((id*9973) % 104729, id) is the engine-portable sampler used by
    w_sample_deterministic."""
    counts = df.groupBy(by).agg(F.count(F.lit(1)).cast("double").alias("n_s"))
    tot = counts.agg(
        _dsum(F.pow(F.col("n_s"), F.lit(alpha))).alias("z")
    )
    quotas = counts.crossJoin(F.broadcast(tot)).select(
        by,
        F.floor(F.lit(float(target)) * F.pow(F.col("n_s"), F.lit(alpha)) / F.col("z"))
        .cast("bigint")
        .alias("quota"),
    )
    w = Window.partitionBy(by).orderBy(
        (F.col(id_col) * 9973) % 104729, F.asc(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quotas), by)
        .filter(F.col("__rn") <= F.col("quota"))
        .select(id_col, by, F.col("__rn").cast("bigint").alias("pick_rank"))
    )
