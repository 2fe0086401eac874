"""Text ranking / retrieval operators: TF-IDF weighting, BM25 scoring,
and sparse cosine similarity over term-weighted document vectors.

The reference indexes documents into a search engine and lets it rank
(SURVEY §2.1 S5/S8 — Elasticsearch full-text queries over the document
envelopes); here ranking is a first-class relational computation so the
same corpus can be scored inside the engine, with a DuckDB oracle.

All three operators share one shape: tokenize → explode →
(doc_id, term) term-frequency agg → join a skinny per-term document-
frequency table. At 100 TB this is two term/doc-keyed shuffles; the df
table is |vocab| rows (millions at worst — AQE can still broadcast it
when small, shuffle-join otherwise). Nothing is ever all-pairs: the
cosine operator joins on shared terms only and applies a ``max_df``
stop-term cutoff, the standard guard that bounds the candidate blow-up
at Σ df² (same role as the PPJoin prefix filter in
operators/dedup.ngram_jaccard_pairs).

Determinism contract (cross-engine hash equality, queries/common.py):
per-term contributions are pure scalar arithmetic on identically-
computed doubles (ln/sqrt agree between JVM and libm to the last ulp on
these operand ranges); every SUM over them goes through
decimal(38,6) so accumulation order cannot change the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.plans.lineage import truncate_lineage

from data_spark.operators.dedup import _words


def _dsum(col: Column) -> Column:
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf) — term counts per document. One explode + one
    (doc,term)-keyed agg. The token array is materialized as a column
    BEFORE the filter/explode lambda touches it (HOF lambdas re-evaluate
    argument expressions per element — see char_shingles docstring)."""
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("words")
        )
        .select(
            "doc_id",
            F.explode(F.filter(F.col("words"), lambda w: w != "")).alias("term"),
        )
    )
    return toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )


def document_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df) — number of documents containing each term. Skinny
    (|vocab| rows); the natural broadcast side of every ranking join."""
    return tf.groupBy("term").agg(F.countDistinct("doc_id").cast("bigint").alias("df"))


def tfidf_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document (smooth idf, sklearn convention:
    idf = ln((N+1)/(df+1)) + 1; score = tf·idf). Ties break on term
    asc so the selected set is engine-independent.

    Reference parity: the reference's search tier ranks documents by
    Lucene's tf-idf family; this exposes the same weighting as columns.
    """
    # tf feeds both the df agg and the scoring join — materialize once
    tf = term_frequencies(docs, text_col, id_col).transform(truncate_lineage)
    dfreq = document_frequencies(tf)
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "term", "tf", "score", F.col("rk").cast("bigint").alias("rk"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 (Robertson/Sparck-Jones) document scores for a bag of query
    terms: score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
    with idf = ln(1 + (N-df+0.5)/(df+0.5)).

    The per-term filter hits the tf table BEFORE the df join, so only
    postings for the query's terms shuffle — at 100 TB the scored set is
    |query terms| postings lists, not the corpus."""
    # one materialized tf feeds both the query-term postings and the
    # document-frequency table (else the tokenize→explode→agg pipeline
    # runs twice — Spark shares no subplans across DataFrame reuse)
    tf_all = term_frequencies(docs, text_col, id_col).transform(truncate_lineage)
    tf = tf_all.filter(F.col("term").isin(query_terms))
    dl = (
        docs.select(
            F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("words")
        )
        .select(
            "doc_id",
            F.size(F.filter(F.col("words"), lambda w: w != ""))
            .cast("bigint")
            .alias("dl"),
        )
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (_dsum(F.col("dl").cast("double")) / F.count(F.lit(1))).alias("avgdl"),
    )
    dfreq = document_frequencies(tf_all).filter(
        F.col("term").isin(query_terms)
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.round(_dsum(F.col("contrib")), 6).alias("bm25"),
        F.count(F.lit(1)).cast("bigint").alias("n_matched_terms"),
    )


def sparse_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 1000,
    min_cosine: float = 0.5,
) -> DataFrame:
    """Document-pair cosine similarity over TF-IDF term vectors, joined
    on SHARED TERMS only (inverted-index join) — never a dense all-pairs
    product. ``max_df`` drops stop-terms whose posting lists would blow
    the Σ df² candidate bound (the retrieval-literature analogue of the
    PPJoin prefix filter); at 100 TB that cutoff is what keeps the join
    sub-quadratic, and dropping ubiquitous terms barely moves cosine.

    Weights: w = tf·idf (smooth idf); per-doc norms via an exact decimal
    sum; pair score = Σ w_a·w_b / (‖a‖·‖b‖)."""
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = document_frequencies(tf)
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .filter(F.col("df") <= max_df)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + F.lit(1.0)
                )
            ).alias("w"),
        )
        # materialized once: w feeds BOTH self-join sides and the norms
        # agg, and Spark does not share subplans across a self-join —
        # without this the tokenize→explode→tf→df pipeline runs 3×
        # (34 exchanges at sf0.01 vs 7 after). At corpus scale the
        # weighted-postings table is the thing you'd persist anyway.
        .transform(truncate_lineage)
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(_dsum(F.col("w") * F.col("w"))).alias("norm")
    )
    a = w.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(_dsum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm").alias("norm_b"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cosine", F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6)
        )
        .filter(F.col("cosine") >= min_cosine)
        .select("doc_a", "doc_b", "cosine")
    )
