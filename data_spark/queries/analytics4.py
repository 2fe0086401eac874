"""Round-6 statistical-testing & corpus-scoring tier.

The drift-monitoring and data-curation decisions a 100 TB training-data
pipeline automates — "did this shard's distribution move?", "which docs
does the LM think are junk?", "which passages repeat across documents
even when their offsets shifted?" — each as a set-oriented operator with
an exact DuckDB oracle:

- ``a_ks_two_sample``: two-sample Kolmogorov–Smirnov distance between
  every language pair's document-length distributions, computed over
  per-value histograms so the statistic is an EXACT integer
  (``max |F_a·n_b − F_b·n_a|``) — no float CDF, no boundary risk;
- ``a_mann_whitney_u``: the rank-sum companion (location shift instead
  of shape), midrank ties handled in doubled-integer units so 2·U is a
  BIGINT and the law 2U_a + 2U_b = 2·n_a·n_b is exact;
- ``g_modularity``: Newman modularity of the LPA(3) communities in
  exact integer units (M²·Q = Σ_c M·D_c − d_c² over directed counts) —
  the "are these communities real?" score next to g_label_propagation;
- ``d_perplexity_filter``: CCNet-style bigram-LM self-scoring — add-1
  smoothed corpus model, per-doc mean negative log-likelihood, flag the
  high-perplexity tail (every probability an integer ratio; ln on
  identical doubles, 6-dp-snapped terms summed as DECIMAL);
- ``d_cdc_chunking``: content-defined chunking (boundary where the
  portable token hash ≡ 0 mod 16) + chunk-fingerprint dedup — the
  passage-level dedup that survives insertions shifting offsets,
  because boundaries are derived from content, not position.

Scale posture: histograms are map-side-combinable groupBys over the
bounded (lang × length) domain; pair enumeration is a broadcast
hash-join on a constant key (never a nested loop); every window is
partitioned (pair / doc); the LM model join is an equi-join on the
bigram key; the only driver-side scalars are 1-row aggregates
(corpus vocabulary size, directed edge count) broadcast back.

Reference parity: drift tests generalize the reference's per-shard
count validation (`federal_fec_compute_load/main.py` row-count gates);
chunk-fingerprint dedup generalizes its line-level hash dedup
(`news_find_duplicates/main.py`) to shift-robust passages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.operators.dedup import _portable_hash60, _words
from data_spark.queries.common import run_scratch_dir, t, table_rows

QUERIES = {}
ORACLE = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared lang-pair histogram: per unordered language pair (a < b), the
# merged per-value counts of documents.n_chars. Bounded by
# |langs|² · |distinct lengths| — a domain, not the data. The pair
# table is built with a constant-key equi-join (BroadcastHashJoin with
# the `<` as a join filter), never a nested loop.
# ---------------------------------------------------------------------------

_PAIR_HIST_SQL = """
    hist AS (
      SELECT lang, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    langs AS (SELECT DISTINCT lang FROM hist),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b
      FROM langs a JOIN langs b ON a.lang < b.lang
    ),
    merged AS (
      SELECT lang_a, lang_b, v, SUM(c_a) AS c_a, SUM(c_b) AS c_b FROM (
        SELECT p.lang_a, p.lang_b, h.v, h.c AS c_a, 0 AS c_b
        FROM pairs p JOIN hist h ON h.lang = p.lang_a
        UNION ALL
        SELECT p.lang_a, p.lang_b, h.v, 0, h.c
        FROM pairs p JOIN hist h ON h.lang = p.lang_b
      ) GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT lang_a, lang_b, v, c_a, c_b,
             SUM(c_a) OVER (PARTITION BY lang_a, lang_b ORDER BY v) AS f_a,
             SUM(c_b) OVER (PARTITION BY lang_a, lang_b ORDER BY v) AS f_b,
             SUM(c_a) OVER (PARTITION BY lang_a, lang_b) AS n_a,
             SUM(c_b) OVER (PARTITION BY lang_a, lang_b) AS n_b
      FROM merged
    )
"""


def _pair_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang_a, lang_b, v, c_a, c_b, f_a, f_b, n_a, n_b): merged
    per-value counts + cumulative counts + sample sizes per pair."""
    d = t(spark, sf_dir, "documents")
    hist = d.groupBy("lang", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    langs = hist.select("lang").distinct().withColumn("_k", F.lit(1))
    pairs = (
        langs.alias("x")
        .join(
            F.broadcast(langs.alias("y")),
            (F.col("x._k") == F.col("y._k")) & (F.col("x.lang") < F.col("y.lang")),
        )
        .select(F.col("x.lang").alias("lang_a"), F.col("y.lang").alias("lang_b"))
    )
    side_a = hist.join(F.broadcast(pairs), hist.lang == F.col("lang_a")).select(
        "lang_a", "lang_b", "v", F.col("c").alias("c_a"), F.lit(0).cast("bigint").alias("c_b")
    )
    side_b = hist.join(F.broadcast(pairs), hist.lang == F.col("lang_b")).select(
        "lang_a", "lang_b", "v", F.lit(0).cast("bigint").alias("c_a"), F.col("c").alias("c_b")
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("lang_a", "lang_b", "v")
        .agg(F.sum("c_a").alias("c_a"), F.sum("c_b").alias("c_b"))
    )
    w_cum = Window.partitionBy("lang_a", "lang_b").orderBy("v")
    w_all = Window.partitionBy("lang_a", "lang_b")
    return merged.select(
        "lang_a",
        "lang_b",
        "v",
        "c_a",
        "c_b",
        F.sum("c_a").over(w_cum).alias("f_a"),
        F.sum("c_b").over(w_cum).alias("f_b"),
        F.sum("c_a").over(w_all).alias("n_a"),
        F.sum("c_b").over(w_all).alias("n_b"),
    )


@_q(
    "a_ks_two_sample",
    f"""
    WITH {_PAIR_HIST_SQL},
    scored AS (
      SELECT lang_a, lang_b, v, n_a, n_b,
             ABS(f_a * n_b - f_b * n_a) AS d_num,
             ROW_NUMBER() OVER (
               PARTITION BY lang_a, lang_b
               ORDER BY ABS(f_a * n_b - f_b * n_a) DESC, v
             ) AS rn
      FROM cum
    )
    SELECT lang_a, lang_b,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(d_num AS BIGINT) AS d_num, v AS v_at,
           CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_d
    FROM scored WHERE rn = 1
    """,
)
def a_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS distance per language pair over document lengths.
    D = max_v |F_a(v) − F_b(v)| is evaluated on the merged per-value
    histogram as the EXACT integer max |f_a·n_b − f_b·n_a| (the CDFs
    only jump at observed values, so the sup over ℝ equals the max over
    histogram rows); the float ks_d is a single division of identical
    cross-engine integers. Argmax reported at the smallest attaining
    value. The statistic a shard-drift monitor thresholds before
    admitting a new source into the training mix."""
    cum = _pair_hist(spark, sf_dir)
    scored = cum.select(
        "lang_a",
        "lang_b",
        "v",
        "n_a",
        "n_b",
        F.abs(F.col("f_a") * F.col("n_b") - F.col("f_b") * F.col("n_a")).alias("d_num"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang_a", "lang_b").orderBy(F.desc("d_num"), F.asc("v"))
        ),
    )
    return scored.filter(F.col("rn") == 1).select(
        "lang_a",
        "lang_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("d_num").cast("bigint").alias("d_num"),
        F.col("v").alias("v_at"),
        (F.col("d_num").cast("double") / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))).alias(
            "ks_d"
        ),
    )


@_q(
    "a_mann_whitney_u",
    f"""
    WITH {_PAIR_HIST_SQL},
    ranked AS (
      SELECT lang_a, lang_b, n_a, n_b, c_a, c_b,
             (f_a + f_b) - (c_a + c_b) AS cum_before,
             c_a + c_b AS c_all
      FROM cum
    )
    SELECT lang_a, lang_b,
           CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b,
           CAST(SUM(c_a * (2 * cum_before + c_all + 1)) - MAX(n_a) * (MAX(n_a) + 1)
                AS BIGINT) AS u2_a,
           CAST(SUM(c_b * (2 * cum_before + c_all + 1)) - MAX(n_b) * (MAX(n_b) + 1)
                AS BIGINT) AS u2_b
    FROM ranked GROUP BY 1, 2
    """,
)
def a_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U per language pair over document lengths, exact
    under ties: with midranks, 2·midrank(v) = 2·C(v−) + c(v) + 1 is an
    integer, so 2·R_a = Σ_v c_a(v)·(2·C(v−) + c(v) + 1) and
    2·U_a = 2·R_a − n_a(n_a+1) are BIGINTs — no float ranks. The
    doubled-unit trick is the same integer-micro-units discipline as
    v_rrf_hybrid's fused scores. Law (pytest + oracle):
    u2_a + u2_b = 2·n_a·n_b."""
    cum = _pair_hist(spark, sf_dir)
    ranked = cum.select(
        "lang_a",
        "lang_b",
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        ((F.col("f_a") + F.col("f_b")) - (F.col("c_a") + F.col("c_b"))).alias("cum_before"),
        (F.col("c_a") + F.col("c_b")).alias("c_all"),
    )
    two_mid = 2 * F.col("cum_before") + F.col("c_all") + 1
    return ranked.groupBy("lang_a", "lang_b").agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        (F.sum(F.col("c_a") * two_mid) - F.max("n_a") * (F.max("n_a") + 1))
        .cast("bigint")
        .alias("u2_a"),
        (F.sum(F.col("c_b") * two_mid) - F.max("n_b") * (F.max("n_b") + 1))
        .cast("bigint")
        .alias("u2_b"),
    )


# ---------------------------------------------------------------------------
# Modularity of the LPA(3) communities, exact integer units.
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    from data_spark.queries.mining import _lpa_oracle

    return f"""
    WITH labels AS ({_lpa_oracle()}),
    edges2 AS (
      SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sym2 AS (SELECT src AS a, dst AS b FROM edges2 UNION SELECT dst, src FROM edges2),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_directed FROM sym2),
    deg AS (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM sym2 GROUP BY 1),
    dsum AS (
      SELECT lb.community, CAST(SUM(d.deg) AS BIGINT) AS deg_sum
      FROM deg d JOIN labels lb ON lb.id = d.id GROUP BY 1
    ),
    intra AS (
      SELECT la.community, CAST(COUNT(*) AS BIGINT) AS intra_directed
      FROM sym2 s
      JOIN labels la ON la.id = s.a
      JOIN labels lb2 ON lb2.id = s.b
      WHERE la.community = lb2.community GROUP BY 1
    )
    SELECT d.community, d.deg_sum,
           COALESCE(i.intra_directed, 0) AS intra_directed,
           m.m_directed,
           CAST(CAST(m.m_directed AS DECIMAL(38,0)) * COALESCE(i.intra_directed, 0)
                - CAST(d.deg_sum AS DECIMAL(38,0)) * d.deg_sum AS BIGINT) AS contribution
    FROM dsum d LEFT JOIN intra i USING (community) CROSS JOIN m
    """


@_q("g_modularity", _modularity_oracle())
def g_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the g_label_propagation communities, in
    exact integer units: with M = directed edge count (= 2m), D_c =
    directed intra-community edges (= 2·L_c) and d_c = Σ degrees,
    M²·Q = Σ_c (M·D_c − d_c²) — every per-community contribution is an
    integer, so the "did LPA find real structure?" score needs no
    float tolerance. Products are DECIMAL(38,0)-routed internally and
    emitted as BIGINT (the gate's portable-type surface; at 100 TB the
    emit would stay decimal — M·D_c exceeds int64 once M > ~3·10⁹). Labels come from the SAME
    LPA(3) computation the driver already hash-verifies; edges/degrees
    are one extra groupBy each, intra-edge counting is two broadcast-
    able equi-joins of the label table onto the edge list. The
    symmetric edge frame is the SAME lineage-truncated frame LPA
    iterated over (_lpa_frames), so the three consumers here (M, deg,
    intra) read the materialized checkpoint instead of re-deriving the
    lineitem×orders join + two DISTINCTs per consumer."""
    from data_spark.queries.mining import _lpa_frames

    sym, labels = _lpa_frames(spark, sf_dir)
    m = sym.agg(F.count(F.lit(1)).cast("bigint").alias("m_directed"))
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    dsum = (
        deg.join(labels, "id")
        .groupBy("community")
        .agg(F.sum("deg").cast("bigint").alias("deg_sum"))
    )
    la = labels.select(F.col("id").alias("a"), F.col("community").alias("ca"))
    lb = labels.select(F.col("id").alias("b"), F.col("community").alias("cb"))
    intra = (
        sym.join(la, "a")
        .join(lb, "b")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_directed"))
    )
    out = (
        dsum.join(intra, "community", "left")
        .withColumn("intra_directed", F.coalesce("intra_directed", F.lit(0).cast("bigint")))
        .crossJoin(F.broadcast(m))
    )
    return out.select(
        "community",
        "deg_sum",
        "intra_directed",
        "m_directed",
        (
            F.col("m_directed").cast("decimal(38,0)") * F.col("intra_directed")
            - F.col("deg_sum").cast("decimal(38,0)") * F.col("deg_sum")
        )
        .cast("bigint")
        .alias("contribution"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM perplexity filter (CCNet-style self-scoring).
# ---------------------------------------------------------------------------

_PPL_THRESHOLD = 6.0

_TOKS_SQL = r"""
      SELECT doc_id,
             str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')),
                             '\s+') AS ws
      FROM documents
"""


@_q(
    "d_perplexity_filter",
    f"""
    WITH toks AS ({_TOKS_SQL}),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(ws))) AS t(i)
      WHERE ws[i] <> '' AND ws[i + 1] <> ''
    ),
    cnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM big GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1 FROM big GROUP BY 1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
        SELECT unnest(ws) AS w FROM toks
      ) WHERE w <> ''
    ),
    scored AS (
      SELECT b.doc_id,
             ROUND(ln(CAST(c.n12 + 1 AS DOUBLE) / CAST(x.n1 + vocab.v AS DOUBLE)), 6) AS lp6
      FROM big b
      JOIN cnt c ON c.w1 = b.w1 AND c.w2 = b.w2
      JOIN ctx x ON x.w1 = b.w1
      CROSS JOIN vocab
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(-lp6 AS DECIMAL(38,6))) AS DOUBLE) AS nll
      FROM scored GROUP BY 1
    )
    SELECT doc_id, n_bigrams, nll, nll / n_bigrams AS avg_nll,
           CAST(nll / n_bigrams > {_PPL_THRESHOLD} AS BOOLEAN) AS flagged
    FROM per_doc
    """,
)
def d_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean NLL under an add-1-smoothed corpus bigram LM —
    the CCNet/Gopher perplexity-filter shape, self-scored (model and
    corpus are the same scan, so every scored bigram is in-model).
    p(w2|w1) = (c12+1)/(c1+V): integer ratios → identical doubles
    cross-engine; each ln term is 6-dp-snapped and the per-doc sum is
    DECIMAL(38,6)-routed (order-independent); avg_nll is one division
    of identical operands. Docs with <2 tokens have no bigrams and are
    absent by contract. Flag threshold {_PPL_THRESHOLD} nats — ln
    values are transcendental, never exactly on it. At scale: the
    model is a groupBy (map-side combinable), scoring is an equi-join
    on the bigram key, V is a 1-row broadcast."""
    return bigram_nll(t(spark, sf_dir, "documents"))


def bigram_nll(d: DataFrame) -> DataFrame:
    """Per-doc (doc_id, n_bigrams, nll, avg_nll, flagged) under the
    add-1 bigram LM trained on ``d`` itself — the self-scoring core of
    d_perplexity_filter, factored so laws (duplicate docs score
    identically, corpus-sum consistency) can run on planted frames."""
    toks = d.select("doc_id", _words(F.col("text")).alias("ws"))
    ln_ = F.greatest(F.size("ws") - 1, F.lit(0))
    big = (
        toks.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, ln_).alias("w1"),
                    F.slice(F.col("ws"), 2, ln_).alias("w2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    cnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("n12"))
    ctx = big.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    vocab = (
        toks.select(F.explode("ws").alias("w"))
        .filter(F.col("w") != "")
        .agg(F.countDistinct("w").cast("bigint").alias("v"))
    )
    scored = (
        big.join(cnt, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("n12") + 1).cast("double") / (F.col("n1") + F.col("v")).cast("double")
                ),
                6,
            ).alias("lp6"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum((-F.col("lp6")).cast("decimal(38,6)")).cast("double").alias("nll"),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "nll",
        (F.col("nll") / F.col("n_bigrams")).alias("avg_nll"),
        (F.col("nll") / F.col("n_bigrams") > F.lit(_PPL_THRESHOLD)).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking + chunk-fingerprint dedup.
# ---------------------------------------------------------------------------

_CDC_MOD = 16


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mod: int = _CDC_MOD,
    with_text: bool = False,
) -> DataFrame:
    """(id, chunk_id, chunk_md5, n_tokens) content-defined chunk table:
    boundaries fall AFTER tokens whose portable hash ≡ 0 (mod ``mod``),
    so they depend only on token content — a prefix insertion re-chunks
    nothing past the next boundary. Per-doc windows only.

    ``with_text=True`` additionally emits the chunk's text (needed by
    corpus REWRITING consumers that reassemble documents from surviving
    chunks); the default plan is unchanged for fingerprint-only callers.
    """
    tok = (
        df.select(F.col(id_col).alias("doc_id"), F.posexplode(_words(F.col(text_col))).alias("pos0", "tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    hashed = tok.withColumn(
        "b",
        F.when(_portable_hash60(F.col("tok")) % mod == 0, F.lit(1)).otherwise(F.lit(0)),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    cid = hashed.withColumn("chunk_id", F.sum("b").over(w) - F.col("b"))
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))),
            lambda s: s.tok,
        ),
        " ",
    )
    n_tok = F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    if with_text:
        return (
            cid.groupBy("doc_id", "chunk_id")
            .agg(joined.alias("chunk_text"), n_tok)
            .withColumn("chunk_md5", F.md5(F.col("chunk_text")))
        )
    return cid.groupBy("doc_id", "chunk_id").agg(F.md5(joined).alias("chunk_md5"), n_tok)


@_q(
    "d_cdc_chunking",
    f"""
    WITH toks0 AS ({_TOKS_SQL}),
    tok AS (
      SELECT doc_id, i AS pos, ws[i] AS tok
      FROM toks0, UNNEST(range(1, len(ws) + 1)) AS t(i)
      WHERE ws[i] <> ''
    ),
    hashed AS (
      SELECT doc_id, pos, tok,
             CASE WHEN CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {_CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS b
      FROM tok
    ),
    cid AS (
      SELECT doc_id, pos, tok,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) - b AS chunk_id
      FROM hashed
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM cid GROUP BY 1, 2
    )
    SELECT chunk_md5, MIN(n_tokens) AS n_tokens,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM chunks GROUP BY 1
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def d_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: a chunk boundary falls AFTER any
    token whose portable 60-bit hash ≡ 0 (mod {_CDC_MOD}) — expected
    chunk length {_CDC_MOD} tokens, but the boundary positions depend
    only on token CONTENT, so inserting a sentence at the top of a doc
    re-chunks nothing downstream of the next boundary (the property
    offset-based shingling lacks; pytest pins it). Chunks are
    fingerprinted (md5 of the space-joined tokens) and fingerprints
    appearing in ≥2 distinct docs are reported — the shift-robust
    repeated-passage detector. Per-doc windows only; the dedup groupBy
    keys on the fingerprint, map-side combinable. Production variant
    would use a rolling Rabin window over bytes; the per-token hash
    keeps the boundary rule portable to the SQL oracle
    (`dedup._portable_hash60`, same md5-prefix family as the exact
    MinHash gate)."""
    chunks = cdc_chunks(t(spark, sf_dir, "documents"))
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Composed curation v2: perplexity rank-cut + CDC chunk dedup, one
# disposition row per document.
# ---------------------------------------------------------------------------

_CURATE_DROP_FRAC = 10  # drop the worst 1/10 by avg_nll


@_q(
    "d_curation_ppl_e2e",
    f"""
    WITH toks AS ({_TOKS_SQL}),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(ws))) AS t(i)
      WHERE ws[i] <> '' AND ws[i + 1] <> ''
    ),
    cnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM big GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1 FROM big GROUP BY 1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
        SELECT unnest(ws) AS w FROM toks
      ) WHERE w <> ''
    ),
    lp AS (
      SELECT b.doc_id,
             ROUND(ln(CAST(c.n12 + 1 AS DOUBLE) / CAST(x.n1 + vocab.v AS DOUBLE)), 6) AS lp6
      FROM big b
      JOIN cnt c ON c.w1 = b.w1 AND c.w2 = b.w2
      JOIN ctx x ON x.w1 = b.w1
      CROSS JOIN vocab
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(-lp6 AS DECIMAL(38,6))) AS DOUBLE) AS nll
      FROM lp GROUP BY 1
    ),
    ranked AS (
      SELECT doc_id, n_bigrams, nll / n_bigrams AS avg_nll,
             ROW_NUMBER() OVER (ORDER BY nll / n_bigrams ASC, doc_id ASC) AS rn,
             COUNT(*) OVER () AS n_scored
      FROM per_doc
    ),
    disp1 AS (
      SELECT d.doc_id,
             COALESCE(r.n_bigrams, 0) AS n_bigrams,
             r.avg_nll,
             (r.doc_id IS NULL OR r.rn > r.n_scored - r.n_scored // {_CURATE_DROP_FRAC})
               AS dropped_ppl
      FROM documents d LEFT JOIN ranked r ON r.doc_id = d.doc_id
    ),
    kept1 AS (SELECT doc_id FROM disp1 WHERE NOT dropped_ppl),
    tok AS (
      SELECT t0.doc_id, i AS pos, ws[i] AS tok
      FROM toks t0 JOIN kept1 k ON k.doc_id = t0.doc_id,
           UNNEST(range(1, len(ws) + 1)) AS u(i)
      WHERE ws[i] <> ''
    ),
    cid AS (
      SELECT doc_id, pos, tok,
             SUM(CASE WHEN CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {_CDC_MOD} = 0
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos)
             - CASE WHEN CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {_CDC_MOD} = 0
                    THEN 1 ELSE 0 END AS chunk_id
      FROM tok
    ),
    chunks AS (
      SELECT doc_id, chunk_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
      FROM cid GROUP BY 1, 2
    ),
    firsts AS (SELECT chunk_md5, MIN(doc_id) AS first_doc FROM chunks GROUP BY 1),
    dups AS (
      SELECT DISTINCT c.doc_id
      FROM chunks c JOIN firsts f ON f.chunk_md5 = c.chunk_md5
      WHERE f.first_doc < c.doc_id
    )
    SELECT d1.doc_id, d1.n_bigrams, d1.avg_nll, d1.dropped_ppl,
           (NOT d1.dropped_ppl AND du.doc_id IS NOT NULL) AS dropped_dup,
           (NOT d1.dropped_ppl AND du.doc_id IS NULL) AS kept
    FROM disp1 d1 LEFT JOIN dups du ON du.doc_id = d1.doc_id
    """,
)
def d_curation_ppl_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation v2 — the round-6 tier as ONE pipeline, a
    disposition row per document:

    1. score every doc under the corpus bigram LM (``bigram_nll``);
    2. drop the worst 1/{_CURATE_DROP_FRAC} by avg_nll via a RANK cut
       ((avg_nll, doc_id) total order through the two-phase distributed
       global rank — a deterministic integer decision, no float
       threshold to sit on a boundary) plus every unscoreable
       (<2-token) doc;
    3. among survivors, drop any doc sharing a content-defined chunk
       fingerprint with a smaller-id survivor (first-doc-wins, the
       shift-robust passage dedup).

    The output is the audit record a curation run must produce: WHY
    each doc was kept or dropped, not just the survivor list. The only
    driver-side values are the scored-doc count (one scalar) and the
    distributed rank's per-partition offsets."""
    from data_spark.operators.order import global_row_number

    docs = t(spark, sf_dir, "documents")
    scores = bigram_nll(docs).select("doc_id", "n_bigrams", "avg_nll")
    ranked = global_row_number(scores, ["avg_nll", "doc_id"], out="rn")
    n_scored = ranked.count()
    cut = n_scored - n_scored // _CURATE_DROP_FRAC
    disp1 = (
        docs.select("doc_id")
        .join(ranked, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
            "avg_nll",
            (F.col("rn").isNull() | (F.col("rn") > F.lit(cut))).alias("dropped_ppl"),
        )
    )
    kept1 = disp1.filter(~F.col("dropped_ppl")).select("doc_id")
    chunks = cdc_chunks(docs.join(kept1, "doc_id")).select("doc_id", "chunk_md5")
    firsts = chunks.groupBy("chunk_md5").agg(F.min("doc_id").alias("first_doc"))
    dups = (
        chunks.join(firsts, "chunk_md5")
        .filter(F.col("first_doc") < F.col("doc_id"))
        .select("doc_id")
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        disp1.join(dups, "doc_id", "left")
        .select(
            "doc_id",
            "n_bigrams",
            "avg_nll",
            "dropped_ppl",
            (~F.col("dropped_ppl") & F.col("_dup").isNotNull()).alias("dropped_dup"),
            (~F.col("dropped_ppl") & F.col("_dup").isNull()).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# Token-balanced shard assignment (serpentine over the global rank).
# ---------------------------------------------------------------------------

_N_SHARDS = 8


@_q(
    "d_shard_assign",
    f"""
    WITH toks AS ({_TOKS_SQL}),
    sized AS (
      SELECT doc_id,
             CAST(len(list_filter(ws, w -> w <> '')) AS BIGINT) AS n_tokens
      FROM toks
    ),
    ranked AS (
      SELECT doc_id, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS rnk
      FROM sized
    )
    SELECT doc_id, n_tokens, rnk,
           CAST(CASE WHEN ((rnk - 1) // {_N_SHARDS}) % 2 = 0
                     THEN (rnk - 1) % {_N_SHARDS}
                     ELSE {_N_SHARDS} - 1 - ((rnk - 1) % {_N_SHARDS})
                END AS BIGINT) AS shard
    FROM ranked
    """,
)
def d_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment — the "write S training shards
    of equal work" step: docs ranked by (n_tokens DESC, doc_id) through
    the two-phase distributed global rank, then dealt serpentine
    (block b = (rank−1)//S goes left-to-right when even, right-to-left
    when odd). Serpentine beats plain round-robin because each
    consecutive block reverses direction, so a shard that got the
    largest doc of one block gets the smallest of the next: per-shard
    token totals differ by at most the largest document (law-tested),
    with zero data movement beyond the rank's range shuffle. The
    assignment is a pure integer function of the rank — deterministic,
    engine-independent, and oracle-exact."""
    from data_spark.operators.order import global_row_number

    docs = t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.filter(_words(F.col("text")), lambda w: w != "")).cast("bigint").alias("n_tokens"),
    )
    ranked = global_row_number(
        sized, [F.col("n_tokens").desc(), F.col("doc_id").asc()], out="rnk"
    )
    block = ((F.col("rnk") - 1) / _N_SHARDS).cast("bigint")
    pos = (F.col("rnk") - 1) % _N_SHARDS
    return ranked.select(
        "doc_id",
        "n_tokens",
        "rnk",
        F.when(block % 2 == 0, pos)
        .otherwise(F.lit(_N_SHARDS - 1) - pos)
        .cast("bigint")
        .alias("shard"),
    )


# ---------------------------------------------------------------------------
# Streaming drift-monitor pipeline, gate-verified end to end.
# ---------------------------------------------------------------------------


@_q(
    "pipe_stream_drift_e2e",
    """
    WITH hist AS (
      SELECT event_type AS grp, CAST(hour(ts) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    ref AS (SELECT MIN(grp) AS rg FROM hist),
    others AS (SELECT h.* FROM hist h, ref WHERE h.grp <> ref.rg),
    refh AS (SELECT v, c AS c_ref FROM hist h, ref WHERE h.grp = ref.rg),
    merged AS (
      SELECT grp, v, SUM(c_g) AS c_g, SUM(c_ref) AS c_ref FROM (
        SELECT grp, v, c AS c_g, 0 AS c_ref FROM others
        UNION ALL
        SELECT o.grp, r.v, 0, r.c_ref
        FROM (SELECT DISTINCT grp FROM others) o CROSS JOIN refh r
      ) GROUP BY 1, 2
    ),
    cum AS (
      SELECT grp, v,
             SUM(c_g) OVER (PARTITION BY grp ORDER BY v) AS f_g,
             SUM(c_ref) OVER (PARTITION BY grp ORDER BY v) AS f_ref,
             SUM(c_g) OVER (PARTITION BY grp) AS n,
             SUM(c_ref) OVER (PARTITION BY grp) AS n_ref
      FROM merged
    ),
    scored AS (
      SELECT grp, v, n, n_ref, ABS(f_g * n_ref - f_ref * n) AS d_num,
             ROW_NUMBER() OVER (
               PARTITION BY grp ORDER BY ABS(f_g * n_ref - f_ref * n) DESC, v
             ) AS rn
      FROM cum
    )
    SELECT grp, CAST(n AS BIGINT) AS n, CAST(n_ref AS BIGINT) AS n_ref,
           CAST(d_num AS BIGINT) AS d_num, v AS v_at,
           CAST(d_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n_ref AS DOUBLE)) AS ks_d
    FROM scored WHERE rn = 1
    """,
)
def pipe_stream_drift_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming drift monitor, gate-verified END TO END: the
    events table is consumed as a REAL file stream (availableNow
    trigger), each micro-batch's (event_type, hour-of-day) counts fold
    into the persistent histogram state (stage-and-swap + replay
    guard), and the result is read_ks_drift over the FOLDED STATE —
    every event type's hour-of-day activity profile KS-tested against
    the reference type (smallest name). Because integer-count folding
    is exactly associative, the state equals the one-shot histogram
    and the DuckDB oracle can recompute the identical statistic from
    the raw table: the hash match verifies the whole streaming path
    (source → fold → promote → reader), not a batch re-derivation.
    Hour-of-day is a bounded integer domain — exactly the histogram
    sink's contract (unbounded domains use the KLL sink +
    read_quantile_drift)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from data_spark.streaming.jobs import (
        hist_state_sink,
        read_ks_drift,
        stream_state_scope,
    )

    work = run_scratch_dir("sdrift", sf_dir)
    state = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")

    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
        .select("event_type", F.hour("ts").alias("hr"))
    )
    # fold shuffles sized to the stream volume (footer count), not the
    # session constant — see stream_state_scope
    with stream_state_scope(spark, table_rows(spark, sf_dir, "events")):
        q = hist_state_sink(stream, state, ckpt, group_col="event_type", value_col="hr")
        if not q.awaitTermination(300):
            # timed out: the reader below would silently consume absent or
            # partial state — fail loudly instead (ADVICE r6)
            q.stop()
            raise TimeoutError("pipe_stream_drift_e2e: stream did not drain within 300s")

    ref = spark.read.parquet(state).agg(F.min("grp")).first()[0]
    return read_ks_drift(spark, state, ref)
