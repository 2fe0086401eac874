"""Round-8 tier: moment-matrix verification, symbolic series,
agreement statistics, log-diluted link prediction, dedup
canonicalization, and vocabulary coverage.

- ``v_pca_moments``: the exact cross-engine gate for the PCA fit's
  distributed accumulation (VERDICT r7 #6). ``pca_fit``
  (operators/decomposition.py) reduces per-batch (n, Σx, XᵀX) partials;
  eigensolves are not SQL-expressible, so ``v_pca_project`` stays
  rows-only with a numpy-mirror pytest — but the moment ACCUMULATION,
  the only data-scale part, hashes exactly once values are snapped to
  the e6 grid: this query emits the full upper-triangle second-moment
  matrix (d·(d+1)/2 rows of BIGINT sums) and DuckDB reproduces it
  bit-for-bit. After this gate, the only unverified step of the PCA
  path is a d×d local eigensolve pinned by tests/test_decomposition.py.
- ``e_sax_symbolize``: SAX symbolization of daily series (PAA +
  quartile-breakpoint alphabet) — exact integer statistics, one
  identical double expression tree per engine.
- ``a_cohens_kappa``: chance-corrected agreement between two
  deterministic raters — the LLM-judge/label-audit statistic.
- ``g_adamic_adar``: 1/ln(deg) witness dilution next to
  g_resource_alloc's 1/deg — integer contributions, no float sums.
- ``d_dedup_canonical``: quality-argmax canonical selection per
  near-dup cluster (what the rewrite step actually keeps).
- ``d_vocab_coverage``: Zipf coverage of the top-k vocabulary —
  tokenizer sizing evidence, TakeOrdered slices, no global rank.

Scale posture: v_pca_moments' pair expansion is a NARROW
double-posexplode (each vector row expands to d·(d+1)/2 pair rows in
place — no join, no shuffle until the final 2080-group aggregation,
which map-side combines); the rest are counted aggregates, partitioned
windows, witness-bounded self-joins, or TakeOrdered heads — per-query
notes below.

Reference parity: the reference has no decomposition/link-prediction
tier (its analytics are pandas in driver memory); these re-express the
same statistics as set-oriented plans with exact cross-engine
contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_spark.plans.lineage import truncate_lineage
from data_spark.queries.common import run_scratch_dir, t

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
# v_pca_moments — exact second-moment matrix over e6-snapped embeddings
# ---------------------------------------------------------------------------

_PCA_MOMENTS_SQL = """
WITH x AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS xv
    FROM embeddings
)
SELECT
    a.i AS i,
    b.i AS j,
    COUNT(*) AS n_vecs,
    CAST(SUM(a.xv) AS BIGINT) AS sum_i,
    CAST(SUM(b.xv) AS BIGINT) AS sum_j,
    CAST(SUM(a.xv * b.xv) AS BIGINT) AS sum_prod
FROM x a
JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY a.i, b.i
"""


@_q("v_pca_moments", _PCA_MOMENTS_SQL)
def v_pca_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle (i <= j, 1-based) exact second moments of the
    embedding table on the e6 snap grid: for every component pair, the
    vector count, both component sums, and the cross-product sum — the
    sufficient statistics ``pca_fit`` accumulates, as exact BIGINTs.

    Bounds: |x| < 1 ⇒ |snap| < 1e6 ⇒ |xv·yv| < 1e12; 9.2e18/1e12 ≈ 9M
    vectors before BIGINT overflow — far above any gate SF; at real
    scale the same statistics carry as DECIMAL(38,0) with no plan
    change. The expansion is posexplode + a per-row SLICE (suffix of
    the same array), so pairs materialize narrowly — no self-join."""
    emb = t(spark, sf_dir, "embeddings")
    snapped = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(v.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("x"),
    )
    d = F.size(F.col("x"))
    pairs = (
        snapped.select("vec_id", "x", F.posexplode("x").alias("i0", "xi"))
        # suffix slice starting AT position i0 (1-based i0+1): pairs
        # (i, j>=i) appear exactly once, diagonal included
        .select(
            "i0",
            "xi",
            F.posexplode(F.slice("x", F.col("i0") + 1, d - F.col("i0"))).alias(
                "p0", "xj"
            ),
        )
    )
    return pairs.groupBy(
        (F.col("i0") + 1).alias("i"),
        (F.col("i0") + F.col("p0") + 1).alias("j"),
    ).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("xi").alias("sum_i"),
        F.sum("xj").alias("sum_j"),
        F.sum(F.col("xi") * F.col("xj")).alias("sum_prod"),
    )


# ---------------------------------------------------------------------------
# e_sax_symbolize — SAX symbolic aggregate approximation of daily series
# ---------------------------------------------------------------------------

_SAX_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS dv
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, CAST(ts AS DATE)
), idx AS (
    SELECT event_type, day, dv,
           date_diff('day', MIN(day) OVER (PARTITION BY event_type), day) AS day_idx
    FROM daily
), stats AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS nd,
           CAST(SUM(dv) AS BIGINT) AS s,
           CAST(SUM(CAST(dv AS DECIMAL(38,0)) * CAST(dv AS DECIMAL(38,0))) AS DOUBLE) AS ss
    FROM idx GROUP BY event_type
), seg AS (
    SELECT event_type, CAST(day_idx // 5 AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(dv) AS BIGINT) AS seg_sum
    FROM idx GROUP BY event_type, day_idx // 5
), z AS (
    SELECT g.event_type, g.segment, g.n_days,
           CAST(g.seg_sum AS DOUBLE) / CAST(g.n_days AS DOUBLE) AS paa,
           (CAST(g.seg_sum AS DOUBLE) / CAST(g.n_days AS DOUBLE)
            - CAST(t.s AS DOUBLE) / CAST(t.nd AS DOUBLE))
           / SQRT(t.ss / CAST(t.nd AS DOUBLE)
                  - (CAST(t.s AS DOUBLE) / CAST(t.nd AS DOUBLE))
                    * (CAST(t.s AS DOUBLE) / CAST(t.nd AS DOUBLE))) AS zval
    FROM seg g JOIN stats t USING (event_type)
)
SELECT event_type, segment, n_days,
       ROUND(paa, 6) AS paa,
       ROUND(zval, 6) AS z,
       CASE WHEN zval < -0.6745 THEN 'a'
            WHEN zval < 0.0 THEN 'b'
            WHEN zval < 0.6745 THEN 'c'
            ELSE 'd' END AS symbol
FROM z
"""


@_q("e_sax_symbolize", _SAX_SQL)
def e_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation, Lin/Keogh 2003) of each
    event type's daily-total series: cent-snapped exact daily sums →
    5-day PAA segment means → per-series z-normalization → alphabet-4
    symbols at the standard normal quartile breakpoints (±0.6745, 0).
    The symbolic form is what motif/novelty mining and index-ahead-of-
    scan time-series stores run on — at 100 TB the symbols are the
    index, the raw series stays in cold storage.

    Exactness: every accumulated statistic is an exact integer
    (cent-snapped sums, squares as DECIMAL(38,0)); μ, σ, PAA, and z are
    single identical double expression trees over those integers in
    both engines, and the breakpoint comparisons bin bit-identical
    doubles — no cross-engine float accumulation anywhere. One narrow
    shuffle to daily grain, windows partitioned by series."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("dv")
    )
    idx = daily.select(
        "event_type",
        "dv",
        F.datediff(
            F.col("day"), F.min("day").over(Window.partitionBy("event_type"))
        ).alias("day_idx"),
    )
    stats = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("dv").cast("bigint").alias("s"),
        F.sum(F.col("dv").cast("decimal(38,0)") * F.col("dv").cast("decimal(38,0)"))
        .cast("double")
        .alias("ss"),
    )
    seg = idx.groupBy(
        "event_type", (F.col("day_idx") / 5).cast("bigint").alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("dv").cast("bigint").alias("seg_sum"),
    )
    paa = F.col("seg_sum").cast("double") / F.col("n_days").cast("double")
    mu = F.col("s").cast("double") / F.col("nd").cast("double")
    sigma = F.sqrt(F.col("ss") / F.col("nd").cast("double") - mu * mu)
    zval = (paa - mu) / sigma
    return seg.join(stats, "event_type").select(
        "event_type",
        "segment",
        "n_days",
        F.round(paa, 6).alias("paa"),
        F.round(zval, 6).alias("z"),
        F.when(zval < F.lit(-0.6745), F.lit("a"))
        .when(zval < F.lit(0.0), F.lit("b"))
        .when(zval < F.lit(0.6745), F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("symbol"),
    )


# ---------------------------------------------------------------------------
# a_cohens_kappa — inter-rater agreement from exact confusion counts
# ---------------------------------------------------------------------------

_KAPPA_SQL = """
WITH rated AS (
    SELECT CASE WHEN o_totalprice >= 150000.0 THEN 1 ELSE 0 END AS a,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS b
    FROM orders
), c AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(a * b) AS BIGINT) AS n11,
           CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
           CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
           CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
    FROM rated
)
SELECT n, n11, n10, n01, n00,
       ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
       ROUND((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
              + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
       ROUND((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                 + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                       + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS kappa
FROM c
"""


@_q("a_cohens_kappa", _KAPPA_SQL)
def a_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic binary raters of the
    same orders — a price-threshold classifier and a priority-band
    classifier. Kappa is THE agreement statistic for LLM-judge /
    human-label audits (agreement corrected for chance); here the
    raters are rule-based so the whole pipeline is reproducible.

    The confusion matrix is four exact integer counts from one
    map-side-combinable aggregate (no shuffle beyond a scalar agg);
    po, pe, kappa are single identical double expression trees over
    them in both engines, rounded 6 dp."""
    o = t(spark, sf_dir, "orders")
    a = F.when(F.col("o_totalprice") >= 150000.0, 1).otherwise(0)
    b = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    c = o.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / nd
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01")).cast("double")
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00")).cast("double")
    ) / (nd * nd)
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# g_adamic_adar — the ln-diluted link-prediction member next to RA
# ---------------------------------------------------------------------------

_AA_SCALE = 1_000_000_000_000
_AA_MAX_DEG = 50


_AA_SQL = f"""
WITH e AS (
    SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), deg AS (
    SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY c
), ok AS (
    SELECT c, d FROM deg WHERE d BETWEEN 2 AND {_AA_MAX_DEG}
), scored AS (
    SELECT a.s AS s1, b.s AS s2,
           CAST(SUM(CAST(FLOOR(CAST({_AA_SCALE} AS DOUBLE) / ln(CAST(d AS DOUBLE))) AS BIGINT)) AS BIGINT) AS score
    FROM e a JOIN ok USING (c) JOIN e b USING (c)
    WHERE a.s < b.s
    GROUP BY a.s, b.s
)
SELECT s1, s2, score FROM scored ORDER BY score DESC, s1, s2 LIMIT 100
"""


@_q("g_adamic_adar", _AA_SQL)
def g_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 predicted supplier links by Adamic-Adar index: for
    supplier pairs sharing a customer, score = Σ_w 1/ln(deg(w)) — the
    logarithmic-dilution sibling of g_resource_alloc (1/deg). Together
    they span the two standard witness-dilution laws of link
    prediction; AA weights mid-degree witnesses higher.

    Cross-engine exactness: each witness contributes the INTEGER
    FLOOR(1e12 / ln(deg)) — ln() runs over identical integer operands
    in both engines (verified to agree for every deg in [2, 2000] on
    this toolchain; the 6-dp-rounded KL oracle set the ln precedent),
    and only integers are summed, so no float accumulation order can
    drift. deg ∈ [2, {_AA_MAX_DEG}]: ln(1) = 0 would divide by zero
    (a single-customer witness carries no dilution signal), and the
    hub cutoff bounds pair fan-out at Σ deg² ≤ {_AA_MAX_DEG}·|E| —
    never all-pairs. Top-100 is TakeOrderedAndProject."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        # one join+DISTINCT pass, not three: deg and both pair-join
        # sides consume this frame (same barrier as a_itemcf_recommend)
        .transform(truncate_lineage)
    )
    deg = (
        e.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter((F.col("d") >= 2) & (F.col("d") <= _AA_MAX_DEG))
    )
    a = e.select(F.col("c"), F.col("s").alias("s1"))
    b = e.select(F.col("c"), F.col("s").alias("s2"))
    contrib = F.floor(
        F.lit(_AA_SCALE).cast("double") / F.log(F.col("d").cast("double"))
    ).cast("bigint")
    scored = (
        a.join(deg, "c")
        .join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.sum(contrib).cast("bigint").alias("score"))
    )
    return scored.orderBy(F.desc("score"), "s1", "s2").limit(100)


# ---------------------------------------------------------------------------
# d_dedup_canonical — quality-driven canonical selection per dup cluster
# ---------------------------------------------------------------------------

_CANONICAL_SQL = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')), '\s+') AS words
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS gram
  FROM toks, UNNEST(range(1, greatest(len(words) - 2, 1) + 1)) AS r(i)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT p.doc_a, p.doc_b
  FROM shared p
  JOIN sizes sa ON p.doc_a = sa.doc_id
  JOIN sizes sb ON p.doc_b = sb.doc_id
  WHERE CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared) >= 0.5
), sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), walk(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a
), comp AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
  FROM walk GROUP BY a
), ranked AS (
  SELECT c.doc_id, c.cluster_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT r.doc_id, r.cluster_id,
       k.doc_id AS canonical_id, k.n_chars AS canonical_chars,
       CAST(r.cluster_size AS BIGINT) AS cluster_size,
       CAST(r.doc_id = k.doc_id AS BIGINT) AS is_canonical
FROM ranked r
JOIN ranked k ON r.cluster_id = k.cluster_id AND k.rk = 1
"""


@_q("d_dedup_canonical", _CANONICAL_SQL)
def d_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonicalization step AFTER near-dup clustering: within each
    fuzzy-dup cluster (n-gram Jaccard >= 0.5 pairs → connected
    components, the d_fuzzy_dedup_resolve graph), keep the member with
    the MOST content (max n_chars, doc_id tiebreak) instead of the
    arbitrary min-id — what production dedup actually ships: the
    longest/cleanest variant of a templated family survives, the rest
    map to it. Emits every cluster member with its canonical doc and
    an is_canonical flag so the rewrite is one semi-join downstream.

    Exactness: the quality score is the INTEGER n_chars column, so the
    argmax is pure integer ordering — no float. Scale posture: pair
    generation is PPJoin-prefix-filtered (never n²), components are
    the iterative min-label loop with truncated lineage, and the
    canonical pick is one partitioned window over cluster members."""
    from pyspark.sql.window import Window

    from data_spark.graph.algorithms import connected_components
    from data_spark.operators.dedup import ngram_jaccard_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("cluster_id"),
    )
    members = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = members.select(
        "doc_id",
        "cluster_id",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    )
    canon = ranked.filter(F.col("rk") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("canonical_id"),
        F.col("n_chars").alias("canonical_chars"),
    )
    return ranked.join(canon, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "canonical_id",
        "canonical_chars",
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        (F.col("doc_id") == F.col("canonical_id")).cast("bigint").alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# d_vocab_coverage — token coverage of the top-k vocabulary (Zipf curve)
# ---------------------------------------------------------------------------

_COVERAGE_SQL = r"""
WITH words AS (
  SELECT unnest(str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')), '\s+')) AS term
  FROM documents
), filtered AS (
  SELECT term FROM words WHERE term <> ''
), counts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM filtered GROUP BY term
), ranked AS (
  SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rk FROM counts
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab_size
  FROM counts
)
SELECT k.k AS top_k,
       CAST((SELECT SUM(n) FROM ranked WHERE rk <= k.k) AS BIGINT) AS covered_tokens,
       t.total_tokens,
       t.vocab_size,
       ROUND(CAST((SELECT SUM(n) FROM ranked WHERE rk <= k.k) AS DOUBLE)
             / CAST(t.total_tokens AS DOUBLE), 6) AS coverage
FROM (VALUES (10), (100), (1000)) k(k), tot t
"""


@_q("d_vocab_coverage", _COVERAGE_SQL)
def d_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf coverage curve: what fraction of all corpus tokens the
    top-10 / top-100 / top-1000 vocabulary terms cover — the statistic
    that sizes tokenizer vocabularies and byte-fallback budgets (a
    corpus whose top-1000 covers 95% tokenizes very differently from
    one where it covers 60%).

    Plan shape: term counts are one map-side-combinable groupBy; each
    top-k slice is TakeOrderedAndProject over the counts frame (count
    desc, lexical tiebreak — NO global window or rank over the full
    vocabulary), reduced to a 1-row sum and joined to the scalar
    totals. Everything is exact integers until the final division."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]+", " ")),
                r"\s+",
            )
        ).alias("term")
    ).filter(F.col("term") != "")
    counts = words.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = counts.agg(
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )
    parts = []
    for k in (10, 100, 1000):
        topk = counts.orderBy(F.desc("n"), F.asc("term")).limit(k)
        parts.append(
            topk.agg(F.sum("n").cast("bigint").alias("covered_tokens")).select(
                F.lit(k).cast("int").alias("top_k"), "covered_tokens"
            )
        )
    cov = parts[0]
    for p in parts[1:]:
        cov = cov.unionByName(p)
    return cov.crossJoin(F.broadcast(tot)).select(
        "top_k",
        "covered_tokens",
        "total_tokens",
        "vocab_size",
        F.round(
            F.col("covered_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# g_katz_centrality — attenuated path counting (exact binary-fraction α)
# ---------------------------------------------------------------------------

_KATZ_SQL = """
WITH base AS (
    SELECT DISTINCT 's' || l.l_suppkey AS s, 'c' || o.o_custkey AS c
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), edges AS (
    SELECT s AS src, c AS dst FROM base
    UNION ALL
    SELECT c AS src, s AS dst FROM base
), x1 AS (
    SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS v FROM edges GROUP BY dst
), x2 AS (
    SELECT e.dst AS id, CAST(SUM(x.v) AS BIGINT) AS v
    FROM edges e JOIN x1 x ON x.id = e.src GROUP BY e.dst
), x3 AS (
    SELECT e.dst AS id, CAST(SUM(x.v) AS BIGINT) AS v
    FROM edges e JOIN x2 x ON x.id = e.src GROUP BY e.dst
)
SELECT x1.id, x1.v AS paths1, x2.v AS paths2, x3.v AS paths3,
       CAST(64 * x1.v + 8 * x2.v + x3.v AS BIGINT) AS katz_num,
       ROUND(CAST(64 * x1.v + 8 * x2.v + x3.v AS DOUBLE) / 512.0, 6) AS katz
FROM x1 JOIN x2 ON x1.id = x2.id JOIN x3 ON x1.id = x3.id
ORDER BY katz_num DESC, x1.id LIMIT 100
"""


@_q("g_katz_centrality", _KATZ_SQL)
def g_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality, 3 attenuation steps at α = 1/8, on the
    symmetrized supplier↔customer graph (the same edge base as
    g_pagerank, made bidirectional so multi-step walks exist): score =
    Σ_t α^t · |walks of length t ending at v|. Next to PageRank's
    degree-normalized diffusion this is RAW attenuated path counting —
    the other classic spectral-ish centrality.

    Exactness: walk counts are exact BIGINTs (x_{t+1} = Aᵀ x_t is a
    join + integer SUM), and α = 1/8 is a binary fraction, so the
    combined score is the exact integer 64·x1 + 8·x2 + x3 at scale 8³
    — no float anywhere until the final display division. Scale
    posture: each step is one equi-join against the edge frame +
    map-side-combinable SUM (the pagerank iteration shape, fixed 3
    rounds); top-100 is TakeOrderedAndProject."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
        )
        .distinct()
    )
    # materialize the symmetric edge frame ONCE (guide §1.2; the r12
    # shared-subplan barrier, applied here in r13): the final plan
    # consumes it six times (x1 once, x2 twice, x3 three times via the
    # nested levels) and Catalyst reuses none of it — 24 parquet scans
    # and 21 exchanges collapse to one edge derivation (plans/r13)
    edges = truncate_lineage(
        base.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionAll(
            base.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        )
    )
    x = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    levels = [x]
    for _ in range(2):
        prev = levels[-1]
        nxt = (
            edges.join(prev, edges.src == prev.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("v").cast("bigint").alias("v"))
        )
        levels.append(nxt)
    x1, x2, x3 = (
        lv.withColumnRenamed("v", f"paths{i}") for i, lv in enumerate(levels, 1)
    )
    num = (
        F.lit(64) * F.col("paths1") + F.lit(8) * F.col("paths2") + F.col("paths3")
    ).cast("bigint")
    return (
        x1.join(x2, "id")
        .join(x3, "id")
        .select(
            "id",
            "paths1",
            "paths2",
            "paths3",
            num.alias("katz_num"),
            F.round(num.cast("double") / F.lit(512.0), 6).alias("katz"),
        )
        .orderBy(F.desc("katz_num"), F.asc("id"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# e_decayed_engagement — exponentially time-decayed sums (binary half-life)
# ---------------------------------------------------------------------------

_DECAY_SQL = """
WITH anchor AS (
    SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events
), scored AS (
    SELECT e.event_type, CAST(e.user_id % 100 AS BIGINT) AS user_bucket,
           CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT) AS cents,
           date_diff('day', CAST(e.ts AS DATE), a.max_day) AS days_ago
    FROM events e, anchor a
    WHERE e.value IS NOT NULL
)
SELECT event_type, user_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents * (CAST(1 AS BIGINT) << (30 - CAST(days_ago AS INTEGER)))) AS BIGINT) AS decayed_num,
       ROUND(CAST(SUM(cents * (CAST(1 AS BIGINT) << (30 - CAST(days_ago AS INTEGER)))) AS DOUBLE)
             / 1073741824.0, 6) AS decayed
FROM scored
WHERE days_ago BETWEEN 0 AND 30
GROUP BY event_type, user_bucket
"""


@_q("e_decayed_engagement", _DECAY_SQL)
def e_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement per (event_type, user cohort): each
    event contributes value · 2^(−days_ago) with a one-day half-life
    and a 30-day horizon — the standard feature-store recency feature
    (and the batch twin of a decayed streaming counter).

    Exactness: the half-life is a POWER OF TWO, so every contribution
    is the exact integer cents · 2^(30−days_ago) and the aggregate is
    one BIGINT sum — no float decay chain whose accumulation order
    could drift cross-engine. The anchor day is a 1-row broadcast
    (allowlisted); one map-side-combinable groupBy."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    anchor = e.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    scored = e.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        (F.col("user_id") % 100).cast("bigint").alias("user_bucket"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("cents"),
        F.datediff(F.col("max_day"), F.col("ts").cast("date")).alias("days_ago"),
    )
    # shiftleft() via expr: the python F.shiftleft wrapper only accepts
    # an int-literal shift amount (same note as io.py's bloom words)
    contrib = F.col("cents") * F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(30 - days_ago AS INT))"
    )
    return (
        scored.filter((F.col("days_ago") >= 0) & (F.col("days_ago") <= 30))
        .groupBy("event_type", "user_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(contrib).cast("bigint").alias("decayed_num"),
            F.round(
                F.sum(contrib).cast("double") / F.lit(1073741824.0), 6
            ).alias("decayed"),
        )
    )


# ---------------------------------------------------------------------------
# m_versioned_optimize_scan — OPTIMIZE ZORDER correctness gate
# ---------------------------------------------------------------------------

_VO_SQL = """
WITH live AS (
    SELECT * FROM orders WHERE o_orderkey % 97 <> 0
)
SELECT 'o_orderkey' AS probe, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM live WHERE o_orderkey BETWEEN 100 AND 2000
UNION ALL
SELECT 'o_custkey' AS probe, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM live WHERE o_custkey BETWEEN 10 AND 200
"""


@_q("m_versioned_optimize_scan", _VO_SQL)
def m_versioned_optimize_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER on the versioned store, gate-verified for
    correctness: orders land in two UNCLUSTERED commits, a key
    tombstone deletes every 97th order, then ``optimize_versioned``
    rewrites the live snapshot z-order-clustered on
    (o_orderkey, o_custkey) with per-file manifest stats. Range probes
    on EACH cluster column read through the stats-pruned path and must
    hash-equal the oracle's plain filters over the same live rows —
    layout optimization (including the tombstone purge it implies) can
    change which files open, never an answer. The strict
    pruning-subset property is pinned in test_compaction; this gate
    pins answer invariance where the driver can see it."""
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from data_spark.io import (  # noqa: PLC0415
        delete_versioned,
        optimize_versioned,
        read_versioned,
        write_versioned,
    )

    base = run_scratch_dir("voptimize", sf_dir)

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    write_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base, "overwrite")
    write_versioned(o.filter(F.col("o_orderkey") % 2 == 1), base, "append")
    delete_versioned(
        o.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey"), base
    )
    optimize_versioned(spark, base, zorder_cols=["o_orderkey", "o_custkey"])

    def census(probe: str, lo: int, hi: int) -> DataFrame:
        pruned = read_versioned(spark, base, prune=(probe, lo, hi))
        return pruned.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total"),
        ).select(F.lit(probe).alias("probe"), "n", "total")

    return census("o_orderkey", 100, 2000).unionByName(
        census("o_custkey", 10, 200)
    )


# ---------------------------------------------------------------------------
# a_benjamini_hochberg — FDR-controlled multiple testing (step-up on chi2)
# ---------------------------------------------------------------------------

# BH at q=0.05 over m=21 hypotheses, df=4: the step-up decision
# p_(i) <= i*q/m is applied on the chi2 STATISTIC via the monotone
# transform x_(i) >= SF^-1(i*q/m) — the 21 thresholds are solved
# OFFLINE (bisection on exp(-x/2)*(1+x/2), the exact chi2_4 survival
# function) and inlined as IDENTICAL literals in both engines, so no
# transcendental ever executes in-engine (exp() disagrees at 1 ulp
# between Spark and DuckDB on this toolchain; ln() agrees but literals
# need neither).
_BH_THRESHOLDS = [
    16.533359735796, 14.970923721021, 14.048181575455, 13.388922159789,
    12.874657024553, 12.452419851614, 12.093875437027, 11.782068739123,
    11.506039873641, 11.258291071398, 11.033465090941, 10.827599953759,
    10.637682377981, 10.461366808266, 10.296791390863, 10.142453318467,
    9.99712193844, 9.859776671662, 9.72956169467, 9.60575222822,
    9.487729036781,
]
_BH_LANGS = ["de", "en", "es", "fr", "zh"]


def _bh_case_sql() -> str:
    whens = " ".join(
        f"WHEN {i + 1} THEN {t!r}" for i, t in enumerate(_BH_THRESHOLDS)
    )
    return f"CASE rk {whens} END"


_BH_SQL = f"""
WITH groups AS (
    SELECT source AS grp, lang FROM documents
    UNION ALL
    SELECT 'ctl_zh' AS grp, lang FROM documents WHERE lang = 'zh'
), cells AS (
    SELECT grp,
           {", ".join(f"CAST(SUM(CASE WHEN lang = '{la}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{la}" for la in _BH_LANGS)}
    FROM groups GROUP BY grp
), gtot AS (
    SELECT {", ".join(f"CAST(SUM(CASE WHEN lang = '{la}' THEN 1 ELSE 0 END) AS BIGINT) AS g_{la}" for la in _BH_LANGS)},
           CAST(COUNT(*) AS BIGINT) AS g_all
    FROM documents
), scored AS (
    SELECT c.grp,
           {" + ".join(f"CAST(c.n_{la} AS BIGINT)" for la in _BH_LANGS)} AS n,
           ({" + ".join(
               f"(CAST(c.n_{la} AS DOUBLE) - (CAST({' + '.join(f'c.n_{x}' for x in _BH_LANGS)} AS DOUBLE)) * CAST(g.g_{la} AS DOUBLE) / CAST(g.g_all AS DOUBLE)) "
               f"* (CAST(c.n_{la} AS DOUBLE) - (CAST({' + '.join(f'c.n_{x}' for x in _BH_LANGS)} AS DOUBLE)) * CAST(g.g_{la} AS DOUBLE) / CAST(g.g_all AS DOUBLE)) "
               f"/ ((CAST({' + '.join(f'c.n_{x}' for x in _BH_LANGS)} AS DOUBLE)) * CAST(g.g_{la} AS DOUBLE) / CAST(g.g_all AS DOUBLE))"
               for la in _BH_LANGS
           )}) AS chi2
    FROM cells c, gtot g
), ranked AS (
    SELECT grp, n, chi2,
           CAST(ROW_NUMBER() OVER (ORDER BY chi2 DESC, grp) AS BIGINT) AS rk
    FROM scored
), thresholded AS (
    SELECT grp, n, chi2, rk, {_bh_case_sql()} AS thr FROM ranked
), cut AS (
    SELECT MAX(CASE WHEN chi2 >= thr THEN rk ELSE 0 END) OVER () AS i_star, *
    FROM thresholded
)
SELECT grp, n, ROUND(chi2, 6) AS chi2, rk,
       CAST(ROUND(thr, 6) AS DOUBLE) AS thr,
       CAST(rk <= i_star AS BIGINT) AS rejected
FROM cut
"""


@_q("a_benjamini_hochberg", _BH_SQL)
def a_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control (step-up, q=0.05) over 21
    simultaneous goodness-of-fit hypotheses: each source's language
    mix vs the corpus mix (df=4 chi2), plus a deliberately degenerate
    control group (all-zh docs) so the rejection branch executes at
    every SF — the multiple-testing discipline a drift-monitoring
    pipeline needs when it runs one test PER SHARD (at 1,000 shards,
    q=0.05 per-test fires ~50 false alarms a day; BH bounds the false
    DISCOVERY rate instead).

    Exactness: cell counts are exact integers; chi2 is one identical
    double expression tree (fixed language order); the step-up
    decision compares chi2 against OFFLINE-solved literal thresholds
    (the chi2_4 survival inverse at i·q/m), so neither engine executes
    a transcendental; ranks and the step-up max are over the bounded
    21-row hypothesis lattice (allowlisted window)."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    groups = d.select(F.col("source").alias("grp"), "lang").unionByName(
        d.filter(F.col("lang") == "zh").select(
            F.lit("ctl_zh").alias("grp"), "lang"
        )
    )
    cells = groups.groupBy("grp").agg(
        *[
            F.sum(F.when(F.col("lang") == la, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{la}")
            for la in _BH_LANGS
        ]
    )
    glob = d.agg(
        *[
            F.sum(F.when(F.col("lang") == la, 1).otherwise(0))
            .cast("bigint")
            .alias(f"g_{la}")
            for la in _BH_LANGS
        ],
        F.count(F.lit(1)).cast("bigint").alias("g_all"),
    )
    joined = cells.crossJoin(F.broadcast(glob))
    n_expr = None
    for la in _BH_LANGS:
        n_expr = F.col(f"n_{la}") if n_expr is None else n_expr + F.col(f"n_{la}")
    chi2 = None
    for la in _BH_LANGS:
        exp_ = (
            n_expr.cast("double")
            * F.col(f"g_{la}").cast("double")
            / F.col("g_all").cast("double")
        )
        dev = F.col(f"n_{la}").cast("double") - exp_
        term = dev * dev / exp_
        chi2 = term if chi2 is None else chi2 + term
    scored = joined.select(
        "grp", n_expr.cast("bigint").alias("n"), chi2.alias("chi2")
    )
    rk = F.row_number().over(Window.orderBy(F.desc("chi2"), F.asc("grp")))
    thr = F.lit(None).cast("double")
    expr = None
    for i, v in enumerate(_BH_THRESHOLDS, 1):
        cond = F.when(F.col("rk") == i, F.lit(v))
        expr = cond if expr is None else expr.when(F.col("rk") == i, F.lit(v))
    ranked = scored.select("grp", "n", "chi2", rk.cast("bigint").alias("rk"))
    thresholded = ranked.select("grp", "n", "chi2", "rk", expr.alias("thr"))
    i_star = F.max(
        F.when(F.col("chi2") >= F.col("thr"), F.col("rk")).otherwise(0)
    ).over(Window.partitionBy())
    # The offline-solved thresholds are the chi2_4 survival inverse at
    # i·q/m with m = 21 BAKED IN: if the testdata's source cardinality
    # ever drifts, every threshold is silently wrong for the observed
    # m. Guard lazily — max(rk) over the same bounded window IS the
    # observed m, and raise_error fires during execution, never adding
    # a scan.
    m_obs = F.max("rk").over(Window.partitionBy())
    m_lit = F.lit(len(_BH_THRESHOLDS)).cast("bigint")
    rejected = F.when(
        m_obs == m_lit, (F.col("rk") <= i_star).cast("bigint")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "a_benjamini_hochberg: observed hypothesis count "
                ),
                m_obs.cast("string"),
                F.lit(f" != {len(_BH_THRESHOLDS)} baked-in BH thresholds"),
            )
        ).cast("bigint")
    )
    return thresholded.select(
        "grp",
        "n",
        F.round("chi2", 6).alias("chi2"),
        "rk",
        F.round("thr", 6).alias("thr"),
        rejected.alias("rejected"),
    )
