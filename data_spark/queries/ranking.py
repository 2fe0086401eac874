"""Ranking / retrieval / analytics gate queries added in round 3:
TF-IDF term weighting, BM25 scoring, sparse-cosine document pairs
(inverted-index join — never all-pairs), plus analytic shapes the
reference's warehouse tier computes downstream of search: EWMA
smoothing, 2-D skyline (Pareto frontier), RFM segmentation, and a
BFS shortest-path whose oracle is a DuckDB recursive CTE.

Cross-engine determinism follows queries/common.py: decimal-cast sums,
rounded float outputs, unique tiebreaks on every window/top-k order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.operators.ranking import (
    bm25_scores,
    sparse_cosine_pairs,
    tfidf_terms,
)
from data_spark.plans.lineage import sized_partitions, truncate_lineage
from data_spark.queries.common import SQL_DSUM, dsum, t, table_rows

QUERIES = {}
ORACLE = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# Shared DuckDB CTE: (doc_id, term, tf) term frequencies with the same
# tokenizer as operators.dedup._words (lowercase, non-alnum → space).
_SQL_TF = """
  toks AS (
    SELECT doc_id,
           str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')), '\\s+') AS words
    FROM documents
  ), tfreq AS (
    SELECT doc_id, w AS term, COUNT(*) AS tf
    FROM toks, UNNEST(words) AS u(w)
    WHERE w <> ''
    GROUP BY doc_id, w
  ), dfreq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tfreq GROUP BY term
  ), nd AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
  )
"""


@_q(
    "d_tfidf_topterms",
    f"""
    WITH {_SQL_TF},
    scored AS (
      SELECT t.doc_id, t.term, t.tf,
             ROUND(t.tf * (ln((nd.n_docs + 1.0) / (d.df + 1.0)) + 1.0), 6) AS score
      FROM tfreq t JOIN dfreq d USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, score, rk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def d_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smooth sklearn idf). The
    reference's search tier gets this weighting from Lucene at query
    time; here it is a two-shuffle relational computation
    (operators/ranking.py) that scales to the corpus, not the index."""
    return tfidf_terms(t(spark, sf_dir, "documents"), top_k=3)


_BM25_TERMS = ["spark", "join", "window"]


@_q(
    "d_bm25_search",
    f"""
    WITH {_SQL_TF},
    dl AS (
      SELECT doc_id, len(list_filter(words, w -> w <> '')) AS dl FROM toks
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             {SQL_DSUM.format(expr='CAST(dl AS DOUBLE)')} / COUNT(*) AS avgdl
      FROM dl
    ),
    contrib AS (
      SELECT t.doc_id,
             CAST(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.2) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
               AS DOUBLE) AS contrib
      FROM tfreq t
      JOIN dfreq d USING (term)
      JOIN dl l USING (doc_id)
      CROSS JOIN stats s
      WHERE t.term IN ('spark', 'join', 'window')
    )
    SELECT doc_id,
           ROUND({SQL_DSUM.format(expr='contrib')}, 6) AS bm25,
           COUNT(*) AS n_matched_terms
    FROM contrib GROUP BY doc_id
    """,
)
def d_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of the corpus for a fixed 3-term query (k1=1.2,
    b=0.75). Only the query terms' postings shuffle — the per-term
    filter sits before every join, so cost is |postings|, not |corpus|."""
    return bm25_scores(t(spark, sf_dir, "documents"), _BM25_TERMS)


@_q(
    "v_tfidf_cosine_pairs",
    f"""
    WITH {_SQL_TF},
    w AS (
      SELECT t.doc_id, t.term,
             t.tf * (ln((nd.n_docs + 1.0) / (d.df + 1.0)) + 1.0) AS w
      FROM tfreq t JOIN dfreq d USING (term) CROSS JOIN nd
      WHERE d.df <= 1000
    ), norms AS (
      SELECT doc_id, sqrt({SQL_DSUM.format(expr='w * w')}) AS norm
      FROM w GROUP BY doc_id
    ), dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             {SQL_DSUM.format(expr='a.w * b.w')} AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(dot / (na.norm * nb.norm), 6) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = doc_a
    JOIN norms nb ON nb.doc_id = doc_b
    WHERE ROUND(dot / (na.norm * nb.norm), 6) >= 0.9
    """,
)
def v_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine-similar document pairs via shared-term inverted-
    index join (Σ df² candidate bound with a max_df stop-term cutoff) —
    the lexical complement of the embedding near-dup operators. The
    gate threshold is 0.9: the synthetic corpus shares one small
    vocabulary, so lower cutoffs return nearly all pairs (~100k at
    sf0.01) — real corpora rely on max_df to keep candidates sparse."""
    return sparse_cosine_pairs(t(spark, sf_dir, "documents"), min_cosine=0.9)


_EWMA_ALPHA = 0.3
_EWMA_TAPS = 8


def _ewma_sql_terms() -> str:
    num = " + ".join(
        f"COALESCE(lag(value, {i}) OVER w * {(_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** i)!r}, 0)"
        for i in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {i}) OVER w IS NOT NULL THEN {(_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** i)!r} ELSE 0 END)"
        for i in range(_EWMA_TAPS)
    )
    return f"({num}) / ({den})"


@_q(
    "w_ewma_taps",
    f"""
    SELECT event_id, user_id,
           ROUND({_ewma_sql_terms()}, 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w_ewma_taps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-tap truncated EWMA of event values per user (α=0.3), expressed
    as a bank of lag() taps in ONE window — no recursion, no UDF, one
    user-keyed shuffle. The truncated-FIR form is the standard way to
    make EWMA engine-portable: a recursive EWMA needs either per-row
    iteration or exponent trickery that overflows doubles on long
    series; 8 taps bound the weight tail at (1-α)^8 < 6% and every tap
    is an identical double in both engines."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weights = [_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** i for i in range(_EWMA_TAPS)]
    num = None
    den = None
    for i, wt in enumerate(weights):
        tap = F.lag("value", i).over(w)
        n_i = F.coalesce(tap * F.lit(wt), F.lit(0.0))
        d_i = F.when(tap.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = n_i if num is None else num + n_i
        den = d_i if den is None else den + d_i
    return e.select(
        "event_id", "user_id", F.round(num / den, 6).alias("ewma")
    )


@_q(
    "s_skyline_2d",
    """
    SELECT p_partkey, p_size, retail
    FROM (SELECT p_partkey, p_size, CAST(p_retailprice AS DOUBLE) AS retail FROM part) a
    WHERE NOT EXISTS (
      SELECT 1 FROM (SELECT p_size, CAST(p_retailprice AS DOUBLE) AS retail FROM part) b
      WHERE b.retail <= a.retail AND b.p_size >= a.p_size
        AND (b.retail < a.retail OR b.p_size > a.p_size)
    )
    """,
)
def s_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (cheaper price, larger size). The oracle states dominance as NOT
    EXISTS (quadratic); the engine computes the same set LINEARLY with
    one window pass — sort by price, a part is on the frontier iff its
    size strictly exceeds every strictly-cheaper part's max size and it
    is the max-size member of its exact price-size group's price point.

    Window rewrite: running max of p_size over strictly-cheaper rows
    (RANGE frame excludes price ties), plus an equal-price guard — at
    equal price only the largest size survives (and duplicates of the
    (price, size) pair all survive, matching the NOT EXISTS semantics).
    """
    p = t(spark, sf_dir, "part").select(
        "p_partkey", "p_size", F.col("p_retailprice").cast("double").alias("retail")
    )
    # per distinct price: the max size at that price (skinny — one row
    # per price point), then a running max over STRICTLY cheaper prices
    # (rows frame ending at -1 is exact because each price is one row)
    per_price = p.groupBy("retail").agg(F.max("p_size").alias("max_same_price"))
    w_cheaper = (
        Window.orderBy("retail")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    price_stats = per_price.select(
        "retail",
        "max_same_price",
        F.max("max_same_price").over(w_cheaper).alias("max_cheaper"),
    )
    return (
        p.join(price_stats, "retail")
        .filter(
            (
                F.col("max_cheaper").isNull()
                | (F.col("p_size") > F.col("max_cheaper"))
            )
            & (F.col("p_size") == F.col("max_same_price"))
        )
        .select("p_partkey", "p_size", "retail")
    )


@_q(
    "a_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order_d,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS raw_monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           strftime(last_order_d, '%Y-%m-%d') AS last_order,
           frequency, ROUND(raw_monetary, 6) AS monetary,
           CAST(NTILE(4) OVER (ORDER BY last_order_d DESC, o_custkey) AS BIGINT) AS r_quartile,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_quartile,
           CAST(NTILE(4) OVER (ORDER BY raw_monetary DESC, o_custkey) AS BIGINT) AS m_quartile
    FROM rfm
    """,
)
def a_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation of
    customers from their orders — the classic warehouse scoring shape.
    One groupBy shuffle to the per-customer grain, then three global
    NTILE windows over the (already tiny relative to facts) customer
    grain; each NTILE order carries o_custkey as the deterministic
    tiebreak."""
    o = t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order_d"),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("o_totalprice")).alias("monetary"),
    )
    return rfm.select(
        "o_custkey",
        F.date_format("last_order_d", "yyyy-MM-dd").alias("last_order"),
        "frequency",
        F.round("monetary", 6).alias("monetary"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("last_order_d"), F.asc("o_custkey")))
        .cast("bigint")
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .cast("bigint")
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        .cast("bigint")
        .alias("m_quartile"),
    )


_BFS_SEED = "s1"
_BFS_MAX_DEPTH = 4


@_q(
    "g_bfs_levels",
    f"""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), sym AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), walk(node, dist) AS (
      SELECT '{_BFS_SEED}' AS node, 0 AS dist
      UNION
      SELECT s.dst, w.dist + 1
      FROM walk w JOIN sym s ON s.src = w.node
      WHERE w.dist < {_BFS_MAX_DEPTH}
    )
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
    FROM walk GROUP BY node
    """,
)
def g_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-path levels from supplier '{seed}' over the
    undirected supplier↔customer graph, capped at depth {cap} — the
    iterative-algorithm tier's first SQL-ORACLED member (the oracle is
    a DuckDB recursive CTE; PageRank/components stay rows-only).

    Spark side: frontier expansion — per level, join the frontier with
    the symmetrized edges, anti-join already-visited nodes, union into
    the visited set. Each level is one join + one distinct; lineage is
    truncated per level via plans.lineage.truncate_lineage (reliable
    checkpoint when the session sets a checkpoint dir, localCheckpoint
    otherwise — same discipline as graph/algorithms.py). At 100 TB the
    frontier join shuffles on node id and the visited set stays skinny
    (node, dist).
    """
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    # Edge-partition count scales with the data: the symmetric edge set
    # is at most 2× the lineitem row count (a parquet-metadata-only
    # count), floored at a few partitions because per-level frames are
    # skinny — under a default 200-partition session each level would
    # otherwise launch hundreds of near-empty tasks — and capped at the
    # session's shuffle parallelism so a 1000-executor job still spreads
    # a 100 TB edge set (test_ranking: partition-scaling assertion).
    n_parts = sized_partitions(edges, 2 * table_rows(spark, sf_dir, "lineitem"))
    sym = truncate_lineage(
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        # materialized once: every BFS level joins against sym, and
        # without this the lineitem⋈orders edge build re-runs per level;
        # src-keyed so the per-level frontier join reuses the exchange
        .repartition(n_parts, "src")
    )
    spark_ = edges.sparkSession
    visited = spark_.createDataFrame(
        [(_BFS_SEED, 0)], "node string, dist int"
    )
    frontier = visited
    for depth in range(1, _BFS_MAX_DEPTH + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth))
        )
        nxt = nxt.transform(truncate_lineage)
        if nxt.isEmpty():
            break
        # visited is a union of already-checkpointed level frames, so
        # its lineage stays O(levels) without materializing it again
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.select("node", F.col("dist").cast("bigint").alias("dist"))


g_bfs_levels.__doc__ = g_bfs_levels.__doc__.format(seed=_BFS_SEED, cap=_BFS_MAX_DEPTH)


@_q(
    "d_weighted_sample",
    """
    SELECT doc_id, source, n_chars
    FROM (
      SELECT doc_id, source, n_chars,
             -ln((CAST((doc_id * 9973) % 104729 AS DOUBLE) + 1.0) / 104730.0)
               / CAST(n_chars AS DOUBLE) AS race_key
      FROM documents
    )
    ORDER BY race_key, doc_id
    LIMIT 50
    """,
)
def d_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample-without-replacement of 50 documents with
    inclusion probability proportional to length (the curation pattern:
    sample training docs by a quality/length weight). Efraimidis-
    Spirakis exponential race: each row draws u in (0,1] and races with
    key -ln(u)/w; the k smallest keys win — one TakeOrdered pass, no
    per-group state, identical result on any partitioning.

    Engine-portable determinism: u comes from the same keyed modular
    permutation as w_sample_deterministic ((id*9973) % 104729, shifted
    into (0,1]), not rand() — so Spark and DuckDB agree bit-for-bit,
    and doc_id breaks any remaining ties.
    """
    d = t(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * 9973) % 104729).cast("double")
    race = -F.log((u + 1.0) / 104730.0) / F.col("n_chars").cast("double")
    return (
        d.select("doc_id", "source", "n_chars", race.alias("race_key"))
        .orderBy("race_key", "doc_id")
        .limit(50)
        .select("doc_id", "source", "n_chars")
    )


@_q(
    "w_rolling_median",
    """
    SELECT event_id, user_id,
           ROUND(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM events
    """,
)
def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median over a bounded 7-row frame per user — the
    robust-smoothing counterpart of w_ewma_taps. Spark has no median
    window function; the bounded frame makes the exact form cheap:
    collect the frame into an array (<=7 values), array_sort inside
    codegen, pick the middle (averaging the two middles on even counts,
    matching DuckDB's interpolating median). Cost is O(frame log frame)
    per row with NO extra shuffle beyond the user-keyed window sort —
    the pattern only degrades if the frame is unbounded, which a
    running median would be."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, ((n / 2) + 1).cast("int"))
    mid = F.element_at(arr, ((n + 1) / 2).cast("int"))
    med = F.when(n % 2 == 1, mid).otherwise((lo + hi) / 2.0)
    return e.select(
        "event_id", "user_id", F.round(med, 6).alias("med7")
    )


@_q(
    "d_temperature_mix",
    """
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_s FROM documents GROUP BY source
    ), z AS (
      SELECT CAST(SUM(CAST(pow(n_s, 0.5) AS DECIMAL(38,6))) AS DOUBLE) AS z FROM counts
    ), quotas AS (
      SELECT source, CAST(floor(200.0 * pow(n_s, 0.5) / z.z) AS BIGINT) AS quota
      FROM counts CROSS JOIN z
    ), ranked AS (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY (doc_id * 9973) % 104729, doc_id
             ) AS BIGINT) AS pick_rank
      FROM documents
    )
    SELECT doc_id, source, pick_rank
    FROM ranked JOIN quotas USING (source)
    WHERE pick_rank <= quota
    """,
)
def d_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing (alpha=0.5, target=200): per-
    source quotas proportional to n_s^alpha up-weight low-resource
    sources — the standard multilingual-LM sampling rule, as one tiny
    per-source agg broadcast back over a source-partitioned window."""
    from data_spark.operators.textstats import temperature_mix

    return temperature_mix(
        t(spark, sf_dir, "documents"), alpha=0.5, target=200
    )


_CHUNK_W = 40
_CHUNK_S = 20


@_q(
    "d_chunk_windows",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(
               str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')), '\\s+'),
               w -> w <> '') AS words
      FROM documents
    )
    SELECT doc_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(least(s + {_CHUNK_W} - 1, len(words)) - s + 1 AS BIGINT) AS chunk_len,
           words[s] AS first_tok,
           words[least(s + {_CHUNK_W} - 1, len(words))] AS last_tok
    FROM toks, UNNEST(range(1, greatest(len(words) - {_CHUNK_W} + 1, 1) + 1, {_CHUNK_S})) AS r(s)
    WHERE len(words) > 0
    """,
)
def d_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking for training prep (window=40,
    stride=20): each document explodes into its chunk grid — the
    context-window slicing step between curation and tokenization.
    Chunk starts come from one sequence() per row (no joins); emitting
    (start, len, first/last token) keeps the gate output flat while the
    real pipeline would slice the token array the same way."""
    d = t(spark, sf_dir, "documents")
    from data_spark.operators.dedup import _words

    base = (
        d.select("doc_id", _words(F.col("text")).alias("__raw"))
        .select(
            "doc_id",
            F.filter(F.col("__raw"), lambda w: w != "").alias("words"),
        )
        .filter(F.size("words") > 0)
    )
    n = F.size("words")
    starts = F.sequence(
        F.lit(1), F.greatest(n - (_CHUNK_W - 1), F.lit(1)), F.lit(_CHUNK_S)
    )
    chunks = base.select(
        "doc_id", "words", F.explode(starts).alias("chunk_start")
    )
    n2 = F.size("words")
    last_pos = F.least(F.col("chunk_start") + (_CHUNK_W - 1), n2)
    return chunks.select(
        "doc_id",
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        (last_pos - F.col("chunk_start") + 1).cast("bigint").alias("chunk_len"),
        F.element_at("words", F.col("chunk_start")).alias("first_tok"),
        F.element_at("words", last_pos).alias("last_tok"),
    )


@_q(
    "e_anomaly_zscore",
    """
    WITH stats AS (
      SELECT event_id, user_id, value,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(CAST(value AS DECIMAL(38,6)) * CAST(value AS DECIMAL(38,6)) AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2,
             COUNT(value) OVER w AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           ROUND((value - s1 / n) / sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 1e-12)), 6) AS z,
           CAST(abs((value - s1 / n) / sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 1e-12))) > 2.0 AS BIGINT) AS is_anomaly
    FROM stats
    WHERE n >= 3
    """,
)
def e_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags per user (10-row trailing window,
    |z| > 2): the standard monitoring shape. Mean and variance come
    from in-window SUM(x)/SUM(x²) — both accumulated as DECIMAL(38,6)
    so the result is exact and order-independent (window aggregates are
    computed by segment trees in some engines, which reassociates float
    addition; decimals make the engines agree bit-for-bit). Spark's
    decimal(38,6)*decimal(38,6) product overflows precision 38 and is
    rescaled back to scale 6 (each x² rounded to 6 dp, HALF_UP); the
    oracle mirrors that with an explicit CAST of the product to
    DECIMAL(38,6) before the windowed SUM, so the two engines agree
    even when values carry more than 3 decimal digits (rounding-mode
    ties aside; events.value has 2 dp, where the product is exact at
    4 dp and no rounding occurs in either engine). The 1e-12
    variance floor keeps a constant-valued window from dividing by
    zero in either engine."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    dec = F.col("value").cast("decimal(38,6)")
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum(dec * dec).over(w).cast("double")
    n = F.count("value").over(w)
    var = F.greatest((s2 - s1 * s1 / n) / (n - 1), F.lit(1e-12))
    z = (F.col("value") - s1 / n) / F.sqrt(var)
    return (
        e.select(
            "event_id",
            "user_id",
            n.alias("__n"),
            F.round(z, 6).alias("z"),
            (F.abs(z) > 2.0).cast("bigint").alias("is_anomaly"),
        )
        .filter(F.col("__n") >= 3)
        .drop("__n")
    )


@_q(
    "g_cube_2d",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS rflag,
           COALESCE(l_linestatus, '<all>') AS lstatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def g_cube_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (returnflag, linestatus) — all four granularities
    in one partially-aggregated pass, completing the grouping-analytics
    family next to rollup (g_rollup_region) and explicit GROUPING SETS
    (g_grouping_sets). NULL grouping placeholders are coalesced to a
    sentinel so the driver-gate hash never mixes real NULLs with
    subtotal NULLs."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("rflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("lstatus"),
            "sum_qty",
            "n_rows",
        )
    )


@_q("a_hll_daily_rollup")  # DataSketches HLL — no SQL oracle can
# reproduce the estimator; accuracy + mergeability law pytest-gated
# (tests/test_sketches.py: union of per-day sketches == global sketch)
def a_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day HLL distinct-user sketches unioned per event_type — the
    persist-sketches-not-facts pattern: cross-day distinct questions
    merge sketch bytes instead of re-shuffling the fact table."""
    from data_spark.operators.sketches import daily_distinct_rollup

    return daily_distinct_rollup(t(spark, sf_dir, "events"))


@_q("a_kll_quantile_sketch")  # DataSketches KLL — rows-only; rank-error
# window pytest-gated (tests/test_sketches.py)
def a_kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged KLL quantile sketch per event_type (p50/p90 at k=200,
    ~1.65% rank error): map-side sketch build + one narrow shuffle of
    sketch bytes, vs the full value shuffle an exact percentile pays."""
    from data_spark.operators.sketches import kll_value_quantiles

    return kll_value_quantiles(t(spark, sf_dir, "events"))


@_q(
    "d_fuzzy_dedup_resolve",
    r"""
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
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS keeper_id
      FROM walk GROUP BY a
    )
    SELECT c.doc_id, c.keeper_id, z.cluster_size
    FROM comp c
    JOIN (
      SELECT keeper_id, COUNT(*) AS cluster_size FROM comp GROUP BY keeper_id
    ) z USING (keeper_id)
    """,
)
def d_fuzzy_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup resolution: PPJoin-filtered n-gram
    Jaccard candidates (>= 0.5) -> connected components over the pair
    graph -> canonical keeper (min doc_id) + cluster size per member.
    This is the full near-dup CLUSTERING step that exact-hash
    d_dedup_resolve can't do — transitive similarity chains (A~B~C
    with A!~C) land in one cluster, matching how production dedup
    collapses templated families.

    Oracle: the same pair set fed through a recursive-CTE transitive
    closure — exact, so the iterative min-label propagation is
    hash-checked, not just rows-counted (g_components stays the
    rows-only general-graph witness).
    """
    from data_spark.graph.algorithms import connected_components
    from data_spark.operators.dedup import ngram_jaccard_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    comp = comp.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("keeper_id"),
    )
    sizes = comp.groupBy("keeper_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return comp.join(sizes, "keeper_id").select(
        "doc_id", "keeper_id", "cluster_size"
    )


@_q(
    "a_histogram_equidepth",
    """
    WITH binned AS (
      SELECT CAST(NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS bin,
             CAST(l_extendedprice AS DOUBLE) AS v
      FROM lineitem
    )
    SELECT bin, COUNT(*) AS n_rows,
           MIN(v) AS lo, MAX(v) AS hi,
           CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
    FROM binned GROUP BY bin
    """,
)
def a_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH 10-bin histogram of l_extendedprice (equal row counts
    per bin, data-driven boundaries) — the complement of the
    fixed-width a_histogram_fixed_bins. NTILE carries the row's full
    key as tiebreak so bin assignment is engine-portable at duplicate
    values. A global NTILE is a single-task sort at scale; the sketch
    alternative for 100 TB is a_kll_quantile_sketch's rank estimates —
    both are exposed so the exact/approximate trade-off is explicit."""
    l = t(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    binned = l.select(
        F.ntile(10).over(w).cast("bigint").alias("bin"),
        F.col("l_extendedprice").cast("double").alias("v"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        dsum(F.col("v")).alias("sum_v"),
    )


# DuckDB CTE for the BM25 arm shared with d_bm25_search (same contrib
# algebra, same rounded 6-dp score).
_SQL_BM25_ARM = f"""
    dl AS (
      SELECT doc_id, len(list_filter(words, w -> w <> '')) AS dl FROM toks
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             {SQL_DSUM.format(expr='CAST(dl AS DOUBLE)')} / COUNT(*) AS avgdl
      FROM dl
    ),
    contrib AS (
      SELECT t.doc_id,
             CAST(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.2) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
               AS DOUBLE) AS contrib
      FROM tfreq t
      JOIN dfreq d USING (term)
      JOIN dl l USING (doc_id)
      CROSS JOIN stats s
      WHERE t.term IN ('spark', 'join', 'window')
    ),
    bm AS (
      SELECT doc_id, ROUND({SQL_DSUM.format(expr='contrib')}, 6) AS bm25
      FROM contrib GROUP BY doc_id
    )
"""


@_q(
    "v_rrf_hybrid",
    f"""
    WITH {_SQL_TF},
    {_SQL_BM25_ARM},
    lexr AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank
      FROM bm
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    sem AS (
      SELECT vec_id,
             ROUND(list_cosine_similarity(embedding, q.qv), 6) AS sim
      FROM embeddings, q WHERE vec_id > 0
    ),
    semr AS (
      SELECT vec_id,
             CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS sem_rank
      FROM sem
    ),
    arms AS (
      SELECT COALESCE(l.doc_id, s.vec_id) AS doc_id, l.lex_rank, s.sem_rank
      FROM (SELECT * FROM lexr WHERE lex_rank <= 100) l
      FULL OUTER JOIN (SELECT * FROM semr WHERE sem_rank <= 100) s
        ON l.doc_id = s.vec_id
    )
    SELECT doc_id, lex_rank, sem_rank,
           COALESCE(1000000 // (60 + lex_rank), 0)
         + COALESCE(1000000 // (60 + sem_rank), 0) AS rrf_micro
    FROM arms
    ORDER BY rrf_micro DESC, doc_id
    LIMIT 20
    """,
)
def v_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal rank fusion: the lexical arm ranks
    documents by BM25 for a fixed 3-term query, the semantic arm ranks
    the embedding corpus by cosine against a fixed query vector
    (vec_id 0), and the fused score is RRF with k=60 in exact integer
    micro-units (1e6 DIV (60+rank)) so the cross-engine hash carries no
    float division. The reference fuses Elasticsearch text relevance
    with downstream scoring the same way at query time.

    Scale shape: each arm is TakeOrderedAndProject down to its top-100
    (map-side heaps, never a global sort), so the only single-partition
    window runs over a CONSTANT-bounded 100-row frame; the fusion join
    is two 100-row sides. Ranks order by the 6-dp ROUNDED scores with
    id tiebreaks — the same cross-engine determinism contract the
    d_bm25_search / v_cosine_topk hashes already prove."""
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")

    arm_k = 100
    lex_top = (
        bm25_scores(docs, _BM25_TERMS)
        .select("doc_id", "bm25")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(arm_k)
    )
    # constant-bounded (<=100 rows) global window: fine at any scale
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("bigint")
        .alias("lex_rank"),
    )

    from data_spark.operators.similarity import cosine_similarity

    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    sem_top = (
        emb.filter(F.col("vec_id") > 0)
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                cosine_similarity(F.col("embedding").cast("array<double>"), F.col("qv")),
                6,
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(arm_k)
    )
    sem = sem_top.select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.desc("sim"), F.asc("vec_id")))
        .cast("bigint")
        .alias("sem_rank"),
    )

    fused = (
        lex.join(sem, lex["doc_id"] == sem["vec_id"], "full_outer")
        .select(
            F.coalesce(lex["doc_id"], sem["vec_id"]).alias("doc_id"),
            "lex_rank",
            "sem_rank",
        )
        .withColumn(
            "rrf_micro",
            F.coalesce(F.expr("1000000 div (60 + lex_rank)"), F.lit(0))
            + F.coalesce(F.expr("1000000 div (60 + sem_rank)"), F.lit(0)),
        )
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(20)
