"""Round-4 continuation mining tier — the "algorithms a data platform
grows into" family, every member with an exact DuckDB oracle:

- graph: synchronous label-propagation communities (mode-style
  iterative update next to g_components' MIN-fold) and personalized
  PageRank (random walk with restart from a seed node);
- recommendations: item-based collaborative filtering (seed-set
  expansion over the support-pruned co-purchase pair table);
- calendar analytics: MoM/YoY growth, ratio-to-moving-average seasonal
  index, per-user max drawdown, Gini coefficient, exact median by
  distributed selection;
- entity resolution: sorted-neighborhood blocking over the two-phase
  distributed global rank, n-gram containment pairs, phonetic
  (simplified-soundex) blocking — the 3rd/4th/5th blocking schemes
  next to hash blocks and shingle bands;
- text: RAKE keyword extraction, winsorized robust means, BPE
  merge-rule training + apply (vocabulary-bounded per round);
- attribution: multi-touch linear credit (the fractional companion to
  the as-of last-touch join);
- maintenance: incremental JOIN-view maintenance (the Δ-rule law).

Cross-engine float discipline (queries/common.py): integer/decimal
arithmetic wherever exactness is free; 6-dp snapping + DECIMAL sums
where ratios must accumulate; unrounded IEEE chains on identical
operands where a final ROUND could land on a half-way (seen once at
sf0.01 in the seasonal index). Iterative frames are lineage-truncated
every round (reliable checkpoint when the session sets a dir —
plans/lineage.py); single-partition windows appear only over
calendar- or vocabulary-bounded frames, never data-scale ones (the
distributed global rank exists precisely for those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.plans.lineage import truncate_lineage
from data_spark.queries.common import t

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
# Synchronous label propagation (community detection), K fixed rounds
# over the symmetric supplier↔customer graph (same edge derivation as
# g_pagerank / g_components, graphq.py). Every node starts labeled with
# its own id; each round it adopts the most frequent label among its
# neighbors, ties broken by lexically-smallest label. Fixed K makes the
# intermediate label tables identical cross-engine — the update is
# integer counts + string mins, so the hash must match.
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    parts = [
        """
        edges AS MATERIALIZED (
          SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        sym AS MATERIALIZED (
          SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges
        ),
        l0 AS (SELECT DISTINCT a AS id, a AS lbl FROM sym)
        """
    ]
    for k in range(1, _LPA_ROUNDS + 1):
        parts.append(
            f"""
            , c{k} AS (
              SELECT s.a AS id, x.lbl, CAST(COUNT(*) AS BIGINT) AS c
              FROM sym s JOIN l{k - 1} x ON x.id = s.b
              GROUP BY 1, 2
            ), l{k} AS MATERIALIZED (
              SELECT id, lbl FROM (
                SELECT id, lbl,
                       ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
                FROM c{k}
              ) WHERE rn = 1
            )
            """
        )
    return (
        "WITH "
        + "".join(parts)
        + f" SELECT id, lbl AS community FROM l{_LPA_ROUNDS}"
    )


def _lpa_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(sym, labels): the materialized symmetric edge frame and the
    LPA(3) community labels built over it — factored so downstream
    consumers (g_modularity) reuse the SAME truncated edge frame
    instead of re-deriving the joins."""
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
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .transform(truncate_lineage)
    )
    lbl = sym.select(F.col("a").alias("id"), F.col("a").alias("lbl")).distinct()
    # AQE off for the fixed rounds: both per-round aggregates ride the
    # truncated frames' existing layout, so runtime re-planning has
    # nothing to convert (no broadcast candidate — votes is keyed fact
    # scale) and costs a re-optimization per tiny stage; measured -23%
    # at sf0.1 (plans/lineage.iteration_scope)
    from data_spark.plans.lineage import iteration_scope  # noqa: PLC0415

    with iteration_scope(spark):
        for _ in range(_LPA_ROUNDS):
            votes = (
                sym.join(lbl.withColumnRenamed("id", "b"), "b")
                .groupBy(F.col("a").alias("id"), "lbl")
                .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            )
            lbl = (
                votes.groupBy("id")
                .agg(
                    F.min(
                        F.struct((-F.col("c")).alias("nc"), F.col("lbl").alias("l"))
                    ).alias("m")
                )
                .select("id", F.col("m.l").alias("lbl"))
                .transform(truncate_lineage)
            )
    return sym, lbl.select("id", F.col("lbl").alias("community"))


@_q("g_label_propagation", _lpa_oracle())
def g_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=3 synchronous label-propagation rounds: per round, join the
    label frame to the symmetric edge list (labels flow b→a), count
    (node, label) votes with map-side combine, then fold the argmax
    with ONE more aggregate — ``MIN(STRUCT(-count, label))`` realizes
    the (count DESC, label ASC) total order without a window, so the
    round costs two key-partitioned shuffles and no global sort. Label
    frames are lineage-truncated every round. Every node has >=1
    neighbor by construction (it appears in an edge), so the argmax is
    total. Body lives in :func:`_lpa_frames` so g_modularity can reuse
    the same materialized edge frame."""
    return _lpa_frames(spark, sf_dir)[1]


# ---------------------------------------------------------------------------
# Item-based collaborative filtering: recommend parts to ONE customer by
# summing co-purchase counts between their purchased parts (the seed
# set) and every candidate part. The pair table is the directed
# co-purchase graph with support pruning — the same bounded-basket
# self-join as a_market_basket, kept integer-exact end to end. The
# target customer is itself data-derived (most distinct orders, tie →
# smallest key) so the query is meaningful at every sf.
# ---------------------------------------------------------------------------

_CF_MIN_SUPPORT = 2
_CF_TOP = 15


@_q(
    "a_itemcf_recommend",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), target AS (
      SELECT o_custkey FROM orders
      GROUP BY o_custkey
      ORDER BY COUNT(DISTINCT o_orderkey) DESC, o_custkey
      LIMIT 1
    ), seed AS (
      SELECT DISTINCT i.l_partkey AS sp
      FROM items i JOIN orders o ON o.o_orderkey = i.l_orderkey
      JOIN target t ON o.o_custkey = t.o_custkey
    ), pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_CF_MIN_SUPPORT}
    )
    SELECT p.pb AS part, CAST(SUM(p.n_ab) AS BIGINT) AS score,
           CAST(COUNT(*) AS BIGINT) AS n_seed_links
    FROM pairs p
    JOIN seed s ON p.pa = s.sp
    WHERE p.pb NOT IN (SELECT sp FROM seed)
    GROUP BY p.pb
    ORDER BY score DESC, part
    LIMIT {_CF_TOP}
    """,
)
def a_itemcf_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 "customers who bought what you bought also bought" parts
    for the busiest customer: seed parts → support-pruned directed
    co-purchase pairs → per-candidate BIGINT score = Σ co-counts with
    the seed set, candidates already purchased anti-joined away. The
    seed set and target row broadcast (both bounded by one customer's
    history); the only fact-scale shuffles are the distinct-items build
    and the pair aggregate; the head is one TakeOrdered pass with a
    part-key tiebreak."""
    items = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        # feeds the seed join and both sides of the pair self-join
        .transform(truncate_lineage)
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    target = (
        orders.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderkey").alias("n"))
        .orderBy(F.desc("n"), "o_custkey")
        .limit(1)
        .select("o_custkey")
    )
    # one customer's orders are a handful of rows: semi-reduce orders by
    # the broadcast target FIRST, then reach items with a second
    # broadcast — the seed build never shuffles the fact table
    tgt_orders = orders.join(F.broadcast(target), "o_custkey").select("o_orderkey")
    seed = (
        items.join(
            F.broadcast(tgt_orders), items.l_orderkey == tgt_orders.o_orderkey
        )
        .select(F.col("l_partkey").alias("sp"))
        .distinct()
        # feeds the score join AND the already-purchased anti-join —
        # materialize the tiny frame so the target/seed subtree plans once
        .transform(truncate_lineage)
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= _CF_MIN_SUPPORT)
    )
    return (
        pairs.join(F.broadcast(seed.withColumnRenamed("sp", "pa")), "pa")
        .join(
            F.broadcast(seed.withColumnRenamed("sp", "pb")), "pb", "left_anti"
        )
        .groupBy(F.col("pb").alias("part"))
        .agg(
            F.sum("n_ab").cast("bigint").alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_seed_links"),
        )
        .orderBy(F.desc("score"), "part")
        .limit(_CF_TOP)
    )


# ---------------------------------------------------------------------------
# Calendar growth: monthly order revenue with month-over-month and
# year-over-year percent change. The fact table collapses to one row
# per month (map-side-combinable decimal SUM), so the single-partition
# lag window runs over a frame bounded by the calendar — ~80 rows for
# the 1995-2001 span regardless of sf. YoY is matched by calendar month
# (lag 12 over the dense month spine, verified dense by construction in
# this data; a gap would surface as a hash diff, not silent misalignment).
# ---------------------------------------------------------------------------


@_q(
    "a_yoy_growth",
    """
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           revenue / LAG(revenue, 1) OVER (ORDER BY month) - 1.0 AS mom_pct,
           revenue / LAG(revenue, 12) OVER (ORDER BY month) - 1.0 AS yoy_pct
    FROM monthly
    ORDER BY month
    """,
)
def a_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with MoM and YoY growth: one decimal-exact
    aggregate over orders, then lag(1)/lag(12) windows over the
    ~80-row month frame (single-partition window is safe — the frame is
    calendar-bounded, not data-bounded). Ratios are double divisions of
    identical operands in both engines, rounded to 6 dp."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        # unrounded ratios of identical doubles — see wins_mean note
        (F.col("revenue") / F.lag("revenue", 1).over(w) - 1.0).alias("mom_pct"),
        (F.col("revenue") / F.lag("revenue", 12).over(w) - 1.0).alias("yoy_pct"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# Sorted-neighborhood entity resolution: the third blocking scheme in
# the ER family (hash blocks: d_edit_distance_block; phonetic-free
# token blocks: d_fuzzy_dedup's shingle bands). Sort the corpus by its
# normalized text, then compare each record only to its w successors in
# sort order — candidate count is exactly w·n no matter how skewed the
# key distribution is (hash blocking's worst case is one giant block).
# The global sort rank comes from operators/order.global_row_number —
# the two-phase range-partitioned rank, NOT a single-partition window —
# so the plan scales with the cluster.
# ---------------------------------------------------------------------------

_SN_WINDOW = 5
_SN_MAX_DIST = 40


@_q(
    "d_sorted_neighborhood",
    rf"""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')) AS nt
      FROM documents
    ), ranked AS (
      SELECT doc_id, nt, ROW_NUMBER() OVER (ORDER BY nt, doc_id) AS rn
      FROM norm
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(b.rn - a.rn AS BIGINT) AS gap,
           CAST(levenshtein(a.nt, b.nt) AS BIGINT) AS dist
    FROM ranked a JOIN ranked b
      ON b.rn > a.rn AND b.rn <= a.rn + {_SN_WINDOW}
    WHERE levenshtein(a.nt, b.nt) <= {_SN_MAX_DIST}
    """,
)
def d_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by sorted-neighborhood blocking: global rank
    over (normalized_text, doc_id) via the two-phase distributed
    ROW_NUMBER, then each record meets exactly its _SN_WINDOW successors
    through an equi-join on shifted rank (explode of the 1..w offsets —
    an integer-keyed join, not a range join), and the edit distance
    runs only on those w·n candidates. Pairs within distance 40 are
    emitted with their sort-order gap — adjacent near-dups surface at
    gap 1."""
    from data_spark.operators.dedup import sorted_neighborhood_pairs  # noqa: PLC0415

    return sorted_neighborhood_pairs(
        t(spark, sf_dir, "documents"),
        window=_SN_WINDOW,
        max_dist=_SN_MAX_DIST,
    )


# ---------------------------------------------------------------------------
# N-gram CONTAINMENT pairs: |A∩B| / |A| rather than Jaccard
# |A∩B| / |A∪B| — the asymmetry that catches quote-and-extend
# near-dups (a short doc fully contained in a longer one scores 1.0 on
# containment but low on Jaccard). Candidates come from the inverted
# shingle index with a df guard, the same Σdf² bound as the ranking
# tier's cosine join.
# ---------------------------------------------------------------------------

_CT_N = 3
_CT_MAX_DF = 25
_CT_MIN = 0.5


@_q(
    "d_containment_pairs",
    rf"""
    WITH toks AS (
      SELECT doc_id,
             str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')),
                             '\s+') AS words
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(words[i:i+{_CT_N - 1}], ' ') AS shingle
      FROM toks, UNNEST(range(1, greatest(len(words) - {_CT_N - 1}, 0) + 1)) AS r(i)
      WHERE len(words) >= {_CT_N}
    ), guarded AS (
      SELECT doc_id, shingle FROM sh
      QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {_CT_MAX_DF}
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM guarded GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM guarded a JOIN guarded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b, c.n_common, sa.n AS n_a, sb.n AS n_b,
           ROUND(CAST(c.n_common AS DOUBLE) / sa.n, 6) AS cont_a,
           ROUND(CAST(c.n_common AS DOUBLE) / sb.n, 6) AS cont_b
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE) / sa.n >= {_CT_MIN}
       OR CAST(c.n_common AS DOUBLE) / sb.n >= {_CT_MIN}
    """,
)
def d_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: per ordered doc pair, the shared
    distinct 3-word-shingle count and BOTH containment directions
    |A∩B|/|A| and |A∩B|/|B|, kept when either side is >=0.5. The
    inverted-index self-join is df-guarded (shingles in more than 25
    docs are dropped on BOTH sides, bounding candidate fan-out at
    Σdf² <= 25·|postings|); sizes use the same guarded sets so the
    ratios are exact integer/integer divisions cross-engine."""
    from data_spark.operators.dedup import containment_pairs  # noqa: PLC0415

    return containment_pairs(
        t(spark, sf_dir, "documents"),
        n=_CT_N,
        max_df=_CT_MAX_DF,
        min_containment=_CT_MIN,
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al.'s Rapid Automatic Keyword
# Extraction): candidate phrases are maximal stopword-free token runs
# (capped at 4 words), a word's score is degree/frequency over all
# phrase occurrences, and a phrase's score is the sum of its word
# scores. Everything is counts and short-phrase sums: the per-doc
# segmentation is a windowed running count of stopword boundaries (no
# UDF), and cross-engine float discipline rounds each word score to the
# 6-dp grid then sums as DECIMAL — associative, so the corpus-wide
# phrase scores hash-match.
# ---------------------------------------------------------------------------

_RAKE_STOP = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")
_RAKE_MAX_LEN = 4
_RAKE_TOP = 20


def _rake_oracle() -> str:
    stops = ", ".join(f"'{w}'" for w in _RAKE_STOP)
    return rf"""
    WITH toksrc AS (
      SELECT doc_id,
             str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')),
                             '\s+') AS words
      FROM documents
    ), toks AS (
      SELECT doc_id, r.i AS pos, words[r.i] AS w
      FROM toksrc, UNNEST(range(1, len(words) + 1)) AS r(i)
    ), flagged AS (
      SELECT doc_id, pos, w,
             CASE WHEN w IN ({stops}) OR w = '' THEN 1 ELSE 0 END AS stop
      FROM toks
    ), segged AS (
      SELECT doc_id, pos, w, stop,
             SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS seg
      FROM flagged
    ), ph AS (
      SELECT doc_id, seg, CAST(COUNT(*) AS BIGINT) AS plen,
             string_agg(w, ' ' ORDER BY pos) AS phrase
      FROM segged WHERE stop = 0
      GROUP BY doc_id, seg
      HAVING COUNT(*) <= {_RAKE_MAX_LEN}
    ), pw AS (
      SELECT phrase, plen, unnest(str_split(phrase, ' ')) AS w FROM ph
    ), ws AS (
      SELECT w, (CAST(SUM(plen) AS BIGINT) * 1000000) // COUNT(*) AS score_e6
      FROM pw GROUP BY w
    ), dp AS (
      SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ FROM ph GROUP BY phrase
    ), dpw AS (
      SELECT phrase, unnest(str_split(phrase, ' ')) AS w FROM dp
    ), scored AS (
      SELECT d.phrase, d.n_occ,
             CAST(SUM(s.score_e6) AS DOUBLE) / 1000000 AS score
      FROM dp d JOIN dpw x ON x.phrase = d.phrase JOIN ws s ON s.w = x.w
      GROUP BY d.phrase, d.n_occ
    )
    SELECT phrase, n_occ, score FROM scored
    ORDER BY score DESC, phrase LIMIT {_RAKE_TOP}
    """


@_q("d_rake_keywords", _rake_oracle())
def d_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 RAKE keyword phrases over the corpus: stopword-boundary
    segmentation by a per-doc running count (one doc-keyed window),
    phrase assembly by sort_array(collect_list(struct(pos, w))) — an
    explicit total order, never collect_list's physical order — then
    word degree/frequency scores on the phrase-occurrence table and
    decimal-exact phrase-score sums. The word-score and distinct-phrase
    frames are vocabulary-bounded; only the token explode touches
    corpus scale, with map-side combine on every aggregate."""
    from data_spark.operators.dedup import _words  # noqa: PLC0415

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(_words(F.col("text"))).alias("pos", "w")
    ).withColumn(
        "stop",
        (F.col("w").isin(*_RAKE_STOP) | (F.col("w") == "")).cast("int"),
    )
    segged = toks.withColumn(
        "seg", F.sum("stop").over(Window.partitionBy("doc_id").orderBy("pos"))
    )
    ph = (
        segged.filter(F.col("stop") == 0)
        .groupBy("doc_id", "seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("plen"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("phrase"),
        )
        .filter(F.col("plen") <= _RAKE_MAX_LEN)
        # feeds the word-score build and the distinct-phrase counts
        .transform(truncate_lineage)
    )
    pw = ph.select("plen", F.explode(F.split("phrase", " ")).alias("w"))
    # word score degree/frequency in integer MICRO-UNITS (floor of
    # deg*1e6/freq): pure BIGINT arithmetic, so the per-phrase score
    # sums are exact without any float rounding step (common.py note on
    # why a 6-dp ROUND of a quotient is engine-divergent)
    ws = pw.groupBy("w").agg(
        F.expr("sum(plen) * 1000000 div count(1)").alias("score_e6")
    )
    dp = ph.groupBy("phrase").agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    dpw = dp.select("phrase", F.explode(F.split("phrase", " ")).alias("w"))
    return (
        dpw.join(F.broadcast(ws), "w")
        .groupBy("phrase")
        .agg((F.sum("score_e6").cast("double") / F.lit(1000000)).alias("score"))
        .join(dp, "phrase")
        .select("phrase", "n_occ", "score")
        .orderBy(F.desc("score"), "phrase")
        .limit(_RAKE_TOP)
    )


# ---------------------------------------------------------------------------
# Winsorized statistics: per-source document-length mean after clipping
# to the exact interpolated [p05, p95] — the robust-mean companion to
# a_mad_outliers (which flags, but does not repair). Percentile
# interpolation is the proven-bit-identical percentile ≡ quantile_cont
# pair (a_percentiles); the clipped mean uses the house decimal-SUM.
# ---------------------------------------------------------------------------


@_q(
    "d_winsorize",
    """
    WITH pct AS (
      SELECT source,
             quantile_cont(n_chars, 0.05) AS p05,
             quantile_cont(n_chars, 0.95) AS p95
      FROM documents GROUP BY source
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n,
           ANY_VALUE(p.p05) AS p05,
           ANY_VALUE(p.p95) AS p95,
           CAST(SUM(CASE WHEN d.n_chars < p.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
           CAST(SUM(CASE WHEN d.n_chars > p.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
           CAST(SUM(CAST(GREATEST(LEAST(CAST(d.n_chars AS DOUBLE), p.p95), p.p05)
                         AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS wins_mean
    FROM documents d JOIN pct p ON p.source = d.source
    GROUP BY d.source
    """,
)
def d_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winsorized mean of document length: exact interpolated
    p05/p95 per source (one map-side-combinable aggregate over a
    handful of groups), broadcast back onto the fact rows, clip, and
    decimal-sum the clipped values. Two fact scans collapse to one via
    the shared source key; the percentile frame is |sources| rows."""
    d = t(spark, sf_dir, "documents").select("source", "n_chars")
    pct = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.05)").alias("p05"),
        F.expr("percentile(n_chars, 0.95)").alias("p95"),
    )
    clipped = F.greatest(
        F.least(F.col("n_chars").cast("double"), F.col("p95")), F.col("p05")
    )
    return (
        d.join(F.broadcast(pct), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.first("p05").alias("p05"),
            F.first("p95").alias("p95"),
            F.sum((F.col("n_chars") < F.col("p05")).cast("int"))
            .cast("bigint")
            .alias("n_clip_low"),
            F.sum((F.col("n_chars") > F.col("p95")).cast("int"))
            .cast("bigint")
            .alias("n_clip_high"),
            # UNROUNDED quotient of a decimal-exact sum: a 6-dp ROUND
            # of sum/count can land exactly on a 7-digit half, where
            # Spark (shortest-repr HALF_UP) and DuckDB (binary value)
            # disagree — the a_seasonal_index lesson
            (
                F.sum(clipped.cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("wins_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (random walk with restart) from one supplier
# over the directed supplier→customer graph — the graph-native
# relevance ranking around a seed node, companion to the seed-set
# expansion of a_itemcf_recommend. Same fixed-iteration + IEEE-constant
# + 1e-8-grid-snap discipline that made global g_pagerank hash-oracle
# able (graphq.py): double-SUM reassociation between engines is bounded
# ~1e-16 relative and absorbed by the round-half FLOOR(rank·1e8 + 0.5)
# snap — half-grid boundary, clear of the grid-sitting structural
# values like the seed's (1−d) teleport share (VERDICT r5 #5).
# ---------------------------------------------------------------------------

_PPR_SOURCE = "s1"
_PPR_ITERATIONS = 6
_PPR_DAMPING = 0.85


def _ppr_oracle() -> str:
    one_minus_d = repr(1.0 - _PPR_DAMPING)
    d = repr(_PPR_DAMPING)
    parts = [
        """
  edges AS MATERIALIZED (
    SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  ),
  verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
  deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
  links AS MATERIALIZED (
    SELECT e.src AS id, e.dst AS dst, d.deg FROM edges e JOIN deg d ON d.id = e.src
  ),
"""
        + f"""
  r0 AS (
    SELECT id, CASE WHEN id = '{_PPR_SOURCE}' THEN CAST(1 AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS rank
    FROM verts
  )"""
    ]
    for k in range(1, _PPR_ITERATIONS + 1):
        parts.append(
            f""",
  i{k} AS (
    SELECT l.dst AS id, SUM(r.rank / l.deg) AS inflow
    FROM links l JOIN r{k - 1} r ON r.id = l.id GROUP BY l.dst
  ),
  r{k} AS (
    SELECT v.id,
           CASE WHEN v.id = '{_PPR_SOURCE}' THEN CAST('{one_minus_d}' AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END
             + CAST('{d}' AS DOUBLE) * COALESCE(i.inflow, CAST(0 AS DOUBLE)) AS rank
    FROM verts v LEFT JOIN i{k} i ON i.id = v.id
  )"""
        )
    parts.append(
        f"""
  SELECT id,
         CAST(FLOOR(rank * CAST(100000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rank_e8
  FROM r{_PPR_ITERATIONS}
    """
    )
    return "WITH" + "".join(parts)


@_q("g_ppr_personalized", _ppr_oracle())
def g_ppr_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6 iterations of personalized PageRank from supplier ``s1``
    (graph/algorithms.pagerank with ``source=``): rank mass starts at
    the seed and teleports back to it each step, so the scores measure
    random-walk proximity to the seed. Per-iteration plan identical to
    global PageRank (links pre-partitioned and cached, two shuffles);
    output round-half snapped to the 1e-8 grid (FLOOR(·1e8 + 0.5),
    boundary-safe — VERDICT r5 #5) for the cross-engine hash."""
    from data_spark.graph.algorithms import pagerank  # noqa: PLC0415

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
    return pagerank(
        edges,
        iterations=_PPR_ITERATIONS,
        damping=_PPR_DAMPING,
        source=_PPR_SOURCE,
    ).select(
        "id",
        F.floor(F.col("rank") * F.lit(1e8) + F.lit(0.5)).cast("bigint").alias("rank_e8"),
    )


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (ratio-to-moving-average): monthly
# revenue → centered 12-month moving average (the trend) → per
# month-of-year average of the revenue/trend ratios (the seasonal
# index). The whole computation runs on the ~80-row monthly frame, so
# the windows are calendar-bounded; the moving average uses DECIMAL
# window sums (associative) and the index averages 6-dp-rounded ratios
# as DECIMAL — the two float-discipline idioms composed.
# ---------------------------------------------------------------------------


@_q(
    "a_seasonal_index",
    """
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(strftime(o_orderdate, '%m') AS BIGINT) AS moy,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY 1, 2
    ), trended AS (
      SELECT month, moy,
             CAST(rev AS DOUBLE) AS rev,
             CAST(SUM(rev) OVER w AS DOUBLE) AS tsum,
             COUNT(*) OVER w AS tn
      FROM monthly
      WINDOW w AS (ORDER BY month ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
    ), ratios AS (
      SELECT moy,
             CAST(ROUND(rev / (tsum / 12), 6) AS DECIMAL(18,6)) AS ratio
      FROM trended WHERE tn = 12
    )
    SELECT moy, CAST(COUNT(*) AS BIGINT) AS n_years,
           CAST(SUM(ratio) AS DOUBLE) / COUNT(*) AS seasonal_index
    FROM ratios GROUP BY moy
    """,
)
def a_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-moving-average seasonal index per calendar month:
    monthly decimal revenue, centered 12-row moving SUM (decimal —
    associative, so the window total is engine-independent), ratio to
    the 12-month trend on the interior months only (tn = 12), then the
    per month-of-year mean of 6-dp-snapped ratios. Every frame after
    the first aggregate is calendar-bounded."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
        F.month("o_orderdate").cast("bigint").alias("moy"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"))
    w = Window.orderBy("month").rowsBetween(-5, 6)
    trended = monthly.select(
        "moy",
        F.col("rev").cast("double").alias("rev"),
        F.sum("rev").over(w).cast("double").alias("tsum"),
        F.count(F.lit(1)).over(w).alias("tn"),
    )
    ratios = trended.filter(F.col("tn") == 12).select(
        "moy",
        F.round(F.col("rev") / (F.col("tsum") / 12), 6)
        .cast("decimal(18,6)")
        .alias("ratio"),
    )
    return ratios.groupBy("moy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_years"),
        # the mean stays an UNROUNDED double quotient: the numerator is a
        # decimal-exact sum, so both engines divide identical operands —
        # a final ROUND here would reintroduce engine-specific half-way
        # behavior exactly at 6-dp boundaries (seen at sf0.01, moy=9)
        (F.sum("ratio").cast("double") / F.count(F.lit(1))).alias(
            "seasonal_index"
        ),
    )


# ---------------------------------------------------------------------------
# Multi-touch LINEAR attribution: every purchase splits one unit of
# credit equally across the user's clicks in the preceding 7 days —
# the fractional-credit counterpart to j_asof_click_attrib's
# last-touch. The click↔purchase pairing is a user-keyed equi-join
# with the time band inside the join condition (per-user event counts
# bound the fan-out, the house as-of idiom); credits are 1/n snapped
# to the 6-dp grid and summed as DECIMAL per click day.
# ---------------------------------------------------------------------------

_MT_WINDOW_DAYS = 7


@_q(
    "j_multitouch_attrib",
    f"""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), touched AS (
      SELECT p.event_id AS pid, c.event_id AS cid,
             strftime(c.ts, '%Y-%m-%d') AS click_day,
             COUNT(*) OVER (PARTITION BY p.event_id) AS n_touches
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id
       AND c.ts <= p.ts
       AND c.ts > p.ts - INTERVAL {_MT_WINDOW_DAYS} DAY
    )
    SELECT click_day,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(1000000 // n_touches) AS DOUBLE) / 1000000 AS credit
    FROM touched GROUP BY click_day
    """,
)
def j_multitouch_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: per purchase, every click by the
    same user in the trailing 7 days earns credit 1/n_touches; credits
    are 6-dp-snapped, decimal-summed per click day. One user-keyed
    shuffle joins the two filtered event streams (band predicate inside
    the join condition — never a cross join), one purchase-keyed window
    counts touches, one day-keyed aggregate folds the credit."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    touched = purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr(f"INTERVAL {_MT_WINDOW_DAYS} DAYS")),
    ).select(
        "pid", "cid", F.date_format("cts", "yyyy-MM-dd").alias("click_day")
    )
    n = touched.withColumn(
        "n_touches", F.count(F.lit(1)).over(Window.partitionBy("pid"))
    )
    # per-touch credit floor(1e6 / n) in integer micro-units — exact
    # BIGINT fold, no float rounding anywhere (a purchase hands out at
    # most 1.0 and at least 1 - n·1e-6 total credit)
    return n.groupBy("click_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        (
            F.sum(F.expr("1000000 div n_touches")).cast("double")
            / F.lit(1000000)
        ).alias("credit"),
    )


# ---------------------------------------------------------------------------
# Phonetic blocking (simplified-soundex): the fourth ER blocking scheme
# — hash blocks, sorted neighborhood, shingle bands, and now phonetic
# keys that bucket words by how they SOUND, catching misspellings that
# share no prefix ('robert'/'rupert' → R163). The encoder is shared
# column algebra (functions/text.phonetic_key and its paired SQL): the
# exact same translate/collapse/pad chain runs in both engines, the
# house process_name discipline.
# ---------------------------------------------------------------------------


def _phonetic_oracle() -> str:
    from data_spark.functions.text import phonetic_key_sql  # noqa: PLC0415

    key = phonetic_key_sql("w")
    return f"""
    WITH words AS (
      SELECT DISTINCT unnest(str_split(p_name, ' ')) AS w FROM part
    ), keyed AS (
      SELECT w, {key} AS pkey FROM words WHERE w <> ''
    )
    SELECT pkey, CAST(COUNT(*) AS BIGINT) AS n_words,
           MIN(w) AS first_word, MAX(w) AS last_word
    FROM keyed GROUP BY pkey
    HAVING COUNT(*) >= 2
    """


@_q("f_phonetic_block", _phonetic_oracle())
def f_phonetic_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic collision blocks over the part-name vocabulary: every
    distinct word keyed by its simplified-soundex code, keys holding
    >=2 distinct words reported with their lexical extremes. The
    vocabulary is distinct-deduped before encoding (the encoder runs
    once per word, not once per row), and blocking cost is one
    word-keyed shuffle — the phonetic analogue of the ER hash-block
    pass."""
    from data_spark.functions.text import phonetic_key  # noqa: PLC0415

    p = t(spark, sf_dir, "part")
    words = (
        p.select(F.explode(F.split("p_name", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    return (
        words.select("w", phonetic_key(F.col("w")).alias("pkey"))
        .groupBy("pkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.min("w").alias("first_word"),
            F.max("w").alias("last_word"),
        )
        .filter(F.col("n_words") >= 2)
    )


# ---------------------------------------------------------------------------
# BPE merge-rule TRAINING (simplified): the learning half of the
# tokenizer story (d_bpe_tokens applies a fixed regex segmentation;
# this derives merge rules from the corpus). K rounds of: count
# adjacent token pairs over the distinct-word vocabulary weighted by
# word frequency, pick the most frequent pair (count DESC, pair ASC),
# rewrite the vocabulary by merging it. The merge uses plain
# leftmost-non-overlapping string replace — both engines share those
# exact semantics, making a fixed K bit-reproducible (documented
# simplification vs canonical BPE's rescan-after-merge greediness).
# Per-round cost at 100 TB: ONE aggregate over the VOCABULARY table
# (weighted by counts), never the corpus — the fact-scale work is the
# single word-count shuffle up front.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 5
_BPE_SEP = "·"


def _bpe_cte_chain() -> str:
    """The shared unrolled-CTE training chain: words → per-word token
    string v0 → K rounds of (pair counts p_k, winner m_k, rewritten
    vocab v_k). Carries the original word through so the apply-side
    oracle can read the final tokenization."""
    sep = _BPE_SEP
    parts = [
        rf"""
        toks AS (
          SELECT unnest(str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')), '\s+')) AS w
          FROM documents
        ), words AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM toks WHERE w <> '' GROUP BY w
        ), v0 AS (
          SELECT w, '{sep}' || regexp_replace(w, '(.)', '\1{sep}', 'g') AS s, n FROM words
        )
        """
    ]
    for k in range(1, _BPE_ROUNDS + 1):
        parts.append(
            f"""
            , t{k} AS (
              SELECT list_filter(str_split(s, '{sep}'), x -> x <> '') AS t, n FROM v{k - 1}
            ), p{k} AS (
              SELECT t[i] AS a, t[i + 1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
              FROM t{k}, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) AS r(i)
              GROUP BY 1, 2
            ), m{k} AS (
              SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1
            ), v{k} AS (
              SELECT w, replace(s, '{sep}' || a || '{sep}' || b || '{sep}',
                                '{sep}' || a || b || '{sep}') AS s, n
              FROM v{k - 1} CROSS JOIN m{k}
            )
            """
        )
    return "WITH " + "".join(parts)


def _bpe_oracle() -> str:
    merges = " UNION ALL ".join(
        f"SELECT {k} AS rnd, a AS left_tok, b AS right_tok, a || b AS merged, cnt FROM m{k}"
        for k in range(1, _BPE_ROUNDS + 1)
    )
    return _bpe_cte_chain() + merges


def _bpe_apply_oracle() -> str:
    sep = _BPE_SEP
    return (
        _bpe_cte_chain()
        + f"""
        SELECT w AS word, n AS n_occurrences,
               CAST(length(w) AS BIGINT) AS n_chars,
               CAST(len(list_filter(str_split(s, '{sep}'), x -> x <> '')) AS BIGINT)
                 AS n_tokens
        FROM v{_BPE_ROUNDS}
        """
    )


def _bpe_fit(spark: SparkSession, sf_dir: str):
    """Run the K-round merge training; returns (merge 1-row frames,
    final vocabulary frame (w, s, n) with merges applied). Shared by
    d_bpe_train (emits the rules) and d_bpe_apply (emits the tokenized
    vocabulary)."""
    from data_spark.operators.dedup import _words  # noqa: PLC0415

    sep = _BPE_SEP
    d = t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_words(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    vocab = words.select(
        "w",
        F.concat(
            F.lit(sep), F.regexp_replace("w", "(.)", f"$1{sep}")
        ).alias("s"),
        "n",
    ).transform(truncate_lineage)
    merges = []
    for k in range(1, _BPE_ROUNDS + 1):
        toks = vocab.select(
            F.filter(F.split("s", sep), lambda x: x != "").alias("t"), "n"
        )
        ln = F.greatest(F.size("t") - 1, F.lit(0))
        pairs = (
            toks.filter(F.size("t") >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("t", 1, ln).alias("a"),
                        F.slice(F.col("t"), 2, ln).alias("b"),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").cast("bigint").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .transform(truncate_lineage)
        )
        merges.append(
            top.select(
                F.lit(k).alias("rnd"),
                F.col("a").alias("left_tok"),
                F.col("b").alias("right_tok"),
                F.concat("a", "b").alias("merged"),
                "cnt",
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(top))
            .select(
                "w",
                F.replace(
                    F.col("s"),
                    F.concat(F.lit(sep), F.col("a"), F.lit(sep), F.col("b"), F.lit(sep)),
                    F.concat(F.lit(sep), F.col("a"), F.col("b"), F.lit(sep)),
                ).alias("s"),
                "n",
            )
            .transform(truncate_lineage)
        )
    return merges, vocab


@_q("d_bpe_train", _bpe_oracle())
def d_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the corpus' top-5 BPE merge rules: one fact-scale shuffle
    (the word count), then every round aggregates adjacent-pair counts
    over the VOCABULARY frame (weighted by word frequency — the
    classic BPE trainer trick that makes cost vocabulary-bounded),
    TakeOrdered picks the (count DESC, pair ASC) winner, and a 1-row
    broadcast rewrites the vocab strings by leftmost-non-overlapping
    replace. Returns the 5 merge rules with their counts."""
    merges, _vocab = _bpe_fit(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


@_q("d_bpe_apply", _bpe_apply_oracle())
def d_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the vocabulary with the learned merges: the same 5-round
    fit (shared _bpe_fit), then per word its occurrence count, char
    length, and post-merge token count — the compression the rules buy.
    All integers; the apply side adds zero shuffles beyond the fit
    (token counting is a projection over the final vocab frame)."""
    sep = _BPE_SEP
    _merges, vocab = _bpe_fit(spark, sf_dir)
    return vocab.select(
        F.col("w").alias("word"),
        F.col("n").alias("n_occurrences"),
        F.length("w").cast("bigint").alias("n_chars"),
        F.size(F.filter(F.split("s", sep), lambda x: x != ""))
        .cast("bigint")
        .alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Maximum drawdown per user: the classic nested-running-aggregate shape
# (running sum → running max of the running sum → peak-to-trough gap).
# Everything stays DECIMAL until the final cast, so the composition of
# three window aggregates is exact cross-engine — no snapping needed.
# ---------------------------------------------------------------------------


@_q(
    "w_max_drawdown",
    """
    WITH series AS (
      SELECT user_id, ts, event_id,
             SUM(CAST(value AS DECIMAL(38,6))) OVER w AS cum
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ), dd AS (
      SELECT user_id,
             MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) - cum AS drawdown
      FROM series
    )
    SELECT user_id, CAST(MAX(drawdown) AS DOUBLE) AS max_drawdown
    FROM dd GROUP BY user_id
    """,
)
def w_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown of the cumulative event-value series:
    decimal running sum (ordered by ts with the event_id tiebreak),
    decimal running max of that sum, then MAX(peak − current). One
    user-keyed shuffle; both windows and the final aggregate share the
    user_id partitioning, so the nested aggregates add no exchanges."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col("value").cast("decimal(38,6)")).over(w)
    series = e.select("user_id", "ts", "event_id", cum.alias("cum"))
    dd = series.select(
        "user_id", (F.max("cum").over(w) - F.col("cum")).alias("drawdown")
    )
    return dd.groupBy("user_id").agg(
        F.max("drawdown").cast("double").alias("max_drawdown")
    )


# ---------------------------------------------------------------------------
# Gini coefficient of the customer revenue distribution — the classic
# rank-weighted formula G = 2·Σ(i·x_i)/(n·T) − (n+1)/n over revenues
# sorted ascending. The global sort rank is the distributed two-phase
# ROW_NUMBER (operators/order.py) on the per-customer aggregate — the
# second fact-scale consumer of that operator after sorted-neighborhood
# blocking. Σ(i·x_i) accumulates BIGINT·DECIMAL exactly; the final
# expression is a fixed chain of IEEE ops over identical operands.
# ---------------------------------------------------------------------------


@_q(
    "a_gini_revenue",
    """
    WITH per_cust AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS x
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM per_cust
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS total,
             CAST(SUM(i * x) AS DOUBLE) AS s_ix
      FROM ranked
    )
    SELECT n AS n_customers, total,
           2.0 * s_ix / (n * total) - (n + 1.0) / n AS gini
    FROM sums
    """,
)
def a_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order revenue: decimal revenue
    aggregate, distributed global rank ascending (two-phase
    ROW_NUMBER — no single-partition window even though the grouped
    frame is customer-sized, because at 100 TB it isn't small), exact
    BIGINT·DECIMAL rank-weighted sum, and the textbook formula as an
    unrounded chain of IEEE ops on identical operands."""
    from data_spark.operators.order import global_row_number  # noqa: PLC0415

    o = t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("x")
    )
    ranked = global_row_number(per_cust, ["x", "o_custkey"], out="i")
    sums = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("total"),
        F.sum(F.col("i") * F.col("x")).cast("double").alias("s_ix"),
    )
    return sums.select(
        F.col("n").alias("n_customers"),
        "total",
        (
            F.lit(2.0) * F.col("s_ix") / (F.col("n") * F.col("total"))
            - (F.col("n") + F.lit(1.0)) / F.col("n")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance: the Δ-rule companion to
# m_incr_agg_maintain's aggregate law. For a view V = A ⋈ B with a
# delta arriving on A: ΔV = ΔA ⋈ B — the maintained view is
# V_old ∪ ΔV, touching history exactly once at state-build time and
# never rescanning it per delta. The query summarizes the maintained
# view so the output stays small, and the oracle computes the DIRECT
# join over the full tables: the maintenance law must hold to the bit.
# ---------------------------------------------------------------------------

_IJM_SPLIT = "1998-01-01"


@_q(
    "m_incr_join_maintain",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def m_incr_join_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain orders ⋈ lineitem under an orders-side delta: the view
    state is pre-1998 orders joined to lineitem; the delta pass joins
    ONLY the new orders against lineitem (ΔA ⋈ B) and unions into the
    state — then the per-priority summary of the maintained view must
    hash-equal the oracle's direct full join. Both join legs share the
    orderkey shuffle key; the delta leg's cost is |ΔA| + matched lines,
    never |state|."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"
    )
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    old = o.filter(F.col("o_orderdate") < _IJM_SPLIT)
    delta = o.filter(F.col("o_orderdate") >= _IJM_SPLIT)
    state = old.join(l, old.o_orderkey == l.l_orderkey).select(
        "o_orderpriority", "l_extendedprice"
    )
    delta_view = delta.join(l, delta.o_orderkey == l.l_orderkey).select(
        "o_orderpriority", "l_extendedprice"
    )
    maintained = state.unionByName(delta_view)
    return maintained.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Exact median by distributed SELECTION: percentile()/quantile_cont
# sort each group inside one aggregation buffer — fine per group, a
# single-buffer collapse when the "group" is the whole fact table.
# The scale path is selection over the two-phase global rank: rank
# everything, pick the two central rows, interpolate with the SAME
# lo + 0.5·(hi − lo) expression in both engines (NOT (lo+hi)/2, which
# differs in the last ulp from the interpolation formula).
# ---------------------------------------------------------------------------


@_q(
    "a_median_via_rank",
    """
    WITH ranked AS (
      SELECT l_extendedprice AS x,
             ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS i,
             COUNT(*) OVER () AS n
      FROM lineitem
    ), central AS (
      SELECT n, x, i FROM ranked
      WHERE i = (n + 1) // 2 OR i = (n + 2) // 2
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           MIN(x) AS x_lo, MAX(x) AS x_hi,
           MIN(x) + 0.5 * (MAX(x) - MIN(x)) AS median
    FROM central
    """,
)
def a_median_via_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide median of l_extendedprice by distributed
    selection: two-phase global ROW_NUMBER over (price, orderkey,
    linenumber), pick ranks ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉, interpolate.
    The ranked frame never converges to one partition — the oracle's
    single-window ROW_NUMBER is the semantics, not the plan."""
    from data_spark.operators.order import global_row_number  # noqa: PLC0415

    l = t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x"), "l_orderkey", "l_linenumber"
    )
    ranked = global_row_number(
        l, ["x", "l_orderkey", "l_linenumber"], out="i"
    ).transform(truncate_lineage)
    n1 = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    lo = F.expr("(n + 1) div 2")
    hi = F.expr("(n + 2) div 2")
    central = ranked.crossJoin(F.broadcast(n1)).filter(
        (F.col("i") == lo) | (F.col("i") == hi)
    )
    return central.agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.min("x").alias("x_lo"),
        F.max("x").alias("x_hi"),
        (F.min("x") + F.lit(0.5) * (F.max("x") - F.min("x"))).alias("median"),
    )


# ---------------------------------------------------------------------------
# Deterministic pseudo-random walks: the graph-sampling pass that feeds
# node-embedding training (node2vec/DeepWalk corpora), made
# REPRODUCIBLE by replacing RNG state with a portable integer hash —
# at step t, the walker at u moves to the neighbor v minimizing
# (A·u + B·v + C·t) mod P (ties → min v). Every executor, every retry,
# and every engine derives the same walks; the per-step plan is the
# LPA shape (one walker⋈edges join + one argmin fold).
# ---------------------------------------------------------------------------

_WALK_STEPS = 3
_WALK_A = 516575261
_WALK_B = 730421473
_WALK_C = 947217823
_WALK_P = 1_000_000_007


def _walk_oracle() -> str:
    parts = [
        """
        edges AS MATERIALIZED (
          SELECT DISTINCT l.l_suppkey * 2 AS src, o.o_custkey * 2 + 1 AS dst
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        sym AS MATERIALIZED (
          SELECT src AS a, b FROM (SELECT src, dst AS b FROM edges)
          UNION SELECT dst, src FROM edges
        ),
        w0 AS (SELECT DISTINCT a AS start, a AS cur FROM sym)
        """
    ]
    for t in range(1, _WALK_STEPS + 1):
        parts.append(
            f"""
            , w{t} AS (
              SELECT start, cur FROM (
                SELECT w.start, s.b AS cur,
                       ROW_NUMBER() OVER (
                         PARTITION BY w.start
                         ORDER BY (CAST({_WALK_A} AS BIGINT) * w.cur
                                   + CAST({_WALK_B} AS BIGINT) * s.b
                                   + CAST({_WALK_C} AS BIGINT) * {t}) % {_WALK_P}, s.b
                       ) AS rn
                FROM w{t - 1} w JOIN sym s ON s.a = w.cur
              ) WHERE rn = 1
            )
            """
        )
    hops = ", ".join(
        f"CASE WHEN w{t}.cur % 2 = 0 THEN 's' || (w{t}.cur // 2) "
        f"ELSE 'c' || (w{t}.cur // 2) END AS hop{t}"
        for t in range(1, _WALK_STEPS + 1)
    )
    joins = " ".join(
        f"JOIN w{t} ON w{t}.start = w0.start" for t in range(1, _WALK_STEPS + 1)
    )
    return (
        "WITH "
        + "".join(parts)
        + f"""
        SELECT CASE WHEN w0.start % 2 = 0 THEN 's' || (w0.start // 2)
                    ELSE 'c' || (w0.start // 2) END AS start, {hops}
        FROM (SELECT DISTINCT start FROM w0) w0 {joins}
        """
    )


@_q("g_walk_sample", _walk_oracle())
def g_walk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One 3-step deterministic walk from every node of the symmetric
    supplier↔customer graph: per step, join the walker frame to the
    edge list and fold the hash-argmin with MIN(STRUCT(h, v)) — two
    key-partitioned shuffles per step, walker frames lineage-truncated.
    Node ids ride as integers (2k / 2k+1 parity encoding) so the hash
    is pure BIGINT arithmetic; labels are re-derived only in the final
    projection."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .transform(truncate_lineage)
    )
    walk = sym.select(F.col("a").alias("start"), F.col("a").alias("cur")).distinct()
    hops = []
    for step in range(1, _WALK_STEPS + 1):
        h = (
            F.lit(_WALK_A).cast("bigint") * F.col("cur").cast("bigint")
            + F.lit(_WALK_B).cast("bigint") * F.col("b").cast("bigint")
            + F.lit(_WALK_C).cast("bigint") * F.lit(step).cast("bigint")
        ) % _WALK_P
        walk = (
            walk.join(sym, walk.cur == sym.a)
            .groupBy("start")
            .agg(
                F.min(F.struct(h.alias("h"), F.col("b").alias("v"))).alias("m")
            )
            .select("start", F.col("m.v").alias("cur"))
            .transform(truncate_lineage)
        )
        hops.append(walk.select("start", F.col("cur").alias(f"h{step}")))
    out = hops[0]
    for i, frame in enumerate(hops[1:], start=2):
        out = out.join(frame, "start")

    def lbl(c):
        return F.when(
            F.col(c) % 2 == 0, F.concat(F.lit("s"), (F.col(c) / 2).cast("bigint"))
        ).otherwise(F.concat(F.lit("c"), ((F.col(c) - 1) / 2).cast("bigint")))

    return out.select(
        lbl("start").alias("start"),
        *[lbl(f"h{t_}").alias(f"hop{t_}") for t_ in range(1, _WALK_STEPS + 1)],
    )


# ---------------------------------------------------------------------------
# ER match-score FUSION: real entity resolution doesn't threshold one
# signal — it fuses several into a calibrated score. Over the
# sorted-neighborhood candidate pairs, three signals combine in integer
# MICRO-UNITS (no float rounding anywhere): edit similarity
# (maxlen − dist)/maxlen, length ratio minlen/maxlen, and first-word
# phonetic agreement (the simplified-soundex encoder exercised on real
# corpus text, not just its golden words). Weights 0.6/0.3/0.1.
# ---------------------------------------------------------------------------

_FUSE_WINDOW = 5
_FUSE_MAX_DIST = 120
_FUSE_MIN_SCORE_E6 = 700_000


def _fusion_oracle() -> str:
    from data_spark.functions.text import phonetic_key_sql  # noqa: PLC0415

    pk = phonetic_key_sql("str_split_regex(nt, ' ')[1]")
    return rf"""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')) AS nt
      FROM documents
    ), attrs AS (
      SELECT doc_id, nt, CAST(length(nt) AS BIGINT) AS len, {pk} AS pk,
             ROW_NUMBER() OVER (ORDER BY nt, doc_id) AS rn
      FROM norm
    ), cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(levenshtein(a.nt, b.nt) AS BIGINT) AS dist,
             GREATEST(a.len, b.len) AS maxlen, LEAST(a.len, b.len) AS minlen,
             CASE WHEN a.pk = b.pk THEN 1 ELSE 0 END AS pk_eq
      FROM attrs a JOIN attrs b
        ON b.rn > a.rn AND b.rn <= a.rn + {_FUSE_WINDOW}
      WHERE abs(a.len - b.len) <= {_FUSE_MAX_DIST}
        AND levenshtein(a.nt, b.nt) <= {_FUSE_MAX_DIST}
    )
    SELECT doc_a, doc_b, dist,
           (600000 * (maxlen - dist) // maxlen)
             + (300000 * minlen // maxlen)
             + 100000 * pk_eq AS score_e6
    FROM cand
    WHERE (600000 * (maxlen - dist) // maxlen)
            + (300000 * minlen // maxlen)
            + 100000 * pk_eq >= {_FUSE_MIN_SCORE_E6}
    """


@_q("d_er_score_fusion", _fusion_oracle())
def d_er_score_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused ER match scores over sorted-neighborhood candidates: the
    two-phase global rank generates w·n candidates, a banded
    levenshtein + length prefilter scores edit similarity, and the
    fusion adds length-ratio and first-word phonetic agreement — all
    as BIGINT micro-units (div, never a float ROUND), thresholded at
    0.70. The phonetic leg runs the same column algebra as its DuckDB
    pair on every candidate row."""
    from data_spark.functions.text import phonetic_key  # noqa: PLC0415
    from data_spark.operators.order import global_row_number  # noqa: PLC0415

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]+", " ")).alias("nt"),
    )
    attrs = d.select(
        "doc_id",
        "nt",
        F.length("nt").cast("bigint").alias("len"),
        phonetic_key(F.split("nt", " ").getItem(0)).alias("pk"),
    )
    ranked = global_row_number(attrs, ["nt", "doc_id"]).transform(truncate_lineage)
    left = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("nt").alias("na"),
        F.col("len").alias("la"),
        F.col("pk").alias("pka"),
        F.explode(F.sequence(F.lit(1), F.lit(_FUSE_WINDOW))).alias("off"),
        (F.col("rn") + F.col("off")).alias("rn_b"),
    )
    right = ranked.select(
        F.col("rn").alias("rn_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("nt").alias("nb"),
        F.col("len").alias("lb"),
        F.col("pk").alias("pkb"),
    )
    cand = (
        left.join(right, "rn_b")
        .filter(F.abs(F.col("la") - F.col("lb")) <= _FUSE_MAX_DIST)
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("na", "nb", _FUSE_MAX_DIST).cast("bigint").alias("dist"),
            F.greatest("la", "lb").alias("maxlen"),
            F.least("la", "lb").alias("minlen"),
            (F.col("pka") == F.col("pkb")).cast("bigint").alias("pk_eq"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= _FUSE_MAX_DIST))
    )
    score = (
        F.expr("600000 * (maxlen - dist) div maxlen")
        + F.expr("300000 * minlen div maxlen")
        + F.lit(100000) * F.col("pk_eq")
    )
    return (
        cand.withColumn("score_e6", score.cast("bigint"))
        .filter(F.col("score_e6") >= _FUSE_MIN_SCORE_E6)
        .select("doc_a", "doc_b", "dist", "score_e6")
    )


# ---------------------------------------------------------------------------
# Benford's-law first-digit audit: the fraud/data-quality classic —
# naturally-occurring amounts follow P(d) = log10(1 + 1/d); synthetic
# or truncated data doesn't. Expected frequencies are EXACT LITERAL
# micro-units (no cross-engine libm call), observed frequencies are
# integer micro-unit ratios of BIGINT counts, so the whole report is
# deterministic end to end.
# ---------------------------------------------------------------------------

_BENFORD_E6 = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _benford_oracle() -> str:
    lattice = " UNION ALL ".join(
        f"SELECT {d} AS digit, CAST({e6} AS BIGINT) AS expected_e6"
        for d, e6 in _BENFORD_E6.items()
    )
    return f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), counts AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ), total AS (
      SELECT CAST(SUM(n) AS BIGINT) AS tot FROM counts
    ), expected AS ({lattice})
    SELECT e.digit, COALESCE(c.n, 0) AS n,
           COALESCE(c.n, 0) * 1000000 // tot AS observed_e6,
           e.expected_e6,
           ABS(COALESCE(c.n, 0) * 1000000 // tot - e.expected_e6) AS abs_dev_e6
    FROM expected e LEFT JOIN counts c ON c.digit = e.digit
    CROSS JOIN total
    """


@_q("dq_benford_digits", _benford_oracle())
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of order totals against Benford's law:
    one map-side-combinable digit count, the 9-digit expected lattice
    as exact literals (micro-units — no ln/log10 call crosses engines),
    observed shares as BIGINT div ratios. The deviation column is what
    an audit alarms on; TPC-H-ish uniform prices deviate wildly from
    Benford, which is itself the point of the check."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    # explicit FLOOR before the integer cast: Spark's double->bigint
    # cast truncates while DuckDB's ROUNDS (9999.7 -> 9999 vs 10000 —
    # different first digit); floor is identical in both
    digits = o.select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    total = counts.agg(F.sum("n").cast("bigint").alias("tot"))
    expected = spark.createDataFrame(
        sorted(_BENFORD_E6.items()), "digit bigint, expected_e6 bigint"
    )
    obs = F.expr("coalesce(n, 0) * 1000000 div tot")
    return (
        expected.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            obs.alias("observed_e6"),
            "expected_e6",
            F.abs(obs - F.col("expected_e6")).alias("abs_dev_e6"),
        )
    )
