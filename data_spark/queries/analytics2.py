"""Round-4 continuation analytics: a cross-engine-EXACT Count-Min
Sketch (the frequency-estimation member of the mergeable-sketch family,
next to the exact HLL rollup and the MinHash/SimHash constructions in
``analytics.py``) and a fixed-iteration weighted single-source
shortest-path query (a third hash-verified member of the iterative
graph tier next to ``g_bfs_levels`` / ``g_kcore_peel``).

Both carry exact DuckDB oracles. The CMS uses the same portable
``(a*x + b) mod p`` hash-family idiom as the exact MinHash
(``analytics.py``): pure 64-bit integer arithmetic both engines compute
identically. The SSSP accumulates distances as DECIMAL(18,2), so the
min-plus relaxations are exact and associative in both engines.

Scale posture:
  - CMS: ONE shuffle over the fact table (the per-(day,user) count with
    map-side combine); everything downstream operates on skinny count
    frames and a 4x64-cell register table. Per-day sketches are merged
    by register SUM in-query — the mergeability law that lets 100 TB of
    history keep only d*w integers per day.
  - SSSP: per-round cost is one equi-join of the (skinny) distance
    frame against the edge list plus one map-side-combinable MIN — the
    Bellman-Ford round, not a path enumeration. Iteration depth is a
    compile-time constant (no driver fixpoint round-trip) and each
    round's plan is lineage-truncated (reliable checkpoint when the
    session configures a dir — plans/lineage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.operators.dedup import _words
from data_spark.plans.lineage import truncate_lineage
from data_spark.queries.analytics import _HLL_M, _HLL_W
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
# Count-Min Sketch heavy hitters: d=4 pairwise-independent-style rows,
# w=64 columns, portable (a*u + b) mod p mod w cell hashing. Registers
# are built per day and merged by SUM — identical to a direct build by
# associativity, demonstrated in-query the same way a_hll_exact_rollup
# merges its HLL registers. Estimates (MIN over the 4 rows) are then
# read for the top-10 true-frequency users, with the guaranteed
# overestimate est >= true visible in the output.
# ---------------------------------------------------------------------------

_CMS_P = 1_000_000_007
_CMS_W = 64
_CMS_AB = [
    (516575261, 423630757),
    (730421473, 842976263),
    (947217823, 298764511),
    (176064001, 785409629),
]
_CMS_TOP = 10


def _cms_cell_sql(i: int) -> str:
    a, b = _CMS_AB[i]
    return f"((({a} * u + {b}) % {_CMS_P}) % {_CMS_W})"


def _cms_oracle() -> str:
    cells = " UNION ALL ".join(
        f"SELECT day, {i} AS row_id, {_cms_cell_sql(i)} AS col_id, cnt FROM per_user_day"
        for i in range(len(_CMS_AB))
    )
    probes = " UNION ALL ".join(
        f"SELECT u, true_cnt, {i} AS row_id, {_cms_cell_sql(i)} AS col_id FROM top"
        for i in range(len(_CMS_AB))
    )
    return f"""
    WITH per_user_day AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, user_id AS u,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ), cells AS ({cells}
    ), day_regs AS (
      SELECT day, row_id, col_id, CAST(SUM(cnt) AS BIGINT) AS reg
      FROM cells GROUP BY 1, 2, 3
    ), regs AS (
      SELECT row_id, col_id, CAST(SUM(reg) AS BIGINT) AS reg
      FROM day_regs GROUP BY 1, 2
    ), truth AS (
      SELECT u, CAST(SUM(cnt) AS BIGINT) AS true_cnt FROM per_user_day GROUP BY u
    ), top AS (
      SELECT u, true_cnt FROM truth ORDER BY true_cnt DESC, u LIMIT {_CMS_TOP}
    ), probes AS ({probes})
    SELECT p.u AS user_id, p.true_cnt, CAST(MIN(r.reg) AS BIGINT) AS est_cnt
    FROM probes p JOIN regs r ON r.row_id = p.row_id AND r.col_id = p.col_id
    GROUP BY 1, 2
    """


def _cms_cell_col(i: int) -> F.Column:
    a, b = _CMS_AB[i]
    return ((F.lit(a) * F.col("u") + F.lit(b)) % _CMS_P) % _CMS_W


@_q("a_cms_heavy_hitters", _cms_oracle())
def a_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency estimates for the top-10 users by
    true event count: per-day 4x64 register tables merged by SUM, then
    est = MIN over the 4 hashed cells. The only fact-table shuffle is
    the per-(day,user) count; registers total d*w = 256 rows regardless
    of corpus size, and the register->probe join broadcasts. Output is
    (user_id, true_cnt, est_cnt) with est_cnt >= true_cnt guaranteed by
    construction."""
    ev = t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("user_id").alias("u"),
    )
    pud = (
        ev.groupBy("day", "u")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # feeds both the register build and the truth counts — truncate
        # so the fact table is scanned once, not once per consumer
        .transform(truncate_lineage)
    )
    cells = None
    for i in range(len(_CMS_AB)):
        sel = pud.select(
            "day",
            F.lit(i).alias("row_id"),
            _cms_cell_col(i).alias("col_id"),
            "cnt",
        )
        cells = sel if cells is None else cells.unionByName(sel)
    day_regs = cells.groupBy("day", "row_id", "col_id").agg(
        F.sum("cnt").cast("long").alias("reg")
    )
    regs = day_regs.groupBy("row_id", "col_id").agg(
        F.sum("reg").cast("long").alias("reg")
    )
    truth = pud.groupBy("u").agg(F.sum("cnt").cast("long").alias("true_cnt"))
    # the 4 probe branches below each reference top — materialize the
    # 10-row head once instead of re-running the truth aggregate per
    # hash row
    top = truth.orderBy(F.desc("true_cnt"), "u").limit(_CMS_TOP).transform(
        truncate_lineage
    )
    probes = None
    for i in range(len(_CMS_AB)):
        sel = top.select(
            "u", "true_cnt", F.lit(i).alias("row_id"), _cms_cell_col(i).alias("col_id")
        )
        probes = sel if probes is None else probes.unionByName(sel)
    return (
        probes.join(F.broadcast(regs), ["row_id", "col_id"])
        .groupBy("u", "true_cnt")
        .agg(F.min("reg").cast("long").alias("est_cnt"))
        .select(F.col("u").alias("user_id"), "true_cnt", "est_cnt")
    )


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths, fixed-iteration Bellman-Ford
# over the symmetric supplier-customer graph (same edge derivation as
# g_pagerank/g_components, graphq.py) with edge weight = MIN(l_quantity)
# per distinct (supplier, customer) pair. After K relaxation rounds the
# result is exactly min-cost over paths of <= K hops — a well-defined
# deterministic quantity both engines compute identically in decimal.
# ---------------------------------------------------------------------------

_SSSP_SOURCE = "s1"
_SSSP_ROUNDS = 3


def _sssp_oracle() -> str:
    parts = [
        f"""
        ed AS (
          SELECT 's' || l.l_suppkey AS a, 'c' || o.o_custkey AS b,
                 CAST(MIN(l.l_quantity) AS DECIMAL(18,2)) AS wt
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        ), sym AS (
          SELECT a, b, wt FROM ed UNION ALL SELECT b, a, wt FROM ed
        ), d0 AS (
          SELECT '{_SSSP_SOURCE}' AS node, CAST(0 AS DECIMAL(18,2)) AS dist
        )
        """
    ]
    for i in range(_SSSP_ROUNDS):
        parts.append(
            f"""
            , d{i + 1} AS (
              SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d{i}
                UNION ALL
                SELECT e.b AS node, CAST(d.dist + e.wt AS DECIMAL(18,2)) AS dist
                FROM d{i} d JOIN sym e ON e.a = d.node
              ) GROUP BY node
            )
            """
        )
    return (
        "WITH "
        + "".join(parts)
        + f" SELECT node, CAST(dist AS DOUBLE) AS dist FROM d{_SSSP_ROUNDS}"
    )


@_q("g_sssp_bellman", _sssp_oracle())
def g_sssp_bellman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=3 Bellman-Ford rounds from supplier ``s1`` over the symmetric
    weighted supplier-customer graph: each round relaxes every edge out
    of the currently-reached set (one equi-join) and folds with a
    map-side-combinable MIN. Distances accumulate as DECIMAL(18,2) so
    min-plus is exact cross-engine; the per-round frames are
    lineage-truncated like the other iterative-tier operators. The
    returned frame is every node reachable within 3 hops with its
    exact <=3-hop min cost."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ed = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("a"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("b"),
        )
        .agg(F.min("l_quantity").cast("decimal(18,2)").alias("wt"))
    )
    sym = ed.unionByName(
        ed.select(F.col("b").alias("a"), F.col("a").alias("b"), "wt")
    ).transform(truncate_lineage)
    dist = (
        sym.sparkSession.createDataFrame(
            [(_SSSP_SOURCE,)], "node string"
        ).select("node", F.lit(0).cast("decimal(18,2)").alias("dist"))
    )
    for _ in range(_SSSP_ROUNDS):
        # relax, MIN-combine the relaxations, then fold into the running
        # distances with a full-outer join: the relax agg shuffles only
        # the relaxation rows, and both join sides are already
        # node-partitioned (the agg output and the previous round's
        # checkpointed groupBy), so the fold adds no exchange — the same
        # reasoning that keeps connected_components' per-round shuffle
        # volume at |E|, measured against the union+groupBy alternative
        # which re-shuffles the reached set every round
        relax_min = (
            dist.join(sym, dist.node == sym.a)
            .groupBy(F.col("b").alias("node"))
            .agg(
                F.min(
                    (F.col("dist") + F.col("wt")).cast("decimal(18,2)")
                ).alias("relaxed")
            )
        )
        dist = (
            dist.join(relax_min, "node", "full_outer")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.col("relaxed")),
                    F.coalesce(F.col("relaxed"), F.col("dist")),
                ).alias("dist"),
            )
            .transform(truncate_lineage)
        )
    return dist.select("node", F.col("dist").cast("double").alias("dist"))


# ---------------------------------------------------------------------------
# PMI collocation mining over the high-frequency vocabulary: the phrase
# detection pass (word2vec/Gensim-style) of a training-data pipeline.
# The universe is restricted to a deterministic head — the top-200
# unigrams by (count desc, lexical) — for the same two reasons as
# d_kl_source_drift: every probability stays an exact integer ratio over
# small frames, and the scalar normalizers attach as windows over those
# small frames instead of an all-rows window or a nested-loop cross
# join. PMI's exp-scale form lift = p(ab)/(p(a)p(b)) is emitted instead
# of the log (same monotone ranking, no cross-engine libm dependence);
# every operand is a BIGINT-derived double, so the multiply/divide chain
# is IEEE-identical in both engines, with a final ROUND(...,6) in house
# style.
# ---------------------------------------------------------------------------

_PMI_VOCAB = 200
_PMI_TOP = 25


def _pmi_oracle() -> str:
    return rf"""
    WITH toks AS (
      SELECT str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')), '\s+') AS words
      FROM documents
    ), uni_all AS (
      SELECT unnest(words) AS term FROM toks
    ), uni AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM uni_all
      WHERE term <> '' GROUP BY term
    ), vocab AS (
      SELECT term, n FROM (
        SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rk FROM uni
      ) WHERE rk <= {_PMI_VOCAB}
    ), vocab2 AS (
      SELECT term, n, CAST(SUM(n) OVER () AS BIGINT) AS n_uni FROM vocab
    ), bi_all AS (
      SELECT words[i] AS w1, words[i+1] AS w2
      FROM toks, UNNEST(range(1, greatest(len(words) - 1, 1) + 1)) AS r(i)
      WHERE len(words) >= 2
    ), bi AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM bi_all
      WHERE w1 IN (SELECT term FROM vocab) AND w2 IN (SELECT term FROM vocab)
      GROUP BY w1, w2
    ), bi2 AS (
      SELECT w1, w2, n_ab, CAST(SUM(n_ab) OVER () AS BIGINT) AS n_bi,
             ROW_NUMBER() OVER (ORDER BY n_ab DESC, w1, w2) AS rk
      FROM bi
    )
    SELECT b.w1, b.w2, b.n_ab, a.n AS n_a, c.n AS n_b,
           ROUND((CAST(b.n_ab AS DOUBLE) * CAST(a.n_uni AS DOUBLE) * CAST(a.n_uni AS DOUBLE))
                 / (CAST(b.n_bi AS DOUBLE) * CAST(a.n AS DOUBLE) * CAST(c.n AS DOUBLE)), 6) AS lift
    FROM bi2 b JOIN vocab2 a ON b.w1 = a.term JOIN vocab2 c ON b.w2 = c.term
    WHERE b.rk <= {_PMI_TOP}
    """


@_q("d_pmi_bigrams", _pmi_oracle())
def d_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 head-vocabulary bigram collocations with PMI lift
    p(ab)/(p(a)p(b)): two fact-table shuffles (unigram count, head-
    filtered bigram count — the vocab semi-joins broadcast), then all
    normalizers and the top-25 head ride windows over frames bounded by
    the 200-term vocab, never the corpus. At 100 TB the head-bigram
    count table is <= vocab^2 = 40k rows no matter the input size."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(_words(F.col("text")).alias("words")).transform(truncate_lineage)
    uni = (
        toks.select(F.explode("words").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    vocab = (
        uni.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("term")))
        )
        .filter(F.col("rk") <= _PMI_VOCAB)
        .select("term", "n")
        .transform(truncate_lineage)
    )
    vocab2 = vocab.select(
        "term",
        "n",
        F.sum("n").over(Window.partitionBy()).cast("bigint").alias("n_uni"),
    )
    ln = F.greatest(F.size("words") - 1, F.lit(0))
    pairs = (
        toks.filter(F.size("words") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("words", 1, ln).alias("w1"),
                    F.slice(F.col("words"), 2, ln).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bi = (
        pairs.join(F.broadcast(vocab.select(F.col("term").alias("w1"))), "w1", "semi")
        .join(F.broadcast(vocab.select(F.col("term").alias("w2"))), "w2", "semi")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    bi2 = bi.select(
        "w1",
        "w2",
        "n_ab",
        F.sum("n_ab").over(Window.partitionBy()).cast("bigint").alias("n_bi"),
    ).withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("n_ab"), F.asc("w1"), F.asc("w2"))),
    )
    a = vocab2.select(F.col("term").alias("w1"), F.col("n").alias("n_a"), "n_uni")
    c = vocab2.select(F.col("term").alias("w2"), F.col("n").alias("n_b"))
    return (
        bi2.filter(F.col("rk") <= _PMI_TOP)
        .join(F.broadcast(a), "w1")
        .join(F.broadcast(c), "w2")
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                (
                    F.col("n_ab").cast("double")
                    * F.col("n_uni").cast("double")
                    * F.col("n_uni").cast("double")
                )
                / (
                    F.col("n_bi").cast("double")
                    * F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                ),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# HLL set algebra over the cross-engine-exact registers of
# a_hll_exact_rollup (analytics.py): per event-type PAIR, estimate
# |A|, |B|, |A∪B| (register-wise MAX merge — the union is exact sketch
# algebra) and |A∩B| by inclusion-exclusion. This is the sketch-tier
# answer to "how many distinct users did BOTH view and purchase"
# without ever shuffling user ids — only 256-register tables move, and
# the whole pair lattice is computed from ONE register build.
# ---------------------------------------------------------------------------


def _hll_est_sql(used: str, s_used: str) -> str:
    """The rollup's harmonic estimate + small-range correction as a SQL
    expression over a register count and the integer-scaled sum."""
    m = _HLL_M
    denom = f"CAST({s_used} + ({m} - {used}) * (CAST(1 AS BIGINT) << {_HLL_W + 1}) AS DOUBLE)"
    raw = (
        f"((0.7213 / (1.0 + 1.079 / {m})) * {m} * {m}"
        f" * CAST(CAST(1 AS BIGINT) << {_HLL_W + 1} AS DOUBLE) / {denom})"
    )
    lc = f"({m} * ln(CAST({m} AS DOUBLE) / ({m} - {used})))"
    return (
        f"(CASE WHEN {raw} <= 2.5 * {m} AND {used} < {m} THEN {lc} ELSE {raw} END)"
    )


def _hll_set_oracle() -> str:
    term = f"SUM(CAST(1 AS BIGINT) << ({_HLL_W + 1} - rho))"
    return f"""
    WITH hashed AS (
      SELECT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events
    ), regs AS (
      SELECT event_type, h % {_HLL_M} AS bucket,
             MAX(CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_W + 1}
                      ELSE {_HLL_W + 1} - length(bin(h // {_HLL_M})) END) AS rho
      FROM hashed GROUP BY event_type, h % {_HLL_M}
    ), ssums AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS used, {term} AS s_used
      FROM regs GROUP BY event_type
    ), types AS (SELECT DISTINCT event_type FROM regs),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM types a JOIN types b ON a.event_type < b.event_type
    ), members AS (
      SELECT ta, tb, ta AS event_type FROM pairs
      UNION ALL SELECT ta, tb, tb FROM pairs
    ), uregs AS (
      SELECT m.ta, m.tb, r.bucket, MAX(r.rho) AS rho
      FROM members m JOIN regs r ON r.event_type = m.event_type
      GROUP BY m.ta, m.tb, r.bucket
    ), usums AS (
      SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS used, {term} AS s_used
      FROM uregs GROUP BY ta, tb
    ), ests AS (
      SELECT u.ta, u.tb,
             {_hll_est_sql("sa.used", "sa.s_used")} AS est_a,
             {_hll_est_sql("sb.used", "sb.s_used")} AS est_b,
             {_hll_est_sql("u.used", "u.s_used")} AS est_u
      FROM usums u
      JOIN ssums sa ON sa.event_type = u.ta
      JOIN ssums sb ON sb.event_type = u.tb
    )
    SELECT ta AS type_a, tb AS type_b,
           ROUND(est_a, 4) AS est_a, ROUND(est_b, 4) AS est_b,
           ROUND(est_u, 4) AS est_union,
           ROUND(GREATEST(est_a + est_b - est_u, 0.0), 4) AS est_intersection
    FROM ests
    """


def _hll_est_col(used: F.Column, s_used: F.Column) -> F.Column:
    m = _HLL_M
    empty_term = F.lit(1 << (_HLL_W + 1)).cast("bigint")
    denom = (s_used + (F.lit(m) - used) * empty_term).cast("double")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) * F.lit(
        float(1 << (_HLL_W + 1))
    ) / denom
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - used))
    return F.when((raw <= 2.5 * m) & (used < m), lc).otherwise(raw)


@_q("a_hll_set_algebra", _hll_set_oracle())
def a_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimates for every event-type pair — |A|, |B|,
    |A∪B| via register-MAX merge, |A∩B| by inclusion-exclusion — from
    ONE build of the 256-register-per-type exact-HLL table. The fact
    table is scanned once (the register groupBy); the pair lattice is a
    deliberate ≤|types|²-row broadcast (audit-allowlisted next to the
    other tiny-lattice joins) whose members then reach the registers by
    exploded-member EQUI-join, so only register tables ever shuffle."""
    e = t(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
    )
    rest = F.expr(f"h div {_HLL_M}")
    rho = F.when(rest == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin(rest))
    )
    regs = (
        e.select("event_type", h.alias("h"))
        .groupBy("event_type", (F.col("h") % _HLL_M).alias("bucket"))
        .agg(F.max(rho).alias("rho"))
        # one register build feeds the single sums, the type list, and
        # the pair-merged registers
        .transform(truncate_lineage)
    )
    term = F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1} - rho)")
    ssums = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("used"),
        F.sum(term).alias("s_used"),
    )
    types = regs.select("event_type").distinct()
    ta = types.select(F.col("event_type").alias("ta"))
    tb = types.select(F.col("event_type").alias("tb"))
    pairs = ta.join(tb, F.col("ta") < F.col("tb"))
    members = pairs.select(
        "ta", "tb", F.explode(F.array("ta", "tb")).alias("event_type")
    )
    uregs = (
        members.join(regs, "event_type")
        .groupBy("ta", "tb", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    usums = uregs.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).cast("bigint").alias("used"),
        F.sum(term).alias("s_used"),
    )
    sa = ssums.select(
        F.col("event_type").alias("ta"),
        F.col("used").alias("used_a"),
        F.col("s_used").alias("s_a"),
    )
    sb = ssums.select(
        F.col("event_type").alias("tb"),
        F.col("used").alias("used_b"),
        F.col("s_used").alias("s_b"),
    )
    est_a = _hll_est_col(F.col("used_a"), F.col("s_a"))
    est_b = _hll_est_col(F.col("used_b"), F.col("s_b"))
    est_u = _hll_est_col(F.col("used"), F.col("s_used"))
    return (
        usums.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.round(est_a, 4).alias("est_a"),
            F.round(est_b, 4).alias("est_b"),
            F.round(est_u, 4).alias("est_union"),
            F.round(
                F.greatest(est_a + est_b - est_u, F.lit(0.0)), 4
            ).alias("est_intersection"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket association rules over parts co-ordered in the same
# order: the Apriori 2-itemset pass (support → confidence → lift). The
# per-order self-join is bounded by basket size (TPC-H baskets ≤ 7
# items), support pruning (n_ab >= minsup) happens in the pair
# aggregate's HAVING before anything else joins, and the only scalar —
# the order universe count — rides the house 1-row broadcast idiom. At
# 100 TB the support threshold is the knob: everything downstream of
# the HAVING is the (small) frequent-pair table.
# ---------------------------------------------------------------------------

_MB_MIN_SUPPORT = 3
_MB_TOP = 25


@_q(
    "a_market_basket",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_ord AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
    ), part_cnt AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MB_MIN_SUPPORT}
    )
    SELECT pa AS part_a, pb AS part_b, n_ab,
           ca.n AS n_a, cb.n AS n_b,
           CAST(n_ab AS DOUBLE) / CAST(ca.n AS DOUBLE) AS confidence,
           CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)
             / (CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE)) AS lift
    FROM pairs
    JOIN part_cnt ca ON ca.l_partkey = pa
    JOIN part_cnt cb ON cb.l_partkey = pb
    CROSS JOIN n_ord
    ORDER BY lift DESC, pa, pb
    LIMIT {_MB_TOP}
    """,
)
def a_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 part-pair association rules by lift (Apriori 2-itemset
    pass): distinct (order, part) items, per-order pair self-join
    (bounded by basket size), support-pruned pair counts, then
    confidence n_ab/n_a and lift N·n_ab/(n_a·n_b) as double ratios of
    BIGINT counts — identical operands cross-engine. One TakeOrdered
    pass picks the head with (pa, pb) tiebreaks."""
    items = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        # feeds both sides of the pair join, the part counts, and the
        # order-universe count — one fact scan
        .transform(truncate_lineage)
    )
    n_ord = items.select(F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"))
    part_cnt = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= _MB_MIN_SUPPORT)
    )
    ca = part_cnt.select(F.col("l_partkey").alias("pa"), F.col("n").alias("n_a"))
    cb = part_cnt.select(F.col("l_partkey").alias("pb"), F.col("n").alias("n_b"))
    # unrounded ratios of identical BIGINT-derived doubles: a 6-dp
    # ROUND can land exactly on a 7-digit half where the engines'
    # rounding strategies split (queries/common.py note)
    conf = F.col("n_ab").cast("double") / F.col("n_a").cast("double")
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n_orders").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return (
        pairs.join(ca, "pa")
        .join(cb, "pb")
        .crossJoin(F.broadcast(n_ord))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "n_ab",
            "n_a",
            "n_b",
            conf.alias("confidence"),
            lift.alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(_MB_TOP)
    )
