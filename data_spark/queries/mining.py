"""Round-4 continuation mining tier: community detection by synchronous
label propagation (a third hash-verified iterative-graph member with a
*mode*-style update, next to the MIN-fold of ``g_components`` and the
min-plus fold of ``g_sssp_bellman``), item-based collaborative-filtering
recommendations (seed-set expansion over the co-purchase pair table —
the query shape behind "frequently bought together"), and
month-over-month / year-over-year growth from calendar-aligned lag
windows.

All three carry exact DuckDB oracles:
  - LPA's per-round update is argmax over neighbor-label counts with a
    (count DESC, label ASC) total order — pure integers and strings, no
    floats anywhere, so a FIXED iteration count is bit-reproducible
    cross-engine (the same trick as g_kcore_peel's fixed peels).
  - The recommender's scores are BIGINT co-occurrence sums — exact by
    construction.
  - Growth ratios are double divisions of decimal-exact monthly sums
    (identical operands cross-engine), rounded to the house 6-dp grid.

Scale posture:
  - LPA: per round, one |E|-sized equi-join of the label frame against
    the symmetric edge list plus two map-side-combinable aggregates
    keyed on node id; label frames are lineage-truncated every round
    (reliable checkpoint when the session sets a dir — plans/lineage.py).
    No all-pairs, no driver fixpoint round-trip.
  - ItemCF: the pair table is support-pruned (HAVING >= 2) before
    anything joins it, the seed set is one customer's purchases (tiny —
    broadcast), and the candidate ranking is one TakeOrdered pass. At
    100 TB the support threshold bounds the pair table exactly as in
    a_market_basket.
  - Growth: ONE map-side-combinable aggregate over the fact table; the
    lag windows ride a frame bounded by the calendar (#months), not the
    data.
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
    total."""
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
    return lbl.select("id", F.col("lbl").alias("community"))


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
           ROUND(revenue / LAG(revenue, 1) OVER (ORDER BY month) - 1.0, 6) AS mom_pct,
           ROUND(revenue / LAG(revenue, 12) OVER (ORDER BY month) - 1.0, 6) AS yoy_pct
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
        F.round(F.col("revenue") / F.lag("revenue", 1).over(w) - 1.0, 6).alias(
            "mom_pct"
        ),
        F.round(F.col("revenue") / F.lag("revenue", 12).over(w) - 1.0, 6).alias(
            "yoy_pct"
        ),
    ).orderBy("month")
