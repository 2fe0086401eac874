"""Second relational battery: TPC-H-shaped subquery/conditional-agg
patterns plus engine-completeness operators (rollup, intersect/except,
pivot, rank/lag windows, correlated scalar subqueries). All
oracle-checked; same determinism rules as queries.common.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.queries.common import SQL_DSUM, dsum, t

QUERIES = {}
ORACLE = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


@_q(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_quantity > 30)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-correlated count (TPC-H Q4 shape) — planned as a left-semi
    join, one shuffle on orderkey, tiny agg."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_q(
    "q12_shipmode_case",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_shipmode_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-count aggregation (TPC-H Q12 shape)."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_q(
    "q14_promo_share",
    f"""
    SELECT ROUND(100.0 * {SQL_DSUM.format(expr="CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
           / {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')}, 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction-of-total conditional aggregate (TPC-H Q14 shape). No
    broadcast hint on part: the join takes ALL parts, and part scales
    with the fact at 100×; a hard hint would override AQE's size check
    and OOM instead of degrading to a shuffle join (r2 verdict)."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * dsum(promo) / dsum(rev), 6).alias("promo_revenue_pct"))
    )


@_q(
    "q16_brand_supplier_cnt",
    """
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20, 25)
    GROUP BY p_brand, p_type
    """,
)
def q16_brand_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT DISTINCT per group with pushed dim predicates (TPC-H Q16
    shape) — partial distinct happens map-side before the shuffle. The
    size/brand filter keeps a fixed FRACTION of part, which still scales
    with the fact, so the broadcast decision is left to AQE."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25)
    )
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q18_large_orders",
    f"""
    SELECT o.o_orderkey, o.o_custkey, {SQL_DSUM.format(expr='l.l_quantity')} AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 150
    )
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + IN-subquery (TPC-H Q18 shape) as agg → semi-join."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
    )


@_q(
    "q19_disjunctive",
    f"""
    SELECT {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive mixed join/scan predicates (TPC-H Q19 shape) —
    Catalyst extracts the common p_partkey equi-key so this stays a hash
    join with residual OR filter, not a nested loop. part enters the
    join unfiltered (the disjunction needs joined rows), so the
    broadcast decision is left to AQE — a hard hint would OOM at 100×."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 30))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & q.between(20, 50))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@_q(
    "w_rank_in_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    ) WHERE rnk <= 3
    """,
)
def w_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via dense_rank (window battery beyond
    row_number)."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rnk")
    )


@_q(
    "w_running_total",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    """,
)
def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per key — decimal accumulation keeps the
    prefix sums bit-identical across engines."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("running_value"),
    )


@_q(
    "w_lag_delta",
    """
    SELECT user_id, event_id,
           CAST(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS DOUBLE) AS delta
    FROM events
    """,
)
def w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() delta per key (cursor-walk semantics, SURVEY W6)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return e.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).cast("double").alias("delta"),
    )


@_q(
    "g_rollup_region",
    f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers,
           {SQL_DSUM.format(expr='c.c_acctbal')} AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def g_rollup_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (engine-completeness beyond the
    reference; one shuffle, grouping-set expansion map-side)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "c_acctbal")
        .rollup("region", "nation")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum(F.col("c_acctbal")).alias("total_balance"))
    )


@_q(
    "s_intersect_except",
    """
    SELECT 'both' AS bucket, c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT 'open_only' AS bucket, c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def s_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set algebra (absent from the reference, part
    of a complete engine; EXCEPT-semantics appear there only as
    anti-joins)."""
    o = t(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    done_c = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    both = open_c.intersect(done_c).select(F.lit("both").alias("bucket"), "c_custkey")
    only = open_c.subtract(done_c).select(F.lit("open_only").alias("bucket"), "c_custkey")
    return both.unionByName(only)


@_q(
    "p_pivot_status",
    f"""
    SELECT o_custkey AS custkey,
           {SQL_DSUM.format(expr="CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END")} AS open_amt,
           {SQL_DSUM.format(expr="CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS done_amt,
           {SQL_DSUM.format(expr="CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END")} AS partial_amt
    FROM orders
    GROUP BY o_custkey
    """,
)
def p_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-to-columns (wide conditional aggregation — expressed as
    CASE sums so the output schema is static and oracle-comparable)."""
    o = t(spark, sf_dir, "orders")

    def amt(status: str):
        return dsum(
            F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(0.0)
        )

    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        amt("O").alias("open_amt"), amt("F").alias("done_amt"), amt("P").alias("partial_amt")
    )


@_q(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View + scalar-max subquery (TPC-H Q15 shape): the revenue view is
    computed once and reused for both the max and the probe — exact
    decimal revenue makes the equality comparison engine-safe."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_q(
    "q17_small_quantity",
    f"""
    SELECT CAST({SQL_DSUM.format(expr='l.l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity))
               AS qty_limit
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.qty_limit
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-key average threshold (TPC-H Q17 shape),
    de-correlated into an aggregate-then-join — one extra shuffle on
    partkey instead of a per-row subquery. The brand filter keeps a
    fixed fraction of part (scales with the fact), so broadcast is left
    to AQE rather than hard-hinted."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy(F.col("l_partkey").alias("k")).agg(
        (0.2 * (dsum(F.col("l_quantity")) / F.count("l_quantity"))).alias("qty_limit")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == avg_qty.k)
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).cast("double").alias("avg_yearly"))
    )


@_q(
    "q22_idle_customers",
    f"""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(c_acctbal) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT substr(c.c_name, 10, 2) AS cntry, COUNT(*) AS numcust,
           {SQL_DSUM.format(expr='c.c_acctbal')} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY cntry
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-average threshold + NOT EXISTS anti-join + substring
    grouping (TPC-H Q22 shape; the anti-join arm is restricted to
    urgent orders so the testdata actually produces qualifying rows)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum(F.col("c_acctbal")) / F.count("c_acctbal")).alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("cntry"))
        .agg(F.count(F.lit(1)).alias("numcust"), dsum(F.col("c_acctbal")).alias("totacctbal"))
    )


@_q(
    "a_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``, verified bit-identical — selection +
    interpolation over identical doubles, not accumulation)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@_q(
    "sq_above_avg_price",
    """
    SELECT p.p_partkey, p.p_retailprice,
           ROUND(p.p_retailprice / (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
                                           / COUNT(p_retailprice) FROM part), 6) AS price_ratio
    FROM part p
    WHERE p.p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
                                    / COUNT(p_retailprice) FROM part)
    """,
)
def sq_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery comparison against a global aggregate (computed
    once, broadcast as a 1-row join — no per-row recomputation)."""
    p = t(spark, sf_dir, "part")
    avg_df = p.agg(
        (dsum(F.col("p_retailprice")) / F.count("p_retailprice")).alias("avg_price")
    )
    return (
        p.join(F.broadcast(avg_df))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .select(
            "p_partkey",
            "p_retailprice",
            F.round(F.col("p_retailprice") / F.col("avg_price"), 6).alias("price_ratio"),
        )
    )


@_q("a_approx_percentiles")  # sketch-based — engine digests differ, rows-only
def a_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per group (``percentile_approx`` — the
    sketch path that replaces a_percentiles' exact sort-based selection
    at 100 TB: bounded-memory mergeable digests, one partial-agg pass).
    Error bound vs the exact values is pytest-gated."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile_approx(l_extendedprice, 0.5, 1000)").alias("median_price"),
        F.expr("percentile_approx(l_extendedprice, 0.9, 1000)").alias("p90_price"),
    )


@_q(
    "w_stratified_sample",
    """
    SELECT doc_id, source FROM documents
    WHERE ('0x' || substr(md5('strat-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 20
    """,
)
def w_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% stratified sample: the hash-threshold rule is
    applied per row, so each stratum (source) is sampled proportionally
    with NO shuffle at all — a pure filter, unlike sort- or
    rand()-based sampling, and stable across engines and reruns."""
    d = t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit("strat-v1"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return d.filter(F.pmod(h, F.lit(100)) < 20).select("doc_id", "source")


@_q(
    "q19_disjunctive_join",
    f"""
    SELECT {SQL_DSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive OR-of-ANDs join predicate (TPC-H Q19 shape). The
    single-table conjuncts common to every arm are factored so Catalyst
    pushes a part-side filter (brand IN, size >= 1) below the join and
    evaluates only the residual disjunction on joined rows — one join,
    no union-of-three-joins blowup. The pushed filter still keeps a
    fixed fraction of part, so broadcast is left to AQE's size check
    rather than hard-hinted."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = arm("Brand#1", 15, 1, 20) | arm("Brand#2", 25, 10, 30) | arm("Brand#3", 35, 20, 40)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@_q(
    "q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
           {SQL_DSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
        OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between a nation pair by year (TPC-H Q7 shape):
    the fact table reaches nation through BOTH the supplier and the
    customer dimension. The nation-pair predicate is pushed INTO the
    dims first (nation filtered to 2 rows, broadcast onto supplier and
    customer), so both dim sides shrink to ~2/25 before any fact join.
    Customer/supplier carry no broadcast hints — they are facts at
    scale; AQE picks broadcast when the filtered side is actually
    small."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    pair_names = ("NATION_0", "NATION_1")
    n1 = n.filter(F.col("n_name").isin(*pair_names)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(*pair_names)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    pair = (F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1") | (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@_q(
    "g_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM.format(expr='l_quantity')} AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def g_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than rollup/cube): the three
    granularities are computed in ONE pass with partial aggregation —
    not three scans unioned."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(dsum(F.col("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))


@_q(
    "w_ntile_decile",
    f"""
    WITH ranked AS (
        SELECT c_custkey, c_acctbal,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer
    )
    SELECT decile, COUNT(*) AS n_customers,
           {SQL_DSUM.format(expr='c_acctbal')} AS sum_bal,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM ranked GROUP BY decile
    """,
)
def w_ntile_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-height bucketing with NTILE: customers split into 10
    account-balance deciles, then per-decile stats. The ORDER BY carries
    c_custkey as a unique tiebreaker so both engines assign identical
    buckets. Scale note: a global NTILE is a single-partition sort; at
    100 TB use a_percentiles/sketch cut-points instead — this query is
    the exact-semantics member of that family."""
    c = t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.select("c_acctbal", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("sum_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@_q(
    "u_unpivot_metrics",
    """
    SELECT p_partkey, metric, value FROM (
        SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    )
    """,
)
def u_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt): each part's numeric metrics become
    (metric, value) rows via the native ``unpivot`` operator — a
    narrow, shuffle-free Expand, not a self-union that rescans the
    input once per metric."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_retailprice").cast("double"),
        F.col("p_size").cast("double"),
    ).unpivot("p_partkey", ["p_retailprice", "p_size"], "metric", "value")
