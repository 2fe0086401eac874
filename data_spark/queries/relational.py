"""Relational-core query inventory (SURVEY §2.2-2.7).

Each entry re-expresses a reference operator class on the driver's
TPC-H-ish tables; the paired ORACLE SQL is what DuckDB runs for the
correctness gate. Operator IDs in docstrings refer to SURVEY §2.

Scale notes are inline per query — the recurring ones:
  - dim joins are explicitly broadcast (J1: the reference's cn22/cm22
    joins, contributions.sql:89-93);
  - aggregations are expressed so Catalyst plans partial (map-side)
    aggregation before the shuffle;
  - top-K uses TakeOrderedAndProject (sort+limit), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.queries.common import SQL_DAVG, SQL_DSUM, davg, dsum, t

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
# Aggregation core
# ---------------------------------------------------------------------------


@_q(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM.format(expr='l_quantity')} AS sum_qty,
           {SQL_DSUM.format(expr='l_extendedprice')} AS sum_base_price,
           {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {SQL_DAVG.format(expr='l_quantity')} AS avg_qty,
           {SQL_DAVG.format(expr='l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-class aggregation (SURVEY A1-A5 analogue; TPC-H Q1 shape).

    Plan: scan with pushed l_shipdate filter → partial hash agg →
    shuffle on (returnflag, linestatus) → final agg. Two grouping keys
    with tiny cardinality ⇒ shuffle is a few KB regardless of SF.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg(F.col("l_quantity")).alias("avg_qty"),
        davg(F.col("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_q(
    "q3_top_orders",
    f"""
    SELECT o.o_orderkey,
           {SQL_DSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-K (SURVEY J1 + W1; TPC-H Q3 shape).

    The selective join runs FIRST: orders⋈(BUILDING customers) cuts the
    orders side ~5× before the expensive fact-fact shuffle with
    lineitem. No broadcast hint on customer — it is a fact at scale
    (a hard hint would override AQE's size check and OOM at 100×);
    AQE auto-broadcasts the filtered side when it is actually small.
    Final top-10 is TakeOrderedAndProject with a unique tiebreak
    (o_orderkey) so the selected set is deterministic. Revenue is a
    decimal sum ⇒ exact, so the ORDER BY boundary matches the oracle.
    """
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@_q(
    "q5_nation_revenue",
    f"""
    SELECT n.n_name AS nation,
           {SQL_DSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
    GROUP BY n.n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (SURVEY J1/J2 at depth; TPC-H Q5 shape).

    Selectivity flows outward-in: region(filtered)→nation→customer
    prunes customers to one region BEFORE the fact joins, so the
    orders⋈customer shuffle carries ~1/5 of orders into the
    lineitem⋈orders shuffle. Broadcast hints only on the genuinely
    bounded dims (nation 25 rows, region 5); customer and supplier are
    facts at scale — AQE decides their join strategy from runtime
    sizes instead of a hard hint that would OOM at 100×.
    """
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Filters / predicates (SURVEY P1-P4, P11)
# ---------------------------------------------------------------------------


@_q(
    "p_compound_filter",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CASE WHEN substr(l_returnflag, 1, 1) = 'R' THEN 'returned'
                WHEN l_linestatus = 'O' THEN 'open'
                ELSE 'closed' END AS class
    FROM lineitem
    WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
      AND NOT (l_quantity < 5 AND l_discount > 0.05)
      AND l_shipdate IS NOT NULL
      AND l_returnflag NOT LIKE 'N%'
    """,
)
def p_compound_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicates + LIKE + NULL guards + CASE routing
    (SURVEY P2/P3/P4/P11 — the contributions.sql:6 classifier shape).

    Everything here compiles to pushed parquet filters + a codegen'd
    CASE projection; no shuffle at all.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "F"))
        & ~((F.col("l_quantity") < 5) & (F.col("l_discount") > 0.05))
        & F.col("l_shipdate").isNotNull()
        & ~F.col("l_returnflag").like("N%")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.when(F.substring("l_returnflag", 1, 1) == "R", "returned")
        .when(F.col("l_linestatus") == "O", "open")
        .otherwise("closed")
        .alias("class"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY J1-J8)
# ---------------------------------------------------------------------------


@_q(
    "j_left_join_dim",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment, n.n_name AS nation
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def j_left_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim LEFT joins (SURVEY J1/J2: the cn22/cm22 enrichment).
    nation (25 rows) is hint-broadcast; customer gets NO hint — it is a
    fact at scale, so AQE chooses broadcast vs shuffle from runtime
    size."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment", F.col("n_name").alias("nation"))
    )


@_q(
    "j_anti_unloaded",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def j_anti_unloaded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join = the reference's incremental "new rows only" pattern
    (SURVEY J3: LEFT JOIN loaded_x ON id WHERE b.id IS NULL,
    load_elastic_contributions/main.py:76-83)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@_q(
    "j_semi_active",
    """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def j_semi_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join = the reference's key-set membership probes (SURVEY J8:
    es.exists pre-checks before insert)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@_q(
    "j_outer_coalesce",
    f"""
    WITH a AS (
      SELECT o_custkey AS custkey, {SQL_DSUM.format(expr='o_totalprice')} AS open_total
      FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    ), b AS (
      SELECT o_custkey AS custkey, {SQL_DSUM.format(expr='o_totalprice')} AS done_total
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    )
    SELECT COALESCE(a.custkey, b.custkey) AS custkey,
           COALESCE(a.open_total, 0.0) AS open_total,
           COALESCE(b.done_total, 0.0) AS done_total
    FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
    """,
)
def j_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer merge + key coalesce (SURVEY J4: the allsides×MBFC
    outer merge, news_sources_ingest_get_crawls/main.py:123-125)."""
    o = t(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(dsum(F.col("o_totalprice")).alias("open_total"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(dsum(F.col("o_totalprice")).alias("done_total"))
    )
    return a.join(b, a.custkey == b.custkey, "full_outer").select(
        F.coalesce(a.custkey, b.custkey).alias("custkey"),
        F.coalesce(F.col("open_total"), F.lit(0.0)).alias("open_total"),
        F.coalesce(F.col("done_total"), F.lit(0.0)).alias("done_total"),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY U1-U3, A1)
# ---------------------------------------------------------------------------


@_q(
    "u_union_pad_distinct",
    """
    SELECT * FROM (
      SELECT o_orderkey AS key, 'order' AS kind, o_totalprice AS amount,
             CAST(NULL AS DOUBLE) AS quantity
      FROM orders WHERE o_totalprice > 100000
      UNION ALL
      SELECT l_orderkey AS key, 'line' AS kind, l_extendedprice AS amount,
             l_quantity AS quantity
      FROM lineitem WHERE l_extendedprice > 50000
    )
    """,
)
def u_union_pad_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of disjoint-schema arms with NULL padding (SURVEY U2:
    the 9-view contributions_elastic22 union, contributions.sql:64-129).
    unionByName(allowMissingColumns) handles the padding declaratively;
    Catalyst pushes each arm's filter to its own scan."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(
            F.col("o_orderkey").alias("key"),
            F.lit("order").alias("kind"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    l = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 50000)
        .select(
            F.col("l_orderkey").alias("key"),
            F.lit("line").alias("kind"),
            F.col("l_extendedprice").alias("amount"),
            F.col("l_quantity").alias("quantity"),
        )
    )
    return o.unionByName(l, allowMissingColumns=True)


@_q(
    "u_distinct_master",
    """
    SELECT DISTINCT l_orderkey, l_partkey, l_suppkey, l_returnflag
    FROM (
      SELECT l_orderkey, l_partkey, l_suppkey, l_returnflag FROM lineitem WHERE l_linestatus = 'F'
      UNION ALL
      SELECT l_orderkey, l_partkey, l_suppkey, l_returnflag FROM lineitem WHERE l_returnflag = 'R'
    )
    """,
)
def u_distinct_master(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ∪ master-table build (SURVEY U1+A1: contributions22 =
    SELECT DISTINCT of oth22 ∪ indiv22, create_master_tables/main.py:51).
    Catalyst plans partial-distinct before the exchange, so overlapping
    arms dedup map-side first."""
    li = t(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"]
    a = li.filter(F.col("l_linestatus") == "F").select(cols)
    b = li.filter(F.col("l_returnflag") == "R").select(cols)
    return a.unionByName(b).distinct()


# ---------------------------------------------------------------------------
# Windows / ordered slices (SURVEY W1-W6, A2, A3)
# ---------------------------------------------------------------------------


@_q(
    "w_topk_global",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 1000
    """,
)
def w_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + head-N batch (SURVEY W1: the ES [0:1000] sorted windows).
    Spark plans TakeOrderedAndProject — per-partition top-K then a
    single-reducer merge of K·P rows, never a global sort."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(1000)
    )


@_q(
    "w_first_per_group",
    """
    SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts, event_type
    FROM (
      SELECT user_id, event_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-earliest-per-key dedup (SURVEY W2/A3: queue_duplicates
    keep-earliest-URL, news_articles_ingest_queue_duplicates/main.py:37-52).
    row_number over (key, ts, unique-id) ⇒ deterministic winner."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            "event_type",
        )
    )


@_q(
    "w_sample_deterministic",
    """
    SELECT event_id, user_id, event_type
    FROM events
    ORDER BY (event_id * 9973) % 104729, event_id
    LIMIT 100
    """,
)
def w_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-sample-N (SURVEY W5: Cypher `WITH rand() ORDER BY r LIMIT
    1000`). rand() is seedable but engine-specific, so the engine's
    sampler uses a keyed pseudo-random permutation — deterministic,
    reproducible, and identical in any engine."""
    e = t(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "event_type")
        .orderBy((F.col("event_id") * 9973) % 104729, F.asc("event_id"))
        .limit(100)
    )


@_q(
    "a_collect_group_array",
    """
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orderkeys
    FROM orders
    GROUP BY o_custkey
    """,
)
def a_collect_group_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-to-array (SURVEY A2: linkages cand_id→[…] via collect_list
    of structs, load_elastic_linkages/main.py:42-97). Emitted as a
    sorted joined string so the value-hash is order-insensitive."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("o_orderkey")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("orderkeys"),
    )


@_q(
    "m_upsert_latest",
    """
    SELECT user_id, event_type, event_id AS latest_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts, value AS latest_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def m_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert emulation: last-write-wins per key (SURVEY S10/§4:
    ES doc_as_upsert + Cypher MERGE…SET ⇒ union + window keep-latest).
    This is the read-side of data_spark.operators.merge.merge_upsert."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
            F.col("value").alias("latest_value"),
        )
    )
