"""Third relational battery (round 2): TPC-H Q11/Q20/Q21-shaped
subquery compositions adapted to the testdata columns, window DISTINCT
aggregation, and an array/higher-order-function battery. Same
determinism + dsum conventions as queries.common; every query carries a
DuckDB oracle.
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
    "q11_important_parts",
    f"""
    SELECT l_partkey,
           {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} > (
      SELECT 1.2 * {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')}
             / COUNT(DISTINCT l_partkey)
      FROM lineitem
    )
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING against a global scalar subquery (TPC-H Q11 shape, adapted
    to lineitem — testdata has no partsupp). The threshold is 1.2× the
    average per-part value, so selectivity is scale-free (TPC-H's
    0.0001/SF discipline).

    Plan: ONE scan feeds both the per-part aggregate and the global
    total (Spark reuses the exchange under AQE); the scalar joins back
    as a 1-row broadcast, so the only real shuffle is the partkey agg.
    """
    l = t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = l.groupBy("l_partkey").agg(dsum(rev).alias("part_value"))
    total = l.agg(
        (1.2 * dsum(rev) / F.countDistinct("l_partkey")).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@_q(
    "q20_heavy_suppliers",
    f"""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
      GROUP BY l_suppkey, l_partkey
      HAVING {SQL_DSUM.format(expr='l_quantity')} > 30
    )
    """,
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested semi-join chain (TPC-H Q20 shape): suppliers shipping >30
    units of any 'large%' part (selectivity holds at any SF: a single
    line's quantity is 1-50, so ~40% of pairs qualify).

    part filter → broadcast semi onto lineitem → (suppkey, partkey) agg
    → semi-join into supplier. Both semis keep only keys through the
    shuffles; nothing wide moves.
    """
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("large%"))
    l = t(spark, sf_dir, "lineitem")
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    return s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@_q(
    "q21_lone_returned_supplier",
    """
    SELECT l1.l_suppkey, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
    GROUP BY l1.l_suppkey
    """,
)
def q21_lone_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS composition (TPC-H Q21 shape): the only
    supplier whose lines came back returned on a multi-supplier
    finished order.

    Both correlated subqueries hit the same lineitem-by-orderkey
    grouping, so they are expressed as ONE aggregation producing
    per-(order, supplier) peer stats — not two extra joins: exists ⇔
    order has another supplier; not-exists ⇔ no other supplier has an
    'R' line. One shuffle on orderkey, one on (orderkey, suppkey).
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    l = t(spark, sf_dir, "lineitem")
    per_os = (
        l.join(o, l.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
        )
    )
    w = Window.partitionBy("l_orderkey")
    peers = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_r_supp", F.sum("has_r").over(w))
    )
    return (
        peers.filter(
            (F.col("has_r") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_r_supp") == 1)
        )
        .groupBy(F.col("l_suppkey"))
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@_q(
    "w_distinct_over_window",
    """
    SELECT l_orderkey, l_linenumber,
           COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) OVER (PARTITION BY l_orderkey) AS n_parts
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def w_distinct_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregate over a window partition. Spark's window
    functions reject DISTINCT, so the engine-level rewrite is
    size(collect_set(...)) over the partition — set semantics via a
    bounded per-partition state, one shuffle on the partition key."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    w = Window.partitionBy("l_orderkey")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.size(F.collect_set("l_suppkey").over(w)).cast("bigint").alias("n_suppliers"),
        F.size(F.collect_set("l_partkey").over(w)).cast("bigint").alias("n_parts"),
    )


@_q(
    "a_salted_skew_agg",
    f"""
    SELECT l_returnflag,
           {SQL_DSUM.format(expr='l_quantity')} AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on a pathologically skewed key
    (l_returnflag has 3 values — every key is a heavy hitter). The
    salt spreads each hot key across reducers for the wide partial
    agg; the final shuffle moves only salt_buckets rows per key. The
    oracle is the plain GROUP BY — salting must be result-invisible.
    Decimal partials keep the double sum order-independent across the
    two stages."""
    from data_spark.operators.skew import salted_agg

    l = t(spark, sf_dir, "lineitem")
    out = salted_agg(
        l,
        ["l_returnflag"],
        {
            "sum_qty": (
                F.sum(F.col("l_quantity").cast("decimal(38,6)")),
                F.sum("sum_qty"),
            ),
            "n": (F.count(F.lit(1)), F.sum("n")),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag", F.col("sum_qty").cast("double").alias("sum_qty"), "n"
    )


@_q(
    "f_map_struct_json",
    """
    WITH per AS (
      SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt,
             MIN(CAST(json_object('k', o_orderkey, 'p', o_orderpriority) AS VARCHAR))
               AS min_js
      FROM orders GROUP BY o_custkey, o_orderpriority
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_priorities,
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN cnt END), 0)
                AS BIGINT) AS urgent,
           CAST(to_json(list_sort(list(o_orderpriority))) AS VARCHAR) AS priorities,
           MIN(min_js) AS sample_json,
           json_extract_string(MIN(min_js), '$.p') AS p_back
    FROM per
    GROUP BY o_custkey
    """,
)
def f_map_struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/struct/JSON function battery (SURVEY §2.8 semi-structured
    glue): per-customer priority→count MAP built with
    map_from_entries(collect_list(struct)), probed with element_at /
    map_keys; struct→JSON via to_json and back via get_json_object.
    The oracle computes the same facts relationally — maps stay an
    engine-internal representation, outputs are flat columns."""
    o = t(spark, sf_dir, "orders")
    js = F.to_json(
        F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("p"))
    )
    per = o.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"), F.min(js).alias("min_js")
    )
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("o_orderpriority"), F.col("cnt")))
    )
    return (
        per.groupBy("o_custkey")
        .agg(m.alias("m"), F.min("min_js").alias("sample_json"))
        .select(
            "o_custkey",
            F.size("m").cast("bigint").alias("n_priorities"),
            F.coalesce(F.element_at(F.col("m"), F.lit("1-URGENT")), F.lit(0))
            .cast("bigint")
            .alias("urgent"),
            # Serialized to a canonical JSON string: the driver's pandas
            # canonicalizer cannot hash raw array cells (r2 driver-red).
            F.to_json(F.array_sort(F.map_keys("m"))).alias("priorities"),
            "sample_json",
            F.get_json_object("sample_json", "$.p").alias("p_back"),
        )
    )


@_q(
    "f_array_battery",
    """
    SELECT o_orderkey,
           CAST(to_json(qtys) AS VARCHAR) AS qtys,
           CAST(to_json(list_sort(qtys)) AS VARCHAR) AS qtys_sorted,
           len(qtys) AS n,
           CAST(list_aggregate(qtys, 'sum') AS DOUBLE) AS qty_sum,
           CAST(to_json(list_transform(list_sort(qtys), x -> x * 2.0)) AS VARCHAR)
             AS doubled,
           CAST(to_json(list_filter(list_sort(qtys), x -> x > 25.0)) AS VARCHAR)
             AS big,
           CAST(len(list_filter(qtys, x -> x > 25.0)) AS BIGINT) AS n_big,
           list_sort(qtys)[1] AS smallest
    FROM (
      SELECT o_orderkey, list(l_quantity ORDER BY l_linenumber, l_quantity) AS qtys
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderkey % 50 = 0
      GROUP BY o_orderkey
    )
    """,
)
def f_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function battery (SURVEY §2.8 list handling —
    the reference's row-Python list munging as native column algebra):
    ordered collect, sort, fold (aggregate), transform, filter,
    element_at. All JVM-side; the lambda arguments are materialized
    arrays, so no re-evaluation blowup (see spark-graft gotchas)."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    grouped = (
        l.join(o, l.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("l_linenumber", "l_quantity"))
            ).alias("pairs")
        )
        .select(
            "o_orderkey",
            F.transform(F.col("pairs"), lambda s: s.l_quantity).alias("qtys"),
        )
    )
    sorted_q = F.array_sort(F.col("qtys"))
    # Array outputs serialized via to_json: the driver's pandas
    # canonicalizer cannot hash raw array cells (r2 driver-red), and
    # Spark/DuckDB agree on compact JSON rendering of double/string
    # arrays ([17.0,2.5] / ["a","b"]).
    return grouped.select(
        "o_orderkey",
        F.to_json("qtys").alias("qtys"),
        F.to_json(sorted_q).alias("qtys_sorted"),
        F.size("qtys").cast("bigint").alias("n"),
        F.aggregate(
            F.col("qtys"), F.lit(0.0), lambda acc, x: acc + x
        ).alias("qty_sum"),
        F.to_json(F.transform(sorted_q, lambda x: x * 2.0)).alias("doubled"),
        F.to_json(F.filter(sorted_q, lambda x: x > 25.0)).alias("big"),
        F.size(F.filter(F.col("qtys"), lambda x: x > 25.0)).cast("bigint").alias("n_big"),
        F.element_at(sorted_q, 1).alias("smallest"),
    )


@_q(
    "j_salted_skew_join",
    f"""
    SELECT l.l_returnflag, d.flag_label,
           {SQL_DSUM.format(expr='l.l_quantity')} AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l
    JOIN (
      SELECT 'A' AS flag, 'returned-accepted' AS flag_label
      UNION ALL SELECT 'R', 'returned-rejected'
      UNION ALL SELECT 'N', 'not-returned'
    ) d ON d.flag = l.l_returnflag
    GROUP BY l.l_returnflag, d.flag_label
    """,
)
def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators.skew.salted_join): the join key
    l_returnflag has 3 values, so a plain shuffle join would funnel
    ~200k rows/key (at sf0.1) through 3 reducers while the rest idle.
    Salting spreads each hot key over 16 reducers; the 3-row dim is
    replicated 16× — the right trade by ~4 orders of magnitude. The
    oracle is the plain join: salting must be result-invisible.
    """
    from data_spark.operators.skew import salted_join

    l = t(spark, sf_dir, "lineitem")
    dim = spark.createDataFrame(
        [("A", "returned-accepted"), ("R", "returned-rejected"), ("N", "not-returned")],
        ["flag", "flag_label"],
    ).withColumnRenamed("flag", "l_returnflag")
    return (
        salted_join(l, dim, ["l_returnflag"], salt_buckets=16)
        .groupBy("l_returnflag", "flag_label")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )
