"""Temporal-join / time-series gate queries added in round 4: as-of
attribution join, OHLC hypertable rollup, sliding-window aggregation,
and a banded interval-overlap join.

These fill the classic "operators Spark lacks as single calls"
(as-of join, range join, hypertable rollup — the custom-operator tier
of SURVEY §2): each is a composition of DataFrame ops chosen for its
shuffle shape at 100 TB, with an independent DuckDB formulation
(ASOF JOIN / plain inequality join) as the oracle so the rewrite is
hash-verified, not assumed.

Cross-engine determinism follows queries/common.py: timestamps compared
and emitted in exact integer microseconds, value selections (not sums)
stay double, sums go through the decimal cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.queries.common import SQL_DSUM, SQL_TS, dsum, t, ts_str

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
    "j_asof_click_attrib",
    f"""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           {SQL_TS.format(expr='p.ts')} AS purchase_ts,
           c.click_id,
           CASE WHEN c.click_id IS NULL THEN NULL
                ELSE epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
    FROM p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def j_asof_click_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase attributed to the same user's latest
    click at-or-before it (last-touch attribution). The reference's
    warehouse tier does this lookup per row against a search index;
    Spark has no ASOF JOIN operator, so this is the scalable rewrite —
    union both streams, ONE user-keyed shuffle, and a running
    last-non-null window carries the most recent click forward. No
    range join, no per-row probe: cost is a sort within user partitions
    regardless of how many purchases a click precedes.

    The oracle is DuckDB's native ASOF LEFT JOIN — an independent
    implementation of the same semantics, so the union+window rewrite
    is verified against an engine that has the real operator. Clicks
    are pre-deduped to one per (user, ts) (max event_id) because as-of
    tie behavior among equal-ts candidates is otherwise unspecified.
    Gap is exact integer microseconds (no float time math).
    """
    e = t(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    tagged = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),  # clicks sort before same-ts purchases: at-or-before
        "click_id",
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(1).alias("kind"),
            F.lit(None).cast("bigint").alias("click_id"),
            F.lit(None).cast("timestamp").alias("click_ts"),
            F.col("event_id").alias("purchase_id"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "purchase_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "ts",
        "kind",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.last("click_ts", ignorenulls=True).over(w).alias("click_ts"),
    )
    return carried.filter(F.col("kind") == 1).select(
        F.col("purchase_id"),
        "user_id",
        ts_str(F.col("ts")).alias("purchase_ts"),
        "click_id",
        F.when(
            F.col("click_id").isNotNull(),
            F.unix_micros("ts") - F.unix_micros("click_ts"),
        ).alias("gap_us"),
    )


@_q(
    "e_ohlc_hourly",
    f"""
    WITH ranked AS (
      SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS hr, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, time_bucket(INTERVAL 1 HOUR, ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, time_bucket(INTERVAL 1 HOUR, ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id, {SQL_TS.format(expr='hr')} AS hour,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {SQL_DSUM.format(expr='value')} AS sum_value
    FROM ranked GROUP BY user_id, hr
    """,
)
def e_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsampling per user — the hypertable rollup shape
    (continuous-aggregate materialization in time-series stores). One
    (user, hour)-keyed shuffle computes everything: open/close are
    first/last VALUE SELECTIONS with a (ts, event_id) total order (not
    float aggregations — selections are bit-exact cross-engine),
    high/low are min/max, and only the volume sum needs the decimal
    cast. At 100 TB this is the map-side-combinable rollup that turns a
    raw event stream into a queryable hypertable; the window pass
    shares the same partitioning as the final groupBy, so Catalyst
    plans a single Exchange."""
    e = t(spark, sf_dir, "events")
    # project hr FIRST so the window partitioning and the final groupBy
    # key are the same attribute — Catalyst then plans ONE Exchange for
    # the whole query (keying the window on the date_trunc expression
    # instead leaves a second shuffle in the plan; test_plan_budget)
    projected = e.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("user_id", "hr").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "hr").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = projected.select(
        "user_id",
        "hr",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("user_id", "hr").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    ).select(
        "user_id",
        ts_str(F.col("hr")).alias("hour"),
        "open",
        "high",
        "low",
        "close",
        "n_events",
        "sum_value",
    )


_SLIDE_US = 15 * 60 * 1_000_000  # 15-minute slide
_SLIDES_PER_WINDOW = 4  # 1-hour window


@_q(
    "e_sliding_1h_15m",
    f"""
    WITH exploded AS (
      SELECT ((epoch_us(ts) // {_SLIDE_US}) - k) * {_SLIDE_US} AS start_us, value
      FROM events, UNNEST(range(0, {_SLIDES_PER_WINDOW})) AS r(k)
    )
    SELECT {SQL_TS.format(expr='make_timestamp(start_us)')} AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {SQL_DSUM.format(expr='value')} AS sum_value
    FROM exploded GROUP BY start_us
    """,
)
def e_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation: 1-hour windows advancing every 15
    minutes, so each event lands in 4 overlapping windows. Spark side
    is the NATIVE ``F.window(ts, '1 hour', '15 minutes')`` operator —
    the same expression Structured Streaming uses for sliding
    event-time aggregation, here run in batch — which Catalyst expands
    to a 4-row explode before one window-keyed partial agg. The oracle
    reconstructs the identical window assignment from integer epoch
    microseconds (Spark aligns windows to the 1970 epoch in the session
    UTC timezone; ``floor(us / slide) - k`` enumerates exactly the
    windows whose [start, start+1h) contains ts), so the native
    operator's bucketing is hash-checked, not trusted."""
    e = t(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


_DAY_US = 86_400_000_000


@_q(
    "j_interval_overlap",
    f"""
    WITH li AS (
      SELECT l_partkey AS p,
             l_orderkey * 10 + l_linenumber AS id,
             epoch_us(l_shipdate) AS s_us,
             epoch_us(l_shipdate) + CAST(l_quantity AS INT) * {_DAY_US} AS e_us
      FROM lineitem
    )
    SELECT a.p AS l_partkey, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM li a JOIN li b
      ON a.p = b.p AND a.id < b.id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    GROUP BY a.p
    """,
)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: per part, count pairs of lineitems whose
    shipping windows [shipdate, shipdate + quantity days] overlap — the
    range-join shape (conflict detection, concurrent-session overlap).
    A naive inequality join degenerates to per-key cross products; the
    Spark plan adds TIME BANDING on top of the part equi-key: each
    interval explodes into the calendar months it spans, the join runs
    on (part, month) — so candidates are bounded by co-bucket density,
    not per-part row count — and pairs found in several shared months
    are deduped before counting. The oracle is the plain inequality
    join, verifying banding loses no pair and invents none. Interval
    endpoints are exact integer microseconds in both engines."""
    # l_shipdate arrives as TIMESTAMP_NTZ from the parquet encoding; the
    # session tz is pinned UTC so the cast is wall-clock-identical to
    # DuckDB's naive-UTC epoch_us (see data_spark.io read_table notes)
    ship = F.col("l_shipdate").cast("timestamp")
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.unix_micros(ship).alias("s_us"),
        (
            F.unix_micros(ship)
            + F.col("l_quantity").cast("int") * F.lit(_DAY_US)
        ).alias("e_us"),
    )
    banded = li.select(
        "p",
        "id",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.date_trunc("month", F.timestamp_micros("s_us")),
                F.date_trunc("month", F.timestamp_micros("e_us")),
                F.expr("interval 1 month"),
            )
        ).alias("bucket"),
    )
    # one explode pass, not two: the self-join's sides are identical up
    # to the shuffle, but the month-explode otherwise recomputes per
    # side (no exchange reuse across the a/b aliases at runtime)
    from data_spark.plans.lineage import truncate_lineage  # noqa: PLC0415

    banded = truncate_lineage(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.s_us") <= F.col("b.e_us"))
            & (F.col("b.s_us") <= F.col("a.e_us")),
        )
        .select(F.col("a.p").alias("l_partkey"), F.col("a.id"), F.col("b.id"))
        .distinct()
    )
    return pairs.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@_q(
    "e_m4_downsample",
    f"""
    WITH ranked AS (
      SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS hr,
             event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
                                ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_last,
             ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
                                ORDER BY value, ts, event_id) AS rn_min,
             ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
                                ORDER BY value DESC, ts, event_id) AS rn_max
      FROM events
    )
    SELECT event_type, {SQL_TS.format(expr='hr')} AS bucket,
           event_id, {SQL_TS.format(expr='ts')} AS ts, value,
           concat_ws(',',
             CASE WHEN rn_first = 1 THEN 'first' END,
             CASE WHEN rn_last  = 1 THEN 'last'  END,
             CASE WHEN rn_max   = 1 THEN 'max'   END,
             CASE WHEN rn_min   = 1 THEN 'min'   END) AS roles
    FROM ranked
    WHERE rn_first = 1 OR rn_last = 1 OR rn_min = 1 OR rn_max = 1
    """,
)
def e_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    (series, pixel-bucket) keep exactly the rows a line plot needs —
    first, last, min, and max, WITH their real timestamps (unlike the
    OHLC rollup, which aggregates the values away). Error-free
    line-chart rendering at any zoom from ~4 rows per bucket instead of
    the raw stream.

    One window pass keyed by (series, bucket) — four ROW_NUMBERs over
    the same partition share a single Exchange; ties broken by
    (ts, event_id) so every selection is a total order. Roles are
    emitted per selected row ('first,max' when one row wins several),
    making the selection itself hash-verifiable."""
    e = t(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    base = e.select("event_type", hr.alias("hr"), "event_id", "ts", "value")
    pw = Window.partitionBy("event_type", "hr")
    ranked = base.select(
        "event_type",
        "hr",
        "event_id",
        "ts",
        "value",
        F.row_number().over(pw.orderBy("ts", "event_id")).alias("rn_first"),
        F.row_number().over(pw.orderBy(F.col("ts").desc(), F.col("event_id").desc())).alias("rn_last"),
        F.row_number().over(pw.orderBy("value", "ts", "event_id")).alias("rn_min"),
        F.row_number().over(pw.orderBy(F.col("value").desc(), "ts", "event_id")).alias("rn_max"),
    )
    roles = F.concat_ws(
        ",",
        F.when(F.col("rn_first") == 1, F.lit("first")),
        F.when(F.col("rn_last") == 1, F.lit("last")),
        F.when(F.col("rn_max") == 1, F.lit("max")),
        F.when(F.col("rn_min") == 1, F.lit("min")),
    )
    return ranked.filter(
        (F.col("rn_first") == 1)
        | (F.col("rn_last") == 1)
        | (F.col("rn_min") == 1)
        | (F.col("rn_max") == 1)
    ).select(
        "event_type",
        ts_str(F.col("hr")).alias("bucket"),
        "event_id",
        ts_str(F.col("ts")).alias("ts"),
        "value",
        roles.alias("roles"),
    )
