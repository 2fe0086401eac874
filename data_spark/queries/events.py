"""Event-stream query inventory (SURVEY §2.9 batch analogues + §2.8
scalar functions exercised with a DuckDB oracle).

The reference's "streaming" is cron micro-batches over document stores;
these queries express the same semantics (tumbling windows, sessionization,
JSON payload extraction, watermark-style incremental splits) on the
``events`` table. True Structured Streaming variants live in
``data_spark.streaming`` (tested in tests/, not oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.functions import clean_zip, parse_amount, parse_date_multi
from data_spark.queries.common import SQL_DSUM, dsum, t, ts_str

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
    "e_tumbling_hourly",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {SQL_DSUM.format(expr='value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def e_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (SURVEY §2.9 "Windows": daily dedup
    lookbacks / per-day Day nodes → window()/date_trunc). Batch form of
    the streaming windowed agg in data_spark.streaming."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value")).alias("total_value"),
    )


@_q(
    "e_json_extract",
    f"""
    SELECT event_type,
           COUNT(*) AS n,
           {SQL_DSUM.format(expr="CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def e_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON payload extraction (SURVEY §2.8 JSON:
    json.loads glue everywhere; Spark side = get_json_object, JVM-native)."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(k.cast("double")).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@_q(
    "e_sessionize",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           {SQL_DSUM.format(expr='value')} AS session_value
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def e_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (SURVEY §2.9
    session/queue state — the batch equivalent of
    applyInPandasWithState/session_window, expressed with lag + running
    sum so it is pure window algebra: one shuffle on user_id)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        # Full-precision gap: unix_micros, NOT cast("long") (which truncates
        # to whole seconds and diverges from the oracle's INTERVAL compare
        # for gaps in (1800 s, 1801 s)).
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 1800 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_no", F.sum("new_session").over(run))
        .groupBy("user_id", "session_no")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("session_value"),
        )
    )


@_q(
    "e_session_window_native",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sno
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, sno
    """,
)
def e_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator in batch mode (the same
    stateful operator Structured Streaming uses, SURVEY §2.9): sessions
    merge while events are within the 30-minute gap; window.end is
    last-event + gap by definition. The oracle is the classic
    gaps-and-islands SQL — proving the native operator's semantics
    equal lag+running-sum islands."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.col("n_events"),
        )
    )


@_q(
    "e_gap_fill_ffill",
    """
    WITH bounds AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events WHERE user_id % 20 = 0 GROUP BY user_id
    ), days AS (
      SELECT user_id, CAST(d AS DATE) AS day
      FROM bounds, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS s(d)
    ), daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             {dsum} AS day_value
      FROM events WHERE user_id % 20 = 0 GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT days.user_id, strftime(days.day, '%Y-%m-%d') AS day,
           daily.day_value,
           LAST_VALUE(daily.day_value IGNORE NULLS) OVER (
             PARTITION BY days.user_id ORDER BY days.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           CASE WHEN daily.day_value IS NULL THEN 1 ELSE 0 END AS was_gap
    FROM days LEFT JOIN daily ON days.user_id = daily.user_id AND days.day = daily.day
    """.format(dsum=SQL_DSUM.format(expr="value")),
)
def e_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward fill: densify each user's daily
    series over its own [min, max] span (explode(sequence) — generated,
    not joined), left-join the real daily aggregates, and carry the
    last observation forward with last(ignorenulls) over an ordered
    frame. The standard resample→ffill primitive for feature pipelines;
    one shuffle on user_id, generation is linear in output rows."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(dsum(F.col("value")).alias("day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    days = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        days.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.when(F.col("day_value").isNull(), 1).otherwise(0).alias("was_gap"),
        )
    )


@_q(
    "e_watermark_split",
    """
    SELECT event_id, user_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    WHERE ts > (SELECT max(ts) - INTERVAL 1 DAY FROM events)
    """,
)
def e_watermark_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark incremental scan (SURVEY §2.9 incremental marker:
    `context.last_indexed > now-1d`, news_articles_ingest_queue_duplicates/
    main.py:29-33). The watermark is a scalar subquery ⇒ computed once,
    then pushed as a scan filter."""
    e = t(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("m")).select(
        (F.col("m") - F.expr("INTERVAL 1 DAY")).alias("wm")
    )
    return (
        e.join(F.broadcast(wm))
        .filter(F.col("ts") > F.col("wm"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )


@_q(
    "e_day_expand",
    """
    SELECT o_orderkey,
           strftime(CAST(d AS DATE), '%Y-%m-%d') AS day
    FROM orders, UNNEST(generate_series(o_orderdate, o_orderdate + INTERVAL 2 DAY,
                                        INTERVAL 1 DAY)) AS s(d)
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def e_day_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-range expansion (SURVEY §2.8 date: facebook delivery_start..stop
    → one row per day, facebook_compute_load_graph/main.py:138-147):
    explode(sequence(...)) — a generator, not a join, so it scales
    linearly with output rows."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    start = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.explode(F.sequence(start, F.date_add(start, 2))).alias("d"),
    ).select("o_orderkey", F.date_format("d", "yyyy-MM-dd").alias("day"))


@_q(
    "f_epoch_roundtrip",
    """
    SELECT event_id,
           strftime(to_timestamp(event_id * 3600 + 1000000000), '%Y-%m-%d %H:%M:%S') AS epoch_ts,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
    FROM events
    """,
)
def f_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch↔timestamp conversion both directions (SURVEY §2.8: reddit
    created_utc epoch→UTC; graph datetime assembly)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format(
            F.timestamp_seconds(F.col("event_id") * 3600 + 1000000000),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("epoch_ts"),
        F.unix_timestamp(F.col("ts")).alias("ts_epoch"),
    )


@_q("a_approx_distinct")  # sketch-based — engine HLLs differ, rows-only check
def a_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type (HyperLogLog++ with 1%
    target error) next to the exact count — the cardinality-sketch path
    for 100 TB scale where exact count-distinct shuffles too much.
    Sketches are engine-specific, so this is a rows-only check; the
    pytest gate bounds the relative error against the exact count."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@_q(
    "j_range_tier",
    f"""
    WITH tiers AS (
      SELECT * FROM (VALUES ('bronze', 0.0, 25.0), ('silver', 25.0, 50.0),
                            ('gold', 50.0, 75.0), ('platinum', 75.0, 1e9))
             AS t(tier, lo, hi)
    )
    SELECT t.tier, COUNT(*) AS n_events,
           {SQL_DSUM.format(expr='e.value')} AS tier_value
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
)
def j_range_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/band join: events matched to value tiers by interval
    containment. The tier table is tiny ⇒ broadcast; at scale with a
    large band table the engine-level rewrite is bucket-explode (like
    the suffix join): derive floor(value/step) keys on both sides and
    equi-join. Here the broadcast nested-loop over 4 rows is the right
    plan — the point is interval semantics, checked exactly."""
    e = t(spark, sf_dir, "events")
    tiers = e.sparkSession.createDataFrame(
        [("bronze", 0.0, 25.0), ("silver", 25.0, 50.0), ("gold", 50.0, 75.0),
         ("platinum", 75.0, 1e9)],
        ["tier", "lo", "hi"],
    )
    return (
        e.join(F.broadcast(tiers), (e.value >= tiers.lo) & (e.value < tiers.hi))
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("tier_value"))
    )


@_q(
    "f_scalar_repair",
    """
    SELECT o_orderkey,
           CASE WHEN zip_raw IS NULL OR zip_raw = '' THEN ''
                WHEN TRY_CAST(zip_raw AS BIGINT) = 0 THEN ''
                WHEN TRY_CAST(zip_raw AS BIGINT) IS NOT NULL THEN
                     CASE WHEN length(CAST(TRY_CAST(zip_raw AS BIGINT) AS VARCHAR)) >= 5
                          THEN CAST(TRY_CAST(zip_raw AS BIGINT) AS VARCHAR)
                          ELSE lpad(CAST(TRY_CAST(zip_raw AS BIGINT) AS VARCHAR), 5, '0') END
                ELSE CASE WHEN length(zip_raw) >= 5 THEN zip_raw
                          ELSE lpad(zip_raw, 5, '0') END END AS zip,
           TRY_CAST(regexp_replace(amount_raw, '[$, ]', '', 'g') AS DOUBLE) AS amount,
           strftime(COALESCE(strptime(date_raw, '%m/%d/%Y'), strptime(date_raw, '%d-%b-%y')),
                    '%Y-%m-%d') AS fixed_date
    FROM (
      SELECT o_orderkey,
             substr(CAST(o_orderkey AS VARCHAR), 1, 4) AS zip_raw,
             '$' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS amount_raw,
             strftime(o_orderdate, '%m/%d/%Y') AS date_raw
      FROM orders
    )
    """,
)
def f_scalar_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar repair battery with a real oracle: clean_zip + money parse +
    multi-format date fallback (SURVEY §2.8 — create_master_tables
    date/zip repair, house…contributions amount parse). Raw strings are
    synthesized from orders so both engines see identical inputs."""
    o = t(spark, sf_dir, "orders")
    raw = o.select(
        "o_orderkey",
        F.substring(F.col("o_orderkey").cast("string"), 1, 4).alias("zip_raw"),
        F.concat(
            F.lit("$"), F.col("o_totalprice").cast("decimal(18,2)").cast("string")
        ).alias("amount_raw"),
        F.date_format("o_orderdate", "MM/dd/yyyy").alias("date_raw"),
    )
    return raw.select(
        "o_orderkey",
        clean_zip(F.col("zip_raw")).alias("zip"),
        parse_amount(F.col("amount_raw")).alias("amount"),
        F.date_format(
            parse_date_multi(F.col("date_raw"), ["M/d/yyyy", "d-MMM-yy"]), "yyyy-MM-dd"
        ).alias("fixed_date"),
    )


@_q(
    "e_asof_latest_view",
    """
    SELECT c.event_id, c.user_id, v.event_id AS view_event_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def e_asof_latest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click is attributed to the user's latest view
    at-or-before it. The engine runs the union+window formulation
    (operators.joins.as_of_join) — one shuffle on user_id, linear in
    |clicks|+|views|, no time-range theta join; the oracle states the
    same semantics with DuckDB's native ASOF JOIN. gap is exact integer
    microseconds so no float drift can enter the hash."""
    from data_spark.operators.joins import as_of_join

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    joined = as_of_join(
        clicks, views, on="user_id", left_ts="ts", right_ts="ts", right_cols=["event_id"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_id_right").alias("view_event_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_right"))).alias("gap_us"),
    )


@_q(
    "e_range_frame_7d",
    f"""
    SELECT event_id, user_id,
           {'{0}'.format('CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)')} AS rolling_7d_value,
           COUNT(*) OVER w AS rolling_7d_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    """,
)
def e_range_frame_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per user, the rolling 7-day sum and
    count ending at each event — a frame defined by event-time distance,
    not row offsets (rows frames can't express it when activity is
    uneven). Decimal sum keeps the engines bit-identical."""
    e = t(spark, sf_dir, "events")
    # frame math in MICROseconds: casting ts to long truncates to seconds
    # and can flip membership for events within 1 s of the 7-day boundary
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("rolling_7d_value"),
        F.count(F.lit(1)).over(w).alias("rolling_7d_events"),
    )


@_q(
    "e_rollup_hierarchy",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_hour,
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket_day,
           event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM.format(expr='value')} AS total_value
    FROM events
    GROUP BY GROUPING SETS (
      (date_trunc('hour', ts), date_trunc('day', ts), event_type),
      (date_trunc('day', ts), event_type),
      (event_type)
    )
    """,
)
def e_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution continuous-aggregate rollup:
    hour, day, and all-time totals per event type out of ONE scan via
    GROUPING SETS — the batch shape of a TimescaleDB/Druid rollup
    hierarchy. Spark expands the sets with a single Expand + one
    aggregate exchange (map-side partials apply per set), so adding a
    resolution never adds a scan. Coarser rows carry NULL bucket keys,
    exactly as the SQL standard specifies."""
    e = t(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        e.select(
            hour.alias("bucket_hour"), day.alias("bucket_day"), "event_type", "value"
        )
        .groupingSets(
            [["bucket_hour", "bucket_day", "event_type"],
             ["bucket_day", "event_type"],
             ["event_type"]],
            "bucket_hour", "bucket_day", "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("total_value"))
    )


@_q(
    "e_funnel_3step",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
    UNION ALL SELECT 'view>click', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL SELECT 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM p
    """,
)
def e_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view → click → purchase): a user counts
    toward a stage only if the event happened STRICTLY AFTER their
    earliest previous-stage event — the canonical product-analytics
    funnel, which a naive per-type MIN cannot express.

    Scale: each stage is a type-pruned scan (predicate reaches the
    parquet reader) aggregated to one row per user, then an equi-join on
    user_id with the time condition as a residual filter; every shuffle
    is user-keyed and skinny, and stages shrink monotonically.
    """
    e = t(spark, sf_dir, "events")

    def first_after(event_type: str, prev: DataFrame | None, prev_ts: str, out_ts: str) -> DataFrame:
        s = e.filter(F.col("event_type") == event_type).select("user_id", "ts")
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts))
        return s.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    v = first_after("view", None, "", "t1")
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    counts = [
        v.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("view").alias("stage"), "n_users"),
        c.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("view>click").alias("stage"), "n_users"),
        p.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("view>click>purchase").alias("stage"), "n_users"),
    ]
    out = counts[0]
    for x in counts[1:]:
        out = out.unionByName(x)
    return out


@_q(
    "e_retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(a.day - f.cohort AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY f.cohort, a.day - f.cohort
    """,
)
def e_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort matrix: users grouped by first-seen day, counted
    on each later active day as an offset from their cohort day — the
    standard growth-analytics triangle.

    Scale: two user-keyed aggregations off one scan lineage (first-seen
    and distinct active days), one equi-join on user_id, then a skinny
    (cohort, offset) agg with map-side partials.
    """
    e = t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    activity = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@_q(
    "e_interval_merge",
    """
    WITH iv AS (
      SELECT user_id, event_id, ts AS s,
             ts + to_seconds(CAST(floor(value * 60) AS BIGINT)) AS e
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       >= s
                  THEN 0 ELSE 1 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           strftime(MIN(s), '%Y-%m-%d %H:%M:%S') AS start_ts,
           strftime(MAX(e), '%Y-%m-%d %H:%M:%S') AS end_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands
    GROUP BY user_id, CAST(island AS BIGINT)
    """,
)
def e_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merging: each event opens an interval
    [ts, ts + 60·value seconds]; overlapping/touching intervals per user
    coalesce into islands (running MAX over the 1-PRECEDING frame
    detects overlap, a conditional running SUM numbers the islands) and
    each island reports its span — the classic warehouse pattern for
    merging sessions/outages/coverage windows.

    Scale: both windows and the final agg share one user-keyed shuffle;
    the duration uses floor() before the cast because double→BIGINT
    rounds in DuckDB but truncates in Spark."""
    e = t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (
            F.col("ts")
            + F.make_interval(secs=F.floor(F.col("value") * 60).cast("bigint"))
        ).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(F.max("e").over(w_prev) >= F.col("s"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    # event_id tiebreak: rows tied on (s, e) must get the same island
    # number in both engines, so the running sum shares w_prev's total
    # order (ADVICE r2).
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "user_id", "s", "e",
        F.sum("new_island").over(w_run).cast("bigint").alias("island")
    )
    return islands.groupBy("user_id", "island").agg(
        F.date_format(F.min("s"), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format(F.max("e"), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


@_q(
    "e_pattern_seq",
    """
    WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_paths,
           strftime(MIN(p.ts), '%Y-%m-%d %H:%M:%S') AS first_conversion
    FROM v
    JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
    JOIN p ON p.user_id = v.user_id AND p.ts > c.ts
          AND p.ts <= v.ts + INTERVAL 1 DAY
    GROUP BY v.user_id
    """,
)
def e_pattern_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event pattern: strictly-ordered view→click→purchase
    sequences completing within one day, counted per user with the
    earliest conversion time — the MATCH_RECOGNIZE shape expressed as a
    user-keyed triple join. Scale posture: all three legs equi-join on
    user_id (ONE shuffle key), so per-user work is bounded by that
    user's event density inside the deadline window, never the stream
    length; the deadline predicate prunes the third leg before the
    aggregate. Timestamps compare at exact microseconds in both
    engines."""
    e = t(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    paths = (
        v.join(c, (F.col("c_uid") == F.col("user_id")) & (F.col("c_ts") > F.col("v_ts")))
        .join(
            p,
            (F.col("p_uid") == F.col("user_id"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 DAY")),
        )
    )
    return paths.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_paths"),
        ts_str(F.min("p_ts")).alias("first_conversion"),
    )


@_q(
    "e_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), trans AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
    FROM trans
    """,
)
def e_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event flows:
    each user's stream is ordered by (ts, event_id) — a total order, so
    the lag pairs are engine-independent — and transition counts
    normalize to row-stochastic probabilities per source state. One
    user-keyed window pass, one tiny (|types|²) aggregate; probability
    is exact-int / exact-int in double, rounded to 6 dp."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"), 6
        ).alias("p"),
    )


@_q(
    "e_asof_tolerance",
    """
    SELECT c.event_id, c.user_id, v.event_id AS view_event_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    WHERE epoch_us(c.ts) - epoch_us(v.ts) <= 86400000000
    """,
)
def e_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas merge_asof(tolerance=...)):
    a click only attributes to its latest prior view when that view is
    at most 24 hours stale — a best match older than the bound is NO
    match, and the click drops like any unmatched row. Same one-shuffle
    union+window plan as e_asof_latest_view with a post-carry staleness
    filter; the oracle states the identical semantics as DuckDB's
    native ASOF JOIN plus the gap bound (filtering the best match is
    exactly the tolerance rule — a nearer non-best match can't exist,
    or it would BE the best match)."""
    from data_spark.operators.joins import as_of_join

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    joined = as_of_join(
        clicks,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        tolerance_us=86_400_000_000,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_id_right").alias("view_event_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_right"))).alias("gap_us"),
    )
