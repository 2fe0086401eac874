"""Round-7 tier: rank statistics, skew diagnostics, and sequential
smoothing.

- ``a_spearman_rank``: Spearman rank correlation per group — the
  robust (monotone, outlier-insensitive) member of the correlation
  family next to ``a_corr_pearson``. Tie-averaged ranks are kept as
  DOUBLED integers (2·rank_min + ties − 1), so every sufficient
  statistic is an exact integer sum and the final rho is one identical
  double expression in both engines.
- ``dq_skew_profile``: the pre-shuffle skew diagnostic — for each
  high-cardinality join/agg key, row count, distinct keys, the heaviest
  key's frequency and share, and the Herfindahl concentration index
  (sum of squared frequency shares). This is the measurement that
  decides when a join needs salting (a_salted_skew_agg /
  j_salted_skew_join are the treatments; this is the diagnosis). At
  100 TB the profile costs one map-side-combinable groupBy per key —
  run it BEFORE committing to a shuffle strategy, not after the skewed
  stage straggles.
- ``e_holt_winters``: Holt double exponential smoothing (level +
  trend) over the per-type daily revenue series. The recurrence is
  inherently sequential per series, so the engine folds each series'
  ordered day array once (parallel ACROSS series, exact order WITHIN);
  the oracle replays the identical recurrence as a recursive CTE.
  Smoothing constants are binary fractions and both engines execute
  the same double expression tree in the same order, so outputs are
  bit-identical without rounding.

Scale posture: spearman shuffles once per group key for the two rank
windows (both partitioned — never a global window); the skew profile
is a union of per-key counted aggregates (map-side combine, output
rows = number of profiled keys); holt-winters state per series is two
doubles and the fold input is the per-series DAILY aggregate — a
calendar-bounded array, never the fact rows.

Reference parity: the reference computes pandas ``corr``/rolling
means in driver memory (news_analyze_*); these re-express the same
statistics as set-oriented plans with exact cross-engine contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.queries.common import run_scratch_dir, stage_era_files, t, table_rows

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
# Spearman rank correlation (tie-averaged, exact integer rank statistics)
# ---------------------------------------------------------------------------

_SPEARMAN_SQL = """
    WITH ranked AS (
      SELECT l_returnflag AS flag,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx2,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS ry2
      FROM lineitem
    ), stats AS (
      SELECT flag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(rx2 * rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM ranked GROUP BY 1
    )
    SELECT flag, CAST(n AS BIGINT) AS n_rows,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
                ELSE (n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
           END AS spearman_rho
    FROM stats ORDER BY flag
"""


@_q("a_spearman_rank", _SPEARMAN_SQL)
def a_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho per return flag between quantity and extended
    price. Tie handling uses average ranks, carried as the DOUBLED
    integer 2·rank_min + ties − 1 (rho is invariant under the linear
    rescale), so the sufficient statistics are exact DECIMAL integer
    sums; the closing Pearson-on-ranks expression runs on identical
    doubles in both engines. Two partitioned rank windows, one grouped
    aggregate — no global sort, no collect."""
    li = t(spark, sf_dir, "lineitem")
    rx = (
        2 * F.rank().over(Window.partitionBy("l_returnflag").orderBy("l_quantity"))
        + F.count(F.lit(1)).over(
            Window.partitionBy("l_returnflag", "l_quantity")
        )
        - 1
    )
    ry = (
        2
        * F.rank().over(
            Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        )
        + F.count(F.lit(1)).over(
            Window.partitionBy("l_returnflag", "l_extendedprice")
        )
        - 1
    )
    ranked = li.select(
        F.col("l_returnflag").alias("flag"), rx.alias("rx2"), ry.alias("ry2")
    )

    def d(c):
        return F.sum(c.cast("decimal(38,0)")).cast("double")

    stats = ranked.groupBy("flag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        d(F.col("rx2")).alias("sx"),
        d(F.col("ry2")).alias("sy"),
        d(F.col("rx2") * F.col("ry2")).alias("sxy"),
        d(F.col("rx2") * F.col("rx2")).alias("sxx"),
        d(F.col("ry2") * F.col("ry2")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    denom_sq = (n * sxx - sx * sx) * (n * syy - sy * sy)
    rho = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return stats.select(
        "flag",
        n.cast("bigint").alias("n_rows"),
        F.when(denom_sq == 0, F.lit(None).cast("double"))
        .otherwise(rho)
        .alias("spearman_rho"),
    ).orderBy("flag")


# ---------------------------------------------------------------------------
# Key-skew profile (the salting decision input)
# ---------------------------------------------------------------------------

# (label, table, key expression) — the join/agg keys whose distribution
# decides shuffle strategy downstream.
_SKEW_KEYS = [
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
    ("events.event_type", "events", "event_type"),
]

_SKEW_SQL = " UNION ALL ".join(
    f"""
    SELECT '{label}' AS key_name,
           CAST(SUM(f) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(f) AS BIGINT) AS max_freq,
           CAST(MAX(f) AS DOUBLE) / CAST(SUM(f) AS DOUBLE) AS top1_share,
           CAST(SUM(f * f) AS DOUBLE)
             / (CAST(SUM(f) AS DOUBLE) * CAST(SUM(f) AS DOUBLE)) AS hhi,
           CAST(MAX(f) AS DOUBLE)
             / (CAST(SUM(f) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS skew_factor
    FROM (SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS f
          FROM {table} WHERE {key} IS NOT NULL GROUP BY {key})
    """
    for label, table, key in _SKEW_KEYS
)


@_q("dq_skew_profile", f"SELECT * FROM ({_SKEW_SQL}) ORDER BY key_name")
def dq_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profile of the hot join/agg keys: rows, distinct
    keys, heaviest key's frequency and share, Herfindahl concentration
    (Σ share² — 1/n_keys when uniform, →1 when one key dominates), and
    skew_factor = max_freq / mean_freq (the straggler multiplier a
    hash-shuffle on this key would suffer). Each profile is one
    map-side-combinable count per key then a 5-row summary — the cheap
    measurement that justifies (or rules out) salting BEFORE the
    expensive shuffle, which is exactly how you pick join strategy at
    100 TB. All ratios divide identical exact integers, so the doubles
    hash-match cross-engine."""
    frames = []
    for label, table, key in _SKEW_KEYS:
        f = (
            t(spark, sf_dir, table)
            .filter(F.col(key).isNotNull())
            .groupBy(key)
            .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("f"))
        )
        n_rows = F.sum("f").cast("double")
        n_keys = F.count(F.lit(1)).cast("double")
        max_f = F.max("f").cast("double")
        frames.append(
            f.agg(
                F.lit(label).alias("key_name"),
                F.sum("f").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.max("f").cast("bigint").alias("max_freq"),
                (max_f / n_rows).alias("top1_share"),
                (
                    F.sum(F.col("f") * F.col("f")).cast("double")
                    / (n_rows * n_rows)
                ).alias("hhi"),
                (max_f / (n_rows / n_keys)).alias("skew_factor"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("key_name")


# ---------------------------------------------------------------------------
# Holt double exponential smoothing (level + trend), per-series fold
# ---------------------------------------------------------------------------

# Binary-fraction smoothing constants (exactly representable doubles).
_HW_ALPHA = 0.5
_HW_BETA = 0.25

_HW_SQL = """
    WITH RECURSIVE daily AS (
      SELECT event_type,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY CAST(ts AS DATE)) AS i
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), hw AS (
      SELECT event_type, day, i, v,
             v AS level, CAST(0 AS DOUBLE) AS trend
      FROM daily WHERE i = 1
      UNION ALL
      SELECT d.event_type, d.day, d.i, d.v,
             0.5 * d.v + 0.5 * (hw.level + hw.trend),
             0.25 * ((0.5 * d.v + 0.5 * (hw.level + hw.trend)) - hw.level)
               + 0.75 * hw.trend
      FROM hw JOIN daily d
        ON d.event_type = hw.event_type AND d.i = hw.i + 1
    )
    SELECT event_type, day, v, level, trend FROM hw
    ORDER BY event_type, day
"""


@_q("e_holt_winters", _HW_SQL)
def e_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear smoothing over per-type daily revenue:
    level_i = α·v_i + (1−α)(level + trend),
    trend_i = β(level_i − level) + (1−β)·trend, seeded (v_1, 0).
    The recurrence is sequential per series, so each series' ordered
    day array is folded ONCE with ``aggregate`` (state: level, trend;
    output rows re-exploded) — series run in parallel, the fold is
    exact order within. The array is the per-series DAILY aggregate —
    calendar-bounded, never fact-sized. The oracle replays the same
    recurrence as a recursive CTE; both engines evaluate the identical
    double expression tree in the identical order, so no rounding is
    needed."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("v"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "v"))).alias("s")
    )
    a, b = F.lit(_HW_ALPHA), F.lit(_HW_BETA)

    # fold state: (level, trend, rows seen so far)
    init = F.struct(
        F.element_at("s", 1)["v"].alias("level"),
        F.lit(0.0).alias("trend"),
        F.array(
            F.struct(
                F.element_at("s", 1)["day"].alias("day"),
                F.element_at("s", 1)["v"].alias("v"),
                F.element_at("s", 1)["v"].alias("level"),
                F.lit(0.0).alias("trend"),
            )
        ).alias("out"),
    )

    def step(acc, x):
        lvl = a * x["v"] + (F.lit(1.0) - a) * (acc["level"] + acc["trend"])
        tr = b * (lvl - acc["level"]) + (F.lit(1.0) - b) * acc["trend"]
        return F.struct(
            lvl.alias("level"),
            tr.alias("trend"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["day"].alias("day"),
                        x["v"].alias("v"),
                        lvl.alias("level"),
                        tr.alias("trend"),
                    )
                ),
            ).alias("out"),
        )

    folded = series.select(
        "event_type",
        F.aggregate(
            F.slice("s", 2, F.greatest(F.size("s") - 1, F.lit(0))),
            init,
            step,
            lambda acc: acc["out"],
        ).alias("out"),
    )
    return (
        folded.select("event_type", F.explode("out").alias("o"))
        .select(
            "event_type",
            F.col("o.day").alias("day"),
            F.col("o.v").alias("v"),
            F.col("o.level").alias("level"),
            F.col("o.trend").alias("trend"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Lakehouse row-level DELETE: key tombstones, merge-on-read, physical purge
# ---------------------------------------------------------------------------

_TOMB_FINAL_SQL = """
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey NOT IN (
        SELECT o_orderkey FROM orders
        WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderstatus = 'F' AND o_orderkey % 22 = 0
"""

_TOMB_AGG_SQL = """
      SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM final GROUP BY 1
"""


@_q(
    "m_tombstone_delete",
    f"""
    WITH final AS ({_TOMB_FINAL_SQL})
    SELECT 'mor' AS phase, * FROM ({_TOMB_AGG_SQL})
    UNION ALL
    SELECT 'purged' AS phase, * FROM ({_TOMB_AGG_SQL})
    ORDER BY phase, status
    """,
)
def m_tombstone_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE on the versioned store, gate-verified end to
    end: commit v0+v1 load the orders facts, v2 tombstones every even
    'F' order (O(tombstone), zero rewrite), v3 re-APPENDS a subset of
    the deleted keys — new facts that must SURVIVE because a tombstone
    covers only the commits that existed when the delete ran. The
    output is the per-status census read twice: once merge-on-read
    (anti-join at scan) and once after ``purge_deletes`` physically
    rewrote the covered commits — the two phases must agree exactly,
    which is the whole purge contract (layout change, never a data
    change). Oracle replays the delete algebra relationally.

    Scale posture: the delete writes only its keys; merge-on-read adds
    one broadcast-sized anti-join per tombstone generation; the purge
    rewrites only covered commits. No path is O(table) except the purge
    the operator explicitly schedules."""
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from data_spark.io import (  # noqa: PLC0415
        delete_versioned,
        purge_deletes,
        read_versioned,
        write_versioned,
    )

    base = run_scratch_dir("tomb", sf_dir)

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_versioned(o.filter(F.col("o_orderkey") % 7 < 5), base, "overwrite")
    write_versioned(o.filter(F.col("o_orderkey") % 7 >= 5), base, "append")
    delete_versioned(
        o.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
        .select("o_orderkey"),
        base,
    )
    write_versioned(
        o.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 22 == 0)),
        base,
        "append",
    )

    def census(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy(F.col("o_orderstatus").alias("status")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total"),
        ).select(F.lit(phase).alias("phase"), "status", "n", "total")

    mor = census(read_versioned(spark, base), "mor")
    purge_deletes(spark, base)
    purged = census(read_versioned(spark, base), "purged")
    return mor.unionByName(purged).orderBy("phase", "status")


# ---------------------------------------------------------------------------
# DSIR-style data selection: hashed-unigram importance resampling
# ---------------------------------------------------------------------------

# Hashed feature space (fixed — no vocabulary shuffle at any corpus
# size) and selection budget.
_DSIR_B = 256
_DSIR_K = 50

_DSIR_SQL = rf"""
    WITH toks AS (
      SELECT doc_id, lang,
             str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')), '\s+') AS words
      FROM documents
    ), tok AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(words[i]), 1, 15)) AS BIGINT) % {_DSIR_B} AS b
      FROM toks, UNNEST(range(1, len(words) + 1)) AS r(i)
      WHERE words[i] <> ''
    ), raw AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS r FROM tok GROUP BY 1
    ), tgt AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS tc FROM tok WHERE lang = 'en' GROUP BY 1
    ), tots AS (
      SELECT (SELECT SUM(r) FROM raw) AS rn, (SELECT COALESCE(SUM(tc), 0) FROM tgt) AS tn
    ), w AS (
      SELECT raw.b,
             CAST(ROUND(ln(
               (CAST(COALESCE(tgt.tc, 0) + 1 AS DOUBLE) * CAST(tots.rn + {_DSIR_B} AS DOUBLE))
               / (CAST(raw.r + 1 AS DOUBLE) * CAST(tots.tn + {_DSIR_B} AS DOUBLE))
             ), 6) AS DECIMAL(20,6)) AS w6
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots
    ), doc_feat AS (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
    ), scored AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(c AS DECIMAL(18,0)) * w.w6) AS DOUBLE) AS score
      FROM doc_feat JOIN w ON doc_feat.b = w.b GROUP BY 1
    )
    SELECT doc_id, n_tokens, score FROM scored
    ORDER BY score DESC, doc_id LIMIT {_DSIR_K}
"""


@_q("d_dsir_select", _DSIR_SQL)
def d_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, public): score every
    candidate document by the hashed-unigram importance log-ratio
    log p_target − log p_raw (target = the 'en' slice, +1-smoothed,
    256 fixed buckets) and keep the top 50. Per-bucket weights are
    6-dp-snapped and carried as exact DECIMALs, so each document score
    is an exact decimal dot product — the only float op is one ln per
    bucket over identical integer-derived doubles.

    Plan shape: tokenize → bucket-hash → two map-side-combinable counts
    (raw / target) → a 256-row broadcast weight table → one grouped
    decimal dot product per doc → TakeOrderedAndProject. The feature
    space never grows with the corpus, the weight join is broadcast,
    and no vocabulary dictionary is ever shuffled — the selection pass
    a 100 TB pretraining pipeline actually runs."""
    from data_spark.operators.dedup import _words  # noqa: PLC0415
    from data_spark.plans.lineage import truncate_lineage  # noqa: PLC0415

    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", _words(F.col("text")).alias("words"))
    # materialized once: three aggregates consume it (raw counts, target
    # counts, per-doc features) — without this the corpus re-tokenizes
    # per consumer, the exact repeated-pipeline shape the ranking tier
    # had to fix
    tok = (
        toks.select("doc_id", "lang", F.explode("words").alias("term"))
        .filter(F.col("term") != "")
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("bigint")
                % _DSIR_B
            ).alias("b"),
        )
        .transform(truncate_lineage)
    )
    raw = tok.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    tgt = (
        tok.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tc"))
    )
    tots = raw.agg(F.sum("r").alias("rn")).crossJoin(
        F.broadcast(
            tgt.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("tn"))
        )
    )
    w = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double")
                        * (F.col("rn") + _DSIR_B).cast("double")
                    )
                    / (
                        (F.col("r") + 1).cast("double")
                        * (F.col("tn") + _DSIR_B).cast("double")
                    )
                ),
                6,
            )
            .cast("decimal(20,6)")
            .alias("w6"),
        )
    )
    doc_feat = tok.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    scored = (
        doc_feat.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c").cast("decimal(18,0)") * F.col("w6"))
            .cast("double")
            .alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(_DSIR_K).select(
        "doc_id", "n_tokens", "score"
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset (diversity selection over embeddings)
# ---------------------------------------------------------------------------

_KC_K = 5


def _kcenter_oracle_sql(k: int) -> str:
    """Unrolled Gonzalez greedy: step i picks the candidate with the
    smallest snapped max-cosine to the chosen set (id tiebreak), same
    e6 round-half grid as the engine side."""
    snap = (
        "CAST(FLOOR(list_cosine_similarity(x.embedding, ce.embedding)"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    parts = [
        "e AS (SELECT vec_id, embedding FROM embeddings)",
        "s1 AS (SELECT MIN(vec_id) AS vid FROM e)",
    ]
    for i in range(2, k + 1):
        prev = f"s{i - 1}"
        parts.append(
            f"""m{i} AS (
      SELECT x.vec_id, MAX({snap}) AS ms
      FROM e x CROSS JOIN {prev} s JOIN e ce ON ce.vec_id = s.vid
      WHERE x.vec_id NOT IN (SELECT vid FROM {prev})
      GROUP BY 1
    )"""
        )
        parts.append(f"p{i} AS (SELECT vec_id AS vid FROM m{i} ORDER BY ms, vec_id LIMIT 1)")
        parts.append(f"s{i} AS (SELECT vid FROM {prev} UNION ALL SELECT vid FROM p{i})")
    finals = ["SELECT vid AS vec_id, 1 AS sel_order FROM s1"] + [
        f"SELECT vid AS vec_id, {i} AS sel_order FROM p{i}" for i in range(2, k + 1)
    ]
    return (
        "WITH " + ",\n    ".join(parts) + "\n    "
        + " UNION ALL ".join(finals)
        + " ORDER BY sel_order"
    )


@_q("v_kcenter_coreset", _kcenter_oracle_sql(_KC_K))
def v_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity coreset over the embedding corpus: greedy k-center
    farthest-point selection (operators/similarity.kcenter_select),
    k=5, cosine geometry, every decision on the e6 snap grid so the
    oracle's independent cosine picks identical centers. Per round one
    broadcast-join corpus scan — O(n·k) similarity evaluations and a
    k-vector driver state, the shape that still works when n is 10^9
    (contrast: facility-location methods that materialize candidate
    pair matrices)."""
    from data_spark.operators.similarity import kcenter_select  # noqa: PLC0415

    return kcenter_select(t(spark, sf_dir, "embeddings"), k=_KC_K)


# ---------------------------------------------------------------------------
# Cramér's V — the effect-size scalar on top of the chi² cell report
# ---------------------------------------------------------------------------

_CHI2_CELLS_SQL = """
    obs AS (
      SELECT event_type, CAST(EXTRACT(HOUR FROM ts) // 6 AS BIGINT) AS hour_band,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, EXTRACT(HOUR FROM ts) // 6
    ), tot AS (
      SELECT obs.*,
             SUM(n) OVER (PARTITION BY event_type) AS row_n,
             SUM(n) OVER (PARTITION BY hour_band) AS col_n,
             SUM(n) OVER () AS all_n
      FROM obs
    ), cells AS (
      SELECT event_type, hour_band, n, all_n,
             ROUND((CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(all_n AS DOUBLE))
                   * (CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(all_n AS DOUBLE))
                   / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(all_n AS DOUBLE)), 6) AS chi2_contrib
      FROM tot
    )
"""


@_q(
    "a_cramers_v",
    f"""
    WITH {_CHI2_CELLS_SQL}
    SELECT CAST(MAX(all_n) AS BIGINT) AS n_obs,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows_dim,
           CAST(COUNT(DISTINCT hour_band) AS BIGINT) AS n_cols_dim,
           CAST(SUM(CAST(chi2_contrib AS DECIMAL(38,6))) AS DOUBLE) AS chi2,
           sqrt(CAST(SUM(CAST(chi2_contrib AS DECIMAL(38,6))) AS DOUBLE)
                / (CAST(MAX(all_n) AS DOUBLE)
                   * CAST(LEAST(COUNT(DISTINCT event_type) - 1,
                                COUNT(DISTINCT hour_band) - 1) AS DOUBLE))) AS cramers_v
    FROM cells
    """,
)
def a_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for event_type × 6-hour band — the normalized
    effect-size scalar on top of a_chi2_cells' cell report (V =
    sqrt(χ² / (n·min(r−1, c−1))), 0 = independent, 1 = determined).
    A cross-cell double SUM is order-dependent, so the per-cell
    contributions are 6-dp-snapped first and summed as exact DECIMALs —
    the same trick the perplexity tier uses — making the total (and
    therefore V) engine-identical. Costs one count shuffle; everything
    after runs on the tiny cell table."""
    e = t(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", (F.hour("ts") / 6).cast("bigint").alias("hour_band")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = obs.select(
        "*",
        F.sum("n").over(Window.partitionBy("event_type")).alias("row_n"),
        F.sum("n").over(Window.partitionBy("hour_band")).alias("col_n"),
        F.sum("n").over(Window.partitionBy()).alias("all_n"),
    )
    exp = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("all_n").cast("double")
    )
    cells = tot.select(
        "event_type",
        "hour_band",
        "all_n",
        F.round(
            (F.col("n").cast("double") - exp) * (F.col("n").cast("double") - exp) / exp,
            6,
        ).alias("chi2_contrib"),
    )
    chi2 = F.sum(F.col("chi2_contrib").cast("decimal(38,6)")).cast("double")
    dof = F.least(
        F.countDistinct("event_type") - 1, F.countDistinct("hour_band") - 1
    ).cast("double")
    return cells.agg(
        F.max("all_n").cast("bigint").alias("n_obs"),
        F.countDistinct("event_type").cast("bigint").alias("n_rows_dim"),
        F.countDistinct("hour_band").cast("bigint").alias("n_cols_dim"),
        chi2.alias("chi2"),
        F.sqrt(chi2 / (F.max("all_n").cast("double") * dof)).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation evaluation: recall@k of prefix-dim retrieval
# ---------------------------------------------------------------------------

_MRL_K = 10
_MRL_DIMS = 16


@_q(
    "v_matryoshka_eval",
    f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 10
    ), full_rank AS (
      SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
        CAST(FLOOR(list_cosine_similarity(qv, cv) * 1000000.0 + 0.5) AS BIGINT) DESC, cid) AS rnk
      FROM q, c
    ), trunc_rank AS (
      SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
        CAST(FLOOR(list_cosine_similarity(qv[1:{_MRL_DIMS}], cv[1:{_MRL_DIMS}]) * 1000000.0 + 0.5) AS BIGINT) DESC, cid) AS rnk
      FROM q, c
    )
    SELECT f.qid, CAST(COUNT(tr.cid) AS BIGINT) AS n_overlap,
           CAST(COUNT(tr.cid) AS DOUBLE) / {_MRL_K}.0 AS recall_at_k
    FROM full_rank f LEFT JOIN trunc_rank tr
      ON tr.qid = f.qid AND tr.cid = f.cid AND tr.rnk <= {_MRL_K}
    WHERE f.rnk <= {_MRL_K}
    GROUP BY f.qid ORDER BY f.qid
    """,
)
def v_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation evaluation: how much of the exact
    cosine top-10 survives when retrieval uses only the first 16 of 64
    dimensions — recall@k per query, the measurement that decides
    whether a prefix-truncated index (4x cheaper memory and compute)
    is good enough as a first stage. Both rankings take every ordering
    decision on e6-snapped similarities with id tiebreaks, so the two
    independent cosine implementations agree exactly. Two broadcast-
    join corpus scans, two partitioned top-k windows, one overlap
    join — O(n) per query set at any corpus size."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    from data_spark.operators.similarity import cosine_similarity  # noqa: PLC0415

    def snap(col):
        return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")

    pairs = c.join(F.broadcast(q)).select(
        "qid",
        "cid",
        snap(cosine_similarity(F.col("qv"), F.col("cv"))).alias("s_full"),
        snap(
            cosine_similarity(
                F.slice(F.col("qv"), 1, _MRL_DIMS), F.slice(F.col("cv"), 1, _MRL_DIMS)
            )
        ).alias("s_trunc"),
    )
    w_full = Window.partitionBy("qid").orderBy(F.desc("s_full"), F.asc("cid"))
    w_trunc = Window.partitionBy("qid").orderBy(F.desc("s_trunc"), F.asc("cid"))
    ranked = pairs.select(
        "qid",
        "cid",
        F.row_number().over(w_full).alias("r_full"),
        F.row_number().over(w_trunc).alias("r_trunc"),
    )
    return (
        ranked.filter(F.col("r_full") <= _MRL_K)
        .groupBy("qid")
        .agg(
            F.sum(
                F.when(F.col("r_trunc") <= _MRL_K, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_overlap"),
        )
        .select(
            "qid",
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.lit(float(_MRL_K))).alias(
                "recall_at_k"
            ),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Streaming CDC apply into the versioned store (tombstone LWW, e2e)
# ---------------------------------------------------------------------------


@_q(
    "pipe_stream_cdc_e2e",
    """
    WITH log AS (
      SELECT o_custkey AS key, o_totalprice AS payload,
             CASE WHEN o_orderkey % 11 = 0 THEN 'D'
                  WHEN o_orderkey % 2 = 0 THEN 'U' ELSE 'I' END AS op,
             o_orderdate AS seq_ts, o_orderkey AS seq_id
      FROM orders
    ), latest AS (
      SELECT key, payload, op,
             ROW_NUMBER() OVER (PARTITION BY key
                                ORDER BY seq_ts DESC, seq_id DESC) AS rk
      FROM log
    )
    SELECT key, payload AS final_price, op AS last_op
    FROM latest WHERE rk = 1 AND op <> 'D'
    ORDER BY key
    """,
)
def pipe_stream_cdc_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC gate-verified END TO END: the m_cdc_apply
    changelog is split into three files by o_orderdate era (mtimes
    forced ascending so the file stream replays them in event order),
    streamed one file per micro-batch through
    streaming.jobs.cdc_stream_sink — per batch: newest-event-per-key
    reduce, tombstone the touched keys, append the survivors as a
    versioned commit — and the FINAL merge-on-read state must equal
    the oracle's one-shot last-writer-wins over the whole log. Because
    every batch boundary is a table version, the same run leaves a
    full time-travel audit trail (pinned in test_streaming).

    The per-key arrival-order contract holds here by construction
    (later eras hold strictly newer seq_ts), which is exactly the
    Kafka/Debezium per-key ordering a production CDC feed provides."""
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from data_spark.io import read_versioned  # noqa: PLC0415
    from data_spark.streaming.jobs import (  # noqa: PLC0415
        cdc_stream_sink,
        stream_state_scope,
    )

    work = run_scratch_dir("scdc", sf_dir)
    src = os.path.join(work, "src")
    table = os.path.join(work, "table")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    o = t(spark, sf_dir, "orders")
    log = o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_totalprice").alias("payload"),
        F.when(F.col("o_orderkey") % 11 == 0, "D")
        .when(F.col("o_orderkey") % 2 == 0, "U")
        .otherwise("I")
        .alias("op"),
        F.col("o_orderdate").alias("seq_ts"),
        F.col("o_orderkey").alias("seq_id"),
    )
    eras = [
        ("1000-01-01", "1994-07-01"),
        ("1994-07-01", "1996-07-01"),
        ("1996-07-01", "3000-01-01"),
    ]
    # ONE partitioned write stages all three era files (one scan of the
    # log instead of one filtered scan per era — guide §1.2/§2.4)
    stage_era_files(log, "seq_ts", eras, src, os.path.join(work, "stage"))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # fold shuffles sized to the stream volume (footer count), not the
    # session constant — see stream_state_scope
    with stream_state_scope(spark, table_rows(spark, sf_dir, "orders")):
        q = cdc_stream_sink(stream, table, ckpt, keys=["key"])
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("pipe_stream_cdc_e2e: stream did not drain within 300s")

    return (
        read_versioned(spark, table)
        .select(
            "key",
            F.col("payload").alias("final_price"),
            F.col("op").alias("last_op"),
        )
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# Burst detection: 2-state Kleinberg automaton, integer Viterbi
# ---------------------------------------------------------------------------

# Transition penalty for entering the burst state, in the same 1e-6
# integer cost units as the snapped emission costs.
_BURST_GAMMA6 = 2_000_000

_BURST_SQL = f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), stats AS (
      SELECT event_type,
             CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lam0
      FROM daily GROUP BY 1
    ), costs AS (
      SELECT d.event_type, d.day, d.n,
             ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day) AS i,
             CAST(FLOOR((s.lam0 - CAST(d.n AS DOUBLE) * ln(s.lam0))
                        * 1000000.0 + 0.5) AS BIGINT) AS c0,
             CAST(FLOOR((2.0 * s.lam0 - CAST(d.n AS DOUBLE) * ln(2.0 * s.lam0))
                        * 1000000.0 + 0.5) AS BIGINT) AS c1
      FROM daily d JOIN stats s USING (event_type)
    ), dp AS (
      SELECT event_type, i, c0 AS f0, {_BURST_GAMMA6} + c1 AS f1,
             '0' AS p0, '1' AS p1
      FROM costs WHERE i = 1
      UNION ALL
      SELECT c.event_type, c.i,
             LEAST(dp.f0, dp.f1) + c.c0,
             LEAST(dp.f0 + {_BURST_GAMMA6}, dp.f1) + c.c1,
             (CASE WHEN dp.f0 <= dp.f1 THEN dp.p0 ELSE dp.p1 END) || '0',
             (CASE WHEN dp.f0 + {_BURST_GAMMA6} <= dp.f1 THEN dp.p0 ELSE dp.p1 END) || '1'
      FROM dp JOIN costs c ON c.event_type = dp.event_type AND c.i = dp.i + 1
    ), fin AS (
      SELECT dp.event_type,
             CASE WHEN dp.f0 <= dp.f1 THEN dp.p0 ELSE dp.p1 END AS path
      FROM dp JOIN (SELECT event_type, MAX(i) AS mi FROM costs GROUP BY 1) last
        ON dp.event_type = last.event_type AND dp.i = last.mi
    )
    SELECT c.event_type, c.day, c.n,
           CAST(substring(f.path, CAST(c.i AS INT), 1) AS BIGINT) AS burst
    FROM costs c JOIN fin f ON c.event_type = f.event_type
    ORDER BY c.event_type, c.day
"""


@_q("e_burst_detect", _BURST_SQL)
def e_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style burst detection over the per-type daily count
    series: a 2-state automaton (base rate λ0 = series mean, burst rate
    2λ0) with Poisson emission costs and a fixed cost to ENTER the
    burst state, solved exactly by Viterbi. Both engines run the DP on
    INTEGER costs — emissions are e6-snapped (λs − n·ln λs, the n!
    term cancels), the transition penalty is an integer constant — so
    every min() decision is exact integer arithmetic and the decoded
    state path is engine-identical by construction (ties break toward
    the base state).

    The recurrence is sequential per series: the engine folds each
    series' ordered day array once carrying (cost0, cost1, path0,
    path1) — parallel across series, O(days) state per series; the
    oracle replays it as a recursive CTE. This is e_cusum_changepoint's
    principled cousin: bursts get an explicit duration prior instead of
    a drift threshold."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    stats = daily.groupBy("event_type").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1)).cast("double")).alias("lam0")
    )

    def snap(col):
        return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")

    lam0 = F.col("lam0")
    n_d = F.col("n").cast("double")
    costs = daily.join(stats, "event_type").select(
        "event_type",
        "day",
        "n",
        snap(lam0 - n_d * F.log(lam0)).alias("c0"),
        snap(F.lit(2.0) * lam0 - n_d * F.log(F.lit(2.0) * lam0)).alias("c1"),
    )
    series = costs.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "n", "c0", "c1"))).alias("s")
    )
    g = F.lit(_BURST_GAMMA6).cast("bigint")
    head = F.element_at("s", 1)
    init = F.struct(
        head["c0"].alias("f0"),
        (g + head["c1"]).alias("f1"),
        F.lit("0").alias("p0"),
        F.lit("1").alias("p1"),
    )

    def step(acc, x):
        return F.struct(
            (F.least(acc["f0"], acc["f1"]) + x["c0"]).alias("f0"),
            (F.least(acc["f0"] + g, acc["f1"]) + x["c1"]).alias("f1"),
            F.concat(
                F.when(acc["f0"] <= acc["f1"], acc["p0"]).otherwise(acc["p1"]),
                F.lit("0"),
            ).alias("p0"),
            F.concat(
                F.when(acc["f0"] + g <= acc["f1"], acc["p0"]).otherwise(acc["p1"]),
                F.lit("1"),
            ).alias("p1"),
        )

    decoded = series.select(
        "event_type",
        "s",
        F.aggregate(
            F.slice("s", 2, F.greatest(F.size("s") - 1, F.lit(0))),
            init,
            step,
            lambda acc: F.when(acc["f0"] <= acc["f1"], acc["p0"]).otherwise(
                acc["p1"]
            ),
        ).alias("path"),
    )
    return (
        decoded.select(
            "event_type",
            F.posexplode("s").alias("pos", "x"),
            F.col("path"),
        )
        .select(
            "event_type",
            F.col("x.day").alias("day"),
            F.col("x.n").alias("n"),
            F.substring(F.col("path"), F.col("pos") + 1, 1)
            .cast("bigint")
            .alias("burst"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (user retention curves with right-censoring)
# ---------------------------------------------------------------------------

# Observation window (days): a user converting within H days of first
# activity is an EVENT at its conversion lag; a user not converting by
# H is right-censored at H (still at risk until then, no event).
_KM_WINDOW_DAYS = 3

_KM_SQL = f"""
    WITH spans AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS first_d,
             MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
               AS conv_d
      FROM events GROUP BY 1
    ), subjects AS (
      SELECT strftime(first_d, '%Y-%m') AS cohort,
             CASE WHEN conv_d IS NOT NULL
                       AND date_diff('day', first_d, conv_d) <= {_KM_WINDOW_DAYS}
                  THEN CAST(date_diff('day', first_d, conv_d) AS BIGINT)
                  ELSE CAST({_KM_WINDOW_DAYS} AS BIGINT) END AS t,
             CASE WHEN conv_d IS NOT NULL
                       AND date_diff('day', first_d, conv_d) <= {_KM_WINDOW_DAYS}
                  THEN 1 ELSE 0 END AS churned
      FROM spans
    ), cohort_n AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n0 FROM subjects GROUP BY 1
    ), times AS (
      SELECT cohort, t,
             CAST(SUM(churned) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM subjects GROUP BY 1, 2
    ), risk AS (
      SELECT times.cohort, times.t, times.d,
             CAST(cohort_n.n0
               - COALESCE(SUM(times.leaving) OVER (PARTITION BY times.cohort
                   ORDER BY times.t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
      FROM times JOIN cohort_n USING (cohort)
    ), factors AS (
      SELECT cohort, t, d, n_risk,
             CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 6)
                  AS DECIMAL(20,6)) AS lf6
      FROM risk WHERE d > 0 AND d < n_risk
    )
    SELECT cohort, t, d, n_risk,
           exp(CAST(SUM(lf6) OVER (PARTITION BY cohort ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE))
           AS survival
    FROM factors ORDER BY cohort, t
"""


@_q("e_kaplan_meier", _KM_SQL)
def e_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion curves per signup cohort: each
    user's event is their first purchase within the observation window
    (lag in days from first activity); users not converting by the
    window bound are right-censored there — they stay in the risk set
    until the bound without counting as conversions (dropping them
    instead biases the curve, the classic funnel-analysis mistake).
    S(t) is the product of (1 − d/n_risk) over event times, carried as
    e6-snapped log factors summed EXACTLY as decimals inside a
    cohort-partitioned cumulative window, then exponentiated once —
    the same decimal-log-product contract as the perplexity tier, so
    both engines emit identical doubles.

    Plan shape: one user-grain aggregate, a per-(cohort,t) count, and
    one cohort-partitioned cumulative window — no global sort, no
    collect; cardinality is bounded by cohorts x window days, never by
    events."""
    from data_spark.plans.lineage import truncate_lineage  # noqa: PLC0415

    ev = t(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("conv_d"),
    )
    lag = F.datediff("conv_d", "first_d")
    converted = F.col("conv_d").isNotNull() & (lag <= _KM_WINDOW_DAYS)
    # materialized: cohort_n and times both consume it — without this
    # the user-grain aggregate (the only fact-sized shuffle) runs twice
    subjects = spans.select(
        F.date_format("first_d", "yyyy-MM").alias("cohort"),
        F.when(converted, lag.cast("bigint"))
        .otherwise(F.lit(_KM_WINDOW_DAYS).cast("bigint"))
        .alias("t"),
        F.when(converted, 1).otherwise(0).alias("churned"),
    ).transform(truncate_lineage)
    cohort_n = subjects.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n0")
    )
    times = subjects.groupBy("cohort", "t").agg(
        F.sum("churned").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    w_prev = (
        Window.partitionBy("cohort")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = times.join(cohort_n, "cohort").select(
        "cohort",
        "t",
        "d",
        (
            F.col("n0")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    factors = risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk"))).select(
        "cohort",
        "t",
        "d",
        "n_risk",
        F.round(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double")),
            6,
        )
        .cast("decimal(20,6)")
        .alias("lf6"),
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return factors.select(
        "cohort",
        "t",
        "d",
        "n_risk",
        F.exp(F.sum("lf6").over(w_cum).cast("double")).alias("survival"),
    ).orderBy("cohort", "t")


# ---------------------------------------------------------------------------
# Landmark closeness centrality (multi-source BFS, exact integer harmonic)
# ---------------------------------------------------------------------------

_LM_SEEDS = ("s1", "s2", "s3", "s4")
_LM_MAX_DEPTH = 4

_LM_SQL = f"""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), sym AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), walk(lm, node, dist) AS (
      SELECT s, s, 0 FROM (VALUES {", ".join(f"('{s}')" for s in _LM_SEEDS)}) t(s)
      UNION
      SELECT w.lm, e.dst, w.dist + 1
      FROM walk w JOIN sym e ON e.src = w.node
      WHERE w.dist < {_LM_MAX_DEPTH}
    ), best AS (
      SELECT lm, node, MIN(dist) AS d FROM walk GROUP BY 1, 2
    )
    SELECT node,
           CAST(COUNT(*) AS BIGINT) AS reached,
           CAST(SUM(12 // d) AS BIGINT) AS harmonic12
    FROM best WHERE d > 0
    GROUP BY node ORDER BY node
"""


@_q("g_landmark_closeness", _LM_SQL)
def g_landmark_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark (pivot) closeness centrality: BFS from a fixed 4-seed
    landmark set over the undirected supplier-customer graph (depth
    <= 4), then per node the count of landmarks reached and the
    harmonic closeness Σ 1/d — carried in EXACT twelfths (12 is the
    LCM of the possible depths 1..4, so 12//d is an integer and the
    sum never touches a float). Landmark methods are how closeness is
    estimated at billion-node scale — full APSP is quadratic; k
    landmarks cost k BFS sweeps.

    Spark side: ONE multi-source frontier carrying (landmark, node) —
    the k sweeps share every edge join rather than running k times;
    per level one src-keyed join + distinct + anti-join against the
    visited set, lineage truncated per level (the g_bfs_levels
    discipline, generalized to a composite frontier key)."""
    from data_spark.plans.lineage import truncate_lineage  # noqa: PLC0415
    from data_spark.queries.ranking import sized_partitions  # noqa: PLC0415

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
    n_parts = sized_partitions(edges, 2 * table_rows(spark, sf_dir, "lineitem"))
    sym = truncate_lineage(
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition(n_parts, "src")
    )
    spark_ = edges.sparkSession
    visited = spark_.createDataFrame(
        [(s, s, 0) for s in _LM_SEEDS], "lm string, node string, dist int"
    )
    frontier = visited
    for depth in range(1, _LM_MAX_DEPTH + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.src)
            .select("lm", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("lm", "node"), ["lm", "node"], "left_anti")
            .withColumn("dist", F.lit(depth))
        )
        nxt = nxt.transform(truncate_lineage)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return (
        visited.filter(F.col("dist") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("reached"),
            F.sum(F.expr("12 div dist")).cast("bigint").alias("harmonic12"),
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Weight of evidence / information value (feature-screening binning)
# ---------------------------------------------------------------------------

_WOE_BINS = 10


@_q(
    "a_woe_iv",
    f"""
    WITH lab AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders
    ), rng AS (
      SELECT MIN(x) AS lo, MAX(x) AS hi FROM lab
    ), binned AS (
      SELECT LEAST(CAST(FLOOR((x - lo) / ((hi - lo) / {_WOE_BINS}.0)) AS BIGINT),
                   {_WOE_BINS - 1}) AS bin,
             bad
      FROM lab CROSS JOIN rng
    ), cells AS (
      SELECT bin,
             CAST(SUM(bad) AS BIGINT) AS bad_n,
             CAST(COUNT(*) - SUM(bad) AS BIGINT) AS good_n
      FROM binned GROUP BY 1
    ), tots AS (
      SELECT SUM(bad_n) AS b, SUM(good_n) AS g FROM cells
    )
    SELECT bin, bad_n, good_n,
           CAST(ROUND(ln((CAST(bad_n AS DOUBLE) * CAST(g AS DOUBLE))
                         / (CAST(good_n AS DOUBLE) * CAST(b AS DOUBLE))), 6)
                AS DOUBLE) AS woe,
           CAST(CAST(bad_n AS BIGINT) * CAST(g AS BIGINT)
                - CAST(good_n AS BIGINT) * CAST(b AS BIGINT) AS BIGINT) AS num_iv
    FROM cells CROSS JOIN tots
    WHERE bad_n > 0 AND good_n > 0
    ORDER BY bin
    """,
)
def a_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning of order price against the 'F'
    status label — the classic credit-scoring / feature-screening
    transform: per equal-width bin, WOE = ln((bad/B)/(good/G)), with
    the IV numerator carried as the EXACT integer bad·G − good·B (the
    caller divides by B·G once to get the IV contribution — keeping
    the gate contract integer-exact where a float share product would
    be summation-order-dependent). One 1-row min/max broadcast, one
    count shuffle; bins with a zero class are excluded as WOE is
    undefined there (standard practice is to merge them)."""
    from data_spark.plans.lineage import truncate_lineage  # noqa: PLC0415

    o = t(spark, sf_dir, "orders")
    lab = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    rng = lab.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    binned = lab.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor(
                (F.col("x") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / F.lit(float(_WOE_BINS)))
            ).cast("bigint"),
            F.lit(_WOE_BINS - 1).cast("bigint"),
        ).alias("bin"),
        "bad",
    )
    # materialized: the totals aggregate and the final projection both
    # consume the 10-row cell table — without this the orders scan and
    # bin groupBy run twice
    cells = binned.groupBy("bin").agg(
        F.sum("bad").cast("bigint").alias("bad_n"),
        (F.count(F.lit(1)) - F.sum("bad")).cast("bigint").alias("good_n"),
    ).transform(truncate_lineage)
    tots = cells.agg(
        F.sum("bad_n").alias("b"), F.sum("good_n").alias("g")
    )
    woe = F.round(
        F.log(
            (F.col("bad_n").cast("double") * F.col("g").cast("double"))
            / (F.col("good_n").cast("double") * F.col("b").cast("double"))
        ),
        6,
    )
    return (
        cells.crossJoin(F.broadcast(tots))
        .filter((F.col("bad_n") > 0) & (F.col("good_n") > 0))
        .select(
            "bin",
            "bad_n",
            "good_n",
            woe.cast("double").alias("woe"),
            (
                F.col("bad_n") * F.col("g") - F.col("good_n") * F.col("b")
            )
            .cast("bigint")
            .alias("num_iv"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Two-proportion z² test (conversion-rate A/B member of the drift family)
# ---------------------------------------------------------------------------


@_q(
    "a_two_proportion_z",
    """
    WITH cells AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events GROUP BY 1
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b,
           CASE WHEN a.conv + b.conv = 0 OR a.conv + b.conv = a.n + b.n
                THEN NULL
                ELSE ROUND(
             (CAST(a.conv AS DOUBLE) / CAST(a.n AS DOUBLE)
              - CAST(b.conv AS DOUBLE) / CAST(b.n AS DOUBLE))
             * (CAST(a.conv AS DOUBLE) / CAST(a.n AS DOUBLE)
                - CAST(b.conv AS DOUBLE) / CAST(b.n AS DOUBLE))
             / ((CAST(a.conv + b.conv AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
                * (1.0 - CAST(a.conv + b.conv AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
                * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))), 6)
           END AS z2
    FROM cells a JOIN cells b ON a.event_type < b.event_type
    ORDER BY type_a, type_b
    """,
)
def a_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z² over every event-type pair (conversion
    = value > 0.5) — the proportion member of the drift-test family
    (KS = shape, Mann-Whitney = rank location, Welch = mean, this =
    rate). Sufficient statistics are exact integers from one count
    shuffle; the pair lattice is the bounded |types|² broadcast join;
    z² is one 6-dp-rounded double over identical operands (squared so
    no sqrt enters the contract — the a_welch_t convention)."""
    from data_spark.plans.lineage import truncate_lineage  # noqa: PLC0415

    ev = t(spark, sf_dir, "events")
    # materialized: both lattice sides read the |types|-row cell table —
    # without this the events scan and count groupBy run twice
    cells = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("conv"),
    ).transform(truncate_lineage)
    a = cells.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("conv").alias("conv_a"),
    )
    b = cells.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("conv").alias("conv_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    degenerate = (F.col("conv_a") + F.col("conv_b") == 0) | (
        F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b")
    )
    z2 = F.when(degenerate, F.lit(None).cast("double")).otherwise(
        F.round(
            (pa - pb)
            * (pa - pb)
            / (
                pool
                * (F.lit(1.0) - pool)
                * (
                    F.lit(1.0) / F.col("n_a").cast("double")
                    + F.lit(1.0) / F.col("n_b").cast("double")
                )
            ),
            6,
        )
    )
    return pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        z2.alias("z2"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# Stats-pruned versioned read (manifest file skipping, gate-verified)
# ---------------------------------------------------------------------------

_VP_LO, _VP_HI = 3000, 4500


@_q(
    "m_versioned_pruned_scan",
    f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey BETWEEN {_VP_LO} AND {_VP_HI}
    GROUP BY 1 ORDER BY 1
    """,
)
def m_versioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest file skipping on the versioned store, gate-verified for
    CORRECTNESS: orders land in two range-clustered commits with
    per-file o_orderkey bounds recorded in the manifests
    (write_versioned(stats_cols=...)); the read resolves a key range to
    only the overlapping files — the skip decision is manifest
    METADATA, no footer is opened for a skipped file — and the census
    over the pruned read must hash-equal the oracle's plain range
    filter. The pruning itself (strict inputFiles subset) is pinned in
    test_compaction; this gate pins that skipping never changes an
    answer."""
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from data_spark.io import read_versioned, write_versioned  # noqa: PLC0415

    base = run_scratch_dir("vprune", sf_dir)

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    half = o.filter(F.col("o_orderkey") % 2 == 0)
    other = o.filter(F.col("o_orderkey") % 2 == 1)
    write_versioned(
        half.repartitionByRange(8, "o_orderkey").sortWithinPartitions("o_orderkey"),
        base,
        "overwrite",
        stats_cols=["o_orderkey"],
    )
    write_versioned(
        other.repartitionByRange(8, "o_orderkey").sortWithinPartitions("o_orderkey"),
        base,
        "append",
        stats_cols=["o_orderkey"],
    )
    pruned = read_versioned(spark, base, prune=("o_orderkey", _VP_LO, _VP_HI))
    return (
        pruned.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F (k-group mean test; Welch t² generalization)
# ---------------------------------------------------------------------------


@_q(
    "a_anova_f",
    """
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS q
      FROM events GROUP BY 1
    ), terms AS (
      SELECT event_type, n, s, q,
             CAST(ROUND(s * s / CAST(n AS DOUBLE), 6) AS DECIMAL(38,6)) AS t6
      FROM g
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
           CAST(SUM(n) AS BIGINT) AS n_total,
           ROUND(CAST(SUM(t6) AS DOUBLE)
                 - CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE)
                   * CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE)
                   / CAST(SUM(n) AS DOUBLE), 6) AS ssb,
           ROUND(CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE)
                 - CAST(SUM(t6) AS DOUBLE), 6) AS ssw,
           ROUND(
             ((CAST(SUM(t6) AS DOUBLE)
               - CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE)
                 * CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(n) AS DOUBLE)) / CAST(COUNT(*) - 1 AS DOUBLE))
             / ((CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE)
                 - CAST(SUM(t6) AS DOUBLE)) / CAST(SUM(n) - COUNT(*) AS DOUBLE)),
             6) AS f_stat
    FROM terms
    """,
)
def a_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across the event-type groups — the k-group mean
    test completing the drift family (KS = shape, Mann-Whitney = rank
    location, Welch t² = 2-group means, z² = rates, chi²/V =
    independence, this = k-group means). Per-group sufficient
    statistics are exact decimal sums; the cross-group Σ(S²/n) terms
    are 6-dp-snapped and decimal-summed (the chi²-cells convention —
    a raw float sum over groups would be order-dependent); SSB/SSW/F
    close over identical doubles, rounded once. One count shuffle,
    then arithmetic over the k-row group table."""
    ev = t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)"))
        .cast("double")
        .alias("q"),
    )
    terms = g.select(
        "n",
        "s",
        "q",
        F.round(F.col("s") * F.col("s") / F.col("n").cast("double"), 6)
        .cast("decimal(38,6)")
        .alias("t6"),
    )
    st6 = F.sum("t6").cast("double")
    ss = F.sum(F.col("s").cast("decimal(38,6)")).cast("double")
    sq = F.sum(F.col("q").cast("decimal(38,6)")).cast("double")
    n_tot = F.sum("n")
    k = F.count(F.lit(1))
    ssb = st6 - ss * ss / n_tot.cast("double")
    ssw = sq - st6
    return terms.agg(
        k.cast("bigint").alias("k_groups"),
        n_tot.cast("bigint").alias("n_total"),
        F.round(ssb, 6).alias("ssb"),
        F.round(ssw, 6).alias("ssw"),
        F.round(
            (ssb / (k - 1).cast("double")) / (ssw / (n_tot - k).cast("double")), 6
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Quantile normalization (cross-group feature alignment)
# ---------------------------------------------------------------------------


@_q(
    "d_quantile_normalize",
    """
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY source) AS m
      FROM documents
    ), pooled AS (
      SELECT n_chars AS pooled_val,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS pr
      FROM documents
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT ranked.doc_id, ranked.source,
           CAST(ranked.n_chars AS BIGINT) AS orig,
           CAST(pooled.pooled_val AS BIGINT) AS normalized
    FROM ranked CROSS JOIN tot
    JOIN pooled ON pooled.pr = (ranked.r * tot.n + ranked.m - 1) // ranked.m
    ORDER BY doc_id
    """,
)
def d_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of n_chars across sources — the classic
    cross-batch feature-alignment transform (microarray/bioinformatics
    heritage, used to align per-source score distributions before a
    single threshold is applied): each row maps to the POOLED
    distribution's value at its within-source quantile, nearest-rank
    convention. Entirely integer: within-source rank r of m rows maps
    to pooled rank ceil(r·N/m) (exact BIGINT arithmetic, never a float
    percentile), so both engines select identical target values with
    the (value, doc_id) total order.

    Plan shape: one partitioned rank window per source, one DISTRIBUTED
    global rank over the pooled values (operators/order.global_row_number
    — a range-partitioned two-phase rank, never a single-partition
    window), and one equi-join on the computed target rank. The oracle
    uses a plain global window; on the engine side that would serialize
    the corpus through one task, exactly what the two-phase rank
    avoids."""
    from data_spark.operators.order import global_row_number  # noqa: PLC0415
    from data_spark.plans.lineage import truncate_lineage  # noqa: PLC0415

    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w_rank = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w_rank).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("m"),
    )
    pooled = global_row_number(
        d.select(F.col("n_chars").alias("pooled_val"), "doc_id"),
        ["pooled_val", "doc_id"],
        out="pr",
    ).select("pooled_val", "pr").transform(truncate_lineage)
    n_total = table_rows(spark, sf_dir, "documents")  # footer metadata, no count job
    # ceil(r*N/m) in pure BIGINT arithmetic — a float division here
    # would lose rank exactness once r*N passes 2^53
    target = ranked.withColumn(
        "pr",
        F.expr(f"CAST((r * CAST({n_total} AS BIGINT) + m - 1) DIV m AS BIGINT)"),
    )
    return (
        target.join(pooled, "pr")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("orig"),
            F.col("pooled_val").cast("bigint").alias("normalized"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP): duration-weighted mean per series/day
# ---------------------------------------------------------------------------


@_q(
    "e_time_weighted_avg",
    """
    WITH seq AS (
      SELECT event_type,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             epoch_us(ts) AS t_us,
             value,
             LEAD(epoch_us(ts))
               OVER (PARTITION BY event_type, CAST(ts AS DATE)
                     ORDER BY ts, event_id) AS nxt,
             epoch_us(CAST(ts AS DATE) + INTERVAL 1 DAY) AS day_end
      FROM events
    ), weighted AS (
      SELECT event_type, day,
             CAST(COALESCE(nxt, day_end) - t_us AS BIGINT) AS w
             , value
      FROM seq
    )
    SELECT event_type, day,
           CAST(SUM(w) AS BIGINT) AS total_micros,
           CAST(SUM(CAST(value AS DECIMAL(38,6)) * w) AS DOUBLE)
             / CAST(SUM(w) AS DOUBLE) AS twap
    FROM weighted
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def e_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (type, day) — the TWAP shape
    every telemetry/finance pipeline needs where plain AVG is wrong
    because observations arrive irregularly: each reading holds until
    the next one (last reading holds to day end), so its weight is that
    duration in exact integer MICROSECONDS (no truncation convention to
    disagree on). Weights come from one partitioned LEAD window; the
    weighted sum is an exact DECIMAL (6-dp value x integer micros),
    and the final division runs on identical doubles. One keyed
    shuffle shared by the window and the groupBy."""
    ev = t(spark, sf_dir, "events")
    w_next = Window.partitionBy("event_type", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.unix_micros("ts").alias("t_us"),
        "value",
        F.lead(F.unix_micros("ts")).over(w_next).alias("nxt"),
        F.unix_micros(
            F.date_add(F.to_date("ts"), 1).cast("timestamp")
        ).alias("day_end"),
    )
    weighted = seq.select(
        "event_type",
        "day",
        (F.coalesce("nxt", "day_end") - F.col("t_us")).cast("bigint").alias("w"),
        "value",
    )
    return (
        weighted.groupBy("event_type", "day")
        .agg(
            F.sum("w").cast("bigint").alias("total_micros"),
            (
                F.sum(F.col("value").cast("decimal(38,6)") * F.col("w")).cast(
                    "double"
                )
                / F.sum("w").cast("double")
            ).alias("twap"),
        )
        .orderBy("event_type", "day")
    )
