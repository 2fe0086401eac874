"""Round-6 continuation tier: corpus rewriting + resampling inference.

Two capabilities a production training-data pipeline needs that the
earlier tiers only approach:

- ``d_chunk_dedup_rewrite``: C4/RefinedWeb-style duplicated-span
  REMOVAL. Every other dedup query in the inventory *reports*
  duplication (pair lists, ratios, dispositions); this one rewrites the
  corpus — content-defined chunks (shift-robust boundaries, shared with
  ``d_cdc_chunking``), global first-occurrence-wins on the chunk
  fingerprint, then each document is REASSEMBLED from its surviving
  chunks in order. Spans shorter than ``_MIN_SPAN`` tokens are never
  removed (a three-word collocation repeating across documents is
  language, not duplication — the C4 rule dedupes three-SENTENCE spans,
  RefinedWeb substrings of ≥50 tokens).
- ``a_bootstrap_ci``: deterministic bootstrap confidence interval for
  total daily order revenue. The resample universe is the DAILY
  AGGREGATE, not the fact table, so the bootstrap costs
  O(B · |days|) — a calendar-bounded constant — regardless of corpus
  size; draws are keyed by the portable md5 hash so both engines select
  identical days; the CI bounds are order statistics of exact DECIMAL
  resample sums (no division, no float percentile, no RNG state).

Scale posture: chunk dedup shuffles on (doc, chunk) and on the chunk
fingerprint — both value keys, no global sort (the within-doc order is
a per-doc ``array_sort``); the bootstrap's only non-broadcast shuffle
is the per-resample sum over B·|days| rows, and its single-group order
statistic collects exactly B=200 decimals.

Reference parity: span removal generalizes the reference's
document-level hash dedup (`news_find_duplicates/main.py`) to
sub-document spans; the bootstrap generalizes its point-estimate count
validations (`federal_fec_compute_load/main.py`) to interval estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.operators.dedup import _portable_hash60
from data_spark.operators.order import global_row_number
from data_spark.plans.lineage import truncate_lineage
from data_spark.queries.analytics4 import _CDC_MOD, _TOKS_SQL, cdc_chunks
from data_spark.queries.common import run_scratch_dir, t, table_rows

QUERIES = {}
ORACLE = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# Spans shorter than this many tokens are exempt from removal even when
# their fingerprint repeats (short repeats are collocations, not
# duplicated passages).
_MIN_SPAN = 4

# The shared chunk table (text + fingerprint), as SQL — the same
# tokenizer / boundary rule the d_cdc_chunking oracle replays.
_CHUNKS_SQL = f"""
    toks0 AS ({_TOKS_SQL}),
    tok AS (
      SELECT doc_id, i AS pos, ws[i] AS tok
      FROM toks0, UNNEST(range(1, len(ws) + 1)) AS t(i)
      WHERE ws[i] <> ''
    ),
    hashed AS (
      SELECT doc_id, pos, tok,
             CASE WHEN CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {_CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS b
      FROM tok
    ),
    cid AS (
      SELECT doc_id, pos, tok,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) - b AS chunk_id
      FROM hashed
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM cid GROUP BY 1, 2
    )
"""


def chunk_dedup_rewrite(
    docs: DataFrame, min_span: int = _MIN_SPAN, mod: int = _CDC_MOD
) -> DataFrame:
    """Remove every repeated content-defined chunk (global
    first-occurrence-wins by (doc_id, chunk_id)) of at least
    ``min_span`` tokens, then reassemble each document from its
    surviving chunks. Returns one row per chunked document:
    (doc_id, n_chunks, n_dropped, orig_tokens, kept_tokens,
    cleaned_md5) — ``cleaned_md5`` fingerprints the rewritten text so
    the whole rewrite is hash-verifiable without shipping the text.
    """
    chunks = cdc_chunks(docs, mod=mod, with_text=True)
    occ_w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_id")
    ranked = chunks.withColumn("occ", F.row_number().over(occ_w))
    kept = ranked.filter((F.col("occ") == 1) | (F.col("n_tokens") < min_span))
    totals = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("orig_tokens"),
    )
    survived = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_chunks"),
        F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                    lambda s: s.chunk_text,
                ),
                " ",
            )
        ).alias("cleaned_md5"),
    )
    return totals.join(survived, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        (F.col("n_chunks") - F.coalesce(F.col("kept_chunks"), F.lit(0))).alias("n_dropped"),
        "orig_tokens",
        F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("bigint").alias("kept_tokens"),
        F.coalesce(F.col("cleaned_md5"), F.md5(F.lit(""))).alias("cleaned_md5"),
    )


@_q(
    "d_chunk_dedup_rewrite",
    f"""
    WITH {_CHUNKS_SQL},
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk_md5 ORDER BY doc_id, chunk_id) AS occ
      FROM chunks
    ),
    kept AS (SELECT * FROM ranked WHERE occ = 1 OR n_tokens < {_MIN_SPAN}),
    totals AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(n_tokens) AS BIGINT) AS orig_tokens
      FROM chunks GROUP BY 1
    ),
    survived AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_chunks,
             CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
             md5(string_agg(chunk_text, ' ' ORDER BY chunk_id)) AS cleaned_md5
      FROM kept GROUP BY 1
    )
    SELECT t.doc_id, t.n_chunks,
           t.n_chunks - COALESCE(s.kept_chunks, 0) AS n_dropped,
           t.orig_tokens,
           CAST(COALESCE(s.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           COALESCE(s.cleaned_md5, md5('')) AS cleaned_md5
    FROM totals t LEFT JOIN survived s USING (doc_id)
    """,
)
def d_chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicated-span removal with document reassembly.

    Rewrites the documents corpus: content-defined chunks (the
    d_cdc_chunking boundary rule, so an insertion shifting offsets
    re-chunks nothing downstream), repeated fingerprints of >= 4 tokens
    keep only their globally-first occurrence, and every document is
    rebuilt from its surviving chunks. Cited parity:
    news_find_duplicates/main.py dedupes whole documents by hash; this
    is the sub-document generalization the C4/RefinedWeb pipelines use.
    """
    return chunk_dedup_rewrite(t(spark, sf_dir, "documents"))


# Number of bootstrap resamples; bounds every frame after the daily
# aggregate at B · |days| rows and the order-statistic collect at B.
_N_BOOT = 200
# 95% CI as order statistics of the B sorted resample totals:
# floor(0.025·B) = 5th smallest and the symmetric 196th.
_LO_IDX = 5
_HI_IDX = _N_BOOT + 1 - _LO_IDX


def bootstrap_daily_total_ci(orders: DataFrame, n_boot: int = _N_BOOT) -> DataFrame:
    """One-row frame (n_days, n_boot, point_total, lo95_total,
    hi95_total): deterministic bootstrap CI for the total of daily
    order-revenue sums, resampling days with replacement.

    Draw (b, slot) selects day index ``md5hash(b ':' slot) mod n_days``
    — a pure function of the draw coordinates, so any engine (and any
    partitioning / retry schedule) picks identical days. Totals stay
    DECIMAL end to end; the CI bounds are element_at() order statistics
    of the B resample sums, so no float percentile interpolation.
    """
    daily = orders.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_total")
    )
    # The ranked day table fans out to three consumers (stats, slots,
    # the draw join); it is calendar-bounded, so materialize it once
    # instead of re-deriving the fact-table aggregate per consumer.
    ranked = truncate_lineage(global_row_number(daily, ["o_orderdate"], out="rk"))
    stats = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("day_total").alias("point_total"),
    ).withColumn("_k", F.lit(1))
    # B draw slots per day row (sequence+explode — no cross join), each
    # mapped to a drawn day by the portable hash mod n_days.
    slots = ranked.select(
        F.col("rk").alias("slot"),
        F.explode(F.sequence(F.lit(1), F.lit(n_boot))).alias("b"),
    ).withColumn("_k", F.lit(1))
    draws = slots.join(F.broadcast(stats.select("_k", "n_days")), "_k").select(
        "b",
        (_portable_hash60(F.concat_ws(":", F.col("b"), F.col("slot"))) % F.col("n_days") + 1).alias("idx"),
    )
    boots = (
        draws.join(
            F.broadcast(ranked.select(F.col("rk"), F.col("day_total"))),
            draws.idx == F.col("rk"),
        )
        .groupBy("b")
        .agg(F.sum("day_total").alias("boot_total"))
    )
    arr = (
        boots.withColumn("_k", F.lit(1))
        .groupBy("_k")
        .agg(F.array_sort(F.collect_list("boot_total")).alias("a"))
    )
    cents = lambda c: (c * 100).cast("bigint")  # noqa: E731 — 2-dp decimals, exact in BIGINT
    return arr.join(F.broadcast(stats), "_k").select(
        "n_days",
        F.lit(n_boot).cast("bigint").alias("n_boot"),
        cents(F.col("point_total")).alias("point_total_cents"),
        cents(F.element_at("a", _LO_IDX)).alias("lo95_total_cents"),
        cents(F.element_at("a", _HI_IDX)).alias("hi95_total_cents"),
    )


@_q(
    "a_bootstrap_ci",
    f"""
    WITH daily AS (
      SELECT o_orderdate, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_total
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT day_total, ROW_NUMBER() OVER (ORDER BY o_orderdate) AS rk FROM daily
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days, SUM(day_total) AS point_total FROM daily
    ),
    slots AS (
      SELECT r.rk AS slot, i.b
      FROM ranked r, UNNEST(range(1, {_N_BOOT} + 1)) AS i(b)
    ),
    draws AS (
      SELECT b,
             CAST(('0x' || substr(md5(b || ':' || slot), 1, 15)) AS BIGINT)
               % (SELECT n_days FROM stats) + 1 AS idx
      FROM slots
    ),
    boots AS (
      SELECT d.b, SUM(r.day_total) AS boot_total
      FROM draws d JOIN ranked r ON r.rk = d.idx
      GROUP BY d.b
    ),
    arr AS (SELECT list_sort(list(boot_total)) AS a FROM boots)
    SELECT s.n_days, CAST({_N_BOOT} AS BIGINT) AS n_boot,
           CAST(s.point_total * 100 AS BIGINT) AS point_total_cents,
           CAST(a[{_LO_IDX}] * 100 AS BIGINT) AS lo95_total_cents,
           CAST(a[{_HI_IDX}] * 100 AS BIGINT) AS hi95_total_cents
    FROM arr, stats s
    """,
)
def a_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap 95% CI for total daily order revenue.

    The resample universe is the daily aggregate (calendar-bounded), so
    the bootstrap is O(B·|days|) whatever the fact-table size; draws
    are portable-hash-keyed so Spark and DuckDB resample identically;
    bounds are exact-decimal order statistics. Cited parity: interval
    generalization of the reference's count-gate validations
    (federal_fec_compute_load/main.py).
    """
    return bootstrap_daily_total_ci(t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Sliding-window HLL: trailing-7-day distinct users per (type, day)
# from DAILY max-rank registers — the sketch×window composition a
# metrics store runs ("7-day actives") without ever re-scanning facts:
# per-day registers are built once (the hll_state_sink's state shape),
# and every day's answer is a register-wise MAX over a value-RANGE
# window. Same cross-engine-exact register discipline as
# a_hll_exact_rollup (queries/analytics.py): 60-bit md5-prefix hash,
# 256 registers, integer-scaled harmonic denominator.
# ---------------------------------------------------------------------------

_HLL_P = 8
_HLL_M = 1 << _HLL_P
_HLL_W = 60 - _HLL_P  # 52-bit rank window; empty-register term = 2^53
_SLIDE_DAYS = 6  # trailing window: current day + 6 preceding


@_q(
    "a_hll_sliding_7d",
    f"""
    WITH hashed AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events
    ),
    regs_daily AS (
      SELECT event_type, day, h % {_HLL_M} AS bucket,
             MAX(CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_W + 1}
                      ELSE {_HLL_W + 1} - length(bin(h // {_HLL_M})) END) AS rho
      FROM hashed GROUP BY 1, 2, 3
    ),
    type_days AS (SELECT DISTINCT event_type, day FROM regs_daily),
    lattice AS (
      SELECT t.event_type, t.day, b.bucket
      FROM type_days t, UNNEST(range(0, {_HLL_M})) AS b(bucket)
    ),
    joined AS (
      SELECT l.event_type, l.day, l.bucket, r.rho,
             datediff('day', DATE '1970-01-01', l.day) AS dn
      FROM lattice l
      LEFT JOIN regs_daily r
        ON r.event_type = l.event_type AND r.day = l.day AND r.bucket = l.bucket
    ),
    merged AS (
      SELECT event_type, day, bucket,
             MAX(rho) OVER (
               PARTITION BY event_type, bucket ORDER BY dn
               RANGE BETWEEN {_SLIDE_DAYS} PRECEDING AND CURRENT ROW
             ) AS mrho
      FROM joined
    ),
    sums AS (
      SELECT event_type, day,
             CAST(COUNT(mrho) AS BIGINT) AS used,
             SUM(CASE WHEN mrho IS NOT NULL
                      THEN CAST(1 AS BIGINT) << ({_HLL_W + 1} - mrho) END) AS s_used
      FROM merged GROUP BY 1, 2
    ),
    raw AS (
      SELECT event_type, day, used,
             CAST(s_used + ({_HLL_M} - used) * (CAST(1 AS BIGINT) << {_HLL_W + 1}) AS BIGINT) AS denom_scaled,
             (0.7213 / (1.0 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M}
               * CAST(CAST(1 AS BIGINT) << {_HLL_W + 1} AS DOUBLE)
               / CAST(s_used + ({_HLL_M} - used) * (CAST(1 AS BIGINT) << {_HLL_W + 1}) AS DOUBLE)
               AS raw_est
      FROM sums
    )
    SELECT event_type, day, used AS buckets_used, denom_scaled,
           ROUND(CASE WHEN raw_est <= 2.5 * {_HLL_M} AND used < {_HLL_M}
                      THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / ({_HLL_M} - used))
                      ELSE raw_est END, 4) AS est_distinct
    FROM raw
    """,
)
def a_hll_sliding_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per (event_type, day) by register-
    MAX over a value-RANGE window of per-day HLL registers.

    The day×register lattice is BOUNDED (|type-days|·256 rows — the
    unused registers must be present so a register set 3 days ago still
    counts today), the window is keyed by (type, bucket), and the only
    float math is the final harmonic estimate over identical operands
    (4-dp rounded) — facts are scanned exactly once for the daily
    registers, the answer for every day derives from register state.
    Scale shape matches the streaming hll_state_sink: at 100 TB the
    daily register table IS the maintained state; this query is its
    reader."""
    e = t(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
    )
    rest = F.expr(f"h div {_HLL_M}")
    rho = F.when(rest == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin(rest))
    )
    regs_daily = (
        e.select("event_type", F.to_date("ts").alias("day"), h.alias("h"))
        .groupBy("event_type", "day", (F.col("h") % _HLL_M).alias("bucket"))
        .agg(F.max(rho).alias("rho"))
    )
    type_days = regs_daily.select("event_type", "day").distinct()
    lattice = type_days.withColumn(
        "bucket", F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1)))
    )
    joined = lattice.join(
        regs_daily, ["event_type", "day", "bucket"], "left"
    ).withColumn("dn", F.datediff(F.col("day"), F.lit("1970-01-01")))
    w = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("dn")
        .rangeBetween(-_SLIDE_DAYS, 0)
    )
    merged = joined.withColumn("mrho", F.max("rho").over(w))
    term = F.when(
        F.col("mrho").isNotNull(),
        F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1} - mrho)"),
    )
    sums = merged.groupBy("event_type", "day").agg(
        F.count("mrho").cast("bigint").alias("used"),
        F.sum(term).alias("s_used"),
    )
    empty_term = F.lit(1 << (_HLL_W + 1)).cast("bigint")
    denom = F.col("s_used") + (F.lit(_HLL_M) - F.col("used")) * empty_term
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    raw_est = (
        F.lit(alpha)
        * F.lit(float(_HLL_M))
        * F.lit(float(_HLL_M))
        * F.lit(float(1 << (_HLL_W + 1)))
        / denom.cast("double")
    )
    est = F.when(
        (raw_est <= 2.5 * _HLL_M) & (F.col("used") < _HLL_M),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / (F.lit(_HLL_M) - F.col("used"))),
    ).otherwise(raw_est)
    return sums.select(
        "event_type",
        "day",
        F.col("used").alias("buckets_used"),
        denom.cast("bigint").alias("denom_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Exact WEIGHTED (multiset) Jaccard near-dup pairs: the dedup tier's
# set-based Jaccard treats "spark" x1 and "spark" x40 as the same
# token; weighted Jaccard J_w = Σ_t min(tf_a, tf_b) / Σ_t max(tf_a,
# tf_b) scores repeated content proportionally — the measure behind
# weighted-MinHash dedup (Ioffe's CWS), here computed EXACTLY via the
# inverted-index join so the whole thing lands on the hash signal.
# Σ max = W_a + W_b − Σ min, so only shared tokens ever join; the
# max_df stop-token guard bounds candidates by Σ df² exactly as in
# sparse_cosine_pairs. Scores are integer micro-units (BIGINT DIV) —
# no cross-engine float division.
# ---------------------------------------------------------------------------

_WJ_MAX_DF = 50
_WJ_MIN_MICRO = 300_000  # report pairs with J_w >= 0.30


def weighted_jaccard_pairs(
    docs: DataFrame, max_df: int = _WJ_MAX_DF, min_micro: int = _WJ_MIN_MICRO
) -> DataFrame:
    from data_spark.operators.ranking import document_frequencies, term_frequencies

    tf = term_frequencies(docs)
    # the guarded posting table fans out to three consumers (totals +
    # both self-join sides) — materialize it once instead of paying the
    # tokenize → tf → df-guard chain per consumer (same shared-subplan
    # discipline as the ranking tier; 22 → 8 exchanges measured)
    guarded = truncate_lineage(
        tf.join(
            F.broadcast(document_frequencies(tf).filter(F.col("df") <= max_df)),
            "term",
        ).select("doc_id", "term", "tf")
    )
    totals = guarded.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("w"))
    a, b = guarded.alias("a"), guarded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.least("a.tf", "b.tf")).cast("bigint").alias("inter_w"))
    )
    return (
        inter.join(totals.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("w", "w_a")
        .join(
            totals.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("w", "w_b"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "inter_w",
            (F.col("w_a") + F.col("w_b") - F.col("inter_w")).alias("union_w"),
            F.expr("1000000 * inter_w DIV (w_a + w_b - inter_w)").alias("jacc_micro"),
        )
        .filter(F.col("jacc_micro") >= min_micro)
    )


@_q(
    "d_weighted_jaccard",
    f"""
    WITH toks0 AS ({_TOKS_SQL}),
    tok AS (
      SELECT doc_id, ws[i] AS term
      FROM toks0, UNNEST(range(1, len(ws) + 1)) AS t(i)
      WHERE ws[i] <> ''
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ),
    guarded AS (
      SELECT tf.* FROM tf
      JOIN (
        SELECT term FROM tf GROUP BY term
        HAVING COUNT(DISTINCT doc_id) <= {_WJ_MAX_DF}
      ) g USING (term)
    ),
    totals AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS w FROM guarded GROUP BY 1
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(LEAST(a.tf, b.tf)) AS BIGINT) AS inter_w
      FROM guarded a JOIN guarded b
        ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.inter_w,
           ta.w + tb.w - i.inter_w AS union_w,
           1000000 * i.inter_w // (ta.w + tb.w - i.inter_w) AS jacc_micro
    FROM inter i
    JOIN totals ta ON ta.doc_id = i.doc_a
    JOIN totals tb ON tb.doc_id = i.doc_b
    WHERE 1000000 * i.inter_w // (ta.w + tb.w - i.inter_w) >= {_WJ_MIN_MICRO}
    """,
)
def d_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted-Jaccard near-duplicate pairs over the documents
    corpus: Σ min(tf) / Σ max(tf) in integer micro-units, shared-token
    inverted-index join with the Σ df²-bounding max_df guard. The
    weighted companion to d_ngram_jaccard (set semantics) — repeated
    content counts proportionally, which is what separates boilerplate
    stuffing from genuine overlap. Cited parity: the exact form of
    weighted-MinHash dedup (news_find_duplicates/main.py's hash dedup
    is the unweighted, whole-document special case)."""
    return weighted_jaccard_pairs(t(spark, sf_dir, "documents"))


_MG_CAP = 16


@_q(
    "pipe_stream_mg_e2e",
    f"""
    WITH items AS (
      SELECT event_type, CAST(user_id AS VARCHAR) AS item,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    totals AS (
      SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_total FROM items GROUP BY 1
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY cnt DESC, item
             ) AS rn
      FROM items
    ),
    deduct AS (
      SELECT event_type, MAX(CASE WHEN rn = {_MG_CAP + 1} THEN cnt ELSE 0 END) AS d
      FROM ranked GROUP BY 1
    )
    SELECT r.event_type, r.item,
           CAST(r.cnt - dd.d AS BIGINT) AS cnt_lower,
           t.n_total,
           CAST(t.n_total // {_MG_CAP + 1} AS BIGINT) AS err_bound
    FROM ranked r
    JOIN deduct dd USING (event_type)
    JOIN totals t USING (event_type)
    WHERE r.rn <= {_MG_CAP} AND r.cnt - dd.d > 0
    """,
)
def pipe_stream_mg_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Misra–Gries heavy-hitter sink, gate-verified END TO END: the
    events table is consumed as a REAL file stream (availableNow), the
    micro-batch's per-(event_type, user) counts fold into MG state
    (prune to 16 counters/type, stage-and-swap + replay guard), and the
    result is read_mg_heavy_hitters over the PROMOTED STATE. The table
    is one parquet file, so the fold is exactly one micro-batch and the
    state is the deterministic one-prune summary the DuckDB oracle
    replays (exact counts → rank → subtract the 17th-largest → drop
    non-positive); the hash match verifies the whole streaming path —
    source → fold → prune → promote → reader — not a re-derivation.
    Multi-batch folds are the laws' job (test_streaming pins the
    mergeable-summaries bounds there; batch boundaries aren't
    deterministic enough for a hash contract)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from data_spark.streaming.jobs import (
        mg_state_sink,
        read_mg_heavy_hitters,
        stream_state_scope,
    )

    work = run_scratch_dir("smg", sf_dir)
    state = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")

    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
        .select("event_type", "user_id")
    )
    # fold shuffles sized to the stream volume (footer count), not the
    # session constant — see stream_state_scope
    with stream_state_scope(spark, table_rows(spark, sf_dir, "events")):
        q = mg_state_sink(
            stream, state, ckpt, keys=["event_type"], item_col="user_id", capacity=_MG_CAP
        )
        if not q.awaitTermination(300):
            # timed out: the reader below would silently consume absent or
            # partial state — fail loudly instead (ADVICE r6)
            q.stop()
            raise TimeoutError("pipe_stream_mg_e2e: stream did not drain within 300s")
    return read_mg_heavy_hitters(spark, state, _MG_CAP)


@_q(
    "a_welch_t",
    """
    WITH stats AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
      FROM documents GROUP BY 1
    ),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             a.n AS n_a, a.s AS s_a, a.q AS q_a,
             b.n AS n_b, b.s AS s_b, b.q AS q_b
      FROM stats a JOIN stats b ON a.lang < b.lang
      WHERE a.n >= 2 AND b.n >= 2
    )
    SELECT lang_a, lang_b, n_a, n_b,
           ROUND((CAST(s_a AS DOUBLE) / n_a) - (CAST(s_b AS DOUBLE) / n_b), 6) AS mean_diff,
           ROUND(
             ((CAST(s_a AS DOUBLE) / n_a) - (CAST(s_b AS DOUBLE) / n_b))
             * ((CAST(s_a AS DOUBLE) / n_a) - (CAST(s_b AS DOUBLE) / n_b))
             / (
               ((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a) / (n_a - 1)) / n_a
               + ((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b) / (n_b - 1)) / n_b
             ), 6) AS t2
    FROM pairs
    """,
)
def a_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t² between every language pair's
    document-length distributions — the PARAMETRIC member of the drift
    family (a_ks_two_sample tests shape, a_mann_whitney_u location by
    rank; Welch is the mean test a metrics pipeline reaches for first).

    Exactness discipline: the per-group sufficient statistics (n, Σx,
    Σx²) are exact BIGINTs (lengths are integers), the pair lattice is
    a broadcast join over the bounded language set, and t² is ONE
    double expression over identical integer operands in both engines,
    6-dp-rounded — the same one-final-float rule the HLL estimate uses.
    t² is reported instead of t so no square root enters the contract."""
    d = t(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("q"),
    )
    a, b = stats.alias("a"), stats.alias("b")
    pairs = (
        a.join(F.broadcast(b), F.col("a.lang") < F.col("b.lang"))
        .filter((F.col("a.n") >= 2) & (F.col("b.n") >= 2))
        .select(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b"),
            F.col("a.n").alias("n_a"), F.col("a.s").alias("s_a"), F.col("a.q").alias("q_a"),
            F.col("b.n").alias("n_b"), F.col("b.s").alias("s_b"), F.col("b.q").alias("q_b"),
        )
    )
    mean_diff = (
        F.col("s_a").cast("double") / F.col("n_a")
        - F.col("s_b").cast("double") / F.col("n_b")
    )
    var_term = lambda s, q, n: (  # noqa: E731
        (F.col(q).cast("double") - F.col(s).cast("double") * F.col(s) / F.col(n))
        / (F.col(n) - 1)
    ) / F.col(n)
    return pairs.select(
        "lang_a",
        "lang_b",
        "n_a",
        "n_b",
        F.round(mean_diff, 6).alias("mean_diff"),
        F.round(
            mean_diff * mean_diff / (var_term("s_a", "q_a", "n_a") + var_term("s_b", "q_b", "n_b")),
            6,
        ).alias("t2"),
    )
