"""Round-9 tier: Write-Audit-Publish branch workflow, partition-spec
evolution, paired-classifier testing, two-stage binary-quantized
retrieval, bounded spatial kNN join, and a streaming event-time join
gate (registered here; the join itself lives in streaming/jobs.py).

- ``m_wap_publish``: the full WAP lifecycle on the versioned store —
  write a batch to a branch, audit it there (tombstone the failing
  rows ON the branch), then atomically fast-forward main. Readers of
  main never see un-audited rows; the gate hashes the post-publish
  state against the oracle's equivalent predicate and ASSERTS main's
  mid-flight isolation in-query. Reference parity: the reference loads
  straight into the serving index and validates afterwards
  (upload/main.py load→validate→rollback); WAP closes that visibility
  gap.
- ``m_partition_evolution``: per-commit partition specs — one commit
  hive-partitioned on event_type, the next on a different spec —
  scanned together with manifest-stats pruning + Spark partition
  pruning, no history rewrite (Iceberg spec evolution).
- ``a_mcnemar_test``: McNemar's paired test comparing two deterministic
  document-quality classifiers against a reference label on the SAME
  documents — the right test when classifiers share their evaluation
  set (the off-diagonal disagreement cells are the only information).
  Statistic emitted as exact integers: b, c, and the (b-c)^2 numerator
  over the b+c denominator — no transcendental in either engine.
- ``v_bq_rerank``: two-stage retrieval — sign-bit binary quantization
  (64-bit Hamming codes from the leading embedding components) builds
  a cheap shortlist, exact e6-integer cosine rescoring reranks it.
  The modern memory-bound ANN recipe (BQ shortlist + rerank): the
  shortlist pass touches 8 bytes/vector instead of 4·d, the exact pass
  touches only shortlist·d.
- ``s_knn_grid_join``: bounded k-nearest-neighbor spatial join — for
  each query point the k nearest neighbors within radius r, exact via
  3x3 grid-cell candidate join (cell = r, so every point within r is
  in a neighboring cell) + per-query top-k window. The kNN variant of
  s_spatial_grid_join's radius join.

Scale posture: the WAP/evolution gates do O(batch) store work and
aggregate to tiny frames; McNemar is one scan to four counters;
v_bq_rerank is a broadcast-probe shortlist (integer XOR+popcount) then
a shortlist-sized exact join; the kNN join shuffles once on cell keys
and windows once per query point (candidates bounded by 9 cells).

Reference parity: the reference has no lakehouse/branching tier (its
store is a serving index refreshed in place) and no vector shortlist
path; these re-express the same pipeline intents Spark-first, cited
per-query below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.queries.common import run_scratch_dir, t, stage_era_files, table_rows

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
# m_wap_publish — write-audit-publish branch workflow
# ---------------------------------------------------------------------------

# final main state = base (custkey%3=0) plus the audited batch
# (custkey%3=1 minus the rows the audit tombstoned: orderkey%5=0)
_WAP_SQL = """
SELECT
    o_orderstatus,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
WHERE (o_custkey % 3 = 0)
   OR (o_custkey % 3 = 1 AND o_orderkey % 5 <> 0)
GROUP BY o_orderstatus
"""


@_q("m_wap_publish", _WAP_SQL)
def m_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish on the versioned store: the batch lands on a
    branch, the audit tombstones its failing rows on the branch, and
    ``publish_branch`` fast-forwards main in one manifest put-if-absent.
    Main's isolation during the audit window is asserted in-query (a
    reader mid-audit must see exactly the pre-batch rows); the final
    hash pins that publish delivered precisely base + audited batch.
    Reference: upload/main.py loads into the live index then validates
    (visible-bad-rows window); the branch gives the same load an
    isolated audit with atomic cutover."""
    from data_spark.io import (  # noqa: PLC0415
        delete_versioned,
        publish_branch,
        read_versioned,
        write_versioned,
    )

    base_dir = run_scratch_dir("wap", sf_dir)
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base = o.filter(F.col("o_custkey") % 3 == 0)
    batch = o.filter(F.col("o_custkey") % 3 == 1)

    v0 = write_versioned(base, base_dir, mode="overwrite")
    write_versioned(batch, base_dir, mode="append", branch="wap")

    # audit ON the branch: the failing rows never become visible on main
    staged = read_versioned(spark, base_dir, branch="wap")
    failing = staged.filter(
        (F.col("o_custkey") % 3 == 1) & (F.col("o_orderkey") % 5 == 0)
    ).select("o_orderkey")
    delete_versioned(failing, base_dir, branch="wap")

    # isolation assert: a main reader mid-audit sees only the base rows
    mid = read_versioned(spark, base_dir).count()
    expected = base.count()
    if mid != expected:
        raise AssertionError(
            f"WAP isolation broken: main saw {mid} rows mid-audit, expected {expected}"
        )

    publish_branch(base_dir, "wap", expect_main=v0)

    return (
        read_versioned(spark, base_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# m_partition_evolution — per-commit partition specs, one scan
# ---------------------------------------------------------------------------

_EVOLVE_SQL = """
SELECT
    event_type,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
WHERE event_id BETWEEN 100 AND 6000 AND value IS NOT NULL
GROUP BY event_type
"""


@_q("m_partition_evolution", _EVOLVE_SQL)
def m_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution: commit 0 is hive-partitioned on
    event_type, commit 1 on a different spec (a derived bucket), and
    the table reads as one — each commit planned under its own spec
    with manifest stats pruning the event_id probe at the file level
    (the prune range is residual-filtered, so it can narrow files,
    never answers). No rewrite happened to change the spec: that is
    the Iceberg spec-evolution contract, and the only sane way to
    re-partition a 100 TB table. Layout-pruning subsets are pinned in
    tests/test_branches.py; this gate pins answer invariance."""
    from data_spark.io import read_versioned, write_versioned  # noqa: PLC0415

    base_dir = run_scratch_dir("pevolve", sf_dir)
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            "value",
            F.pmod(F.col("event_id"), F.lit(7)).cast("int").alias("vb"),
        )
    )
    write_versioned(
        e.filter(F.col("event_id") % 2 == 0),
        base_dir,
        mode="overwrite",
        partition_by=["event_type"],
        stats_cols=["event_id"],
    )
    write_versioned(
        e.filter(F.col("event_id") % 2 == 1),
        base_dir,
        mode="append",
        partition_by=["vb"],
        stats_cols=["event_id"],
    )
    got = read_versioned(spark, base_dir, prune=("event_id", 100, 6000))
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# a_mcnemar_test — paired-classifier comparison, exact integer cells
# ---------------------------------------------------------------------------

_MCNEMAR_SQL = """
WITH d AS (
    SELECT (n_chars >= 250) AS truth,
           ((LENGTH(text) - LENGTH(REPLACE(text, 'table', ''))) >= 10) AS pa,
           ((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) >= 45) AS pb
    FROM documents
)
SELECT
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN pa = truth AND pb <> truth THEN 1 ELSE 0 END) AS BIGINT) AS b_cell,
    CAST(SUM(CASE WHEN pa <> truth AND pb = truth THEN 1 ELSE 0 END) AS BIGINT) AS c_cell,
    CAST(
      (SUM(CASE WHEN pa = truth AND pb <> truth THEN 1 ELSE 0 END)
       - SUM(CASE WHEN pa <> truth AND pb = truth THEN 1 ELSE 0 END))
      * (SUM(CASE WHEN pa = truth AND pb <> truth THEN 1 ELSE 0 END)
         - SUM(CASE WHEN pa <> truth AND pb = truth THEN 1 ELSE 0 END))
      AS BIGINT) AS chi2_num,
    CAST(SUM(CASE WHEN pa <> pb AND (pa = truth OR pb = truth) THEN 1 ELSE 0 END)
      AS BIGINT) AS chi2_den
FROM d
"""


@_q("a_mcnemar_test", _MCNEMAR_SQL)
def a_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between two deterministic document-quality
    classifiers evaluated on the SAME corpus against a reference label
    — the correct comparison when two models share an eval set (the
    marginal-accuracy z-test overstates significance because the
    per-document errors are correlated; only the b/c disagreement
    cells carry information). Classifier A keys on a term-frequency
    heuristic, B on a whitespace-token-count heuristic; the statistic
    (b-c)^2/(b+c) is emitted as an exact integer numerator/denominator
    pair, so the gate hash covers the test itself, not a float
    rendering of it.

    Scale posture: one corpus scan folding into five counters —
    map-side combine reduces everything before the single-row shuffle;
    at 100 TB this is scan-bound and embarrassingly partial-aggregable.
    Complements a_cohens_kappa (rater agreement) and a_two_proportion_z
    (independent samples) in the eval-statistics family."""
    d = t(spark, sf_dir, "documents").select(
        (F.col("n_chars") >= 250).alias("truth"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("table"))))
            >= 10
        ).alias("pa"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))) >= 45
        ).alias("pb"),
    )
    b = F.sum(
        F.when((F.col("pa") == F.col("truth")) & (F.col("pb") != F.col("truth")), 1)
        .otherwise(0)
    )
    c = F.sum(
        F.when((F.col("pa") != F.col("truth")) & (F.col("pb") == F.col("truth")), 1)
        .otherwise(0)
    )
    disagree = F.sum(
        F.when(
            (F.col("pa") != F.col("pb"))
            & ((F.col("pa") == F.col("truth")) | (F.col("pb") == F.col("truth"))),
            1,
        ).otherwise(0)
    )
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        b.cast("bigint").alias("b_cell"),
        c.cast("bigint").alias("c_cell"),
        ((b - c) * (b - c)).cast("bigint").alias("chi2_num"),
        disagree.cast("bigint").alias("chi2_den"),
    )


# ---------------------------------------------------------------------------
# v_bq_rerank — binary-quantized shortlist + exact integer cosine rerank
# ---------------------------------------------------------------------------

_BQ_SHORTLIST = 40
_BQ_K = 10

# Hamming distance between sign-bit codes == the count of components
# whose signs differ, so the oracle computes it componentwise and
# never needs the bit-packed form the engine uses.
_BQ_SQL = f"""
WITH x AS (
    SELECT vec_id, i AS idx,
           CAST(embedding[i] AS DOUBLE) AS xd,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS xv
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
), hams AS (
    SELECT q.vec_id AS qid, c.vec_id AS cid,
           CAST(SUM(CASE WHEN (q.xd >= 0) <> (c.xd >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS hamming
    FROM x q JOIN x c ON q.idx = c.idx
    WHERE q.vec_id % 100 = 0 AND c.vec_id % 100 <> 0
    GROUP BY q.vec_id, c.vec_id
), short AS (
    SELECT qid, cid, hamming,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hamming, cid) AS hrank
    FROM hams
), scores AS (
    SELECT s.qid, s.cid,
           CAST(SUM(q.xv * c.xv) AS BIGINT) AS dot,
           CAST(SUM(c.xv * c.xv) AS BIGINT) AS cnorm2
    FROM short s
    JOIN x q ON q.vec_id = s.qid
    JOIN x c ON c.vec_id = s.cid AND c.idx = q.idx
    WHERE s.hrank <= {_BQ_SHORTLIST}
    GROUP BY s.qid, s.cid
)
SELECT qid, cid AS neighbor_id, rank, dot, cnorm2 FROM (
    SELECT qid, cid, dot, cnorm2,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(cnorm2 AS DOUBLE)) DESC, cid
           ) AS BIGINT) AS rank
    FROM scores WHERE cnorm2 > 0
) WHERE rank <= {_BQ_K}
"""


@_q("v_bq_rerank", _BQ_SQL)
def v_bq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage binary-quantized retrieval: sign-bit codes (one bit
    per embedding component, packed into a 64-bit BIGINT) build a
    Hamming shortlist, then exact cosine on the e6-snapped integer
    components reranks only the shortlist — the memory-bound ANN
    recipe modern vector stores ship (BQ + rescoring): the shortlist
    pass reads 8 bytes per corpus vector instead of 4·d, the exact
    pass touches shortlist·d values per query.

    Cross-engine exactness: the engine's bit_count(XOR) over packed
    codes equals the oracle's componentwise sign-mismatch count by
    construction; the rerank ranks by dot/sqrt(cnorm2) (the query norm
    is constant inside a partition, so this IS cosine order) where dot
    and cnorm2 are exact BIGINTs — sqrt and division are both
    correctly-rounded IEEE ops on identical inputs, so the rank is
    deterministic in both engines, and only integers are hashed.

    Scale posture: the codes table is built once per corpus scan (at
    production scale it IS the persisted index, the ann_index pattern);
    queries broadcast (8 bytes each); the shortlist leaves each
    partition pre-window via the (hamming, cid) TakeOrdered shape; the
    rerank join touches |queries|·shortlist corpus vectors only.
    Reference parity: the reference serves similarity from a
    native-index black box; this is the same two-stage contract as
    explicit relational algebra next to v_hamming_topk (binary corpus)
    and v_int8_cosine_topk (int8 corpus)."""
    from data_spark.operators.similarity import (  # noqa: PLC0415
        bq_rerank_topk,
        sign_bit_codes,
    )

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    c = emb.filter(F.col("vec_id") % 100 != 0)
    codes = sign_bit_codes(c, "vec_id", "embedding")
    return bq_rerank_topk(
        c, q, codes, k=_BQ_K, shortlist=_BQ_SHORTLIST, id_col="vec_id", vec_col="embedding"
    )



# ---------------------------------------------------------------------------
# s_knn_grid_join — bounded k-nearest-neighbor spatial join
# ---------------------------------------------------------------------------

_KNN_MOD = 100_000
_KNN_R = 2_000
_KNN_R2 = _KNN_R * _KNN_R
_KNN_K = 5

# Oracle: brute force (the oracle may be O(n*q); the engine may not).
_KNN_SQL = f"""
WITH pts AS (
    SELECT c_custkey AS id,
           CAST(('0x' || substr(md5('x' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % {_KNN_MOD} AS x,
           CAST(('0x' || substr(md5('y' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % {_KNN_MOD} AS y
    FROM customer
), q AS (
    SELECT id, x, y FROM pts WHERE id % 20 = 0
), cand AS (
    SELECT q.id AS qid, p.id AS cid,
           (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) AS dist2
    FROM q JOIN pts p ON p.id <> q.id
    WHERE (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) <= {_KNN_R2}
)
SELECT qid, cid AS neighbor_id, rank, dist2 FROM (
    SELECT qid, cid, dist2,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, cid) AS BIGINT) AS rank
    FROM cand
) WHERE rank <= {_KNN_K}
"""


@_q("s_knn_grid_join", _KNN_SQL)
def s_knn_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-nearest-neighbor spatial join: for every query point,
    the k nearest corpus points within radius r — exact, because the
    grid cell size equals r, so a query's 3x3 cell neighborhood
    contains EVERY point within r (the radius cap is what makes grid
    kNN exact; unbounded kNN needs expanding-ring search). Queries
    explode into their 9 neighbor cells, the corpus keeps its home
    cell, candidates form a pure equi-join on the composite cell id,
    and one per-query window takes the k nearest by exact integer
    squared distance. The kNN sibling of s_spatial_grid_join's radius
    join — same derived point set, same cell algebra.

    Scale posture: one shuffle on cell ids with candidate volume
    bounded by 9x cell occupancy (never n*q); the top-k window
    partitions by query id, so rank state never concentrates. Skewed
    cells (hot regions) salt the same way any skewed equi-join does
    (operators/skew.py)."""
    c = t(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    coord = lambda prefix: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat(F.lit(prefix), key)), 1, 15), 16, 10)
        .cast("bigint")
        % _KNN_MOD
    )
    pts = c.select(
        F.col("c_custkey").alias("id"), coord("x").alias("x"), coord("y").alias("y")
    )
    qpts = pts.filter(F.col("id") % 20 == 0).select(
        F.col("id").alias("qid"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
        F.explode(
            F.array(
                *[
                    ((F.col("x") / _KNN_R).cast("bigint") + dx) * 1_000_000
                    + ((F.col("y") / _KNN_R).cast("bigint") + dy)
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    )
    home = pts.select(
        F.col("id").alias("cid"),
        F.col("x").alias("cx"),
        F.col("y").alias("cy"),
        (
            (F.col("x") / _KNN_R).cast("bigint") * 1_000_000
            + (F.col("y") / _KNN_R).cast("bigint")
        ).alias("cell"),
    )
    dist2 = (F.col("qx") - F.col("cx")) * (F.col("qx") - F.col("cx")) + (
        F.col("qy") - F.col("cy")
    ) * (F.col("qy") - F.col("cy"))
    cand = (
        qpts.join(home, "cell")
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", dist2.alias("dist2"))
        .filter(F.col("dist2") <= _KNN_R2)
    )
    w = Window.partitionBy("qid").orderBy("dist2", "cid")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _KNN_K)
        .select("qid", F.col("cid").alias("neighbor_id"), "rank", "dist2")
    )


# ---------------------------------------------------------------------------
# pipe_stream_join_e2e — watermarked stream-stream event-time join
# ---------------------------------------------------------------------------

_SJ_SQL = """
WITH v AS (
    SELECT event_id AS view_id, user_id, ts AS view_ts
    FROM events WHERE event_type = 'view'
), c AS (
    SELECT event_id AS click_id, user_id, ts AS click_ts
    FROM events WHERE event_type = 'click'
)
SELECT v.user_id AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(v.view_id) AS BIGINT) AS sum_view_ids,
       CAST(SUM(c.click_id) AS BIGINT) AS sum_click_ids
FROM v JOIN c
  ON v.user_id = c.user_id
 AND c.click_ts >= v.view_ts
 AND c.click_ts <= v.view_ts + INTERVAL 1 HOUR
GROUP BY v.user_id
"""


@_q("pipe_stream_join_e2e", _SJ_SQL)
def pipe_stream_join_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream event-time join, gate-verified END TO
    END: views and clicks are split into three time-era files per side
    (mtimes forced ascending, so each micro-batch advances event time
    the way a live feed does), streamed through
    streaming.jobs.stream_event_time_join — click attributes to a
    same-user view it follows within an hour — into an append-mode
    parquet sink, and the drained result must equal the oracle's
    one-shot batch join over the whole table.

    The watermark/state contract does real work here: with 2-hour
    watermarks and the 1-hour range bound, view state is evicted as the
    watermark passes view_ts + 1h — and the era split proves no
    cross-batch match is lost to eviction, because a click can only
    match views at most 1h older and arrival is time-ordered (the
    Kafka-partition contract), so every needed view is still in state.
    At 100 TB/day the same bounds keep join state O(window), not
    O(stream). Reference parity: the reference joins clicks to
    impressions in batch after landing (twitter hydrate-then-join);
    this is the same semantics with bounded state and no re-land."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from data_spark.streaming.jobs import (  # noqa: PLC0415
        stream_event_time_join,
        stream_state_scope,
    )

    work = run_scratch_dir("sjoin", sf_dir)
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")

    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    eras = [
        ("1000-01-01", "2024-01-11"),
        ("2024-01-11", "2024-01-21"),
        ("2024-01-21", "3000-01-01"),
    ]
    srcs = {}
    for side, df, ts_col in (("views", views, "view_ts"), ("clicks", clicks, "click_ts")):
        src = os.path.join(work, side)
        os.makedirs(src)
        srcs[side] = src
        # one partitioned write per side instead of one filtered
        # scan+write per era (3 jobs → 1, guide §1.2/§2.4)
        stage_era_files(df, ts_col, eras, src, os.path.join(work, f"stage_{side}"))

    v_schema = views.schema
    c_schema = clicks.schema
    v_stream = (
        spark.readStream.schema(v_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcs["views"])
    )
    c_stream = (
        spark.readStream.schema(c_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcs["clicks"])
    )
    joined = stream_event_time_join(
        v_stream,
        c_stream,
        key="user_id",
        left_ts="view_ts",
        right_ts="click_ts",
        left_watermark="2 hours",
        right_watermark="2 hours",
        max_delay="1 hour",
    )
    # state partitions sized to the staged stream volume (footer count),
    # not the session constant — see stream_state_scope
    with stream_state_scope(spark, table_rows(spark, sf_dir, "events")):
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("pipe_stream_join_e2e: stream did not drain within 300s")

    return (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("view_id").cast("bigint").alias("sum_view_ids"),
            F.sum("click_id").cast("bigint").alias("sum_click_ids"),
        )
    )
