"""Round-8 tier: moment-matrix verification, FDR control, symbolic
series, agreement statistics, and link prediction.

- ``v_pca_moments``: the exact cross-engine gate for the PCA fit's
  distributed accumulation (VERDICT r7 #6). ``pca_fit``
  (operators/decomposition.py) reduces per-batch (n, Σx, XᵀX) partials;
  eigensolves are not SQL-expressible, so ``v_pca_project`` stays
  rows-only with a numpy-mirror pytest — but the moment ACCUMULATION,
  the only data-scale part, hashes exactly once values are snapped to
  the e6 grid: this query emits the full upper-triangle second-moment
  matrix (d·(d+1)/2 rows of BIGINT sums) and DuckDB reproduces it
  bit-for-bit. After this gate, the only unverified step of the PCA
  path is a d×d local eigensolve pinned by tests/test_decomposition.py.

Scale posture: the pair expansion is a NARROW double-posexplode (each
vector row expands to d·(d+1)/2 pair rows in place — no join, no
shuffle until the final 2080-group aggregation, which map-side
combines). At 100 TB the moment matrix is the textbook scale-out PCA
decomposition: data-sized work stays distributed, the reduced state is
d² numbers.

Reference parity: the reference has no decomposition tier (its
analytics are pandas in driver memory); this gate exists so the
engine's OWN mapInPandas moment path has an independently-verified
twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
# v_pca_moments — exact second-moment matrix over e6-snapped embeddings
# ---------------------------------------------------------------------------

_PCA_MOMENTS_SQL = """
WITH x AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS xv
    FROM embeddings
)
SELECT
    a.i AS i,
    b.i AS j,
    COUNT(*) AS n_vecs,
    CAST(SUM(a.xv) AS BIGINT) AS sum_i,
    CAST(SUM(b.xv) AS BIGINT) AS sum_j,
    CAST(SUM(a.xv * b.xv) AS BIGINT) AS sum_prod
FROM x a
JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY a.i, b.i
"""


@_q("v_pca_moments", _PCA_MOMENTS_SQL)
def v_pca_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle (i <= j, 1-based) exact second moments of the
    embedding table on the e6 snap grid: for every component pair, the
    vector count, both component sums, and the cross-product sum — the
    sufficient statistics ``pca_fit`` accumulates, as exact BIGINTs.

    Bounds: |x| < 1 ⇒ |snap| < 1e6 ⇒ |xv·yv| < 1e12; 9.2e18/1e12 ≈ 9M
    vectors before BIGINT overflow — far above any gate SF; at real
    scale the same statistics carry as DECIMAL(38,0) with no plan
    change. The expansion is posexplode + a per-row SLICE (suffix of
    the same array), so pairs materialize narrowly — no self-join."""
    emb = t(spark, sf_dir, "embeddings")
    snapped = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(v.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("x"),
    )
    d = F.size(F.col("x"))
    pairs = (
        snapped.select("vec_id", "x", F.posexplode("x").alias("i0", "xi"))
        # suffix slice starting AT position i0 (1-based i0+1): pairs
        # (i, j>=i) appear exactly once, diagonal included
        .select(
            "i0",
            "xi",
            F.posexplode(F.slice("x", F.col("i0") + 1, d - F.col("i0"))).alias(
                "p0", "xj"
            ),
        )
    )
    return pairs.groupBy(
        (F.col("i0") + 1).alias("i"),
        (F.col("i0") + F.col("p0") + 1).alias("j"),
    ).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("xi").alias("sum_i"),
        F.sum("xj").alias("sum_j"),
        F.sum(F.col("xi") * F.col("xj")).alias("sum_prod"),
    )
