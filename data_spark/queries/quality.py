"""Practical-engine tier added late in round 4: data-quality constraint
auditing (the dbt-test / Deequ shape), a planar spatial-grid
neighbor join (the geospatial radius-join shape, kept trig-free so the
distance math is integer-exact in both engines), and a fixed-depth
bill-of-materials hierarchical rollup (the recursive part-explosion
shape at a deterministic depth).

All three carry exact DuckDB oracles.
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


@_q(
    "dq_constraint_audit",
    """
    SELECT 'orderkey_unique' AS rule,
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'custkey_fk_orphans',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'shipdate_not_null',
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'discount_in_range',
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'quantity_positive',
           CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orderstatus_domain',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    """,
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the Deequ/dbt-test shape): six
    constraint rules — key uniqueness, FK orphans (anti-join),
    not-null, numeric range, positivity, and a value-domain check —
    each reduced to a violation count and unioned into one report.
    Every rule is a single scan-side aggregate (the FK check is one
    anti-join); at 100 TB the whole audit is a handful of
    map-side-combinable passes, and the three lineitem rules share ONE
    scan — a single wide aggregate unpivoted into report rows."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")

    dup = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(
            F.lit("orderkey_unique").alias("rule"),
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("bigint").alias("n_violations"),
        )
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(
            F.lit("custkey_fk_orphans").alias("rule"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        )
    )

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    # the three lineitem rules share ONE scan/aggregate, then unpivot
    # the single wide row into (rule, n_violations) rows
    li_rules = li.agg(
        cnt(F.col("l_shipdate").isNull()).alias("shipdate_not_null"),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "discount_in_range"
        ),
        cnt(F.col("l_quantity") <= 0).alias("quantity_positive"),
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("rule"), F.col(r).alias("n_violations"))
                    for r in (
                        "shipdate_not_null",
                        "discount_in_range",
                        "quantity_positive",
                    )
                ]
            )
        ).alias("rv")
    ).select("rv.rule", "rv.n_violations")
    domain = o.agg(
        F.lit("orderstatus_domain").alias("rule"),
        cnt(~F.col("o_orderstatus").isin("O", "F", "P")).alias("n_violations"),
    )
    return dup.unionByName(orphans).unionByName(li_rules).unionByName(domain)


# ---------------------------------------------------------------------------
# Planar spatial radius join. Points are derived deterministically from
# customer keys via md5-prefix hashes (Poisson-like scatter — a
# multiplicative lattice was tried first and its minimum pair distance
# exceeded any useful radius), the grid
# cell size equals the radius, and each LEFT-side point explodes into
# its 3×3 cell neighborhood so candidates form an equi-join on the
# cell id — the standard grid-file spatial join: candidate volume is
# bounded by cell occupancy, never n².
# ---------------------------------------------------------------------------

_SP_MOD = 100_000
_SP_R = 500
_SP_R2 = _SP_R * _SP_R


@_q(
    "s_spatial_grid_join",
    f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST(('0x' || substr(md5('x' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % {_SP_MOD} AS x,
             CAST(('0x' || substr(md5('y' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % {_SP_MOD} AS y
      FROM customer
    ), cells AS (
      SELECT id, x, y,
             (x // {_SP_R} + dx) * 1000000 + (y // {_SP_R} + dy) AS cell
      FROM pts, UNNEST([-1, 0, 1]) AS t1(dx), UNNEST([-1, 0, 1]) AS t2(dy)
    ), home AS (
      SELECT id, x, y, (x // {_SP_R}) * 1000000 + (y // {_SP_R}) AS cell FROM pts
    )
    SELECT a.id AS id_a, b.id AS id_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
    FROM cells a JOIN home b ON a.cell = b.cell AND a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_SP_R2}
    """,
)
def s_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within radius 500 on a 100000×100000 plane, via
    grid-cell banding: the LEFT side explodes into its 9 neighbor
    cells, the RIGHT side keeps only its home cell, so every true pair
    is found exactly once (no cross-cell dedup needed: each (a,b) pair
    meets in exactly one cell — b's home) and the join is a pure
    equi-join on the composite cell id. Distances are integer
    squared-Euclidean — exact in both engines, no trig, no floats;
    the same shape handles haversine by padding the radius at the
    banding stage and refining exactly inside."""
    c = t(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    coord = lambda prefix: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat(F.lit(prefix), key)), 1, 15), 16, 10)
        .cast("bigint")
        % _SP_MOD
    )
    pts = c.select(
        F.col("c_custkey").alias("id"), coord("x").alias("x"), coord("y").alias("y")
    )
    cell_of = lambda xx, yy: (  # noqa: E731
        (xx / _SP_R).cast("bigint") * 1_000_000 + (yy / _SP_R).cast("bigint")
    )
    neighbors = pts.select(
        "id",
        "x",
        "y",
        F.explode(
            F.array(
                *[
                    ((F.col("x") / _SP_R).cast("bigint") + dx) * 1_000_000
                    + ((F.col("y") / _SP_R).cast("bigint") + dy)
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    )
    home = pts.select("id", "x", "y", cell_of(F.col("x"), F.col("y")).alias("cell"))
    a, b = neighbors.alias("a"), home.alias("b")
    dist2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id")),
        )
        .filter(dist2 <= _SP_R2)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist2.alias("dist2"),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-depth BOM rollup: parts form a synthetic 10-ary hierarchy
# (parent = key DIV 10). Each node's rollup sums retail price over
# itself, children, and grandchildren — two equi-joins on the parent
# key, decimal-exact, no recursion needed because the depth is a
# compile-time constant (the same fixed-depth trick as g_kcore_peel).
# ---------------------------------------------------------------------------


@_q(
    "h_bom_rollup",
    """
    WITH p AS (
      SELECT p_partkey AS k,
             NULLIF(p_partkey // 10, p_partkey) AS parent,
             CAST(p_retailprice AS DECIMAL(38,6)) AS price
      FROM part
    ), child_sum AS (
      SELECT parent AS k, CAST(COUNT(*) AS BIGINT) AS n_children,
             SUM(price) AS c_price
      FROM p GROUP BY parent
    ), grandchild_sum AS (
      SELECT c.parent AS k, CAST(COUNT(*) AS BIGINT) AS n_grandchildren,
             SUM(g.price) AS g_price
      FROM p g JOIN p c ON g.parent = c.k
      GROUP BY c.parent
    )
    SELECT p.k AS part_key,
           COALESCE(cs.n_children, 0) AS n_children,
           COALESCE(gs.n_grandchildren, 0) AS n_grandchildren,
           CAST(p.price + COALESCE(cs.c_price, 0) + COALESCE(gs.g_price, 0) AS DOUBLE)
             AS subtree_price
    FROM p
    LEFT JOIN child_sum cs ON cs.k = p.k
    LEFT JOIN grandchild_sum gs ON gs.k = p.k
    """,
)
def h_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level bill-of-materials rollup over the synthetic 10-ary
    part hierarchy: per part, the child/grandchild counts and the
    decimal-exact price total of its depth-≤2 subtree. Aggregate-
    then-join: children and grandchildren are pre-summed per parent
    BEFORE joining back to the node table, so the joins move one row
    per node, not one per descendant — the shape that survives a
    100 TB parts table with deep fan-out."""
    # nullif guards the root: key 0's integer parent is itself, and a
    # self-loop would count the root twice in its own subtree
    p = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.nullif(
            (F.col("p_partkey") / 10).cast("bigint"), F.col("p_partkey")
        ).alias("parent"),
        F.col("p_retailprice").cast("decimal(38,6)").alias("price"),
    )
    child_sum = p.groupBy(F.col("parent").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_children"),
        F.sum("price").alias("c_price"),
    )
    g, c = p.alias("g"), p.alias("c")
    grandchild_sum = (
        g.join(c, F.col("g.parent") == F.col("c.k"))
        .groupBy(F.col("c.parent").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grandchildren"),
            F.sum(F.col("g.price")).alias("g_price"),
        )
    )
    return (
        p.join(child_sum, "k", "left")
        .join(grandchild_sum, "k", "left")
        .select(
            F.col("k").alias("part_key"),
            F.coalesce("n_children", F.lit(0)).alias("n_children"),
            F.coalesce("n_grandchildren", F.lit(0)).alias("n_grandchildren"),
            (
                F.col("price")
                + F.coalesce(F.col("c_price"), F.lit(0))
                + F.coalesce(F.col("g_price"), F.lit(0))
            )
            .cast("double")
            .alias("subtree_price"),
        )
    )


_PROFILE_STR_COLS = ("o_orderstatus", "o_orderpriority")


def _profile_oracle_sql() -> str:
    arms = []
    for c in _PROFILE_STR_COLS:
        arms.append(
            f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           MIN({c}) AS min_s,
           MAX({c}) AS max_s,
           CAST(FLOOR(CAST(SUM(length({c})) AS DOUBLE) / COUNT({c}) * 1000000)
                AS BIGINT) AS avg_len_e6
    FROM orders"""
        )
    arms.append(
        """
    SELECT 'o_orderdate' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_distinct,
           strftime(MIN(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS min_s,
           strftime(MAX(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS max_s,
           CAST(NULL AS BIGINT) AS avg_len_e6
    FROM orders"""
    )
    arms.append(
        """
    SELECT 'o_totalprice' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           CAST(CAST(FLOOR(MIN(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS min_s,
           CAST(CAST(FLOOR(MAX(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS max_s,
           CAST(NULL AS BIGINT) AS avg_len_e6
    FROM orders"""
    )
    return "\nUNION ALL".join(arms)


@_q("dq_profile", _profile_oracle_sql())
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler (the Deequ/dbt profiling shape): for
    each profiled column of orders — null count, distinct count,
    min/max, average length — emitted as one (col_name, metrics) row
    per column. Numeric min/max are snapped to cent-scaled integers so
    the report is engine-portable; the numeric column's avg_len is NULL
    by design.

    Scale shape: ALL metrics for ALL columns come from ONE wide
    aggregate over ONE scan of the table (the per-column distinct
    counts expand to Spark's standard distinct-aggregate rewrite), and
    the wide row is unpivoted to report rows by an explode over a
    literal array — row volume equals the column count, never the data.
    The oracle recomputes per column for readability; the engine never
    rescans."""
    o = t(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_STR_COLS:
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{c}__n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{c}__n_null"),
            F.countDistinct(F.col(c)).cast("bigint").alias(f"{c}__n_distinct"),
            F.min(F.col(c)).alias(f"{c}__min_s"),
            F.max(F.col(c)).alias(f"{c}__max_s"),
            F.floor(
                F.sum(F.length(F.col(c))).cast("double")
                / F.count(F.col(c))
                * F.lit(1000000)
            )
            .cast("bigint")
            .alias(f"{c}__avg_len_e6"),
        ]
    aggs += [
        F.count(F.lit(1)).cast("bigint").alias("o_orderdate__n_rows"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("o_orderdate__n_null"),
        F.countDistinct(F.to_date("o_orderdate"))
        .cast("bigint")
        .alias("o_orderdate__n_distinct"),
        F.date_format(F.min(F.to_date("o_orderdate")), "yyyy-MM-dd").alias(
            "o_orderdate__min_s"
        ),
        F.date_format(F.max(F.to_date("o_orderdate")), "yyyy-MM-dd").alias(
            "o_orderdate__max_s"
        ),
        F.lit(None).cast("bigint").alias("o_orderdate__avg_len_e6"),
    ]
    aggs += [
        F.count(F.lit(1)).cast("bigint").alias("o_totalprice__n_rows"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("o_totalprice__n_null"),
        F.countDistinct(F.col("o_totalprice"))
        .cast("bigint")
        .alias("o_totalprice__n_distinct"),
        F.floor(F.min("o_totalprice") * 100)
        .cast("bigint")
        .cast("string")
        .alias("o_totalprice__min_s"),
        F.floor(F.max("o_totalprice") * 100)
        .cast("bigint")
        .cast("string")
        .alias("o_totalprice__max_s"),
        F.lit(None).cast("bigint").alias("o_totalprice__avg_len_e6"),
    ]
    wide = o.agg(*aggs)
    cols = list(_PROFILE_STR_COLS) + ["o_orderdate", "o_totalprice"]
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"{c}__n_rows").alias("n_rows"),
                        F.col(f"{c}__n_null").alias("n_null"),
                        F.col(f"{c}__n_distinct").alias("n_distinct"),
                        F.col(f"{c}__min_s").alias("min_s"),
                        F.col(f"{c}__max_s").alias("max_s"),
                        F.col(f"{c}__avg_len_e6").alias("avg_len_e6"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.*")


@_q(
    "dq_langid_eval",
    r"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(str_split_regex(trim(lower(text)), '\s+'),
                 w -> w IN ('the','and','of','to','is','in'))) AS en_score,
             len(list_filter(str_split_regex(trim(lower(text)), '\s+'),
                 w -> w IN ('el','la','de','que','y','en'))) AS es_score,
             len(list_filter(str_split_regex(trim(lower(text)), '\s+'),
                 w -> w IN ('le','la','de','et','est','un'))) AS fr_score
      FROM documents
    ),
    pred AS (
      SELECT lang AS actual,
             CASE WHEN en_score >= es_score AND en_score >= fr_score AND en_score > 0 THEN 'en'
                  WHEN es_score >= fr_score AND es_score > 0 THEN 'es'
                  WHEN fr_score > 0 THEN 'fr'
                  ELSE 'unknown' END AS predicted
      FROM scored
    ),
    cells AS (
      SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT actual, predicted, n,
           CAST(1000000 * n // SUM(n) OVER (PARTITION BY actual) AS BIGINT) AS share_of_actual_ppm,
           CAST(1000000 * n // SUM(n) OVER (PARTITION BY predicted) AS BIGINT) AS share_of_predicted_ppm
    FROM cells
    """,
)
def dq_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a query: the lang-ID heuristic's
    confusion matrix against the corpus's ground-truth ``lang`` column,
    with per-cell recall/precision shares in exact integer ppm
    (diagonal cells' share_of_actual = recall, share_of_predicted =
    precision). The evaluation-harness member of the quality tier —
    model quality gates at 100 TB are this exact shape: one prediction
    pass, one confusion groupBy over the bounded label lattice, window
    totals over |labels|² rows. Cited parity: generalizes the
    reference's per-shard count validations to labeled-accuracy gates."""
    from data_spark.operators.textstats import language_id
    from pyspark.sql.window import Window

    pred = language_id(t(spark, sf_dir, "documents")).select(
        F.col("lang").alias("actual"), F.col("predicted_lang").alias("predicted")
    )
    cells = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return cells.select(
        "actual",
        "predicted",
        "n",
        F.expr("1000000 * n DIV SUM(n) OVER (PARTITION BY actual)").alias(
            "share_of_actual_ppm"
        ),
        F.expr("1000000 * n DIV SUM(n) OVER (PARTITION BY predicted)").alias(
            "share_of_predicted_ppm"
        ),
    )
