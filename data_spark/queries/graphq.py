"""Graph-algorithm gate queries (iterative — not SQL-expressible, so
these are rows-only driver checks; exactness is pytest-gated against
plain-Python reference iterations in tests/test_graph.py).

The graph is derived from the TPC-H-ish testdata: supplier→customer
edges wherever a supplier's lineitem belongs to a customer's order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_spark.graph.algorithms import connected_components, pagerank, triangle_count
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


def _supplier_customer_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )


_SQL_EDGES = """
  edges AS MATERIALIZED (
    SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  )
"""

_PR_ITERATIONS = 6
_PR_DAMPING = 0.85


def _pagerank_oracle_sql() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (DuckDB has no
    aggregate-in-recursive-CTE, but a FIXED iteration count needs no
    recursion at all). Float discipline: every constant is the same IEEE
    double Python bakes into the Spark plan — ``(1-d)/n`` is embedded as
    the repr of Python's ``1.0 - 0.85`` then divided by n IN-ENGINE, so
    both engines perform identical exactly-rounded IEEE ops; the only
    divergence left is SUM reassociation (~1e-16 relative), made
    invisible by the final round-half snap FLOOR(rank·1e8 + 0.5)
    (VERDICT r5 #5). Round-half, not FLOOR: PageRank's structural
    values — the teleport floor (1−d)/n, leaf ranks — are short
    decimals that sit ON the 1e-8 grid, exactly where FLOOR's decision
    boundary is, so ulp drift around them COULD flip the floored
    integer. The half-grid boundary at k+0.5 has no structural
    attractor, leaving only the ~1e-16-coincidence window
    (test_graph's ±1-ulp perturbation check pins every emitted score
    clear of it at the test SFs); see g_hits's oracle note."""
    one_minus_d = repr(1.0 - _PR_DAMPING)  # '0.15000000000000002'
    d = repr(_PR_DAMPING)
    parts = [
        _SQL_EDGES,
        """,
  verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
  nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM verts),
  deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
  links AS MATERIALIZED (
    SELECT e.src AS id, e.dst AS dst, d.deg FROM edges e JOIN deg d ON d.id = e.src
  ),
  r0 AS (SELECT v.id, CAST(1 AS DOUBLE) / nn.n AS rank FROM verts v CROSS JOIN nn)""",
    ]
    for k in range(1, _PR_ITERATIONS + 1):
        parts.append(
            f""",
  i{k} AS (
    SELECT l.dst AS id, SUM(r.rank / l.deg) AS inflow
    FROM links l JOIN r{k - 1} r ON r.id = l.id GROUP BY l.dst
  ),
  r{k} AS (
    SELECT v.id,
           CAST('{one_minus_d}' AS DOUBLE) / nn.n
             + CAST('{d}' AS DOUBLE) * COALESCE(i.inflow, CAST(0 AS DOUBLE)) AS rank
    FROM verts v CROSS JOIN nn LEFT JOIN i{k} i ON i.id = v.id
  )"""
        )
    parts.append(
        f"""
  SELECT id,
         CAST(FLOOR(rank * CAST(100000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rank_e8
  FROM r{_PR_ITERATIONS}
    """
    )
    return "WITH" + "".join(parts)


@_q("g_pagerank", _pagerank_oracle_sql())
def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier→customer graph (6 iterations, two
    shuffles each, lineage truncated every 3 — graph/algorithms.py).

    Hash-oracled since r4 (previously rows-only): the DuckDB oracle
    unrolls the same 6 iterations as chained CTEs with bit-identical
    IEEE constants, and both engines emit ranks round-half snapped to a
    1e-8 grid (FLOOR(rank·1e8 + 0.5) AS BIGINT — boundary-safe vs the
    grid-sitting structural values, VERDICT r5 #5) so double-sum
    reassociation between engines — bounded ~1e-16 relative — cannot
    flip the value hash."""
    edges = _supplier_customer_edges(spark, sf_dir)
    return pagerank(edges, iterations=_PR_ITERATIONS, damping=_PR_DAMPING).select(
        "id",
        F.floor(F.col("rank") * F.lit(1e8) + F.lit(0.5)).cast("bigint").alias("rank_e8"),
    )


@_q(
    "g_triangles",
    """
    WITH und AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS triangles
    FROM und e1
    JOIN und e2 ON e2.u = e1.v
    JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def g_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global triangle count over the part co-occurrence graph
    (parts sharing an order). The oracle counts id-ordered triangles
    (u < v < w); the engine uses degree-ordered orientation
    (graph/algorithms.triangle_count) — a different join order with a
    provably identical count, chosen because it bounds wedge fan-out by
    oriented out-degree (O(m^1.5) total) on skewed graphs."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    # the caller-side distinct looks redundant with triangle_count's
    # canonicalize+dedup, but measured FASTER kept (r11 profile: 4.18 s
    # vs 4.50 s at sf0.1) — it shrinks the cached und build's dedup
    # input from the ~6M-row raw join output to 1.2M edges
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return triangle_count(edges)


_CC_MAX_ITERATIONS = 20


def _components_oracle_sql() -> str:
    """Min-label propagation unrolled to the SAME iteration cap as the
    Spark operator. Soundness: connected_components raises (driver-red,
    not a wrong answer) if labels are still moving after
    ``_CC_MAX_ITERATIONS`` rounds, so whenever a hash comparison
    happens at all the Spark side has reached the fixed point — and a
    fixed point is stable under the oracle's extra rounds, so 20
    unrolled rounds are guaranteed to agree. Each round is one O(m)
    join+MIN (not a transitive closure — the d_fuzzy_dedup_resolve
    closure oracle is quadratic in component size, fine for small
    near-dup clusters but not for this graph's single giant component).
    MATERIALIZED pins each round; without it DuckDB may inline the
    twice-referenced previous round and double the plan per level."""
    parts = [
        _SQL_EDGES,
        """,
  sym AS MATERIALIZED (
    SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges
  ),
  l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lbl FROM sym)""",
    ]
    for k in range(1, _CC_MAX_ITERATIONS + 1):
        parts.append(
            f""",
  l{k} AS MATERIALIZED (
    SELECT id, MIN(lbl) AS lbl FROM (
      SELECT id, lbl FROM l{k - 1}
      UNION ALL
      SELECT s.b AS id, x.lbl FROM sym s JOIN l{k - 1} x ON x.id = s.a
    ) GROUP BY id
  )"""
        )
    parts.append(
        f"""
  SELECT lbl AS component, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM l{_CC_MAX_ITERATIONS} GROUP BY lbl
    """
    )
    return "WITH" + "".join(parts)


@_q("g_components", _components_oracle_sql())
def g_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (min-label propagation with early stop) of
    the same derived graph, summarized as component sizes.

    Hash-oracled since r4 (previously rows-only): labels are exact
    string mins — no float anywhere — so once both engines reach the
    fixed point the hash must match; see _components_oracle_sql for why
    the unrolled-20-rounds oracle is guaranteed to be at the fixed
    point whenever the Spark side returns at all."""
    edges = _supplier_customer_edges(spark, sf_dir)
    return (
        connected_components(edges, max_iterations=_CC_MAX_ITERATIONS)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


@_q(
    "g_clustering_coeff",
    """
    WITH und AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT u AS id FROM und UNION ALL SELECT v FROM und)
      GROUP BY id
    ), tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM und e1
      JOIN und e2 ON e2.u = e1.v
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ), per_node AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
      GROUP BY id
    )
    SELECT d.id, d.degree,
           COALESCE(p.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN 2.0 * COALESCE(p.n_triangles, 0) / (d.degree * (d.degree - 1))
                ELSE 0.0 END AS coeff
    FROM deg d LEFT JOIN per_node p ON d.id = p.id
    """,
)
def g_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient over the part
    co-occurrence graph (graph/algorithms.local_clustering). The oracle
    counts id-ordered triangles and attributes each to its three
    corners; the engine's degree-ordered orientation yields the same
    per-node counts with O(m^1.5) wedge work."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    from data_spark.graph.algorithms import local_clustering

    return local_clustering(edges)


_HITS_ITERATIONS = 3


def _hits_oracle_sql() -> str:
    """Unrolled fixed-iteration HITS mirroring graph.algorithms.hits
    half-step by half-step. Float discipline: every SUM routes through
    DECIMAL(38,18) — exact and order-independent inside each engine —
    so the only cross-engine drift left is the double→decimal rounding
    convention (Spark rounds the shortest decimal repr, DuckDB the
    exact binary expansion: ≤1 ulp at the 18th decimal per addend).
    The final round-half snap FLOOR(score·1e8 + 0.5) makes that
    bounded drift invisible (VERDICT r5 #5): HITS's structural values
    — L1-normalized scores of symmetric vertices, exact decimal shares
    like 0.25 — sit ON the 1e-8 grid where plain FLOOR's boundary is,
    so ulp drift around them could flip the floored integer; the
    half-grid boundary at k+0.5 has no structural attractor, leaving
    only a ~1e-16-coincidence window (pinned clear by test_graph's
    ±1-ulp perturbation check at the test SFs). Same contract as
    g_pagerank's oracle."""
    dsum = "CAST(SUM(CAST({expr} AS DECIMAL(38,18))) AS DOUBLE)"
    parts = [
        _SQL_EDGES,
        """,
  verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
  h0 AS (SELECT id, CAST(1 AS DOUBLE) AS hub FROM verts)""",
    ]
    for k in range(1, _HITS_ITERATIONS + 1):
        p = k - 1
        parts.append(
            f""",
  ar{k} AS (
    SELECT v.id, COALESCE(x.raw, CAST(0 AS DOUBLE)) AS raw
    FROM verts v LEFT JOIN (
      SELECT e.dst AS id, {dsum.format(expr='h.hub')} AS raw
      FROM edges e JOIN h{p} h ON h.id = e.src GROUP BY e.dst
    ) x ON x.id = v.id
  ),
  an{k} AS (SELECT {dsum.format(expr='raw')} AS norm FROM ar{k}),
  a{k} AS MATERIALIZED (
    SELECT id, raw / (SELECT norm FROM an{k}) AS auth FROM ar{k}
  ),
  hr{k} AS (
    SELECT v.id, COALESCE(x.raw, CAST(0 AS DOUBLE)) AS raw
    FROM verts v LEFT JOIN (
      SELECT e.src AS id, {dsum.format(expr='a.auth')} AS raw
      FROM edges e JOIN a{k} a ON a.id = e.dst GROUP BY e.src
    ) x ON x.id = v.id
  ),
  hn{k} AS (SELECT {dsum.format(expr='raw')} AS norm FROM hr{k}),
  h{k} AS MATERIALIZED (
    SELECT id, raw / (SELECT norm FROM hn{k}) AS hub FROM hr{k}
  )"""
        )
    parts.append(
        f"""
  SELECT h.id,
         CAST(FLOOR(h.hub * CAST(100000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS hub_e8,
         CAST(FLOOR(a.auth * CAST(100000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS auth_e8
  FROM h{_HITS_ITERATIONS} h JOIN a{_HITS_ITERATIONS} a ON a.id = h.id
    """
    )
    return "WITH" + "".join(parts)


@_q("g_hits", _hits_oracle_sql())
def g_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the supplier→customer graph
    (3 iterations, L1-normalized half-steps — graph/algorithms.hits).
    Suppliers accrue hub mass, customers authority mass; the recurrence
    couples them so a supplier's score reflects the standing of the
    customers it reaches, not just its degree.

    Hash-oracled: the DuckDB oracle unrolls the same 3 iterations with
    the same decimal(38,18)-summed, coalesce-0 recurrence, and both
    engines emit scores round-half snapped to a 1e-8 grid
    (FLOOR(score·1e8 + 0.5) — boundary-safe vs grid-sitting structural
    values, VERDICT r5 #5) so the ≤1-ulp double→decimal convention
    drift between engines cannot flip the value hash."""
    from data_spark.graph.algorithms import hits

    edges = _supplier_customer_edges(spark, sf_dir)
    return hits(edges, iterations=_HITS_ITERATIONS).select(
        "id",
        F.floor(F.col("hub") * F.lit(1e8) + F.lit(0.5)).cast("bigint").alias("hub_e8"),
        F.floor(F.col("auth") * F.lit(1e8) + F.lit(0.5)).cast("bigint").alias("auth_e8"),
    )


# ---------------------------------------------------------------------------
# Luby's maximal-independent-set, derandomized: the classic O(log n)-
# round distributed-greedy MIS (Luby 1986) with the random priorities
# replaced by the portable md5-prefix hash (id tiebreak), so every
# engine / partitioning / retry picks the identical set. Fixed
# _MIS_ROUNDS rounds — vertices still active afterwards are reported
# 'undecided' (the honest fixed-iteration contract BFS/k-core also
# use), never silently guessed. Per round: one neighbor-min join+agg
# over the active frame, one neighbor expansion of the round's
# winners, two anti-joins — all equi-keyed, nothing all-pairs.
# MIS is the scheduling primitive behind conflict-free parallel
# application (e.g. applying near-dup merge decisions so no two
# adjacent merges run in the same wave).
# ---------------------------------------------------------------------------

_MIS_ROUNDS = 3


def _mis_oracle() -> str:
    parts = [
        _SQL_EDGES,
        """,
        sym AS MATERIALIZED (
          SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges
        ),
        a0 AS (
          SELECT DISTINCT a AS id,
                 lpad(CAST(CAST(('0x' || substr(md5(a), 1, 15)) AS BIGINT) AS VARCHAR),
                      19, '0') || '|' || a AS pri
          FROM sym
        )
        """,
    ]
    for k in range(1, _MIS_ROUNDS + 1):
        parts.append(
            f"""
            , nmin{k} AS (
              SELECT s.a AS id, MIN(x.pri) AS mn
              FROM sym s JOIN a{k - 1} x ON x.id = s.b
              GROUP BY 1
            ), cand{k} AS MATERIALIZED (
              SELECT v.id FROM a{k - 1} v LEFT JOIN nmin{k} n ON n.id = v.id
              WHERE n.mn IS NULL OR v.pri < n.mn
            ), rem{k} AS MATERIALIZED (
              SELECT DISTINCT s.b AS id
              FROM sym s JOIN cand{k} c ON c.id = s.a
              WHERE s.b IN (SELECT id FROM a{k - 1})
            ), a{k} AS MATERIALIZED (
              SELECT v.id, v.pri FROM a{k - 1} v
              WHERE v.id NOT IN (SELECT id FROM cand{k})
                AND v.id NOT IN (SELECT id FROM rem{k})
            )
            """
        )
    finals = [
        f"SELECT id, 'mis' AS status, CAST({k} AS BIGINT) AS rnd FROM cand{k}"
        for k in range(1, _MIS_ROUNDS + 1)
    ] + [
        f"SELECT id, 'out' AS status, CAST({k} AS BIGINT) AS rnd FROM rem{k}"
        for k in range(1, _MIS_ROUNDS + 1)
    ] + [
        f"SELECT id, 'undecided' AS status, CAST(0 AS BIGINT) AS rnd FROM a{_MIS_ROUNDS}"
    ]
    return "WITH " + "".join(parts) + " " + " UNION ALL ".join(finals)


@_q("g_mis_luby", _mis_oracle())
def g_mis_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derandomized Luby MIS over the supplier-customer graph: 3
    synchronous rounds, hash priorities, (id, status, rnd) output —
    status 'mis' (joined the set in round rnd), 'out' (lost to an MIS
    neighbor in round rnd), or 'undecided' (still active after the
    fixed rounds, rnd 0).

    Hash-verified against the unrolled round-by-round CTE oracle;
    independence/maximality laws + python mirror in tests/test_graph.py.
    Cited parity: the reference's graph dedup batches conflict-free
    Cypher MERGE waves by hand (graph/fec.py amendment batching); MIS
    is that wave-scheduling primitive as an operator."""
    from data_spark.operators.dedup import _portable_hash60
    from data_spark.plans.lineage import truncate_lineage

    edges = _supplier_customer_edges(spark, sf_dir)
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .transform(truncate_lineage)
    )
    active = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "pri",
        F.concat(
            F.lpad(_portable_hash60(F.col("id")).cast("string"), 19, "0"),
            F.lit("|"),
            F.col("id"),
        ),
    ).transform(truncate_lineage)
    out_parts = []
    for k in range(1, _MIS_ROUNDS + 1):
        nmin = (
            sym.join(active.withColumnRenamed("id", "b"), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("pri").alias("mn"))
        )
        cand = (
            active.join(nmin, "id", "left")
            .filter(F.col("mn").isNull() | (F.col("pri") < F.col("mn")))
            .select("id")
            .transform(truncate_lineage)
        )
        rem = (
            sym.join(cand.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"))
            .distinct()
            .join(active.select("id"), "id")  # only still-active neighbors
            .transform(truncate_lineage)
        )
        out_parts.append(
            cand.select("id", F.lit("mis").alias("status"), F.lit(k).cast("bigint").alias("rnd"))
        )
        out_parts.append(
            rem.select("id", F.lit("out").alias("status"), F.lit(k).cast("bigint").alias("rnd"))
        )
        active = (
            active.join(cand, "id", "left_anti")
            .join(rem, "id", "left_anti")
            .transform(truncate_lineage)
        )
    out_parts.append(
        active.select("id", F.lit("undecided").alias("status"), F.lit(0).cast("bigint").alias("rnd"))
    )
    res = out_parts[0]
    for p in out_parts[1:]:
        res = res.unionByName(p)
    return res
