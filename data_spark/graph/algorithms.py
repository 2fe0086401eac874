"""Iterative graph algorithms on edge DataFrames.

The reference's graph side is Cypher queries over Neo4j (scans +
anti-patterns, graph/tables.py); ranking/centrality belongs to the same
surface but is iterative, so it cannot be a single SQL statement. Here
each iteration is declared as one join + one aggregation and the loop
runs on the driver — Catalyst plans every iteration, and lineage is
truncated periodically so planning cost stays O(1) per iteration instead
of growing with the unrolled loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_spark.plans.lineage import iteration_scope, truncate_lineage


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
    source: str | None = None,
) -> DataFrame:
    """PageRank over an edge list; returns (id, rank).

    With ``source`` set this computes PERSONALIZED PageRank: the rank
    mass starts at the source and teleports back to it — the standard
    random-walk-with-restart relevance score around one node, the graph
    analogue of the item-CF seed expansion. Same per-iteration plan;
    only the init vector and the teleport term change.

    Per iteration: contributions = links ⋈ ranks on the source id,
    then one groupBy(dst) SUM. Both static frames (links, verts) are
    cached PRE-PARTITIONED on the id key: the heavy links side is never
    reshuffled — per iteration either AQE broadcasts the skinny ranks
    frame into it (small n) or the sort-merge join aligns on the cached
    id-hash partitioning and only the ranks side moves. No driver-side
    data movement either way. Every ``checkpoint_every`` iterations the
    ranks DataFrame is lineage-truncated (truncate_lineage): without it
    the logical plan doubles per iteration and planning time eventually
    dwarfs execution.

    Simplified formulation (as in Spark's own PageRank example):
    rank = (1−d)/n + d·inflow; dangling-node mass is not redistributed.
    """
    # The caller's edge frame is often expensive (e.g. a fact-table
    # self-join); verts, out_deg and links would otherwise each rebuild
    # it from scratch — cache it for the setup phase only.
    edges = edges.cache()
    verts = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .repartition("id")
        .cache()
    )
    n = verts.count()
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    links = (
        edges.join(out_deg, src)
        .select(F.col(src).alias("id"), F.col(dst).alias("dst"), "deg")
        .repartition("id")
        .cache()
    )
    links.count()  # materialize off the edge cache before dropping it
    edges.unpersist()
    if source is None:
        ranks = verts.select("id", F.lit(1.0 / n).alias("rank"))
        teleport = F.lit((1.0 - damping) / n)
    else:
        ranks = verts.select(
            "id",
            F.when(F.col("id") == source, F.lit(1.0)).otherwise(F.lit(0.0)).alias(
                "rank"
            ),
        )
        teleport = (
            F.when(F.col("id") == source, F.lit(1.0 - damping))
            .otherwise(F.lit(0.0))
        )
    # AQE off for the loop AND the final cascade that executes it: the
    # per-iteration frames are skinny and pre-partitioned on unchanging
    # keys, so runtime re-planning only adds a round trip per stage
    # (measured −8% wall at sf0.1, interleaved A/B; see
    # plans.lineage.iteration_scope)
    with iteration_scope(edges.sparkSession):
        # SPARSE loop (guide §1.2/§2.4): the per-iteration state is the
        # inflow frame (vertices with >=1 in-link) instead of the dense
        # rank vector, and the rank expression rank = teleport +
        # d*coalesce(inflow, 0) is inlined into the links join — the
        # former verts LEFT JOIN per iteration existed only to fill
        # zeros no contribution ever reads (0/deg contributes exactly
        # 0.0 to a sum; every links row matches the join either way),
        # so dropping it removes one join per iteration without moving
        # a single double: the dense vector is reconstructed once after
        # the loop.
        inflow = None
        for i in range(iterations):
            if inflow is None:
                contribs = links.join(ranks, "id").select(
                    "dst", (F.col("rank") / F.col("deg")).alias("c")
                )
            else:
                contribs = links.join(
                    inflow.withColumnRenamed("dst", "id"), "id", "left"
                ).select(
                    "dst",
                    (
                        (
                            teleport
                            + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                        )
                        / F.col("deg")
                    ).alias("c"),
                )
            inflow = contribs.groupBy("dst").agg(F.sum("c").alias("inflow"))
            if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
                inflow = inflow.transform(truncate_lineage)
        if inflow is not None:  # iterations == 0 keeps the init vector
            ranks = (
                verts.join(inflow.withColumnRenamed("dst", "id"), "id", "left")
                .select(
                    "id",
                    (
                        teleport
                        + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
        # Materialize the result (eager: the lazy in-loop marks cascade
        # here, while verts/links are still cached), then release the
        # cached blocks: long-lived sessions (bench/driver) run many
        # queries, so leaked cache blocks accumulate (ADVICE r2).
        ranks = truncate_lineage(ranks, eager=True)
    verts.unpersist()
    links.unpersist()
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle count of an undirected graph; returns one row
    (triangles BIGINT). Edges may arrive in either direction and with
    duplicates — they are canonicalized to u < v first.

    Scale posture: the classic degree-ordered orientation — every edge
    is directed from its lower-(degree, id) endpoint to the higher one,
    so each triangle is generated exactly once and, crucially, every
    vertex's ORIENTED out-degree is O(√m) even for power-law hubs (a
    hub's edges all point toward it). Counting is the compact-forward
    algorithm (Latapy 2008): triangles = Σ over oriented edges (u,v) of
    |N⁺(u) ∩ N⁺(v)| — each oriented edge probes two out-adjacency
    arrays instead of materializing the wedge set as rows. Versus the
    wedge-join + closing-semi-join formulation this shuffles O(m)
    adjacency entries once rather than O(Σ outdeg²) wedge rows
    (measured 4× faster at sf0.1, where 1.2 M edges expand to 49 M
    wedges), with the same O(m^1.5) intersection work, done JVM-side
    inside one aggregate. Array sizes are bounded by the O(√m)
    out-degree, so no hub ever produces an oversized row.
    """
    oriented, und = _orient_by_degree(edges, src, dst)
    joined = _with_out_neighbors(oriented)
    out = joined.agg(
        # coalesce: SUM over an empty edge set is NULL, but a
        # triangle-free graph must report 0 like COUNT(*) did
        F.coalesce(F.sum(F.size(F.array_intersect("na", "nb"))), F.lit(0))
        .cast("bigint")
        .alias("triangles")
    ).transform(lambda d: truncate_lineage(d, eager=True))
    oriented.unpersist()
    und.unpersist()
    return out


def _orient_by_degree(edges: DataFrame, src: str, dst: str):
    """Canonicalize to u < v, drop self-loops/dups, then direct every
    edge from its lower-(degree, id) endpoint to the higher one.
    Returns (oriented, und) — BOTH cached: und because the degree count
    and the orientation joins would otherwise rebuild the caller's
    (often fact-self-join) edge frame 3×, oriented because every
    consumer reads it several times. The CALLER unpersists both after
    materializing its result. Cache, not an eager checkpoint: the
    blocks stay in executor memory without checkpoint's extra write
    pass, and nothing downstream needs lineage truncation here."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .union(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .cache()
    )
    return oriented, und


def _with_out_neighbors(oriented: DataFrame) -> DataFrame:
    """Attach both endpoints' out-adjacency arrays to every oriented
    edge: (a, b, na, nb). Inner joins are sound — a always has an
    out-edge (this one), and a b with no out-neighbors contributes an
    empty intersection either way."""
    adj = oriented.groupBy("a").agg(F.sort_array(F.collect_list("b")).alias("nbrs"))
    adj_u = adj.select(F.col("a").alias("u_"), F.col("nbrs").alias("na"))
    adj_v = adj.select(F.col("a").alias("v_"), F.col("nbrs").alias("nb"))
    return (
        oriented.join(adj_u, oriented.a == adj_u.u_)
        .join(adj_v, oriented.b == adj_v.v_)
        .select("a", "b", "na", "nb")
    )


def local_clustering(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-vertex triangle counts and local clustering coefficient:
    (id, degree, n_triangles, coeff) with coeff = 2·T / (deg·(deg−1))
    for deg ≥ 2, else 0.

    Same degree-ordered orientation + compact-forward intersection as
    :func:`triangle_count` (each triangle found exactly once, at its
    pivot edge), then every found triangle (a, b, w) is attributed to
    all three corners via one explode — so per-node attribution costs
    one skinny shuffle of O(#triangles) rows on top of the global
    count, never the wedge multiset.
    """
    oriented, und = _orient_by_degree(edges, src, dst)
    deg = (
        oriented.select(F.col("a").alias("id"))
        .union(oriented.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tris = _with_out_neighbors(oriented).select(
        "a", "b", F.explode(F.array_intersect("na", "nb")).alias("w")
    )
    per_node = (
        tris.select(F.explode(F.array("a", "b", "w")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        deg.join(per_node, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
        # eager: materialize before unpersisting the cached edge frames
        .transform(lambda d: truncate_lineage(d, eager=True))
    )
    oriented.unpersist()
    und.unpersist()
    return out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components by iterative label propagation (min-id
    spreading); returns (id, component) where component is the smallest
    reachable vertex id.

    Each round every vertex adopts the minimum label among itself and
    its neighbors (one symmetric join + one MIN agg). Converges in
    O(graph diameter) rounds — the loop stops early when a round changes
    nothing, detected by comparing a 64-bit fingerprint of the label
    assignment across rounds: SUM(xxhash64(id, component)) is one
    map-side-combinable aggregate over the new frame, replacing the
    join-with-previous-round + count a literal changed-rows check costs
    (min-label only ever DECREASES labels, so fingerprint equality ⇔
    fixpoint up to a 2^-64 hash-collision chance — and a collision can
    only stop the loop at most one round early, never corrupt labels).
    Lineage is truncated per round via truncate_lineage.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition("a")
        .cache()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .transform(truncate_lineage)
    )

    def fingerprint(frame: DataFrame):
        # decimal accumulator: ANSI mode makes a plain long SUM raise on
        # overflow, and 64-bit hashes summed over millions of rows will
        return frame.agg(
            F.sum(F.xxhash64("id", "component").cast("decimal(38,0)")).alias("fp")
        ).collect()[0]["fp"]

    prev_fp = fingerprint(labels)
    converged = False
    # AQE off for the loop (skinny pre-partitioned frames; see
    # plans/lineage.iteration_scope) — ~20% of wall at bench scale
    with iteration_scope(edges.sparkSession):
        for _ in range(max_iterations):
            neighbor_min = (
                sym.join(labels, sym.a == labels.id)
                .groupBy(F.col("b").alias("id"))
                .agg(F.min("component").alias("nbr_min"))
            )
            labels = (
                labels.join(neighbor_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                    ).alias("component"),
                )
                .transform(truncate_lineage)
            )
            fp = fingerprint(labels)
            if fp == prev_fp:
                converged = True
                break
            prev_fp = fp
    if not converged:
        # Hitting the cap with labels still moving means components on
        # graphs with diameter > max_iterations would be silently split.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations (labels still changing); raise max_iterations"
        )
    sym.unpersist()  # labels was materialized by the last fingerprint()
    return labels


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg) over a directed edge list;
    returns (id, hub, auth) with L1 normalization after every half-step.

    Reference parity: the reference ranks FEC entities by aggregate
    linkage in Cypher (graph/cypher.py's recipient/contributor rollups);
    HITS is the same mutually-recursive "good source ↔ good target"
    notion as an iterative operator.

    Per iteration, two join+agg rounds over the cached, id-partitioned
    edge frame: auth(v) = Σ hub(u) over in-edges, then hub(u) = Σ auth(v)
    over out-edges, each L1-normalized by a 1-row aggregate broadcast
    (deliberate scalar nested-loop join, same class as the PageRank
    teleport constant). Cross-engine determinism: every SUM routes
    through decimal(38,18) (exact, order-independent — the established
    _dsum discipline at a scale fine enough for unit-mass vectors), so
    hub/auth vectors stay bit-identical doubles in any engine that
    mirrors the recurrence; see g_hits's unrolled-CTE oracle.

    Scale: the deduped edge list is cached TWICE, once repartitioned on
    u (consumed by the auth half-step's join on u) and once on v (the
    hub half-step's join on v) — the same pre-partition-per-join-key
    discipline as pagerank's links frame, so each half-step exchanges
    only the skinny (id, score) frame and the edge blocks never
    reshuffle across iterations. Lineage is truncated once per
    half-step (reliable checkpoint when the session has a checkpoint
    dir — plans/lineage) because each raw frame fans out to two
    consumers; see the loop comment.
    """
    if iterations < 1:
        # with 0 iterations auth is never computed and the output
        # contract (L1-normalized hub AND auth) is unmeetable — fail
        # loudly instead of returning a half-initialized frame
        raise ValueError(f"hits() requires iterations >= 1, got {iterations}")
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    e_u = e0.repartition("u").cache()
    e_v = e0.repartition("v").cache()
    verts = (
        e_u.select(F.col("u").alias("id"))
        .union(e_u.select(F.col("v").alias("id")))
        .distinct()
        .repartition("id")
        .cache()
    )
    verts.count()
    e_u.count()
    e_v.count()

    def _dsum18(col):
        return F.sum(col.cast("decimal(38,18)")).cast("double")

    hub = verts.select("id", F.lit(1.0).alias("hub"))
    auth = None
    # Each half-step's raw frame is consumed TWICE (the 1-row norm
    # aggregate and the normalizing division). Materialize it before
    # the norm agg — without this every iteration re-derives the whole
    # upstream join chain for each consumer and the plan's work grows
    # ~4× per iteration (measured: 3 iterations = 135 s at sf0.1 vs
    # ~1 s materialized). The frames are skinny (id, double), so the
    # per-half-step truncation is O(|V|) bytes.
    # AQE off for the loop and the final cascade that executes it
    # (skinny pre-partitioned frames; −14% wall at sf0.1, interleaved
    # A/B — see plans.lineage.iteration_scope)
    with iteration_scope(e0.sparkSession):
        # SPARSE half-steps (guide §1.2/§2.4): the loop keeps only the
        # aggregated raw frames — auth over vertices with >=1 in-edge,
        # hub over vertices with >=1 out-edge — instead of left-joining
        # verts to densify after every half-step. Equivalence is exact:
        # every e_u row's u has an out-edge and every e_v row's v has an
        # in-edge, so the sparse frame matches every edge the dense one
        # did; a densified zero contributes exactly +0.0 to the
        # decimal(38,18) norm and to the next half-step's sums; and the
        # dense vectors are reconstructed ONCE after the loop with the
        # same coalesce-to-0.0 the half-steps used (0.0/norm == 0.0).
        # Two joins per iteration removed from the plan.
        for i in range(iterations):
            auth_raw = (
                e_u.join(hub.withColumnRenamed("id", "u"), "u")
                .groupBy(F.col("v").alias("id"))
                .agg(_dsum18(F.col("hub")).alias("raw"))
                .transform(truncate_lineage)
            )
            a_norm = auth_raw.agg(_dsum18(F.col("raw")).alias("norm"))
            auth = auth_raw.crossJoin(F.broadcast(a_norm)).select(
                "id", (F.col("raw") / F.col("norm")).alias("auth")
            )
            hub_raw = (
                e_v.join(auth.withColumnRenamed("id", "v"), "v")
                .groupBy(F.col("u").alias("id"))
                .agg(_dsum18(F.col("auth")).alias("raw"))
                .transform(truncate_lineage)
            )
            h_norm = hub_raw.agg(_dsum18(F.col("raw")).alias("norm"))
            hub = hub_raw.crossJoin(F.broadcast(h_norm)).select(
                "id", (F.col("raw") / F.col("norm")).alias("hub")
            )
        out = (
            verts.join(hub, "id", "left")
            .join(auth, "id", "left")
            .select(
                "id",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("auth", F.lit(0.0)).alias("auth"),
            )
            # eager: the lazy per-half-step marks cascade here, while
            # verts/e_u/e_v are still cached
            .transform(lambda d: truncate_lineage(d, eager=True))
        )
    verts.unpersist()
    e_u.unpersist()
    e_v.unpersist()
    return out
