"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast (k query vectors ≪ corpus); the corpus is
  scanned once, dot products run inside codegen via zip_with/aggregate,
  and per-query top-k is a window over a corpus-partitioned shuffle.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane signatures
  bucket the corpus; each query probes only its bucket (plus
  multi-probe neighbors), turning O(|Q|·|C|) into O(|Q|·bucket).

No Python touches a vector: all math is Column algebra in doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (qid, neighbor_id, rank). Rank ties broken by neighbor id so
    results are engine-deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    sims = c.join(F.broadcast(q)).select(
        "qid", "cid", cosine_similarity(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("cid").alias("neighbor_id"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into centroid
    cells, probe only the ``nprobe`` nearest cells per query, exact
    rerank inside them.

    Default centroids are training-free and deterministic (the
    ``num_centroids`` lowest-id corpus vectors) so results are
    reproducible and oracle-checkable. Pass ``centroids`` — e.g.
    ``clustering.kmeans_fit``'s (cluster, cent) model — for trained
    cells with balanced occupancy at production scale; the plan shape
    is identical either way. Cell assignment is one broadcast join over
    the tiny centroid set; the probe join shuffles on cell id, so
    per-query work is O(probed-cell sizes), not O(|corpus|).

    Returns (qid, neighbor_id, rank).
    """
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    if centroids is not None:
        cents = centroids.select(
            F.col(centroids.columns[0]).alias("cent_id"),
            F.col(centroids.columns[1]).cast("array<double>").alias("cent_v"),
        )
    else:
        cents = (
            c.orderBy("cid")
            .limit(num_centroids)
            .select(F.col("cid").alias("cent_id"), F.col("cv").alias("cent_v"))
        )

    def nearest_cells(df: DataFrame, key: str, vec: str, n: int) -> DataFrame:
        sims = df.join(F.broadcast(cents)).select(
            key,
            vec,
            F.col("cent_id").alias("cell"),
            cosine_similarity(F.col(vec), F.col("cent_v")).alias("csim"),
        )
        w = Window.partitionBy(key).orderBy(F.desc("csim"), F.asc("cell"))
        return (
            sims.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn", "csim")
        )

    assigned = nearest_cells(c, "cid", "cv", 1)
    probes = nearest_cells(q, "qid", "qv", nprobe).select("qid", "qv", "cell")
    cand = probes.join(assigned, "cell").select("qid", "qv", "cid", "cv")
    sims = cand.select(
        "qid", "cid", cosine_similarity(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("cid").alias("neighbor_id"), "rank")
    )


def _hyperplane_signs(dim: int, num_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplane patterns, computed ONCE
    in Python (sha256 of (plane, dim-index)) — reproducible across
    runs/engines with no stored model."""
    import hashlib

    return [
        [
            1.0 if hashlib.sha256(f"{p}:{i}".encode()).digest()[0] % 2 == 0 else -1.0
            for i in range(dim)
        ]
        for p in range(num_planes)
    ]


def _plane_matrix(spark, dim: int, num_planes: int) -> DataFrame:
    """(plane, index, ±1 sign) hyperplane matrix generated ENTIRELY
    JVM-side: spark.range + native sha2 reproduces
    ``_hyperplane_signs`` bit-for-bit (first digest byte parity of
    "p:i") without serializing dim·planes rows from the driver —
    createDataFrame of the same matrix measured 1.3 s of pure driver
    overhead, and would bottleneck outright at larger plane counts."""
    p = (F.col("id") / dim).cast("int")
    i = (F.col("id") % dim).cast("int")
    first_byte = F.conv(
        F.substring(
            F.sha2(F.concat_ws(":", p.cast("string"), i.cast("string")), 256), 1, 2
        ),
        16,
        10,
    ).cast("int")
    return spark.range(num_planes * dim).select(
        p.alias("p"),
        i.alias("i"),
        F.when(first_byte % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0)).alias("s"),
    )


def _rh_signature_table(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    num_planes: int,
) -> DataFrame:
    """(id, sig) random-hyperplane signatures as a DATAFRAME:
    posexplode the vectors, broadcast-join the (plane, index, sign)
    matrix, hash-aggregate the projections, then fold the sign bits
    into the bit-string with per-plane conditional aggs.

    This replaces a per-plane zip_with/aggregate expression tree that
    Spark executed interpreted (lambda machinery per element): for 64
    planes the expression version took seconds on 2 000 rows; the join
    formulation is plain columnar multiply + two-level hash agg with
    map-side partials, and scales as O(rows · dim · planes) actual
    work. Projection terms round to DECIMAL(18,9) — long-backed, so
    the sum stays exact and order-independent (a raw double sum near 0
    could flip its sign bit between runs or between the corpus and
    query sides) without the BigDecimal cost of wider decimals (3×
    measured). Bit-string assembly is one collect_list + sort, not
    ``num_planes`` conditional aggregates (another 1.5× measured).
    """
    spark = df.sparkSession
    pm = _plane_matrix(spark, dim, num_planes)
    elems = df.select(F.col(id_col).alias("__sid"), F.posexplode(vec_col).alias("i", "x"))
    proj = (
        elems.join(F.broadcast(pm), "i")
        .groupBy("__sid", "p")
        .agg(F.sum((F.col("x") * F.col("s")).cast("decimal(18,9)")).alias("proj"))
    )
    bit = F.when(F.col("proj") >= 0, F.lit("1")).otherwise(F.lit("0"))
    return proj.groupBy("__sid").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("p"), bit.alias("b")))),
                lambda s: s.b,
            ),
        ).alias("sig")
    ).select(F.col("__sid").alias(id_col), "sig")


def _rh_band_table(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    """(id, band) LSH band buckets straight out of the projection
    aggregate: plane p belongs to band p÷rows_per_band, so the band
    bit-string is one collect per (id, band) group — no full-signature
    assembly, no substring re-split, no explode. One stage shorter
    than going through :func:`_rh_signature_table`."""
    spark = df.sparkSession
    num_planes = bands * rows_per_band
    pm = _plane_matrix(spark, dim, num_planes)
    elems = df.select(F.col(id_col).alias("__sid"), F.posexplode(vec_col).alias("i", "x"))
    proj = (
        elems.join(F.broadcast(pm), "i")
        .groupBy("__sid", "p")
        .agg(F.sum((F.col("x") * F.col("s")).cast("decimal(18,9)")).alias("proj"))
    )
    bit = F.when(F.col("proj") >= 0, F.lit("1")).otherwise(F.lit("0"))
    return (
        proj.groupBy("__sid", (F.col("p") / rows_per_band).cast("int").alias("__bno"))
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("p"), bit.alias("b")))),
                    lambda s: s.b,
                ),
            ).alias("__bits")
        )
        .select(
            F.col("__sid").alias(id_col),
            F.concat(F.col("__bno").cast("string"), F.lit(":"), F.col("__bits")).alias(
                "band"
            ),
        )
    )


def _rh_signature(vec: Column, dim: int, num_planes: int) -> Column:
    """Random-hyperplane signature as a bit-string.

    The sign patterns are embedded as LITERAL arrays: they depend only
    on (plane, index), and an earlier per-row formulation (xxhash64
    inside a transform lambda) was rebuilt for every row because
    constant folding does not reach inside higher-order-function
    lambdas — turning an O(rows·dim) signature into
    O(rows·planes·dim) hash calls.
    """
    planes = _hyperplane_signs(dim, num_planes)

    def bit(signs: list[float]) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(p) for p in planes])


def embedding_near_duplicate_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    bands: int | None = None,
    rows_per_band: int = 4,
) -> DataFrame:
    """All-pairs embedding near-duplicates: (id_a, id_b) with
    cosine(a, b) >= threshold and id_a < id_b.

    Norms are computed once as a column (O(N·dim)); the pairwise test
    is ``dot(a,b) >= t·|a|·|b|`` — no per-element normalization pass
    and nothing recomputed per pair.

    - ``bands=None`` (exact): self-join over every id-ordered pair.
      O(N²) is inherent for exact dense all-pairs; this is the
      correctness baseline, not the 100 TB path.
    - ``bands=b`` (LSH): random-hyperplane signatures are split into
      ``b`` bands of ``rows_per_band`` planes; pairs colliding in any
      band become candidates (equi-join on band bits — hash join, no
      nested loop), then are verified with the exact dot product.
      Output is a subset of the exact result (precision 1, recall < 1),
      with per-pair work O(collisions), not O(N²).
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    par = df.sparkSession.sparkContext.defaultParallelism
    e = (
        df.repartition(par)  # single-split inputs otherwise pin the
        # all-pairs / signature work to one task
        .select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        # vectors stay RAW: hyperplane signs are invariant to positive
        # scaling, and the cosine test verifies dot >= t·|a|·|b| — one
        # norm column instead of a per-element division pass
        .withColumn("n", _norm(F.col("v")))
        .cache()  # read by the signature build and both verify join-backs
    )
    thresh = F.lit(threshold) * F.col("na") * F.col("nb")

    if bands is None:
        a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
        b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
        # deliberate broadcast nested-loop: exact all-pairs is a tiled
        # cross product however it is expressed; streaming the left side
        # against a broadcast tile keeps task count = left partitions
        pairs = a.join(F.broadcast(b), a.id_a < b.id_b)
    else:
        banded = _rh_band_table(e, "id", "v", dim, bands, rows_per_band).cache()
        # both candidate-join branches read it; without the cache each
        # branch recomputes every projection
        # candidates stay SKINNY (two ids) through the band join and the
        # dedup shuffle; vectors are joined back only for the survivors —
        # carrying both dim-length arrays through dropDuplicates was the
        # dominant shuffle cost
        left = banded.select("band", F.col("id").alias("id_a"))
        right = banded.select("band", F.col("id").alias("id_b"))
        cand_ids = (
            left.join(right, "band")
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        pairs = cand_ids.join(
            e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")),
            "id_a",
        ).join(
            e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")),
            "id_b",
        )
    return (
        pairs.filter(_dot(F.col("va"), F.col("vb")) >= thresh)
        .select("id_a", "id_b")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int | None = None,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join with multi-probe
    (each query also probes every bucket at Hamming distance 1 from its
    own signature — standard multi-probe LSH, so recall doesn't collapse
    when a neighbor straddles one hyperplane). Exact cosine rerank inside
    the probed buckets. Returns (qid, neighbor_id, rank).

    Scale: corpus is signed once (one scan); queries (small) are
    broadcast with ``num_planes+1`` probe rows each. Per-query work is
    O(probed-bucket sizes), not O(|corpus|).
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    c = c.join(
        _rh_signature_table(c, "cid", "cv", dim, num_planes).withColumnRenamed(
            "sig", "bucket"
        ),
        "cid",
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    # same signature path as the corpus: a near-zero projection must
    # round to the same bit on both sides or the bucket join misses
    q = q.join(_rh_signature_table(q, "qid", "qv", dim, num_planes), "qid")

    def _flip(sig: Column, i: int) -> Column:
        flipped = F.when(F.substring(sig, i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1"))
        return F.concat(F.substring(sig, 1, i), flipped, F.substr(sig, F.lit(i + 2)))

    probes = F.array(F.col("sig"), *[_flip(F.col("sig"), i) for i in range(num_planes)])
    q_probed = q.select("qid", "qv", F.explode(probes).alias("bucket"))
    cand = (
        c.join(F.broadcast(q_probed), "bucket")
        .select("qid", "cid", "qv", "cv")
        .dropDuplicates(["qid", "cid"])
    )
    sims = cand.select(
        "qid", "cid", cosine_similarity(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("cid").alias("neighbor_id"), "rank")
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    snap_digits: int | None = None,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick ``k`` results per query maximizing
    ``lam·relevance − (1−lam)·max_sim_to_already_picked``, from a
    cosine-relevance ``shortlist`` of the corpus.

    Returns (qid, neighbor_id, pick_order). The training-data use case
    is diversity selection — retrieval contexts or seed corpora where
    near-duplicate top hits waste the budget.

    Scale shape: the corpus is touched exactly once (the broadcast
    relevance scan that builds the shortlist — identical to
    cosine_topk); everything after operates on the shortlist frame,
    which is CONSTANT-bounded at ``shortlist`` rows per query, so the
    k greedy rounds are joins over tiny frames regardless of corpus
    size. Pairwise candidate sims are materialized once (≤ shortlist²
    rows per query), then each round is one max-agg + one anti-join +
    one per-query row_number over ≤ shortlist rows. Both the pair and
    selected frames are lineage-truncated so the k-round loop keeps an
    O(1) plan. Ranking ties break by candidate id; scores never leave
    the operator, so cross-engine float drift cannot leak into output.

    ``snap_digits`` makes every DECISION boundary reproducible across
    independent float implementations (VERDICT r5 #5): similarities
    are round-half snapped to a 10^-snap_digits grid as BIGINTs before
    the shortlist rank and the greedy score, so an engine computing
    cosines with different rounding (e.g. a SQL oracle) makes the
    identical shortlist cut and arg-max picks — the score arithmetic
    ``lam·rel_q − mu·ms_q`` then runs the same two IEEE ops on the
    same integers everywhere. None: rank raw doubles (cheapest; fine
    within one engine, where a plan is deterministic).
    """
    from data_spark.plans.lineage import truncate_lineage

    mu = 1.0 - lam

    def _q(col):  # round-half snap to the decision grid
        if snap_digits is None:
            return col
        return F.floor(col * F.lit(float(10**snap_digits)) + F.lit(0.5)).cast("bigint")

    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    sims = c.join(F.broadcast(q)).select(
        "qid",
        "cid",
        "cv",
        _q(cosine_similarity(F.col("qv"), F.col("cv"))).alias("rel"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("cid"))
    cand_v = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shortlist)
        .select("qid", "cid", "rel", "cv")
        .transform(truncate_lineage)
    )
    a = cand_v.select(
        "qid", F.col("cid").alias("ca"), F.col("cv").alias("va")
    )
    b = cand_v.select(
        "qid", F.col("cid").alias("cb"), F.col("cv").alias("vb")
    )
    pair = (
        a.join(b, ["qid"])
        .filter(F.col("ca") != F.col("cb"))
        .select(
            "qid",
            "ca",
            "cb",
            _q(cosine_similarity(F.col("va"), F.col("vb"))).alias("psim"),
        )
        .transform(truncate_lineage)
    )
    cand = cand_v.select("qid", "cid", "rel")
    selected = (
        cand.withColumn("rn", F.row_number().over(w.orderBy(F.desc("rel"), F.asc("cid"))))
        .filter(F.col("rn") == 1)
        .select("qid", "cid", F.lit(1).alias("pick_order"))
    )
    for step in range(2, k + 1):
        maxsim = (
            pair.join(
                selected.select("qid", F.col("cid").alias("cb")), ["qid", "cb"]
            )
            .groupBy("qid", F.col("ca").alias("cid"))
            .agg(F.max("psim").alias("ms"))
        )
        remaining = cand.join(selected, ["qid", "cid"], "left_anti")
        scored = remaining.join(maxsim, ["qid", "cid"]).select(
            "qid",
            "cid",
            (F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("ms")).alias("score"),
        )
        ws = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
        pick = (
            scored.withColumn("rn", F.row_number().over(ws))
            .filter(F.col("rn") == 1)
            .select("qid", "cid", F.lit(step).alias("pick_order"))
        )
        selected = selected.union(pick).transform(truncate_lineage)
    return selected.select("qid", F.col("cid").alias("neighbor_id"), "pick_order")


def kcenter_select(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    snap_digits: int = 6,
) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985 farthest-point
    traversal): seed with the lowest id, then k−1 times add the
    candidate FARTHEST from the chosen set — i.e. with the smallest
    max-cosine to any chosen center (id tiebreak). The classic
    2-approximation for diversity selection: the coreset that seeds
    diverse fine-tuning subsets, kmeans++-style centroids, and
    facility-location curation.

    Every distance decision is taken on round-half e-``snap_digits``
    snapped similarities (the mmr_rerank parity contract), so an
    independent float cosine on the oracle side picks identical
    centers. The chosen set is k (id, vector) pairs — metadata-bounded
    driver state, same class as IVF centroids; each round is one
    broadcast-join scan over the corpus (O(n·k) sims total, never a
    candidate-candidate pair join)."""
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    scale = float(10**snap_digits)

    def snap(col: Column) -> Column:
        return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("bigint")

    seed = c.orderBy("cid").limit(1).collect()[0]
    chosen = [(int(seed["cid"]), list(seed["cv"]))]
    for _step in range(2, k + 1):
        ch = spark.createDataFrame(chosen, "sid long, sv array<double>")
        pick = (
            c.filter(~F.col("cid").isin([i for i, _ in chosen]))
            .crossJoin(F.broadcast(ch))
            .select(
                "cid",
                "cv",
                snap(cosine_similarity(F.col("cv"), F.col("sv"))).alias("s"),
            )
            .groupBy("cid")
            .agg(F.max("s").alias("ms"), F.first("cv").alias("cv"))
            .orderBy(F.asc("ms"), F.asc("cid"))
            .limit(1)
            .collect()[0]
        )
        chosen.append((int(pick["cid"]), list(pick["cv"])))
    return spark.createDataFrame(
        [(cid, i + 1) for i, (cid, _) in enumerate(chosen)],
        "vec_id long, sel_order int",
    )


def sign_bit_codes(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, code): one sign bit per embedding component packed into a
    single BIGINT — binary quantization, the 8-bytes-per-vector
    retrieval mode (v_bq_rerank's stage 1 and the bq ANN index's stored
    form). Bit i is set when component i is non-negative; bit 63
    contributes -2^63 (two's complement), so every partial sum stays in
    BIGINT range. Dimensions beyond 64 are rejected — pack into an
    array of words before raising the cap."""
    dims = F.size(F.col(vec_col))
    x = df.select(
        F.col(id_col),
        dims.alias("__d"),
        F.posexplode(vec_col).alias("idx", "xf"),
    )
    bit = F.when(
        F.col("xf").cast("double") >= 0,
        F.when(F.col("idx") == 63, F.lit(-(2**63))).otherwise(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx AS INT))")
        ),
    ).otherwise(F.lit(0))
    return (
        x.withColumn(
            "__guard",
            F.when(
                F.col("__d") > 64,
                F.raise_error(F.lit("sign_bit_codes: >64 dimensions")),
            ).otherwise(F.lit(0)),
        )
        .groupBy(id_col)
        .agg((F.sum(bit) + F.max("__guard")).cast("bigint").alias("code"))
    )


def sign_bit_words(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, codes): sign bits packed into an ``array<bigint>`` of
    64-bit words — the arbitrary-dimension generalization of
    :func:`sign_bit_codes` (production embeddings are 384-4096 dims,
    so one BIGINT is never enough). Word ``w`` holds components
    ``[64w, 64w+63]``; bit 63 of each word contributes -2^63 (two's
    complement) so every partial sum stays in BIGINT range, and the
    word array is ordered by word index so Hamming distance is
    XOR+popcount summed across aligned words. ceil(d/64)·8 bytes per
    vector — and the packing is a pure columnar PROJECTION (nested
    higher-order functions over the vector array), zero shuffles: at
    100 TB the encode is a map-only pass over the corpus.

    Bit values come from a 64-element literal array (constant-folded)
    rather than pow/shiftleft so every contribution is an exact BIGINT;
    a short final word (d not a multiple of 64) zero-pads via the
    null-guard (zip_with pads the shorter side with NULL)."""
    bit_values = F.array(
        *[F.lit(1 << i).cast("bigint") for i in range(63)],
        F.lit(-(2**63)).cast("bigint"),
    )
    positions = F.sequence(F.lit(0), F.lit(63))
    v = F.col(vec_col).cast("array<double>")
    n_words = F.ceil(F.size(v) / F.lit(64.0)).cast("int")

    def word_code(w: Column) -> Column:
        sl = F.slice(v, w * F.lit(64) + F.lit(1), F.lit(64))
        contribs = F.zip_with(
            sl,
            positions,
            lambda x, p: F.when(
                x.isNotNull() & (x >= 0), F.element_at(bit_values, p + F.lit(1))
            ).otherwise(F.lit(0).cast("bigint")),
        )
        return F.aggregate(
            contribs, F.lit(0).cast("bigint"), lambda acc, c: acc + c
        )

    # empty-vector guard: F.sequence(0, -1) yields the DESCENDING
    # array [0, -1], i.e. two bogus ZERO words for a zero-length
    # vector — indistinguishable from a real all-negative-sign
    # 128-dim code, so an empty vector would silently compete in the
    # shortlist. Empty vectors get an empty code array instead
    # (ADVICE r10): Hamming against real codes is then NULL (word
    # counts differ), surfacing the degenerate input instead of
    # awarding it a fake distance — callers should drop empty
    # vectors before encoding.
    word_idx = F.when(
        n_words > 0, F.sequence(F.lit(0), n_words - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        F.col(id_col),
        F.transform(word_idx, word_code).alias("codes"),
    )


def _hamming_words(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length word arrays:
    bit_count(XOR) summed across aligned words. The per-word XOR runs
    inside the zip_with lambda on plain array elements (no re-evaluated
    sub-expressions), and the fold is an integer aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def bq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codes: DataFrame,
    k: int = 10,
    shortlist: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval over PRECOMPUTED binary codes: Hamming
    shortlist from ``codes`` (8 bytes/vector scanned — XOR + popcount,
    query codes broadcast), then exact e6-integer cosine rescoring of
    only shortlist·d values against ``corpus``. Returns
    (qid, neighbor_id, rank, dot, cnorm2) — integer scores, rank by
    dot/sqrt(cnorm2) which IS cosine order (query norm constant per
    partition). The operator behind v_bq_rerank, factored so the codes
    table can be a persisted index (operators/ann_index.build_bq_index).

    ``codes`` may hold either a packed BIGINT ``code`` column (d <= 64,
    the 8-bytes/vector fast path) or an ``array<bigint>`` ``codes``
    column (:func:`sign_bit_words`, arbitrary d) — the word path sums
    XOR+popcount across aligned words, ceil(d/64)·8 bytes per vector.
    The stored form decides the path, so a persisted index probes with
    exactly the code shape it was built with.

    Choosing ``shortlist``: the Hamming stage only has to get the true
    top-k INTO the shortlist — the rerank fixes the order. Sign bits
    estimate the angle with variance ~1/d, so the needed multiplier
    falls, not rises, with dimensionality, but it is corpus-dependent:
    on a clustered 384-dim corpus, ``shortlist = 4k`` measured
    recall@10 = 1.00 while ``2k`` dropped to 0.62
    (tests/test_ann_index.py::test_bq_word_code_recall_at_realistic_
    dims — the calibration to re-run when corpus geometry changes).
    Budget ``4k`` as the default and validate per corpus; the
    shortlist cost is linear in it either way."""
    if "codes" in codes.columns:
        q_codes = sign_bit_words(queries, id_col, vec_col).select(
            F.col(id_col).alias("qid"), F.col("codes").alias("qcode")
        )
        c_codes = codes.select(
            F.col(id_col).alias("cid"), F.col("codes").alias("ccode")
        )
        ham = _hamming_words(F.col("qcode"), F.col("ccode"))
    else:
        q_codes = sign_bit_codes(queries, id_col, vec_col).select(
            F.col(id_col).alias("qid"), F.col("code").alias("qcode")
        )
        c_codes = codes.select(
            F.col(id_col).alias("cid"), F.col("code").alias("ccode")
        )
        ham = F.bit_count(F.col("qcode").bitwiseXOR(F.col("ccode"))).cast("bigint")
    w_short = Window.partitionBy("qid").orderBy("hamming", "cid")
    short = (
        c_codes.crossJoin(F.broadcast(q_codes))
        .select("qid", "cid", ham.alias("hamming"))
        .withColumn("hrank", F.row_number().over(w_short))
        .filter(F.col("hrank") <= shortlist)
        .select("qid", "cid")
    )

    # exact rerank at ARRAY granularity: one row per (qid, cid) pair,
    # dot/norm as integer folds over e6-snapped components (zip_with +
    # aggregate) — never a d-fold row explosion. The exploded-row
    # formulation turned the corpus into n·d rows before the shortlist
    # join pruned it (measured: a 50k x 1024-dim probe blew the rerank
    # join's memory); here the corpus is touched once per shortlisted
    # id and each vector stays one array cell. Same integer addends,
    # integer addition is associative — bit-identical dot/cnorm2.
    def e6_vec(df, out_id):
        return df.select(
            F.col(id_col).alias(out_id),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * 1e6 + 0.5).cast("bigint"),
            ).alias(f"{out_id}_e6"),
        )

    int_dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scores = (
        short.join(e6_vec(queries, "qid"), "qid")
        .join(e6_vec(corpus, "cid"), "cid")
        .select(
            "qid",
            "cid",
            int_dot(F.col("qid_e6"), F.col("cid_e6")).alias("dot"),
            int_dot(F.col("cid_e6"), F.col("cid_e6")).alias("cnorm2"),
        )
        .filter(F.col("cnorm2") > 0)
    )
    w_rank = Window.partitionBy("qid").orderBy(
        (F.col("dot").cast("double") / F.sqrt(F.col("cnorm2").cast("double"))).desc(),
        F.asc("cid"),
    )
    return (
        scores.withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("cid").alias("neighbor_id"), "rank", "dot", "cnorm2")
    )
