"""Product quantization (PQ) for approximate nearest neighbor search.

PQ is the memory-bounded half of the canonical 100 TB ANN design
(IVF-PQ): split each d-dim vector into ``m`` subvectors, k-means each
subspace into ``ksub`` codewords, and store every corpus vector as m
small integer codes — a 64-dim float32 vector becomes 8 bytes at
m=8/ksub=256-or-less (32× compression), so billion-vector corpora fit
where raw floats cannot. Queries score candidates with asymmetric
distance computation (ADC): one lookup table of
|queries|·m·ksub exact subspace distances, then every candidate's
approximate distance is a SUM of m table entries — no float vector
math per candidate.

The reference's search tier delegates vector scoring to its index
server; here the whole lifecycle (fit, encode, score) is DataFrame
algebra with the same cross-engine determinism contract as
operators/clustering.py: lowest-id init, left-fold double distances,
DECIMAL(38,9) centroid means, DECIMAL(38,12) ADC accumulation — the
fit and the ADC ranking are bit-reproducible, so the gate query
(queries/vectors.v_pq_adc_topk) is hash-verified against an unrolled
DuckDB oracle rather than rows-only.

Scale shape: the fit touches subvector slices (n·m skinny rows, two
shuffles per Lloyd round); encode is one broadcast join + per-(id,sub)
argmin; ADC scoring shuffles (qid, id) partial sums with map-side
combine and never moves raw vectors. Compose with the IVF cell
restriction (operators/ann_index.py) to bound the candidate set per
probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.plans.lineage import truncate_lineage


def _sqdist(a: Column, b: Column) -> Column:
    # identical fold order to DuckDB list_reduce over per-dim squared
    # diffs (0.0 seed is exact under +) — see clustering._sqdist
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subvectors(
    df: DataFrame, m: int, dsub: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sub, subv): each vector exploded into its m contiguous
    slices. slice() is 1-based; sub is 0-based."""
    slices = F.array(
        *[F.slice(F.col("__v"), s * dsub + 1, dsub) for s in range(m)]
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .select("id", F.posexplode(slices).alias("sub", "subv"))
    )


def _assign_sub(subvecs: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(id, sub, code) nearest-codeword per subvector: broadcast the
    m·ksub codebook rows, join on sub, argmin of squared L2 with lower
    code breaking ties (ROW_NUMBER — the exact ordering the oracle's
    ROW_NUMBER mirrors)."""
    scored = subvecs.join(F.broadcast(codebooks), "sub").select(
        "id", "sub", "code", _sqdist(F.col("subv"), F.col("cent")).alias("dist")
    )
    w = Window.partitionBy("id", "sub").orderBy(F.asc("dist"), F.asc("code"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", "sub", "code")
    )


def pq_fit(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit PQ codebooks: an independent Lloyd's k-means per subspace,
    all m subspaces trained in the SAME per-round shuffles (the
    codebook key is (sub, code), so one assignment join and one
    mean-update aggregation carry every subspace at once).

    Determinism contract (shared with clustering.kmeans_fit): init =
    the ksub lowest-id subvectors per subspace; distances left-fold
    doubles; means accumulate DECIMAL(38,9) / count; empty codes keep
    their previous codeword. Returns (sub int, code int,
    cent array<double>)."""
    first = df.select(F.col(vec_col).cast("array<double>")).first()
    d = len(first[0])
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m

    subvecs = _subvectors(df, m, dsub, id_col, vec_col).cache()
    w_init = Window.partitionBy("sub").orderBy("id")
    codebooks = (
        subvecs.withColumn("__rn", F.row_number().over(w_init))
        .filter(F.col("__rn") <= ksub)
        .select(
            "sub", (F.col("__rn") - 1).cast("int").alias("code"),
            F.col("subv").alias("cent"),
        )
        .transform(truncate_lineage)
    )
    for _ in range(iterations):
        assigned = _assign_sub(subvecs, codebooks)
        sums = (
            assigned.join(subvecs, ["id", "sub"])
            .select("sub", "code", F.posexplode("subv").alias("i", "x"))
            .groupBy("sub", "code", "i")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
        )
        new_cents = sums.groupBy("sub", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s.m
            ).alias("cent")
        )
        codebooks = (
            codebooks.select("sub", "code", F.col("cent").alias("prev"))
            .join(new_cents, ["sub", "code"], "left")
            .select("sub", "code", F.coalesce("cent", "prev").alias("cent"))
            # eager on the last round: the lazy marks must cascade while
            # the subvecs cache is still alive
            .transform(lambda d, e=(_ == iterations - 1): truncate_lineage(d, eager=e))
        )
    subvecs.unpersist()
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against fitted codebooks → (id, sub, code): the
    long-form code table (m small ints per vector — the 32×-compressed
    representation a 100 TB corpus actually stores)."""
    m = codebooks.agg(F.countDistinct("sub")).first()[0]
    dsub = len(codebooks.select("cent").first()[0])
    subvecs = _subvectors(df, m, dsub, id_col, vec_col)
    return _assign_sub(subvecs, codebooks)


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: exact per-subspace distances from
    each query to every codeword (the |queries|·m·ksub lookup table —
    tiny, broadcast), then every candidate scores as the SUM of its m
    LUT entries, accumulated in DECIMAL(38,12) so the total is
    order-independent and the (qid, rank) output hash-stable across
    engines. Returns (qid, neighbor_id, rank).

    The only data-proportional shuffle is the (qid, id) partial-sum
    aggregation over the CODE table (n·m skinny rows with map-side
    combine) — raw vectors never move."""
    m = codebooks.agg(F.countDistinct("sub")).first()[0]
    dsub = len(codebooks.select("cent").first()[0])
    qsub = _subvectors(queries, m, dsub, id_col, vec_col).withColumnRenamed(
        "id", "qid"
    )
    lut = qsub.join(F.broadcast(codebooks), "sub").select(
        "qid", "sub", "code",
        _sqdist(F.col("subv"), F.col("cent")).alias("dist"),
    )
    partial = codes.join(F.broadcast(lut), ["sub", "code"]).groupBy(
        "qid", "id"
    ).agg(F.sum(F.col("dist").cast("decimal(38,12)")).alias("adist"))
    w = Window.partitionBy("qid").orderBy(F.asc("adist"), F.asc("id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("id").alias("neighbor_id"), F.col("rank").cast("bigint").alias("rank"))
    )


def pq_shortlist_rerank(
    codes: DataFrame,
    codebooks: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production PQ read path: ADC shortlists ``shortlist``
    candidates per query from the compressed codes, then ONLY the
    shortlisted raw vectors are fetched (semi-join against the corpus)
    and reranked by exact squared L2. Recall equals the shortlist's
    coverage of the true top-k while the exact math touches
    |queries|·shortlist vectors instead of the corpus. Returns
    (qid, neighbor_id, rank) — exact-distance ranking, id tiebreak."""
    cand = pq_adc_topk(
        codes, codebooks, queries, k=shortlist, id_col=id_col, vec_col=vec_col
    ).select("qid", F.col("neighbor_id").alias("cid"))
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = (
        cand.join(c, "cid")
        .join(F.broadcast(q), "qid")
        .select("qid", "cid", _sqdist(F.col("qv"), F.col("cv")).alias("d"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            F.col("cid").alias("neighbor_id"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
