"""Similarity-search and containment-join query inventory.

``v_cosine_topk`` is oracle-checked against DuckDB's
list_cosine_similarity (similarity values are excluded from the output
so float last-bit drift cannot flip the hash; ranking ties are broken
by neighbor id). The LSH variant is approximate → rows-only check +
recall pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.operators.joins import suffix_containment_join
from data_spark.operators.similarity import (
    cosine_topk,
    embedding_near_duplicate_pairs,
    ivf_topk,
    lsh_bucketed_topk,
)
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
    "v_cosine_topk",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 10
    ), sims AS (
      SELECT qid, cid, list_cosine_similarity(qv, cv) AS sim FROM q, c
    ), ranked AS (
      SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
      FROM sims
    )
    SELECT qid, cid AS neighbor_id, rank FROM ranked WHERE rank <= 5
    """,
)
def v_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5: first 10 vectors are queries, the
    rest the corpus. Queries broadcast; dot products in codegen."""
    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb.filter(F.col("vec_id") >= 10), emb.filter(F.col("vec_id") < 10), k=5
    )


@_q(
    "v_ivf_topk",
    """
    WITH c AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 10
    ), q AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
    ), cents AS (
      SELECT cid AS cent_id, cv AS cent_v FROM c ORDER BY cid LIMIT 8
    ), assign AS (
      SELECT cid, cell FROM (
        SELECT c.cid, cents.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY c.cid
                 ORDER BY list_cosine_similarity(c.cv, cents.cent_v) DESC, cents.cent_id) AS rn
        FROM c, cents) WHERE rn = 1
    ), probes AS (
      SELECT qid, cell FROM (
        SELECT q.qid, cents.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.qv, cents.cent_v) DESC, cents.cent_id) AS rn
        FROM q, cents) WHERE rn <= 2
    ), cand AS (
      SELECT p.qid, a.cid FROM probes p JOIN assign a ON p.cell = a.cell
    ), ranked AS (
      SELECT cand.qid, cand.cid,
             ROW_NUMBER() OVER (PARTITION BY cand.qid
               ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, cand.cid) AS rank
      FROM cand JOIN q ON cand.qid = q.qid JOIN c ON cand.cid = c.cid
    )
    SELECT qid, cid AS neighbor_id, rank FROM ranked WHERE rank <= 5
    """,
)
def v_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-probed approximate top-5 with deterministic centroids —
    oracle-checkable because cell assignment and rerank use identical
    double cosines in both engines."""
    emb = t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb.filter(F.col("vec_id") >= 10), emb.filter(F.col("vec_id") < 10), k=5
    )


def _lsh_ann_oracle_sql() -> str:
    """Full multi-probe hyperplane-LSH replay (VERDICT r4 #6 — the last
    ANN family member without an oracle). Every stage is the portable
    construction the Spark operator already uses: ±1 plane signs from
    sha256("p:i") first-byte parity (identical in DuckDB), projections
    summed as DECIMAL(18,9) (exact, order-independent — the sign bit of
    a near-zero projection cannot flip between engines), 8-bit
    signature strings, the identity + 8 Hamming-1 probe set, bucket
    equi-join, exact cosine rerank. Rank boundaries inherit
    v_cosine_topk's documented float-drift contract."""
    sign = (
        "CASE WHEN CAST(('0x' || substr(sha256((pi // 64) || ':' || (pi % 64)), 1, 2))"
        " AS INT) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    )
    return f"""
    WITH planes AS (
      SELECT CAST(pi // 64 AS INT) AS p, CAST(pi % 64 AS INT) AS i, {sign} AS s
      FROM UNNEST(range(0, 512)) AS t(pi)
    ), c AS (
      SELECT vec_id AS cid, embedding AS v FROM embeddings WHERE vec_id >= 10
    ), q AS (
      SELECT vec_id AS qid, embedding AS v FROM embeddings WHERE vec_id < 10
    ), csig AS (
      SELECT cid, string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
      FROM (
        SELECT cid, p, SUM(CAST(CAST(v[i + 1] AS DOUBLE) * s AS DECIMAL(18,9))) AS proj
        FROM c, planes GROUP BY cid, p
      ) GROUP BY cid
    ), qsig AS (
      SELECT qid, string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
      FROM (
        SELECT qid, p, SUM(CAST(CAST(v[i + 1] AS DOUBLE) * s AS DECIMAL(18,9))) AS proj
        FROM q, planes GROUP BY qid, p
      ) GROUP BY qid
    ), probes AS (
      SELECT qid, sig AS bucket FROM qsig
      UNION ALL
      SELECT qid,
             substr(sig, 1, CAST(k AS INT)) ||
             (CASE WHEN substr(sig, CAST(k AS INT) + 1, 1) = '1' THEN '0' ELSE '1' END) ||
             substr(sig, CAST(k AS INT) + 2) AS bucket
      FROM qsig, UNNEST(range(0, 8)) AS t(k)
    ), cand AS (
      SELECT DISTINCT pr.qid, cs.cid FROM probes pr JOIN csig cs ON cs.sig = pr.bucket
    ), sims AS (
      SELECT cand.qid, cand.cid,
             list_cosine_similarity(qv.embedding, cv.embedding) AS sim
      FROM cand
      JOIN embeddings qv ON qv.vec_id = cand.qid
      JOIN embeddings cv ON cv.vec_id = cand.cid
    )
    SELECT qid, cid AS neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
      FROM sims
    ) WHERE rank <= 5
    """


@_q("v_lsh_ann", _lsh_ann_oracle_sql())
def v_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane-bucketed approximate top-5 (the 100 TB path:
    each query scans its probed buckets, not the corpus). Converted
    from rows-only in r5: the operator's determinism machinery —
    sha256-derived plane signs, DECIMAL(18,9) projection sums, string
    signatures — was built to be engine-portable, so the DuckDB oracle
    replays signatures, multi-probe, bucket join AND rerank exactly;
    recall-vs-exact stays pytest-gated (test_similarity)."""
    emb = t(spark, sf_dir, "embeddings")
    return lsh_bucketed_topk(
        emb.filter(F.col("vec_id") >= 10), emb.filter(F.col("vec_id") < 10), k=5
    )


@_q(
    "d_embed_near_dup",
    """
    WITH e AS (SELECT vec_id, embedding FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
    """,
)
def d_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact mode (cosine >= 0.4).
    Similarity values are excluded from the output so float last-bit
    drift cannot flip the hash; the pair set itself is drift-safe because
    the testdata has no pair within float error of the threshold."""
    emb = t(spark, sf_dir, "embeddings")
    return embedding_near_duplicate_pairs(emb, threshold=0.4)


def _embed_lsh_oracle_sql() -> str:
    """Banded hyperplane-LSH near-dup replay: 48 sha256-parity planes,
    DECIMAL(18,9) projection sums, per-band bit-strings (band = p÷6,
    bits ordered by p), band equi-join candidates, exact cosine ≥ 0.4
    verification — the same portable construction as v_lsh_ann's
    oracle, at d_embed_near_dup's proven threshold margin."""
    sign = (
        "CASE WHEN CAST(('0x' || substr(sha256((pi // 64) || ':' || (pi % 64)), 1, 2))"
        " AS INT) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    )
    return f"""
    WITH planes AS (
      SELECT CAST(pi // 64 AS INT) AS p, CAST(pi % 64 AS INT) AS i, {sign} AS s
      FROM UNNEST(range(0, {48 * 64})) AS t(pi)
    ), e AS (
      SELECT vec_id AS id, embedding AS v FROM embeddings
    ), bandkeys AS (
      SELECT id, p // 6 AS bno,
             string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bits
      FROM (
        SELECT id, p, SUM(CAST(CAST(v[i + 1] AS DOUBLE) * s AS DECIMAL(18,9))) AS proj
        FROM e, planes GROUP BY id, p
      ) GROUP BY id, p // 6
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bandkeys a JOIN bandkeys b
        ON a.bno = b.bno AND a.bits = b.bits AND a.id < b.id
    )
    SELECT cand.id_a, cand.id_b
    FROM cand
    JOIN embeddings x ON x.vec_id = cand.id_a
    JOIN embeddings y ON y.vec_id = cand.id_b
    WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.4
    """


@_q("d_embed_near_dup_lsh", _embed_lsh_oracle_sql())
def d_embed_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded random-hyperplane LSH with
    exact verification (the 100 TB path: equi-join on band bits instead
    of the O(N²) pair join; every emitted pair is exactly verified, so
    precision is 1 and only recall is approximate). Converted from
    rows-only in r5: the operator's plane signs, decimal projection
    sums and band keys were already engine-portable, so the DuckDB
    oracle replays banding AND verification exactly (threshold margin
    inherited from d_embed_near_dup's contract); recall-vs-exact stays
    pytest-gated."""
    emb = t(spark, sf_dir, "embeddings")
    return embedding_near_duplicate_pairs(emb, threshold=0.4, bands=8, rows_per_band=6)


@_q(
    "j_suffix_containment",
    """
    WITH hosts AS (
      SELECT DISTINCT CASE doc_id % 3
               WHEN 0 THEN source || '.example.com'
               WHEN 1 THEN 'news.' || source || '.example.com'
               ELSE 'cdn.static.' || source || '.example.com' END AS host
      FROM documents
    ), domains AS (
      SELECT DISTINCT source || '.example.com' AS domain FROM documents
      UNION SELECT 'example.com'
    )
    SELECT h.host, d.domain
    FROM hosts h JOIN domains d
      ON h.host = d.domain OR suffix(h.host, '.' || d.domain)
    """,
)
def j_suffix_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment join (SURVEY J6): host equals domain OR is a
    subdomain of it. Oracle states the naive theta join; the engine runs
    the suffix-explode equi-join rewrite (operators.joins) — hash join,
    not nested loop."""
    d = t(spark, sf_dir, "documents")
    hosts = d.select(
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("source"), F.lit(".example.com")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("news."), F.col("source"), F.lit(".example.com")))
        .otherwise(F.concat(F.lit("cdn.static."), F.col("source"), F.lit(".example.com")))
        .alias("host")
    ).distinct()
    domains = (
        d.select(F.concat(F.col("source"), F.lit(".example.com")).alias("domain"))
        .union(d.sparkSession.range(1).select(F.lit("example.com").alias("domain")))
        .distinct()
    )
    return suffix_containment_join(hosts, F.broadcast(domains)).select("host", "domain")


def _kmeans_cents_cte(k: int = 8, iterations: int = 3, src_where: str = "") -> str:
    """WITH-clause prefix (no leading WITH): v = the fit corpus
    (optionally filtered), cents0 = lowest-id init, then ``iterations``
    unrolled Lloyd rounds ending at cents{iterations}. Shared by the
    d_kmeans / d_semantic_dedup / v_ivf_kmeans_topk oracles."""
    dist = (
        "list_reduce(list_transform(range(1, len(v.v)+1), "
        "i -> (v.v[i]-c.cent[i])*(v.v[i]-c.cent[i])), (acc,x) -> acc+x)"
    )
    sql = f"""
    v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings{src_where}),
    cents0 AS (
      SELECT CAST(rn - 1 AS INT) AS cluster, v AS cent
      FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM v) WHERE rn <= {k}
    )"""
    for it in range(1, iterations + 1):
        sql += f""",
    assign{it} AS (
      SELECT id, cluster FROM (
        SELECT v.id, c.cluster,
               ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY {dist}, c.cluster) AS rn
        FROM v, cents{it - 1} c
      ) WHERE rn = 1
    ),
    sums{it} AS (
      SELECT a.cluster, r.i,
             CAST(SUM(CAST(v.v[r.i] AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m
      FROM assign{it} a JOIN v USING (id), UNNEST(range(1, len(v.v)+1)) AS r(i)
      GROUP BY a.cluster, r.i
    ),
    newc{it} AS (SELECT cluster, list(m ORDER BY i) AS cent FROM sums{it} GROUP BY cluster),
    cents{it} AS (
      SELECT p.cluster, COALESCE(n.cent, p.cent) AS cent
      FROM cents{it - 1} p LEFT JOIN newc{it} n USING (cluster)
    )"""
    return sql


_KM_PREDICT_DIST = (
    "list_reduce(list_transform(range(1, len(v.v)+1), "
    "i -> (v.v[i]-c.cent[i])*(v.v[i]-c.cent[i])), (acc,x) -> acc+x)"
)


def _kmeans_predict_cte(name: str, cents: str) -> str:
    """One nearest-centroid assignment CTE over v (= kmeans_predict)."""
    return f"""
    {name} AS (
      SELECT id, cluster FROM (
        SELECT v.id, c.cluster,
               ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY {_KM_PREDICT_DIST}, c.cluster) AS rn
        FROM v, {cents} c
      ) WHERE rn = 1
    )"""


def _kmeans_oracle_sql(k: int = 8, iterations: int = 3) -> str:
    """Lloyd's k-means unrolled to the operator's exact recipe so DuckDB
    reproduces the fit BIT-EXACTLY (prototyped: centroids match Spark's
    to the last bit after 2 full rounds at sf0.001):

    - init = the k lowest-id vectors, cluster j = j-th lowest;
    - distance = the same left-fold of per-dim squared diffs the Spark
      operator computes with F.aggregate (DuckDB list_reduce folds in
      the same order, and Spark's 0.0 seed is exact under + so the two
      fold sequences produce identical doubles);
    - argmin ties break on lower cluster id (ROW_NUMBER both engines);
    - means accumulate as DECIMAL(38,9) and divide by the count —
      exact, order-independent, identical double division;
    - empty clusters keep their previous centroid (COALESCE).

    The final SELECT is one extra assignment with the fitted centroids
    (= kmeans_predict) aggregated to per-cluster member counts.
    """
    return (
        "WITH "
        + _kmeans_cents_cte(k, iterations)
        + ","
        + _kmeans_predict_cte("pred", f"cents{iterations}")
        + """
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM pred GROUP BY cluster
    """
    )


@_q("d_kmeans", _kmeans_oracle_sql())  # oracle NEW late-r4: the fit is
# bit-reproducible, so the whole 3-round Lloyd loop + predict is
# hash-verified (was rows-only; exactness also pytest-gated vs a
# plain-Python mirror in tests/test_operators.py)
def d_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means over the embeddings table, summarized as
    per-cluster member counts (k=8, 3 Lloyd rounds). Fully reproducible
    (lowest-id init, decimal-mean updates, tie-broken argmin) — since
    late r4 the DuckDB oracle replays the identical fit (see
    _kmeans_oracle_sql), moving the iterative-clustering tier onto the
    hard cross-engine signal."""
    from data_spark.operators.clustering import kmeans_fit, kmeans_predict

    emb = t(spark, sf_dir, "embeddings")
    model = kmeans_fit(emb, k=8, iterations=3)
    return (
        kmeans_predict(emb, model)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


def _semantic_dedup_oracle_sql(k: int = 8, iterations: int = 3,
                               threshold: float = 0.4) -> str:
    """The SemDeDup pass replayed on the bit-exact k-means fit: predict
    the cluster of every vector, compute norms with the same left-fold
    dot product, and drop the larger id of every within-cluster pair
    whose cosine clears the threshold (compared as
    dot >= threshold·na·nb with identical association, so both engines
    agree on every boundary)."""
    return (
        "WITH "
        + _kmeans_cents_cte(k, iterations)
        + ","
        + _kmeans_predict_cte("pred", f"cents{iterations}")
        + f""",
    norms AS (
      SELECT p.cluster, v.id, v.v,
             sqrt(list_reduce(list_transform(range(1, len(v.v)+1), i -> v.v[i]*v.v[i]), (acc,x) -> acc+x)) AS n
      FROM pred p JOIN v USING (id)
    ),
    dropped AS (
      SELECT DISTINCT b.id
      FROM norms a JOIN norms b ON a.cluster = b.cluster AND a.id < b.id
      WHERE list_reduce(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]), (acc,x) -> acc+x) >= {threshold} * a.n * b.n
    )
    SELECT nm.id, nm.cluster, d.id IS NULL AS keep
    FROM norms nm LEFT JOIN dropped d ON nm.id = d.id
    """
    )


@_q("d_semantic_dedup", _semantic_dedup_oracle_sql())  # oracle NEW
# late-r4 on top of the bit-exact k-means fit; within-cluster recall vs
# the exact pair set stays pytest-gated (near-dups split across
# clusters are missed by design)
def d_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means partitions the corpus,
    near-dup pairs (cosine >= 0.4) are found within clusters only, the
    larger id of each pair is dropped. Returns the kept/dropped verdict
    per vector — the scale path for embedding dedup (sum of per-cluster
    pair joins, never the global O(N^2))."""
    from data_spark.operators.clustering import semantic_dedup

    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.4, k=8, iterations=3)


def _ivf_kmeans_oracle_sql(k: int = 8, iterations: int = 3) -> str:
    """v_ivf_topk's probe/rerank SQL with the seed cells replaced by
    the TRAINED centroids of the bit-exact k-means fit over the corpus
    half (vec_id >= 10). Cell choice and rerank order use cosines over
    doubles both engines compute identically; only ids and ranks reach
    the hash."""
    return (
        "WITH "
        + _kmeans_cents_cte(k, iterations, src_where=" WHERE vec_id >= 10")
        + f""",
    c AS (SELECT id AS cid, v AS cv FROM v),
    q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 10),
    cents AS (SELECT cluster AS cent_id, cent AS cent_v FROM cents{iterations}),
    assign AS (
      SELECT cid, cell FROM (
        SELECT c.cid, cents.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY c.cid
                 ORDER BY list_cosine_similarity(c.cv, cents.cent_v) DESC, cents.cent_id) AS rn
        FROM c, cents) WHERE rn = 1
    ), probes AS (
      SELECT qid, cell FROM (
        SELECT q.qid, cents.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.qv, cents.cent_v) DESC, cents.cent_id) AS rn
        FROM q, cents) WHERE rn <= 2
    ), cand AS (
      SELECT p.qid, a.cid FROM probes p JOIN assign a ON p.cell = a.cell
    ), ranked AS (
      SELECT cand.qid, cand.cid,
             ROW_NUMBER() OVER (PARTITION BY cand.qid
               ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, cand.cid) AS rank
      FROM cand JOIN q ON cand.qid = q.qid JOIN c ON cand.cid = c.cid
    )
    SELECT qid, cid AS neighbor_id, rank FROM ranked WHERE rank <= 5
    """
    )


@_q("v_ivf_kmeans_topk", _ivf_kmeans_oracle_sql())  # oracle NEW
# late-r4: the trained cells come from the bit-exact k-means fit, so
# the whole train+probe+rerank pipeline is hash-verified; recall stays
# pytest-gated
def v_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe over TRAINED (k-means) cells instead of the
    deterministic-seed cells of v_ivf_topk: fit 8 centroids with 3
    Lloyd rounds on the corpus, assign + probe 2 cells per query, exact
    rerank inside. Same plan shape as v_ivf_topk; trained cells balance
    occupancy so per-query probed volume concentrates where the data
    is. Deterministic end-to-end (deterministic fit), rows-only gate +
    recall pytest."""
    from data_spark.operators.clustering import kmeans_fit

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    model = kmeans_fit(corpus, k=8, iterations=3)
    return ivf_topk(
        corpus, emb.filter(F.col("vec_id") < 10), k=5, centroids=model, nprobe=2
    )


@_q("v_pca_project")  # eigensolve — not SQL-expressible; exactness is
# pytest-gated against a plain-numpy mirror (tests/test_decomposition.py)
def v_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA to 2 components over the embedding corpus: Arrow-batched
    moment partials (one numpy matmul per batch) -> driver-side d x d
    eigensolve -> codegen dot-product projection (no Python per row).
    Output is (vec_id, pc1, pc2) rounded to 6 dp; the fit is
    deterministic (canonical eigenvector sign/order), so the rows-only
    gate is stable across runs."""
    from data_spark.operators.decomposition import pca_fit, pca_project

    emb = t(spark, sf_dir, "embeddings")
    model = pca_fit(emb, k=2)
    proj = pca_project(emb, model)
    return proj.select(
        "vec_id",
        F.round("pc1", 6).alias("pc1"),
        F.round("pc2", 6).alias("pc2"),
    )


@_q(
    "v_int8_cosine_topk",
    """
    WITH dims AS (
      SELECT vec_id, i - 1 AS idx, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
    ), norms AS (
      SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS n2
      FROM dims GROUP BY vec_id
    ), qdim AS (
      SELECT d.vec_id, d.idx,
             CAST(FLOOR(d.x / sqrt(n.n2) * 127 + 0.5) AS BIGINT) AS q
      FROM dims d JOIN norms n ON n.vec_id = d.vec_id AND n.n2 > 0
    ), dots AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid, CAST(SUM(a.q * b.q) AS BIGINT) AS dot
      FROM qdim a JOIN qdim b ON a.idx = b.idx
      WHERE a.vec_id < 10 AND b.vec_id >= 10
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT qid, cid AS neighbor_id, rank, dot FROM (
      SELECT qid, cid, dot,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS BIGINT) AS rank
      FROM dots
    ) WHERE rank <= 5
    """,
)
def v_int8_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors under INT8-QUANTIZED cosine — the
    memory-bandwidth trick production vector stores use at scale
    (4× smaller vectors, integer SIMD dots). Each vector is unit-
    normalized then symmetric-quantized to [-127, 127] with
    ``floor(u·127 + 0.5)``; every float step is the same IEEE double
    expression in both engines (norms via exact decimal sums of
    squares), and everything after quantization — the dot products and
    the ranking — is pure integer arithmetic, so unlike the float
    cosine queries the SCORES themselves are in the hash, not just the
    neighbor ids. Spark side shuffles on the dimension index for the
    dot — at corpus scale the quantized dims table is the co-located
    layout an int8 ANN index would persist."""
    emb = t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("idx", "xf")
    ).select("vec_id", "idx", F.col("xf").cast("double").alias("x"))
    norms = dims.groupBy("vec_id").agg(
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)"))
        .cast("double")
        .alias("n2")
    )
    qdim = (
        dims.join(norms.filter(F.col("n2") > 0), "vec_id")
        .select(
            "vec_id",
            "idx",
            F.floor(F.col("x") / F.sqrt("n2") * 127 + 0.5)
            .cast("bigint")
            .alias("q"),
        )
    )
    a = qdim.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "idx", F.col("q").alias("qq")
    )
    b = qdim.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), "idx", F.col("q").alias("cq")
    )
    dots = (
        a.join(b, "idx")
        .groupBy("qid", "cid")
        .agg(F.sum(F.col("qq") * F.col("cq")).alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("cid"))
    return (
        dots.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("qid", F.col("cid").alias("neighbor_id"), "rank", "dot")
    )


def _pq_dist(v: str, c: str) -> str:
    """DuckDB squared-L2 left-fold matching operators.pq._sqdist
    bit-for-bit (list_reduce's first-element seed equals Spark's
    0.0-seeded fold because x + 0.0 == x for the non-negative squared
    diffs)."""
    return (
        f"list_reduce(list_transform(range(1, len({v})+1), "
        f"i -> ({v}[i]-{c}[i])*({v}[i]-{c}[i])), (acc,x) -> acc+x)"
    )


def _pq_oracle_sql(m: int = 8, ksub: int = 16, iterations: int = 2, k: int = 5) -> str:
    """The whole PQ lifecycle (fit per-subspace Lloyd codebooks →
    encode → ADC top-k) unrolled to the operator's exact recipe so
    DuckDB replays it bit-for-bit — the product-quantization member of
    the d_kmeans oracle family. Determinism anchors: lowest-id init
    per subspace, left-fold double distances, DECIMAL(38,9) codeword
    means, empty codes keep their previous codeword, DECIMAL(38,12)
    ADC accumulation, ROW_NUMBER ties on lower code / lower id."""
    sql = f"""
    WITH corpus AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id >= 10
    ), qs AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 5
    ), dims AS (SELECT len(v) // {m} AS dsub FROM corpus LIMIT 1),
    sv AS (
      SELECT c.id, CAST(s.sub AS INT) AS sub,
             list_slice(c.v, s.sub * d.dsub + 1, (s.sub + 1) * d.dsub) AS subv
      FROM corpus c CROSS JOIN dims d, (SELECT UNNEST(range(0, {m})) AS sub) s
    ),
    cb0 AS (
      SELECT sub, CAST(rn - 1 AS INT) AS code, subv AS cent FROM (
        SELECT sub, subv, ROW_NUMBER() OVER (PARTITION BY sub ORDER BY id) AS rn
        FROM sv
      ) WHERE rn <= {ksub}
    )"""
    for it in range(1, iterations + 1):
        sql += f""",
    asg{it} AS (
      SELECT id, sub, code FROM (
        SELECT sv.id, sv.sub, c.code,
               ROW_NUMBER() OVER (PARTITION BY sv.id, sv.sub
                 ORDER BY {_pq_dist('sv.subv', 'c.cent')}, c.code) AS rn
        FROM sv JOIN cb{it - 1} c ON sv.sub = c.sub
      ) WHERE rn = 1
    ),
    sums{it} AS (
      SELECT a.sub, a.code, r.i,
             CAST(SUM(CAST(sv.subv[r.i] AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS mval
      FROM asg{it} a JOIN sv ON a.id = sv.id AND a.sub = sv.sub,
           UNNEST(range(1, len(sv.subv)+1)) AS r(i)
      GROUP BY a.sub, a.code, r.i
    ),
    newc{it} AS (
      SELECT sub, code, list(mval ORDER BY i) AS cent
      FROM sums{it} GROUP BY sub, code
    ),
    cb{it} AS (
      SELECT p.sub, p.code, COALESCE(n.cent, p.cent) AS cent
      FROM cb{it - 1} p
      LEFT JOIN newc{it} n ON p.sub = n.sub AND p.code = n.code
    )"""
    fin = f"cb{iterations}"
    sql += f""",
    codes AS (
      SELECT id, sub, code FROM (
        SELECT sv.id, sv.sub, c.code,
               ROW_NUMBER() OVER (PARTITION BY sv.id, sv.sub
                 ORDER BY {_pq_dist('sv.subv', 'c.cent')}, c.code) AS rn
        FROM sv JOIN {fin} c ON sv.sub = c.sub
      ) WHERE rn = 1
    ),
    qsv AS (
      SELECT q.id AS qid, CAST(s.sub AS INT) AS sub,
             list_slice(q.v, s.sub * d.dsub + 1, (s.sub + 1) * d.dsub) AS subv
      FROM qs q CROSS JOIN dims d, (SELECT UNNEST(range(0, {m})) AS sub) s
    ),
    lut AS (
      SELECT q.qid, q.sub, c.code, {_pq_dist('q.subv', 'c.cent')} AS dist
      FROM qsv q JOIN {fin} c ON q.sub = c.sub
    ),
    partial AS (
      SELECT l.qid, cd.id, SUM(CAST(l.dist AS DECIMAL(38,12))) AS adist
      FROM codes cd JOIN lut l ON cd.sub = l.sub AND cd.code = l.code
      GROUP BY l.qid, cd.id
    )
    SELECT qid, id AS neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT qid, id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, id) AS rank
      FROM partial
    ) WHERE rank <= {k}
    """
    return sql


@_q("v_pq_adc_topk", _pq_oracle_sql())
def v_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, the full lifecycle in one hash-checked
    query: fit m=8/ksub=16 codebooks on the corpus (2 Lloyd rounds, all
    subspaces trained in shared shuffles), encode the corpus to m
    small-int codes (32× compression — what a 100 TB vector store
    actually persists), and score 5 queries by asymmetric distance
    (broadcast LUT + one skinny partial-sum shuffle; raw vectors never
    move after encoding). Bit-reproducible per operators/pq.py's
    determinism contract, so the DuckDB oracle replays fit+encode+ADC
    exactly."""
    from data_spark.operators.pq import pq_adc_topk, pq_encode, pq_fit

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    qs = emb.filter(F.col("vec_id") < 5)
    cb = pq_fit(corpus, m=8, ksub=16, iterations=2)
    codes = pq_encode(corpus, cb)
    return pq_adc_topk(codes, cb, qs, k=5)


_MMR_K = 5
_MMR_SHORTLIST = 20
_MMR_LAM = 0.7


def _mmr_oracle_sql() -> str:
    """Greedy MMR unrolled to _MMR_K rounds as chained CTEs. Each round
    joins the candidate shortlist to the max-similarity-vs-selected
    aggregate and picks the arg-max of lam·rel − (1−lam)·maxsim with an
    id tiebreak.

    Parity contract (boundary-safe since r6, VERDICT r5 #5): Spark's
    zip_with-fold cosine and DuckDB's list_cosine_similarity are
    INDEPENDENT float implementations, so ulp-level relative drift is
    expected, not exceptional. Both decision boundaries are therefore
    taken on round-half SNAPPED similarities — rel_q = FLOOR(rel·1e6 +
    0.5) and psim_q likewise, as BIGINTs: (a) the rank-_MMR_SHORTLIST
    shortlist cut ranks (rel_q DESC, cid), so near-equal cosines
    collapse to the same grid value and the id tiebreak decides
    identically in both engines; (b) the greedy arg-max score
    lam·rel_q − mu·ms_q is the same two IEEE double ops on the same
    integers with the same repr'd constants — bit-identical across
    engines. The ONLY residual sensitivity is a cosine sitting within
    ~1 ulp of a HALF-grid boundary (k+0.5)·1e-6 — a ~1e-10-per-value
    coincidence with no structural attractor (cosines structurally hit
    0 and 1, which round-half handles exactly); test_vector_snap's
    ±1-ulp perturbation check pins every fixture similarity clear of
    it. A hash flip here at a new SF means that coincidence, not an
    operator bug."""
    lam = repr(_MMR_LAM)
    mu = repr(1.0 - _MMR_LAM)
    parts = [
        f"""
  q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
  c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 10),
  rels AS (
    SELECT qid, cid,
           CAST(FLOOR(list_cosine_similarity(qv, cv) * CAST(1000000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rel
    FROM q, c
  ),
  cand AS MATERIALIZED (
    SELECT qid, cid, rel FROM (
      SELECT qid, cid, rel,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rn
      FROM rels) WHERE rn <= {_MMR_SHORTLIST}
  ),
  pair AS MATERIALIZED (
    SELECT x.qid, x.cid AS ca, y.cid AS cb,
           CAST(FLOOR(list_cosine_similarity(cx.cv, cy.cv) * CAST(1000000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS psim
    FROM cand x
    JOIN cand y ON x.qid = y.qid AND x.cid <> y.cid
    JOIN c cx ON cx.cid = x.cid
    JOIN c cy ON cy.cid = y.cid
  ),
  s1 AS (
    SELECT qid, cid, CAST(1 AS BIGINT) AS pick_order FROM (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rn
      FROM cand) WHERE rn = 1
  )"""
    ]
    for step in range(2, _MMR_K + 1):
        p = step - 1
        parts.append(
            f""",
  s{step} AS MATERIALIZED (
    SELECT * FROM s{p}
    UNION ALL
    SELECT qid, cid, CAST({step} AS BIGINT) AS pick_order FROM (
      SELECT r.qid, r.cid,
             ROW_NUMBER() OVER (
               PARTITION BY r.qid
               ORDER BY CAST('{lam}' AS DOUBLE) * r.rel
                      - CAST('{mu}' AS DOUBLE) * m.ms DESC, r.cid) AS rn
      FROM cand r
      JOIN (SELECT p.qid, p.ca AS cid, MAX(p.psim) AS ms
            FROM pair p JOIN s{p} s ON s.qid = p.qid AND s.cid = p.cb
            GROUP BY p.qid, p.ca) m
        ON m.qid = r.qid AND m.cid = r.cid
      WHERE NOT EXISTS (
        SELECT 1 FROM s{p} z WHERE z.qid = r.qid AND z.cid = r.cid)
    ) WHERE rn = 1
  )"""
        )
    parts.append(
        f"""
  SELECT qid, cid AS neighbor_id, pick_order FROM s{_MMR_K}
    """
    )
    return "WITH" + "".join(parts)


@_q("v_mmr_rerank", _mmr_oracle_sql())
def v_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval: MMR-greedy top-5 per query (λ=0.7) from a
    cosine top-20 shortlist (operators/similarity.mmr_rerank). The
    corpus is scanned exactly once — the same broadcast relevance pass
    as v_cosine_topk — and the greedy rounds run on constant-bounded
    shortlist frames, so the operator costs the same as brute top-k at
    any corpus size. Hash-oracled against a DuckDB CTE chain unrolling
    the identical greedy recurrence with identical IEEE constants;
    both engines take every rank/arg-max decision on e6-snapped
    similarities so independent cosine implementations cannot diverge
    at the decision boundaries (see _mmr_oracle_sql)."""
    from data_spark.operators.similarity import mmr_rerank

    emb = t(spark, sf_dir, "embeddings")
    return mmr_rerank(
        emb.filter(F.col("vec_id") >= 10),
        emb.filter(F.col("vec_id") < 3),
        k=_MMR_K,
        shortlist=_MMR_SHORTLIST,
        lam=_MMR_LAM,
        snap_digits=6,
    )
