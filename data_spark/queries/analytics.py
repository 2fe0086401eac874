"""Statistics / graph-analytics / verifiable-sketch gate queries added
in round 4: deterministic per-group mode, decimal-exact Pearson
correlation, graph degree distribution, and CROSS-ENGINE-EXACT sketch
constructions — MinHash (signatures + banded LSH candidate pairs) and
SimHash (60-bit column-algebra signatures + pigeonhole Hamming pairs).

The exact sketches are the notable ones: the engine's production
MinHash/SimHash (operators/dedup.py) use xxhash64, which only Spark
can compute, so their gate queries are rows-only. Here the shingle
hash is the first 15 hex digits of md5 — computable bit-identically by
Spark (``conv(substr(md5(t),1,15),16,10)``) and DuckDB
(``CAST('0x'||substr(md5(t),1,15) AS BIGINT)``) — and everything
downstream is integer arithmetic both engines share, so the whole
sketch→banding→candidate-pair pipelines are hash-verified end to end,
closing the "sketch tier is rows-only by design" gap for both
families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.operators.dedup import _words, ngrams_from_words
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
    "a_mode_per_group",
    """
    SELECT user_id, event_type AS mode_type, n FROM (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rk
      FROM events GROUP BY user_id, event_type
    ) WHERE rk = 1
    """,
)
def a_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each user's most frequent event
    type, ties broken lexicographically so the selected row is engine-
    independent. Two map-side-combinable shuffles (count, then pick-max
    per user on an already-tiny frame) — the argmax-per-key shape."""
    e = t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@_q(
    "a_corr_pearson",
    """
    WITH sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(EXTRACT(HOUR FROM ts) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(value AS DECIMAL(38,6)) * CAST(EXTRACT(HOUR FROM ts) AS DECIMAL(38,6)) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(CAST(value AS DECIMAL(38,6)) * CAST(value AS DECIMAL(38,6)) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(EXTRACT(HOUR FROM ts) AS DECIMAL(38,6)) * CAST(EXTRACT(HOUR FROM ts) AS DECIMAL(38,6)) AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr
    FROM sums
    """,
)
def a_corr_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of event value vs hour-of-day per event type
    — the statistics family's bivariate member. All five moment sums
    accumulate as DECIMAL(38,6) (products rescaled to scale 6 exactly
    like Spark's decimal multiply, exact here: value has 2 dp), so the
    only float math is the final closed-form expression over identical
    double operands — bit-equal across engines, rounded to 6 dp. One
    map-side-combinable shuffle; no second pass for the means."""
    e = t(spark, sf_dir, "events")
    xd = F.col("value").cast("decimal(38,6)")
    yd = F.hour("ts").cast("decimal(38,6)")
    sums = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum((xd * yd).cast("decimal(38,6)")).cast("double").alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,6)")).cast("double").alias("sxx"),
        F.sum((yd * yd).cast("decimal(38,6)")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    corr = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select("event_type", "n", F.round(corr, 6).alias("corr"))


@_q(
    "g_degree_distribution",
    """
    WITH edges AS (
      SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), sym AS (
      SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges
    ), deg AS (
      SELECT a, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY a
    )
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def g_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the undirected supplier↔customer graph —
    the first look any graph analysis takes (skew tells you whether the
    wedge/frontier joins downstream need salting). The Spark plan skips
    the oracle's symmetrize+dedup entirely: the edge set is already
    distinct and the graph bipartite (s-/c- prefixed ids can't collide),
    so exploding both endpoints of each edge IS the symmetric adjacency
    multiset — one exchange fewer, and the histogram stays tiny
    regardless of graph size."""
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
    deg = (
        edges.select(F.explode(F.array("src", "dst")).alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


# ---------------------------------------------------------------------------
# Cross-engine-exact MinHash over 3-word shingles: md5-prefix shingle
# hash + fixed (a·h+b) mod p permutations. p and the coefficients stay
# < 2^30-ish so a·h fits int64. Shingles, not unigrams: the synthetic
# corpus shares one small vocabulary, so unigram minhashes collide for
# ~all pairs (measured 97k/124k at sf0.001) while 3-gram shingles keep
# candidates at true near-dups (~30 pairs) — the same reason the
# production operators (dedup.py) shingle before sketching.
# ---------------------------------------------------------------------------

_MH_P = 1_000_000_007
_MH_A = [516575261, 730421473, 947217823, 176064001,
         568519393, 368085727, 283985429, 120634811]
_MH_B = [423630757, 842976263, 298764511, 785409629,
         651174457, 934519853, 502749791, 67330517]
_MH_BANDS = 4  # 2 rows per band over the 8 signatures

# {hm_expr} is the 60-bit md5-prefix hash: minhash reduces it mod p up
# front (so the a·hm+b permutations stay int64-safe); simhash keeps it
# raw (its bits ARE the signature material).
_SQL_DOC_TOKENS_TMPL = r"""
  toks AS (
    SELECT doc_id,
           str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')), '\s+') AS words
    FROM documents
  ), tok AS (
    SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS term
    FROM toks, UNNEST(range(1, greatest(len(words) - 2, 1) + 1)) AS r(i)
    WHERE len(words) >= 3  -- sub-shingle docs vanish in BOTH engines
  ), hashed AS (
    SELECT doc_id, {hm_expr} AS hm
    FROM tok
  )
"""

_SQL_HASH_RAW = "CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT)"

_SQL_DOC_TOKENS = _SQL_DOC_TOKENS_TMPL.format(
    hm_expr=f"{_SQL_HASH_RAW} % {_MH_P}"
)

_SQL_SIGS = (
    _SQL_DOC_TOKENS
    + ", sigs AS (SELECT doc_id, "
    + ", ".join(
        f"MIN(({a} * hm + {b}) % {_MH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
    )
    + " FROM hashed GROUP BY doc_id)"
)


def _spark_signatures(docs: DataFrame) -> DataFrame:
    # materialize the token array BEFORE the shingle HOF (lambda args
    # re-evaluate per invocation — dedup.ngrams_from_words contract)
    toks = docs.select("doc_id", _words(F.col("text")).alias("__words"))
    tok = toks.select(
        "doc_id", F.explode(ngrams_from_words(F.col("__words"), 3)).alias("term")
    ).distinct()
    hashed = tok.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("bigint")
            % _MH_P
        ).alias("hm"),
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("hm") + F.lit(b)) % _MH_P).alias(f"sig_{i}")
            for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
        ]
    )


@_q("d_minhash_sig", "WITH" + _SQL_SIGS + " SELECT * FROM sigs")
def d_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-permutation MinHash signature per document, hash-verified
    cross-engine (see module docstring — md5-prefix token hash instead
    of the production xxhash64, identical in both engines). Shuffle
    shape is the production one: explode→distinct tokens, one groupBy
    with 8 map-side-combinable MINs; signatures are 8 ints per doc no
    matter the corpus size."""
    return _spark_signatures(t(spark, sf_dir, "documents"))


_SQL_BANDS = (
    _SQL_SIGS
    + ", bands AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, sig_{2 * j} AS k1, sig_{2 * j + 1} AS k2 FROM sigs"
        for j in range(_MH_BANDS)
    )
    + ")"
)


@_q(
    "d_minhash_band_pairs",
    "WITH"
    + _SQL_BANDS
    + """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
         AND a.doc_id < b.doc_id
    """,
)
def d_minhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate pairs over the exact MinHash signatures
    (4 bands × 2 rows): documents agreeing on any full band. This is
    the same banding equi-join the production MinHash-LSH operator
    runs (operators/dedup.py), but over the cross-engine hash — so the
    ENTIRE sketch→band→bucket-join pipeline gets a value-hash driver
    check, not a row count. The join key (band, k1, k2) keeps the
    shuffle an equi-join; candidates per bucket are bounded by bucket
    occupancy, never all-pairs."""
    from data_spark.plans.lineage import truncate_lineage  # noqa: PLC0415

    # one signature pass, not two: the band self-join's sides share the
    # shingle -> 8-permutation MIN aggregation (same barrier as
    # d_simhash_exact_pairs)
    sigs = truncate_lineage(_spark_signatures(t(spark, sf_dir, "documents")))
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.col(f"sig_{2 * j}").alias("k1"),
                        F.col(f"sig_{2 * j + 1}").alias("k2"),
                    )
                    for j in range(_MH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.k1", "bk.k2")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.k2") == F.col("b.k2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Cross-engine-exact SimHash: the same md5-prefix shingle hash feeds a
# 60-bit simhash computed entirely in column algebra (60 conditional
# sums — no UDF at all, unlike the production pandas-UDF simhash64),
# then 4×15-bit pigeonhole banding finds all pairs within Hamming ≤ 3.
# ---------------------------------------------------------------------------

_SH_BITS = 60
_SH_CHUNKS = 4  # 15 bits each: Hamming ≤ 3 ⇒ ≥1 identical chunk
_SH_MAX_HAMMING = 3

_SQL_SIMHASH = (
    _SQL_DOC_TOKENS_TMPL.format(hm_expr=_SQL_HASH_RAW)
    + ", bitsums AS (SELECT doc_id, "
    + ", ".join(
        f"SUM(CASE WHEN ((hm >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(_SH_BITS)
    )
    + " FROM hashed GROUP BY doc_id), sigs AS (SELECT doc_id, "
    + " + ".join(
        f"CASE WHEN s{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END"
        for b in range(_SH_BITS)
    )
    + " AS sig FROM bitsums)"
)


def _spark_simhash_sigs(docs: DataFrame) -> DataFrame:
    """60-bit column-algebra simhash per document over 3-word shingles,
    (doc_id, sig) — the cross-engine twin of ``_SQL_SIMHASH`` (same
    md5-prefix shingle hash both engines compute bit-identically).
    Shared by d_simhash_exact_pairs and v_hamming_topk (analytics3)."""
    toks = docs.select("doc_id", _words(F.col("text")).alias("__words"))
    tok = toks.select(
        "doc_id", F.explode(ngrams_from_words(F.col("__words"), 3)).alias("term")
    ).distinct()
    hashed = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("bigint").alias("hm"),
    )
    bitsums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("hm"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(_SH_BITS)
        ]
    )
    sig = None
    for b in range(_SH_BITS):
        term = F.when(
            F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return bitsums.select("doc_id", sig.alias("sig"))


@_q(
    "d_simhash_exact_pairs",
    "WITH"
    + _SQL_SIMHASH
    + f"""
    , chunks AS (
      SELECT doc_id, sig, c AS chunk_idx, (sig >> (c * 15)) & 32767 AS chunk
      FROM sigs, UNNEST(range(0, {_SH_CHUNKS})) AS u(c)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM chunks a JOIN chunks b
      ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {_SH_MAX_HAMMING}
    """,
)
def d_simhash_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (Hamming ≤ 3 over 60-bit shingle
    simhashes), hash-verified cross-engine — the second exact-sketch
    family member next to d_minhash_sig/band_pairs. Two things are
    notable versus the production simhash path (operators/dedup.py):
    the signature is pure column algebra (explode → 60 map-side-
    combinable conditional SUMs → bit assembly; the production path
    uses the repo's single pandas UDF), and the 4×15-bit chunk banding
    is provably exhaustive for Hamming ≤ 3 by pigeonhole — so the
    oracle check covers sketch construction AND candidate generation
    AND the exact Hamming verify. Candidates are an equi-join on
    (chunk_idx, chunk); nothing all-pairs anywhere."""
    from data_spark.plans.lineage import truncate_lineage  # noqa: PLC0415

    # one signature pass, not two: the chunk self-join's sides are the
    # same frame, but the explode -> 60-bitsum aggregation otherwise
    # recomputes per side (same barrier v_hamming_topk uses)
    sigs = truncate_lineage(_spark_simhash_sigs(t(spark, sf_dir, "documents")))
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftright(F.col("sig"), c * 15)
                        .bitwiseAND(F.lit(32767))
                        .alias("chunk"),
                    )
                    for c in range(_SH_CHUNKS)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "sig", "ck.chunk_idx", "ck.chunk")
    a, b_ = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b_,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= _SH_MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("bigint").alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Cross-engine-exact HyperLogLog: the third sketch family hash-verified
# end to end (next to the exact MinHash and SimHash above). Same trick:
# the item hash is the 60-bit md5 prefix both engines compute
# bit-identically; bucket = low 8 bits, rho = leading-zero rank of the
# remaining 52-bit window via integer bit-length (length(bin(x)) in
# both engines); and the harmonic denominator Σ 2^(-M_j) accumulates
# EXACTLY as the integer Σ 2^(53 - M_j) (≤ 256·2^53 < 2^62, bigint-
# safe), so the only float math is the final α·m²·2^53/S estimate over
# identical operands. The production HLL (operators/sketches.py, Apache
# DataSketches) stays the scale path; this puts the HLL ALGORITHM —
# bucketing, max-rank registers, day-level mergeability, harmonic
# estimate — on the hard cross-engine signal.
# ---------------------------------------------------------------------------

_HLL_P = 8            # 256 registers
_HLL_M = 1 << _HLL_P
_HLL_W = 60 - _HLL_P  # 52-bit rank window; empty register term = 2^53


@_q(
    "a_hll_exact_rollup",
    f"""
    WITH hashed AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events
    ), regs_daily AS (
      SELECT event_type, day, h % {_HLL_M} AS bucket,
             MAX(CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_W + 1}
                      ELSE {_HLL_W + 1} - length(bin(h // {_HLL_M})) END) AS rho
      FROM hashed GROUP BY event_type, day, h % {_HLL_M}
    ), days AS (
      SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      FROM regs_daily GROUP BY event_type
    ), regs AS (
      SELECT event_type, bucket, MAX(rho) AS rho
      FROM regs_daily GROUP BY event_type, bucket
    ), sums AS (
      SELECT r.event_type,
             CAST(COUNT(*) AS BIGINT) AS used,
             MAX(d.n_days) AS n_days,
             SUM(CAST(1 AS BIGINT) << ({_HLL_W + 1} - rho)) AS s_used
      FROM regs r JOIN days d ON r.event_type = d.event_type
      GROUP BY r.event_type
    ), raw AS (
      SELECT event_type, n_days, used,
             CAST(s_used + ({_HLL_M} - used) * (CAST(1 AS BIGINT) << {_HLL_W + 1}) AS BIGINT) AS denom_scaled,
             (0.7213 / (1.0 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M}
               * CAST(CAST(1 AS BIGINT) << {_HLL_W + 1} AS DOUBLE)
               / CAST(s_used + ({_HLL_M} - used) * (CAST(1 AS BIGINT) << {_HLL_W + 1}) AS DOUBLE)
               AS raw_est
      FROM sums
    )
    SELECT event_type, n_days, used AS buckets_used, denom_scaled,
           ROUND(CASE WHEN raw_est <= 2.5 * {_HLL_M} AND used < {_HLL_M}
                      THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / ({_HLL_M} - used))
                      ELSE raw_est END, 4) AS est_distinct
    FROM raw
    """,
)
def a_hll_exact_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a hand-rolled, cross-engine-
    exact HyperLogLog: 256 max-rank registers built per (type, day) and
    MERGED across days inside the query (register-wise MAX — the
    mergeability law the sketch tier is built on), then the harmonic
    estimate. The register table and the integer-scaled denominator are
    bit-exact in the hash; est_distinct is one double expression over
    identical operands, rounded to 4 dp. Shuffle shape is the real
    sketch rollup's: facts → per-day registers (map-side MAX) → merged
    registers → 3-row output; register count (256/type) is the ONLY
    thing that crosses stages, never user ids."""
    e = t(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
    )
    # integer floor-div (h is non-negative): float division would round
    # in the 53rd bit of the 60-bit hash and corrupt the rank window
    rest = F.expr(f"h div {_HLL_M}")
    rho = F.when(rest == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin(rest))
    )
    regs_daily = (
        e.select("event_type", F.to_date("ts").alias("day"), h.alias("h"))
        .groupBy("event_type", "day", (F.col("h") % _HLL_M).alias("bucket"))
        .agg(F.max(rho).alias("rho"))
    )
    # true distinct-day count per type (a per-bucket max of bucket-local
    # day counts only coincidentally equals it on dense data)
    days = regs_daily.groupBy("event_type").agg(
        F.countDistinct("day").cast("bigint").alias("n_days")
    )
    regs = regs_daily.groupBy("event_type", "bucket").agg(F.max("rho").alias("rho"))
    term = F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1} - rho)")
    sums = regs.join(days, "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("used"),
        F.max("n_days").alias("n_days"),
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
    # standard small-range correction: linear counting on the empty-
    # register count when the raw estimate is below 2.5m (the raw
    # harmonic estimate is biased high there — measured 267 vs a true
    # 150 at sf0.01 before the correction)
    est = F.when(
        (raw_est <= 2.5 * _HLL_M) & (F.col("used") < _HLL_M),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / (F.lit(_HLL_M) - F.col("used"))),
    ).otherwise(raw_est)
    return sums.select(
        "event_type",
        "n_days",
        F.col("used").alias("buckets_used"),
        denom.alias("denom_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )


@_q(
    "a_autocorr_lag1",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), lagged AS (
      SELECT event_type, x,
             LAG(x) OVER (PARTITION BY event_type ORDER BY day) AS xp
      FROM daily
    ), sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(xp AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(x AS DECIMAL(38,6)) * CAST(xp AS DECIMAL(38,6)) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(CAST(x AS DECIMAL(38,6)) * CAST(x AS DECIMAL(38,6)) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(xp AS DECIMAL(38,6)) * CAST(xp AS DECIMAL(38,6)) AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM lagged WHERE xp IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS acf1
    FROM sums
    """,
)
def a_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily-total series —
    the time-series family's memory test (persistence of day-to-day
    totals). Daily sums accumulate as decimals (exact), the lag pairs
    come from one per-type window pass, and the Pearson closed form
    over decimal moment sums is the a_corr_pearson pattern — identical
    double operands both engines, rounded to 6 dp. Two skinny shuffles:
    (type, day) daily totals, then the 3-key type window+agg."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "x", F.lag("x").over(w).alias("xp")
    ).filter(F.col("xp").isNotNull())
    xd = F.col("x").cast("decimal(38,6)")
    yd = F.col("xp").cast("decimal(38,6)")
    sums = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum((xd * yd).cast("decimal(38,6)")).cast("double").alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,6)")).cast("double").alias("sxx"),
        F.sum((yd * yd).cast("decimal(38,6)")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    acf = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select("event_type", "n", F.round(acf, 6).alias("acf1"))


@_q(
    "a_linreg_trend",
    """
    WITH pts AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DECIMAL(38,6)) AS x,
             CAST(value AS DECIMAL(38,6)) AS y
      FROM events
    ), sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS DECIMAL(19,6)) AS nd,
             CAST(SUM(x) AS DECIMAL(19,6)) AS sx,
             CAST(SUM(y) AS DECIMAL(19,6)) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DECIMAL(19,6)) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DECIMAL(19,6)) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(CAST(nd * sxy - sx * sy AS DOUBLE)
                 / CAST(nd * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(nd * sxx - sx * sx AS DOUBLE), 6) AS intercept
    FROM sums
    """,
)
def a_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of event value over time (x = epoch day):
    the grouped-regression member of the statistics family, computed
    from four decimal moment sums in ONE map-side-combinable shuffle —
    no per-group iteration, no second pass for the means. The closed
    form runs on identical double operands in both engines; slope and
    intercept round to 6 dp."""
    e = t(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast(
        "decimal(38,6)"
    )
    y = F.col("value").cast("decimal(38,6)")
    # moments stay DECIMAL(19,6) end to end: the closed-form numerators
    # reach ~8e17 (sy·sxx), past the exact-integer range of a double, so
    # computing them in float lets the engines' differing
    # multiply-subtract contraction produce ~1e-6 drift (observed at
    # sf0.01). Decimal(19,6)·decimal(19,6) fits both engines' 38-digit
    # multiply exactly; the ONLY float op is the final division of two
    # identical doubles.
    sums = e.select("event_type", x.alias("x"), y.alias("y")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("decimal(19,6)").alias("nd"),
        F.sum("x").cast("decimal(19,6)").alias("sx"),
        F.sum("y").cast("decimal(19,6)").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,6)")).cast("decimal(19,6)").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)")).cast("decimal(19,6)").alias("sxx"),
    )
    den = (F.col("nd") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = (F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / den
    intercept = (
        F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    ).cast("double") / den
    return sums.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


@_q(
    "a_mad_outliers",
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), med AS (
      SELECT event_type, value AS med FROM ranked WHERE rn = (n + 1) // 2
    ), dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
      FROM events e JOIN med m ON e.event_type = m.event_type
    ), dev_ranked AS (
      SELECT event_type, med, ad,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ), mad AS (
      SELECT event_type, med, ad AS mad FROM dev_ranked WHERE rn = (n + 1) // 2
    )
    SELECT d.event_type, m.med, m.mad,
           CAST(SUM(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, m.med, m.mad
    """,
)
def a_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type: lower-median of value,
    median absolute deviation around it, and how many points fall
    beyond 3 MADs — the robust-statistics cut that survives the heavy
    tails a z-score drowns in. Both medians are exact ROW_NUMBER
    selections at position (n+1)/2 (engine-independent: ties share the
    selected VALUE even when the tied row differs), and every
    comparison runs on identical doubles. Two windowed passes + one
    broadcast-size median join per pass, all keyed on the 5-value
    event_type."""
    e = t(spark, sf_dir, "events").select("event_type", "value")
    wv = Window.partitionBy("event_type").orderBy("value")
    wc = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == ((F.col("n") + 1) / 2).cast("bigint")
    ).select("event_type", F.col("value").alias("med"))
    dev = e.join(med, "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    wd = Window.partitionBy("event_type").orderBy("ad")
    dev_ranked = dev.select(
        "event_type",
        "med",
        "ad",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    mad = dev_ranked.filter(
        F.col("rn") == ((F.col("n") + 1) / 2).cast("bigint")
    ).select("event_type", F.col("ad").alias("mad"))
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                F.when(F.col("ad") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers")
        )
    )


@_q(
    "a_chi2_cells",
    """
    WITH obs AS (
      SELECT event_type, CAST(EXTRACT(HOUR FROM ts) // 6 AS BIGINT) AS hour_band,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, EXTRACT(HOUR FROM ts) // 6
    ), tot AS (
      SELECT obs.*,
             SUM(n) OVER (PARTITION BY event_type) AS row_n,
             SUM(n) OVER (PARTITION BY hour_band) AS col_n,
             SUM(n) OVER () AS all_n
      FROM obs
    )
    SELECT event_type, hour_band, n,
           ROUND(CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(all_n AS DOUBLE), 6) AS expected,
           ROUND((CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(all_n AS DOUBLE))
                 * (CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(all_n AS DOUBLE))
                 / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(all_n AS DOUBLE)), 6) AS chi2_contrib
    FROM tot
    """,
)
def a_chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence CELL REPORT for event_type × 6-hour
    band: observed count, expected count under independence, and each
    cell's χ² contribution — deliberately emitted per cell rather than
    as one χ² total, both because the deviating cells are the
    actionable output and because a cross-cell double SUM is
    summation-order-dependent and would not hash across engines. All
    marginals are exact integers; expected/contrib are single double
    expressions over identical operands, rounded to 6 dp. One count
    shuffle; the marginals come from windows over the tiny cell
    table."""
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
    dev = F.col("n").cast("double") - exp
    return tot.select(
        "event_type",
        "hour_band",
        "n",
        F.round(exp, 6).alias("expected"),
        F.round(dev * dev / exp, 6).alias("chi2_contrib"),
    )


@_q(
    "d_kl_source_drift",
    r"""
    WITH words AS (
      SELECT source, unnest(str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g')),
                    '\s+')) AS term
      FROM documents
    ), filtered AS (SELECT source, term FROM words WHERE term <> ''),
    top_terms AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rk
        FROM filtered GROUP BY term
      ) WHERE rk <= 20
    ), corpus AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS n_t FROM filtered
      WHERE term IN (SELECT term FROM top_terms) GROUP BY term
    ), per_source AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n_st FROM filtered
      WHERE term IN (SELECT term FROM top_terms) GROUP BY source, term
    ), corpus2 AS (
      SELECT term, n_t, CAST(SUM(n_t) OVER () AS BIGINT) AS n_corp FROM corpus
    ), sized AS (
      SELECT p.source, p.term, p.n_st, c.n_t, c.n_corp,
             SUM(p.n_st) OVER (PARTITION BY p.source) AS n_s
      FROM per_source p JOIN corpus2 c USING (term)
    )
    SELECT source, term,
           ROUND(CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE), 6) AS p_source,
           ROUND(CAST(n_t AS DOUBLE) / CAST(n_corp AS DOUBLE), 6) AS q_corpus,
           ROUND((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                 * ln((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                      / (CAST(n_t AS DOUBLE) / CAST(n_corp AS DOUBLE))), 6) AS kl_contrib
    FROM sized
    """,
)
def d_kl_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-drift report over the corpus' top-20
    terms (deterministic head: count desc, lexical tiebreak): each
    (source, term) row carries the source's probability restricted to
    the head, the corpus baseline, and the KL-divergence contribution
    p·ln(p/q) — the domain-drift signal a training-data pipeline
    monitors per shard. Per-term rows instead of a summed KL for the
    same two reasons as a_chi2_cells (actionability + cross-engine
    summation order). Restricting both distributions to the same
    20-term head keeps every probability an exact integer ratio."""
    d = t(spark, sf_dir, "documents")
    words = d.select("source", F.explode(_words(F.col("text"))).alias("term")).filter(
        F.col("term") != ""
    )
    top = (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("term")))
        )
        .filter(F.col("rk") <= 20)
        .select("term")
    )
    head = words.join(F.broadcast(top), "term")
    corpus = head.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))
    per_source = head.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_st")
    )
    # the baseline normalizer is the CORPUS head total — a per-source
    # sum over present rows would silently inflate q for any source
    # missing a head term. Attached as an all-rows window over the
    # 20-row corpus table (a scalar cross join would plan as a nested-
    # loop join, which the plan audit forbids engine-wide).
    corpus2 = corpus.select(
        "term",
        "n_t",
        F.sum("n_t").over(Window.partitionBy()).cast("bigint").alias("n_corp"),
    )
    sized = per_source.join(corpus2, "term").select(
        "source",
        "term",
        "n_st",
        "n_t",
        "n_corp",
        F.sum("n_st").over(Window.partitionBy("source")).alias("n_s"),
    )
    p = F.col("n_st").cast("double") / F.col("n_s").cast("double")
    q = F.col("n_t").cast("double") / F.col("n_corp").cast("double")
    return sized.select(
        "source",
        "term",
        F.round(p, 6).alias("p_source"),
        F.round(q, 6).alias("q_corpus"),
        F.round(p * F.log(p / q), 6).alias("kl_contrib"),
    )


@_q(
    "a_theilsen_slope",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE) - DATE '1970-01-01'
    ), slopes AS (
      SELECT a.event_type, (b.y - a.y) / CAST(b.d - a.d AS DOUBLE) AS s
      FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
    ), ranked AS (
      SELECT event_type, s,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM slopes
    )
    SELECT event_type, CAST(cnt AS BIGINT) AS n_pairs,
           ROUND(s, 6) AS theilsen_slope
    FROM ranked WHERE rn = (cnt + 1) // 2
    """,
)
def a_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the LOWER MEDIAN of all
    pairwise slopes between daily totals — the estimator that shrugs
    off the outlier days OLS (a_linreg_trend) tips over on; breakdown
    point ~29%.

    Determinism: daily totals are exact decimal sums cast to double and
    day indexes are integers, so every pairwise slope is one identical
    IEEE division in both engines; the lower median SELECTS one of
    those exact values (never averages two), and equal-slope ordering
    ambiguity cannot change the selected VALUE.

    Scale: the self-join is per-type pairwise over DAILY points, so its
    volume is bounded by (types × days²) — a calendar-bounded constant
    independent of raw event volume; the raw table is reduced first by
    one map-side-combinable aggregate. The median is a per-type window
    over the same bounded frame, never a global sort."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
            F.col("value").cast("decimal(38,6)").alias("v"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("v").cast("double").alias("y"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            (
                (F.col("b.y") - F.col("a.y"))
                / (F.col("b.d") - F.col("a.d")).cast("double")
            ).alias("s"),
        )
    )
    w = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "s",
        F.row_number().over(w.orderBy("s")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    return ranked.filter(F.col("rn") == F.expr("(cnt + 1) div 2")).select(
        "event_type",
        F.col("cnt").cast("bigint").alias("n_pairs"),
        F.round("s", 6).alias("theilsen_slope"),
    )
