"""Property-based cross-engine fuzzing: generate small filter/project/
aggregate queries over lineitem and require Spark and DuckDB to return
identical results (the sqllogictest-style harness SURVEY §5 says the
reference never had). Derandomized so CI is stable."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from data_spark.io import read_table
from tools.check_correctness import frame_key

# slow lane (VERDICT r12 #1): the fuzz sweep is full-coverage work,
# not per-commit signal - run with SPARK_GRAFT_RUN_SLOW=1 / -m slow
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]

comparison = st.sampled_from(["<", "<=", ">", ">=", "=", "<>"])

num_pred = st.builds(
    lambda c, op, v: f"{c} {op} {v}",
    st.sampled_from(NUM_COLS),
    comparison,
    st.floats(min_value=0.01, max_value=100000, allow_nan=False).map(lambda x: round(x, 2)),
)
str_pred = st.builds(
    lambda c, op, v: f"{c} {op} '{v}'",
    st.sampled_from(STR_COLS),
    st.sampled_from(["=", "<>"]),
    st.sampled_from(["A", "N", "R", "O", "F"]),
)
key_pred = st.builds(
    lambda c, op, v: f"{c} {op} {v}",
    st.sampled_from(KEY_COLS),
    comparison,
    st.integers(min_value=0, max_value=6000),
)
atom = st.one_of(num_pred, str_pred, key_pred)
predicate = st.recursive(
    atom,
    lambda inner: st.builds(
        lambda a, conj, b: f"({a} {conj} {b})", inner, st.sampled_from(["AND", "OR"]), inner
    ),
    max_leaves=4,
)


@pytest.fixture(scope="module")
def engines(spark):
    read_table(spark, SF, "lineitem").createOrReplaceTempView("li_fuzz")
    read_table(spark, SF, "orders").createOrReplaceTempView("ord_fuzz")
    read_table(spark, SF, "part").createOrReplaceTempView("part_fuzz")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW li_fuzz AS SELECT * FROM '{SF}/lineitem.parquet'")
    con.execute(f"CREATE VIEW ord_fuzz AS SELECT * FROM '{SF}/orders.parquet'")
    con.execute(f"CREATE VIEW part_fuzz AS SELECT * FROM '{SF}/part.parquet'")
    return spark, con


def _parity(spark, con, sql):
    sdf = spark.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    drows = res.fetchall()
    sc, sk = frame_key(sdf.columns, srows)
    dc, dk = frame_key([d[0] for d in res.description], drows)
    assert sc == dc, f"columns for: {sql}"
    assert sk == dk, f"mismatch for: {sql}"


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate, cols=st.sets(st.sampled_from(KEY_COLS + STR_COLS), min_size=1, max_size=4))
def test_filter_project_parity(engines, pred, cols):
    spark, con = engines
    collist = ", ".join(sorted(cols))
    sql = f"SELECT {collist} FROM li_fuzz WHERE {pred}"
    sdf = spark.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    drows = res.fetchall()
    sc, sk = frame_key(sdf.columns, srows)
    dc, dk = frame_key([d[0] for d in res.description], drows)
    assert sc == dc
    assert sk == dk, f"mismatch for: {sql}"


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate, group=st.sampled_from(STR_COLS), agg_col=st.sampled_from(KEY_COLS))
def test_aggregate_parity(engines, pred, group, agg_col):
    spark, con = engines
    # decimal-exact aggregates only (see queries.common determinism rules)
    sql = (
        f"SELECT {group}, COUNT(*) AS n, MIN({agg_col}) AS mn, MAX({agg_col}) AS mx, "
        f"SUM({agg_col}) AS s FROM li_fuzz WHERE {pred} GROUP BY {group}"
    )
    _parity(spark, con, sql)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicate,
    how=st.sampled_from(["JOIN", "LEFT JOIN", "SEMI JOIN", "ANTI JOIN"]),
    ocol=st.sampled_from(["o_orderstatus", "o_orderpriority", "o_totalprice"]),
)
def test_join_parity(engines, pred, how, ocol):
    """Fuzzed join shapes over lineitem ⋈ orders: inner/left/semi/anti
    with a generated lineitem-side predicate."""
    spark, con = engines
    if how in ("SEMI JOIN", "ANTI JOIN"):
        # semi/anti expose only the left side; DuckDB's SEMI/ANTI syntax
        # matches Spark's
        sql = (
            f"SELECT l_orderkey, l_linenumber, l_returnflag FROM li_fuzz "
            f"{how} ord_fuzz ON l_orderkey = o_orderkey WHERE {pred}"
        )
    else:
        sql = (
            f"SELECT l_orderkey, l_linenumber, {ocol} FROM li_fuzz "
            f"{how} ord_fuzz ON l_orderkey = o_orderkey WHERE {pred}"
        )
    _parity(spark, con, sql)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicate,
    part=st.sampled_from(STR_COLS),
    order=st.sampled_from(KEY_COLS),
    fn=st.sampled_from(
        ["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "COUNT(*)", "MIN(l_orderkey)"]
    ),
)
def test_window_parity(engines, pred, part, order, fn):
    """Fuzzed window functions: ranking and running aggregates over a
    deterministic (unique-key-completed) ORDER BY."""
    spark, con = engines
    # complete the order with all key cols so ties are impossible and
    # running aggregates are engine-deterministic
    order_cols = ", ".join([order] + [k for k in KEY_COLS if k != order])
    frame = (
        "" if fn.endswith("()") and "COUNT" not in fn
        else " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    sql = (
        f"SELECT l_orderkey, l_linenumber, {fn} OVER "
        f"(PARTITION BY {part} ORDER BY {order_cols}{frame}) AS w "
        f"FROM li_fuzz WHERE {pred}"
    )
    _parity(spark, con, sql)


str_expr = st.sampled_from(
    [
        "upper(l_returnflag)",
        "lower(l_linestatus)",
        "trim(l_returnflag || '  ')",
        "substr(l_returnflag || l_linestatus, 1, 2)",
        "l_returnflag || '_' || l_linestatus",
        "length(l_returnflag || l_linestatus)",
        "replace(l_returnflag, 'A', 'Z')",
        "coalesce(nullif(l_returnflag, 'N'), 'none')",
    ]
)
date_expr = st.sampled_from(
    [
        "year(l_shipdate)",
        "month(l_shipdate)",
        "day(l_shipdate)",
        # date_trunc: DATE in DuckDB, TIMESTAMP in Spark — cast to compare
        "CAST(date_trunc('month', l_shipdate) AS DATE)",
        "CAST(date_trunc('day', l_shipdate) AS DATE)",
    ]
)
num_expr = st.sampled_from(
    [
        "abs(l_quantity - 25)",
        # floor/ceil: DOUBLE in DuckDB, BIGINT in Spark — cast to compare
        "CAST(floor(l_extendedprice / 100) AS BIGINT)",
        "CAST(ceil(l_discount * 100) AS BIGINT)",
        "greatest(l_quantity, l_tax * 10)",
        "least(l_quantity, 10.0)",
    ]
)


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate, e1=str_expr, e2=date_expr, e3=num_expr)
def test_scalar_function_parity(engines, pred, e1, e2, e3):
    """Fuzzed scalar string/date/numeric expressions (the §2.8 function
    surface both engines share, dialect-identical subset): projected
    over a fuzzed filter, full-row parity."""
    spark, con = engines
    sql = (
        f"SELECT l_orderkey, l_linenumber, {e1} AS s, {e2} AS d, {e3} AS n "
        f"FROM li_fuzz WHERE {pred}"
    )
    _parity(spark, con, sql)


# ---------------------------------------------------------------------------
# Window-function fuzzing: random (function, partition, order, frame)
# combinations must agree across engines. Determinism discipline:
# ranking funcs get a total order (unique (l_orderkey, l_linenumber)
# tiebreak), value orderings pin NULLS FIRST explicitly (Spark's ASC
# default is nulls-first, DuckDB's is nulls-last — the f_null_semantics
# trap), and SUM goes through DECIMAL then back to DOUBLE.
# ---------------------------------------------------------------------------

_WF_TIEBREAK = "l_orderkey, l_linenumber"

_wf_func = st.sampled_from(
    [
        ("ROW_NUMBER()", "rows"),
        ("RANK()", "plain"),
        ("DENSE_RANK()", "plain"),
        ("COUNT(*)", "frame"),
        ("MIN({c})", "frame"),
        ("MAX({c})", "frame"),
        # OVER binds to the aggregate, so the decimal SUM template
        # carries its own {over} slot inside the outer CAST
        ("CAST(SUM(CAST({c} AS DECIMAL(38,6))) OVER {over} AS DOUBLE)", "frame"),
        ("LAG({c}, {k})", "rows"),
        ("LEAD({c}, {k})", "rows"),
    ]
)
_wf_frame = st.sampled_from(
    [
        "",
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        " ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING",
        " ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
    ]
)


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=_wf_func,
    part=st.sampled_from(["l_returnflag", "l_linestatus", "l_returnflag, l_linestatus"]),
    val=st.sampled_from(NUM_COLS + KEY_COLS),
    off=st.integers(min_value=1, max_value=3),
    frame=_wf_frame,
)
def test_window_function_parity(engines, fn, part, val, off, frame):
    spark, con = engines
    tmpl, kind = fn
    expr = tmpl.replace("{c}", val).replace("{k}", str(off))
    if kind == "plain":
        # rank functions: order by a possibly-tied value — ties share a
        # rank, so the result is deterministic without a tiebreak, and
        # WITH ties the two engines must still agree
        over = f"(PARTITION BY {part} ORDER BY {val} ASC NULLS FIRST)"
    elif kind == "rows":
        # row-position functions need a TOTAL order
        over = f"(PARTITION BY {part} ORDER BY {val} ASC NULLS FIRST, {_WF_TIEBREAK})"
    else:
        over = (
            f"(PARTITION BY {part} ORDER BY {val} ASC NULLS FIRST, {_WF_TIEBREAK}"
            f"{frame})"
        )
    win = expr.format(over=over) if "{over}" in tmpl else f"{expr} OVER {over}"
    sql = (
        f"SELECT l_orderkey, l_linenumber, {win} AS w "
        f"FROM li_fuzz WHERE l_orderkey < 3000"
    )
    _parity(spark, con, sql)


# ---------------------------------------------------------------------------
# Date/interval fuzzing over orders.o_orderdate: truncation grains,
# date_part extraction, interval shifts, and date diffs must agree.
# All expressions avoid engine-specific formatting — outputs are
# truncated timestamps (canonicalized by the shared frame_key), integer
# parts, or integer day differences.
# ---------------------------------------------------------------------------

_DT_GRAIN = st.sampled_from(["year", "quarter", "month", "week", "day"])
_DT_PART = st.sampled_from(["year", "month", "day", "quarter"])
_DT_SHIFT = st.integers(min_value=-90, max_value=90)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(grain=_DT_GRAIN, part=_DT_PART, shift=_DT_SHIFT)
def test_date_function_parity(engines, grain, part, shift):
    spark, con = engines
    sql = (
        f"SELECT o_orderkey, "
        # both engines cast to DATE: Spark's date_trunc returns a
        # TIMESTAMP while DuckDB's returns DATE for calendar grains
        f"CAST(date_trunc('{grain}', o_orderdate) AS DATE) AS tr, "
        f"CAST(date_part('{part}', o_orderdate) AS BIGINT) AS pt, "
        f"CAST(o_orderdate + INTERVAL {abs(shift)} DAY AS DATE) AS fwd, "
        f"CAST(o_orderdate - INTERVAL {abs(shift)} DAY AS DATE) AS back "
        # (a date-diff column was dropped: Spark's date_diff takes an
        # UNQUOTED unit while DuckDB's takes a string — no shared text)
        f"FROM ord_fuzz WHERE o_orderkey % 7 = {abs(shift) % 7}"
    )
    _parity(spark, con, sql)


# ---------------------------------------------------------------------------
# String-function fuzzing over part names: case mapping, substring
# windows, replace, padding, split-part and edit distance must agree.
# Expressions stick to the dialect intersection (e.g. ASCII-only data,
# 1-based substring, split_part in both engines).
# ---------------------------------------------------------------------------


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    start=st.integers(min_value=1, max_value=8),
    length=st.integers(min_value=1, max_value=10),
    needle=st.sampled_from(["a", "e", "o", "re", "ol"]),
    repl=st.sampled_from(["", "_", "XY"]),
    field=st.integers(min_value=1, max_value=3),
)
def test_string_function_parity(engines, start, length, needle, repl, field):
    spark, con = engines
    sql = (
        f"SELECT p_partkey, "
        f"upper(p_name) AS u, "
        f"substring(p_name, {start}, {length}) AS sub, "
        f"replace(p_name, '{needle}', '{repl}') AS rep, "
        f"CAST(length(p_name) AS BIGINT) AS ln, "
        f"split_part(p_name, ' ', {field}) AS sp, "
        f"CAST(levenshtein(p_name, 'standard widget') AS BIGINT) AS lev "
        f"FROM part_fuzz WHERE p_partkey % 5 = {start % 5}"
    )
    _parity(spark, con, sql)


# ---------------------------------------------------------------------------
# Phonetic-key fuzz: the simplified-soundex algebra must encode
# IDENTICALLY in both engines for arbitrary inputs — not just the 11
# golden words — including mixed case, digits, punctuation, unicode
# noise, and pathological repeats.
# ---------------------------------------------------------------------------

phonetic_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzAEIOU'.- 0123456789é",
    min_size=0,
    max_size=24,
)


@settings(
    max_examples=60,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
    deadline=None,
)
@given(words=st.lists(phonetic_word, min_size=1, max_size=8, unique=True))
def test_phonetic_key_fuzz_parity(engines, words):
    from pyspark.sql import functions as F

    from data_spark.functions.text import phonetic_key, phonetic_key_sql

    spark, con = engines
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: (r.k or "")
        for r in df.select("w", phonetic_key(F.col("w")).alias("k")).collect()
    }
    for w in words:
        lit = "'" + w.replace("'", "''") + "'"
        val = con.execute(f"SELECT {phonetic_key_sql(lit)}").fetchone()[0]
        assert (val or "") == got[w], w
        # structural invariant: empty, or an upper letter + 3 digits
        k = got[w]
        if k:
            assert len(k) == 4 and k[0].isupper() and k[1:].isdigit()


# ---------------------------------------------------------------------------
# Distributed-rank fuzz: global_row_number must agree with a plain
# sorted enumeration for arbitrary key sets (duplicated keys included —
# the tiebreak column restores the total order) at every partition
# count.
# ---------------------------------------------------------------------------


@settings(
    max_examples=20,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
    deadline=None,
)
@given(
    keys=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=3), min_size=1, max_size=40
    ),
    n_parts=st.sampled_from([1, 2, 5]),
)
def test_global_row_number_fuzz(engines, keys, n_parts):
    from data_spark.operators.order import global_row_number

    spark, _ = engines
    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k string, tie long")
    ranked = global_row_number(df, ["k", "tie"], num_partitions=n_parts)
    got = [(r.k, r.tie) for r in ranked.orderBy("rn").collect()]
    assert got == sorted(rows)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred_a=predicate,
    pred_b=predicate,
    op=st.sampled_from(["INTERSECT", "EXCEPT", "UNION"]),
    cols=st.sets(st.sampled_from(KEY_COLS + STR_COLS), min_size=1, max_size=3),
)
def test_setop_parity(engines, pred_a, pred_b, op, cols):
    """Fuzzed set operations: two generated predicates over the same
    scan, combined with INTERSECT/EXCEPT/UNION (all set-dedup
    semantics) — the relational algebra the reference's queue-dedup
    and master-list code paths rely on."""
    spark, con = engines
    proj = ", ".join(sorted(cols))
    sql = (
        f"SELECT {proj} FROM li_fuzz WHERE {pred_a} "
        f"{op} SELECT {proj} FROM li_fuzz WHERE {pred_b}"
    )
    _parity(spark, con, sql)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicate,
    shape=st.sampled_from(
        ["ROLLUP(l_returnflag, l_linestatus)",
         "CUBE(l_returnflag, l_linestatus)",
         "GROUPING SETS ((l_returnflag), (l_linestatus), ())"]
    ),
    min_n=st.integers(min_value=1, max_value=50),
)
def test_rollup_having_parity(engines, pred, shape, min_n):
    """Fuzzed multi-level aggregation lattices with a HAVING cut: the
    NULL indicator rows ROLLUP/CUBE emit must canonicalize identically
    across engines, and the HAVING predicate must apply after the
    lattice expansion in both.

    KNOWN DIVERGENCE this family documents (caught by its first run):
    on an EMPTY filtered input, DuckDB's ROLLUP/CUBE emits the
    SQL-standard grand-total row (NULL, NULL, 0, NULL) for the ()
    grouping set while Spark emits no rows at all. min_n >= 1 keeps
    the generated queries inside the semantics the engines share; any
    registry query that rolls up a possibly-empty filter must force a
    non-empty input or avoid the () grouping set."""
    spark, con = engines
    sql = (
        f"SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        f"SUM(l_orderkey) AS s FROM li_fuzz WHERE {pred} "
        f"GROUP BY {shape} HAVING COUNT(*) >= {min_n}"
    )
    _parity(spark, con, sql)


# ---------------------------------------------------------------------------
# bloom membership pruning: pruned and unpruned recovery must agree on
# EVERY key set (r12 — the probe is pure file-skipping, the semi-join
# is the residual; any divergence is a false negative, i.e. corruption)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bloom_tables(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    from data_spark.io import write_versioned

    root = tmp_path_factory.mktemp("bloomfuzz")
    base = spark.range(0, 3000).select(
        F.col("id").alias("k"),
        (F.col("id") % 13).cast("bigint").alias("v"),
        (F.col("id") % 4).cast("string").alias("p"),
    )
    paths = {}
    for name, bloom, part in (
        ("bloom_flat", True, None),
        ("plain_flat", False, None),
        ("bloom_hive", True, ["p"]),
    ):
        tp = str(root / name)
        for i in range(3):
            write_versioned(
                base.filter(F.col("k") % 3 == i).repartition(6),
                tp,
                mode="overwrite" if i == 0 else "append",
                stats_cols=["k"],
                bloom_cols=["k"] if bloom and i == 0 else None,
                partition_by=part,
            )
        paths[name] = tp
    return paths


key_sets = st.lists(
    st.integers(min_value=-50, max_value=3300), min_size=1, max_size=12
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(keys=key_sets)
def test_fuzz_bloom_preimages_equal_plain(spark, bloom_tables, keys):
    from data_spark.io import (
        _load_manifest,
        _tombstone_bounds,
        _tombstone_preimages,
        branch_head,
    )

    tomb = spark.createDataFrame([(k,) for k in keys], "k bigint").dropDuplicates()
    bounds = _tombstone_bounds(tomb)
    got = {}
    for name in ("bloom_flat", "plain_flat", "bloom_hive"):
        tp = bloom_tables[name]
        v = branch_head(tp, "main")
        pre = _tombstone_preimages(spark, tp, v, tomb, bounds)
        got[name] = sorted((r["k"], r["v"]) for r in pre.select("k", "v").collect())
    assert got["bloom_flat"] == got["plain_flat"]
    assert got["bloom_hive"] == got["plain_flat"]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(keys=st.lists(st.integers(min_value=-50, max_value=3300), min_size=1, max_size=5))
def test_fuzz_bloom_point_lookup_equals_filter(spark, bloom_tables, keys):
    from data_spark.io import read_versioned

    tp = bloom_tables["bloom_flat"]
    if len(keys) == 1:
        where = f"k = {keys[0]}"
    else:
        where = f"k IN ({', '.join(map(str, keys))})"
    got = sorted(
        (r["k"], r["v"]) for r in read_versioned(spark, tp, where=where).select("k", "v").collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in read_versioned(spark, tp).filter(where).select("k", "v").collect()
    )
    assert got == want
