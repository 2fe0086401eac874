"""FEC contribution-graph extraction (SURVEY §3.1 step 7).

The reference classifies each contribution doc into one of ~10 Cypher
batch lists and MERGEs Candidate/Committee/Donor/Contribution/Day nodes
plus CONTRIBUTED_TO / HAPPENED_ON edges
(load_graph_contributions/main.py:83-182, cypher.py:11-163). Node keys
per the declared constraints (cypher.py:1-9): Candidate.cand_id,
Committee.cmte_id, Contribution.sub_id, Donor (name, zip_code), Day
(year, month, day).

Spark restatement: one pass over the classified view produces node and
edge DataFrames; the per-classification routing is a `when` column, the
with/without-date split is just nullable Day columns, and MERGE is the
keyed dedup in graph.tables. No batching, no 10-way row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_spark.functions.text import clean_zip
from data_spark.graph.tables import GraphTables, upsert_edges, upsert_nodes
from data_spark.operators.merge import delete_then_insert


def _props(*cols: str) -> F.Column:
    pairs = []
    for c in cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    return F.create_map(*pairs)


def contribution_graph(elastic: DataFrame) -> GraphTables:
    """Nodes/edges for the contribution graph from the classified view.

    Source node label/key by classification:
      candidate → Candidate(cand_id); committee → Committee(cmte_id);
      individual/organization → Donor(name, zip_code) with cleaned zip.
    Every row adds Contribution(sub_id) (props: amount, types, file ids)
    and target Committee(cmte_id); dated rows add Day(y,m,d) +
    HAPPENED_ON.
    """
    cls = F.col("classification")
    # try_cast: malformed repaired dates (e.g. a 7-char raw MMDDYYY) route
    # to the without-date path, like the reference's try/except parse_date
    dt = F.col("transaction_dt").try_cast("date")
    base = elastic.select(
        cls.alias("classification"),
        F.when(cls == "candidate", F.lit("Candidate"))
        .when(cls == "committee", F.lit("Committee"))
        .otherwise(F.lit("Donor"))
        .alias("src_label"),
        F.when(cls.isin("individual", "organization"),
               F.concat_ws("|", F.col("donor_name"), clean_zip(F.col("donor_zip_code"))))
        .otherwise(F.col("source"))
        .alias("src_key"),
        F.col("target").alias("target_key"),
        F.col("sub_id").cast("string").alias("sub_id"),
        dt.alias("d"),
        F.year(dt).alias("year"),
        F.month(dt).alias("month"),
        F.dayofmonth(dt).alias("day"),
        "transaction_amt", "amndt_ind", "rpt_tp", "transaction_pgi",
        "transaction_tp", "image_num", "file_num", "tran_id",
        "donor_name", "donor_zip_code", "donor_state", "donor_employer",
        "donor_occupation",
    ).filter(F.col("src_key").isNotNull() & (F.col("src_key") != ""))

    src_nodes = base.select(
        F.col("src_label").alias("label"),
        F.col("src_key").alias("key"),
        F.when(
            F.col("src_label") == "Donor",
            _props("donor_name", "donor_state", "donor_employer", "donor_occupation"),
        ).otherwise(F.create_map().cast("map<string,string>")).alias("props"),
    )
    target_nodes = base.select(
        F.lit("Committee").alias("label"),
        F.col("target_key").alias("key"),
        F.create_map().cast("map<string,string>").alias("props"),
    )
    contribution_nodes = base.select(
        F.lit("Contribution").alias("label"),
        F.col("sub_id").alias("key"),
        _props(
            "transaction_amt", "amndt_ind", "rpt_tp", "transaction_pgi",
            "transaction_tp", "image_num", "file_num", "tran_id",
        ).alias("props"),
    )
    day_nodes = base.filter(F.col("d").isNotNull()).select(
        F.lit("Day").alias("label"),
        F.concat_ws("-", "year", "month", "day").alias("key"),
        F.create_map().cast("map<string,string>").alias("props"),
    )
    nodes = upsert_nodes(
        None,
        src_nodes.unionByName(target_nodes)
        .unionByName(contribution_nodes)
        .unionByName(day_nodes),
        ["label", "key"],
    )

    def edge(src_label, src_key, rel, dst_label, dst_key, df=base):
        return df.select(
            src_label.alias("src_label"), src_key.alias("src_key"),
            F.lit(rel).alias("rel"),
            dst_label.alias("dst_label"), dst_key.alias("dst_key"),
        )

    e1 = edge(F.col("src_label"), F.col("src_key"), "CONTRIBUTED_TO",
              F.lit("Contribution"), F.col("sub_id"))
    e2 = edge(F.lit("Contribution"), F.col("sub_id"), "CONTRIBUTED_TO",
              F.lit("Committee"), F.col("target_key"))
    e3 = edge(F.col("src_label"), F.col("src_key"), "CONTRIBUTED_TO",
              F.lit("Committee"), F.col("target_key"))
    dated = base.filter(F.col("d").isNotNull())
    e4 = edge(F.lit("Contribution"), F.col("sub_id"), "HAPPENED_ON",
              F.lit("Day"), F.concat_ws("-", "year", "month", "day"), df=dated)
    edges = upsert_edges(None, e1.unionByName(e2).unionByName(e3).unionByName(e4))
    return GraphTables(nodes=nodes, edges=edges)


def _node(df: DataFrame, label: str, key, props=None) -> DataFrame:
    out = df.filter(key.isNotNull() & (key != "")).select(
        F.lit(label).alias("label"),
        key.alias("key"),
        (props if props is not None else F.create_map().cast("map<string,string>")).alias(
            "props"
        ),
    )
    return out


def _edge(df: DataFrame, src_label, src_key, rel: str, dst_label, dst_key) -> DataFrame:
    return df.filter(
        src_key.isNotNull() & (src_key != "") & dst_key.isNotNull() & (dst_key != "")
    ).select(
        F.lit(src_label).alias("src_label"), src_key.alias("src_key"),
        F.lit(rel).alias("rel"),
        F.lit(dst_label).alias("dst_label"), dst_key.alias("dst_key"),
    )


def race_key() -> F.Column:
    """Race composite NODE KEY (type, election_yr, office, office_st,
    office_district) — load_graph_candidates/cypher.py:5 — flattened to
    one string key with a fixed field order."""
    return F.concat_ws(
        "|",
        F.lit("federal"),
        F.col("cand_election_yr").cast("string"),
        F.col("cand_office_st"),
        F.col("cand_office"),
        F.col("cand_office_district"),
    )


def candidate_graph(cn: DataFrame, ccl: DataFrame) -> GraphTables:
    """Candidate graph build (load_graph_candidates/cypher.py:7-43):
    Candidate nodes with SET props, State/Party nodes, the Race 5-tuple
    composite-key node, and RUNNING_IN / ASSOCIATED_WITH / RUNNING_FOR
    edges; ccl linkages become Committee-ASSOCIATED_WITH->Candidate
    edges keyed by linkage_id."""
    cand_props = _props(
        "cand_name", "cand_pty_affiliation", "cand_election_yr", "cand_office_st",
        "cand_office", "cand_office_district", "cand_ici",
    )
    nodes = upsert_nodes(
        None,
        _node(cn, "Candidate", F.col("cand_id"), cand_props)
        .unionByName(_node(cn, "State", F.col("cand_office_st")))
        .unionByName(_node(cn, "Party", F.col("cand_pty_affiliation")))
        .unionByName(
            _node(
                cn.filter(F.col("cand_election_yr").isNotNull()),
                "Race",
                race_key(),
                _props(
                    "cand_election_yr", "cand_office_st", "cand_office",
                    "cand_office_district",
                ),
            )
        ),
        ["label", "key"],
    )
    raced = cn.filter(F.col("cand_election_yr").isNotNull())
    plain_edges = (
        _edge(cn, "Candidate", F.col("cand_id"), "RUNNING_IN", "State",
              F.col("cand_office_st"))
        .unionByName(_edge(cn, "Candidate", F.col("cand_id"), "ASSOCIATED_WITH",
                           "Party", F.col("cand_pty_affiliation")))
        .unionByName(_edge(raced, "Candidate", F.col("cand_id"), "RUNNING_FOR",
                           "Race", race_key()))
        .unionByName(_edge(raced, "Race", race_key(), "ASSOCIATED_WITH", "State",
                           F.col("cand_office_st")))
    )
    # edge identity includes linkage_id (MERGE {subtype:'linkage',
    # linkage_id})
    linkage_edges = ccl.filter(
        F.col("cmte_id").isNotNull() & F.col("cand_id").isNotNull()
    ).select(
        F.lit("Committee").alias("src_label"), F.col("cmte_id").alias("src_key"),
        F.lit("ASSOCIATED_WITH").alias("rel"),
        F.lit("Candidate").alias("dst_label"), F.col("cand_id").alias("dst_key"),
        F.col("linkage_id").cast("string").alias("linkage_id"),
    )
    edges = upsert_edges(None, plain_edges).withColumn(
        "linkage_id", F.lit(None).cast("string")
    ).unionByName(
        upsert_edges(
            None, linkage_edges,
            ["src_label", "src_key", "rel", "dst_label", "dst_key", "linkage_id"],
        )
    )
    return GraphTables(nodes=nodes, edges=edges)


def committee_graph(cm: DataFrame, ccl: DataFrame) -> GraphTables:
    """Committee graph build (load_graph_committees/cypher.py:7-37):
    Committee nodes with SET props, Party and Employer
    (connected_org_nm) nodes, ASSOCIATED_WITH edges, plus ccl linkage
    edges to candidates keyed by linkage_id."""
    cmte_props = _props(
        "cmte_nm", "cmte_dsgn", "cmte_tp", "cmte_pty_affiliation", "org_tp",
        "connected_org_nm",
    )
    nodes = upsert_nodes(
        None,
        _node(cm, "Committee", F.col("cmte_id"), cmte_props)
        .unionByName(_node(cm, "Party", F.col("cmte_pty_affiliation")))
        .unionByName(_node(cm, "Employer", F.col("connected_org_nm"))),
        ["label", "key"],
    )
    plain_edges = _edge(
        cm, "Committee", F.col("cmte_id"), "ASSOCIATED_WITH", "Party",
        F.col("cmte_pty_affiliation"),
    ).unionByName(
        _edge(cm, "Committee", F.col("cmte_id"), "ASSOCIATED_WITH", "Employer",
              F.col("connected_org_nm"))
    )
    linkage_edges = ccl.filter(
        F.col("cmte_id").isNotNull() & F.col("cand_id").isNotNull()
    ).select(
        F.lit("Committee").alias("src_label"), F.col("cmte_id").alias("src_key"),
        F.lit("ASSOCIATED_WITH").alias("rel"),
        F.lit("Candidate").alias("dst_label"), F.col("cand_id").alias("dst_key"),
        F.col("linkage_id").cast("string").alias("linkage_id"),
    )
    edges = upsert_edges(None, plain_edges).withColumn(
        "linkage_id", F.lit(None).cast("string")
    ).unionByName(
        upsert_edges(
            None, linkage_edges,
            ["src_label", "src_key", "rel", "dst_label", "dst_key", "linkage_id"],
        )
    )
    return GraphTables(nodes=nodes, edges=edges)


def _exp_key(file_num_col: str = "file_num") -> F.Column:
    """Expenditure composite NODE KEY (type, file_num, tran_id) —
    load_graph_expenditures/cypher.py:4 — flattened."""
    return F.concat_ws(
        "|", F.lit("independent"), F.col(file_num_col).cast("string"), F.col("tran_id")
    )


def expenditure_graph(
    exp_master: DataFrame, existing: GraphTables | None = None
) -> GraphTables:
    """Independent-expenditure graph build with amendment routing
    (load_graph_expenditures/cypher.py:40-75): rows carrying
    prev_file_num first DETACH DELETE their predecessor Expenditure
    node (same type+tran_id, prior file_num) — node removal routed
    through merge.delete_then_insert, edge detach as anti-joins on both
    endpoints — then everything MERGEs as usual: Committee-SPENT->
    Expenditure-IDENTIFIES->Candidate, PAID->Payee, HAPPENED_ON->Day,
    Committee-TARGETS->Candidate."""
    ind = exp_master.filter(
        (F.col("type") == "independent")
        & F.col("cand_id").isNotNull()
        & F.col("cmte_id").isNotNull()
    )
    dt = F.col("transaction_dt").try_cast("date")
    base = ind.select(
        "cmte_id", "cand_id", "payee", "transaction_amt", "sup_opp", "purpose",
        "amndt_ind", "image_num",
        _exp_key().alias("exp_key"),
        F.when(
            F.col("prev_file_num").isNotNull(), _exp_key("prev_file_num")
        ).alias("prev_exp_key"),
        dt.alias("d"),
        F.year(dt).alias("year"), F.month(dt).alias("month"),
        F.dayofmonth(dt).alias("day"),
    )
    exp_props = _props(
        "transaction_amt", "sup_opp", "purpose", "amndt_ind", "image_num",
    )
    exp_nodes = base.select(
        F.lit("Expenditure").alias("label"),
        F.col("exp_key").alias("key"),
        exp_props.alias("props"),
        F.col("prev_exp_key"),
    )
    dated = base.filter(F.col("d").isNotNull())
    day_key = F.concat_ws("-", "year", "month", "day")
    other_nodes = (
        _node(base, "Committee", F.col("cmte_id"))
        .unionByName(_node(base, "Candidate", F.col("cand_id")))
        .unionByName(_node(base, "Payee", F.col("payee")))
        .unionByName(_node(dated, "Day", day_key))
    )
    new_edges = (
        _edge(base, "Committee", F.col("cmte_id"), "SPENT", "Expenditure",
              F.col("exp_key"))
        .unionByName(_edge(base, "Expenditure", F.col("exp_key"), "IDENTIFIES",
                           "Candidate", F.col("cand_id")))
        .unionByName(_edge(base, "Expenditure", F.col("exp_key"), "PAID", "Payee",
                           F.col("payee")))
        .unionByName(_edge(dated, "Expenditure", F.col("exp_key"), "HAPPENED_ON",
                           "Day", day_key))
        .unionByName(_edge(base, "Committee", F.col("cmte_id"), "TARGETS",
                           "Candidate", F.col("cand_id")))
    )

    if existing is None:
        nodes = upsert_nodes(
            None,
            exp_nodes.drop("prev_exp_key").unionByName(other_nodes),
            ["label", "key"],
        )
        edges = upsert_edges(None, new_edges)
        return GraphTables(nodes=nodes, edges=edges)

    # DETACH DELETE predecessors: the Expenditure keys referenced by
    # amendments vanish from the node table (delete_then_insert also
    # inserts the amendment nodes) and every edge touching them goes.
    nodes = delete_then_insert(
        existing.nodes, exp_nodes, key="key", prev_key="prev_exp_key"
    )
    prev_keys = exp_nodes.select(F.col("prev_exp_key").alias("k")).where(
        F.col("k").isNotNull()
    ).distinct()
    edges = (
        existing.edges
        .join(prev_keys, existing.edges.src_key == F.col("k"), "left_anti")
        .join(prev_keys, F.col("dst_key") == F.col("k"), "left_anti")
    )
    nodes = upsert_nodes(nodes, other_nodes, ["label", "key"])
    edges = upsert_edges(edges, new_edges)
    return GraphTables(nodes=nodes, edges=edges)
