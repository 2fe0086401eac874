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
