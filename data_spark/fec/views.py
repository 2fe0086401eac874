"""The 9-view classification/edge layer over the contributions master
(federal/fec/bigquery/contributions.sql:3-129), as composable DataFrame
functions. Views are logical — Catalyst inlines them, shares the single
master scan, and pushes each arm's predicate down (SURVEY §4: the
reference hand-layers views for reuse; the optimizer subsumes that).

The transaction-type classifier everywhere is:
  disbursement ⇔ transaction_tp starts with '2' or '4', except 24I/24T.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EDGE_COLS = [
    "transaction_dt", "transaction_amt", "amndt_ind", "rpt_tp",
    "transaction_pgi", "transaction_tp", "image_num", "file_num", "tran_id",
    "sub_id",
]


def is_disbursement() -> Column:
    tp = F.col("transaction_tp")
    first = F.substring(tp, 1, 1)
    return ((first == "2") | (first == "4")) & (tp != "24I") & (tp != "24T")


def contributions_from_candidates(master: DataFrame) -> DataFrame:
    """contributions.sql:3-8: candidate → committee receipts."""
    return master.filter(
        (F.col("entity_tp") == "CAN")
        & ~F.col("other_id").like("C%")
        & ~is_disbursement()
        & F.col("other_id").isNotNull()
        & F.col("cmte_id").isNotNull()
    ).select(
        F.col("other_id").alias("source"), F.col("cmte_id").alias("target"), *_EDGE_COLS
    )


def contributions_from_ind_donors(master: DataFrame) -> DataFrame:
    """contributions.sql:10-15: individual donor → committee."""
    return master.filter(
        (F.col("entity_tp") == "IND")
        & ~is_disbursement()
        & F.col("name").isNotNull()
        & F.col("cmte_id").isNotNull()
    ).select(
        "entity_tp", "name", "state",
        F.coalesce(F.col("zip_code"), F.lit("")).alias("zip_code"),
        "employer", "occupation",
        F.col("cmte_id").alias("target"), *_EDGE_COLS,
    )


def contributions_from_org_donors(master: DataFrame) -> DataFrame:
    """contributions.sql:17-22: unlinked organization donor → committee."""
    return master.filter(
        (F.col("entity_tp") == "ORG")
        & F.col("other_id").isNull()
        & ~is_disbursement()
        & F.col("name").isNotNull()
        & F.col("cmte_id").isNotNull()
    ).select(
        "entity_tp", "name", "state",
        F.coalesce(F.col("zip_code"), F.lit("")).alias("zip_code"),
        F.col("cmte_id").alias("target"), *_EDGE_COLS,
    )


def _com_entity() -> Column:
    return F.col("entity_tp").isin("CCM", "COM", "PAC", "PTY")


def contributions_com_receipts(master: DataFrame) -> DataFrame:
    """contributions.sql:24-30."""
    return master.filter(
        _com_entity() & ~is_disbursement()
        & F.col("other_id").isNotNull() & F.col("cmte_id").isNotNull()
    ).select(F.col("other_id").alias("source"), F.col("cmte_id").alias("target"), *_EDGE_COLS)


def contributions_com_disbursements(master: DataFrame) -> DataFrame:
    """contributions.sql:32-38 (direction flipped: cmte → other)."""
    return master.filter(
        _com_entity() & is_disbursement()
        & F.col("cmte_id").isNotNull() & F.col("other_id").isNotNull()
    ).select(F.col("cmte_id").alias("source"), F.col("other_id").alias("target"), *_EDGE_COLS)


def contributions_can_disbursements(master: DataFrame) -> DataFrame:
    """contributions.sql:40-46."""
    return master.filter(
        (F.col("entity_tp") == "CAN") & F.col("other_id").like("C%") & is_disbursement()
        & F.col("cmte_id").isNotNull() & F.col("other_id").isNotNull()
    ).select(F.col("cmte_id").alias("source"), F.col("other_id").alias("target"), *_EDGE_COLS)


def contributions_org_receipts(master: DataFrame) -> DataFrame:
    """contributions.sql:48-54."""
    return master.filter(
        (F.col("entity_tp") == "ORG") & F.col("other_id").like("C%") & ~is_disbursement()
        & F.col("other_id").isNotNull() & F.col("cmte_id").isNotNull()
    ).select(F.col("other_id").alias("source"), F.col("cmte_id").alias("target"), *_EDGE_COLS)


def contributions_org_disbursements(master: DataFrame) -> DataFrame:
    """contributions.sql:56-62."""
    return master.filter(
        (F.col("entity_tp") == "ORG") & F.col("other_id").like("C%") & is_disbursement()
        & F.col("cmte_id").isNotNull() & F.col("other_id").isNotNull()
    ).select(F.col("cmte_id").alias("source"), F.col("other_id").alias("target"), *_EDGE_COLS)


def contributions_from_committees(master: DataFrame) -> DataFrame:
    """contributions.sql:64-79: 5-arm committee-edge union."""
    arms = [
        contributions_com_receipts(master),
        contributions_com_disbursements(master),
        contributions_can_disbursements(master),
        contributions_org_receipts(master),
        contributions_org_disbursements(master),
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


_CAND_DIM = [
    "cand_name", "cand_pty_affiliation", "cand_election_yr", "cand_office_st",
    "cand_office", "cand_office_district", "cand_ici", "cand_pcc", "cand_zip",
]
_CMTE_DIM = [
    "cmte_nm", "cmte_zip", "cmte_dsgn", "cmte_tp", "cmte_pty_affiliation",
    "cmte_filing_freq", "org_tp", "connected_org_nm",
]


def _nulls(names: list[str], prefix: str, types: dict[str, str] | None = None):
    types = types or {}
    return [
        F.lit(None).cast(types.get(n, "string")).alias(f"{prefix}_{n}") for n in names
    ]


def pas_elastic(pas_master: DataFrame, cn: DataFrame, cm: DataFrame) -> DataFrame:
    """Committee→candidate support edges from the pas master: the
    spending committee enriched with the committee dim, the supported
    candidate with the candidate dim (same broadcast-dim discipline as
    contributions_elastic). Source key is cmte_id, target key cand_id —
    the one edge type the oth/indiv files cannot express."""
    cnb = F.broadcast(cn.select("cand_id", *_CAND_DIM))
    cmb = F.broadcast(cm.select("cmte_id", *_CMTE_DIM))
    return (
        pas_master.alias("a")
        .filter(F.col("a.cmte_id").isNotNull() & F.col("a.cand_id").isNotNull())
        .join(cmb.alias("s"), F.col("a.cmte_id") == F.col("s.cmte_id"), "left")
        .join(cnb.alias("t"), F.col("a.cand_id") == F.col("t.cand_id"), "left")
        .select(
            F.lit("committee_candidate").alias("classification"),
            F.col("a.cmte_id").alias("source"),
            *[F.col(f"s.{n}").alias(f"source_{n}") for n in _CMTE_DIM],
            F.col("a.cand_id").alias("target"),
            *[F.col(f"t.{n}").alias(f"target_{n}") for n in _CAND_DIM],
            F.col("a.entity_tp").alias("donor_entity_tp"),
            F.col("a.name").alias("donor_name"),
            F.col("a.state").alias("donor_state"),
            *[F.col(f"a.{c}").alias(c) for c in _EDGE_COLS],
        )
    )


def contributions_elastic(master: DataFrame, cn: DataFrame, cm: DataFrame) -> DataFrame:
    """contributions.sql:81-129: 4-arm classified, dim-enriched union
    feeding the document sink. cn/cm are broadcast on every arm."""
    cnb = F.broadcast(cn.select("cand_id", *_CAND_DIM))
    cmb = F.broadcast(cm.select("cmte_id", *_CMTE_DIM))
    cand_types = {"cand_election_yr": "bigint"}

    def target_join(df: DataFrame) -> DataFrame:
        c = cmb.alias("c")
        return df.alias("a").join(c, F.col("a.target") == F.col("c.cmte_id"), "left")

    def tail_cols():
        return [F.col(f"a.{c}").alias(c) for c in ["target"]] + [
            F.col(f"c.{n}").alias(f"target_{n}") for n in _CMTE_DIM
        ] + [F.col(f"a.{c}").alias(c) for c in _EDGE_COLS]

    donor_null = _nulls(
        ["entity_tp", "name", "state", "zip_code", "employer", "occupation"], "donor"
    )

    candidates = (
        target_join(contributions_from_candidates(master))
        .join(cnb.alias("b"), F.col("a.source") == F.col("b.cand_id"), "left")
        .select(
            F.lit("candidate").alias("classification"),
            *donor_null,
            F.col("a.source").alias("source"),
            *[F.col(f"b.{n}").alias(f"source_{n}") for n in _CAND_DIM],
            *_nulls(_CMTE_DIM, "source"),
            *tail_cols(),
        )
    )
    individuals = target_join(contributions_from_ind_donors(master)).select(
        F.lit("individual").alias("classification"),
        F.col("a.entity_tp").alias("donor_entity_tp"),
        F.col("a.name").alias("donor_name"),
        F.col("a.state").alias("donor_state"),
        F.col("a.zip_code").alias("donor_zip_code"),
        F.col("a.employer").alias("donor_employer"),
        F.col("a.occupation").alias("donor_occupation"),
        F.lit(None).cast("string").alias("source"),
        *_nulls(_CAND_DIM, "source", cand_types),
        *_nulls(_CMTE_DIM, "source"),
        *tail_cols(),
    )
    organizations = target_join(contributions_from_org_donors(master)).select(
        F.lit("organization").alias("classification"),
        F.col("a.entity_tp").alias("donor_entity_tp"),
        F.col("a.name").alias("donor_name"),
        F.col("a.state").alias("donor_state"),
        F.col("a.zip_code").alias("donor_zip_code"),
        F.lit(None).cast("string").alias("donor_employer"),
        F.lit(None).cast("string").alias("donor_occupation"),
        F.lit(None).cast("string").alias("source"),
        *_nulls(_CAND_DIM, "source", cand_types),
        *_nulls(_CMTE_DIM, "source"),
        *tail_cols(),
    )
    committees = (
        target_join(contributions_from_committees(master))
        .join(cmb.alias("b"), F.col("a.source") == F.col("b.cmte_id"), "left")
        .select(
            F.lit("committee").alias("classification"),
            *donor_null,
            F.col("a.source").alias("source"),
            *_nulls(_CAND_DIM, "source", cand_types),
            *[F.col(f"b.{n}").alias(f"source_{n}") for n in _CMTE_DIM],
            *tail_cols(),
        )
    )
    return (
        candidates.unionByName(individuals)
        .unionByName(organizations)
        .unionByName(committees)
    )
