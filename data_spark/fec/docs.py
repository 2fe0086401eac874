"""Nested document assembly + linkage grouping (SURVEY §2.8
struct/array construction, §2.4 A2).

``contribution_documents`` reproduces the per-row doc built by
federal_fec_compute_load_elastic_contributions/main.py:91-196 — but as
one struct() projection over the classified view, not a pandas loop:
  row:       the nested source/target envelope (variant sub-struct per
             classification: donor | candidate | committee)
  processed: normalized date + process_name'd donor/candidate name
  (context.last_* timestamps are sink metadata, injected at write time)

``linkage_documents`` reproduces load_elastic_linkages/main.py:42-97:
per-key arrays of linkage structs with last-write-wins per linkage_id
(the reference's dict-overwrite ⇒ dropDuplicates keeping one row per
(key, linkage_id)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_spark.functions.text import process_name


def contribution_documents(elastic: DataFrame) -> DataFrame:
    """(sub_id key, row struct, processed struct) per classified row."""
    cls = F.col("classification")
    is_person = cls.isin("individual", "organization")

    donor = F.struct(
        F.col("donor_entity_tp").alias("entity_tp"),
        F.col("donor_name").alias("name"),
        F.col("donor_state").alias("state"),
        F.col("donor_zip_code").alias("zip_code"),
        F.col("donor_employer").alias("employer"),
        F.col("donor_occupation").alias("occupation"),
    )
    candidate = F.struct(
        F.col("source").alias("cand_id"),
        F.col("source_cand_name").alias("cand_name"),
        F.col("source_cand_pty_affiliation").alias("cand_pty_affiliation"),
        F.col("source_cand_election_yr").alias("cand_election_yr"),
        F.col("source_cand_office_st").alias("cand_office_st"),
        F.col("source_cand_office").alias("cand_office"),
        F.col("source_cand_office_district").alias("cand_office_district"),
        F.col("source_cand_ici").alias("cand_ici"),
        F.col("source_cand_pcc").alias("cand_pcc"),
        F.col("source_cand_zip").alias("cand_zip"),
    )
    src_committee = F.struct(
        F.col("source").alias("cmte_id"),
        *[F.col(f"source_{n}").alias(n) for n in [
            "cmte_nm", "cmte_zip", "cmte_dsgn", "cmte_tp",
            "cmte_pty_affiliation", "cmte_filing_freq", "org_tp",
            "connected_org_nm",
        ]],
    )
    target_committee = F.struct(
        F.col("target").alias("cmte_id"),
        *[F.col(f"target_{n}").alias(n) for n in [
            "cmte_nm", "cmte_zip", "cmte_dsgn", "cmte_tp",
            "cmte_pty_affiliation", "cmte_filing_freq", "org_tp",
            "connected_org_nm",
        ]],
    )
    row = F.struct(
        F.struct(
            cls.alias("classification"),
            F.when(is_person, donor).alias("donor"),
            F.when(cls == "candidate", candidate).alias("candidate"),
            F.when(cls == "committee", src_committee).alias("committee"),
        ).alias("source"),
        F.struct(target_committee.alias("committee")).alias("target"),
        F.col("transaction_dt"),
        F.col("transaction_amt"),
        F.col("amndt_ind"),
        F.col("rpt_tp"),
        F.col("transaction_pgi"),
        F.col("transaction_tp"),
        F.col("image_num"),
        F.col("file_num"),
        F.col("tran_id"),
        F.col("sub_id").cast("string").alias("sub_id"),
    )
    norm_donor = F.when(is_person, process_name(F.col("donor_name")))
    norm_cand = F.when(cls == "candidate", process_name(F.col("source_cand_name")))
    processed = F.struct(
        F.col("transaction_dt").alias("date"),
        F.struct(
            F.when(norm_donor.isNotNull(), F.struct(norm_donor.alias("name"))).alias("donor"),
            F.when(norm_cand.isNotNull(), F.struct(norm_cand.alias("cand_name"))).alias(
                "candidate"
            ),
        ).alias("source"),
    )
    return elastic.select(
        F.col("sub_id").alias("_id"), row.alias("row"), processed.alias("processed")
    )


_SPENDER_COLS = [
    "cmte_nm", "cmte_zip", "cmte_dsgn", "cmte_tp", "cmte_pty_affiliation",
    "cmte_filing_freq", "org_tp", "connected_org_nm",
]
_CONTENT_COLS = [
    "sup_opp", "cand_id", "cand_name", "cand_pty_affiliation",
    "cand_election_yr", "cand_office_st", "cand_office",
    "cand_office_district", "cand_ici", "cand_pcc", "cand_zip",
]


def expenditure_documents(master: DataFrame) -> DataFrame:
    """Expenditure envelope per master row
    (load_elastic_expenditures/main.py:88-166): spender committee
    sub-struct, payee sub-struct, flat transaction fields, and a
    ``content`` candidate sub-struct present ONLY when the row carries
    any of sup_opp/cand_id/cand_name (the independent arm); processed
    names via process_name. One struct projection — no pandas loop."""
    has_content = (
        F.col("sup_opp").isNotNull()
        | F.col("cand_id").isNotNull()
        | F.col("cand_name").isNotNull()
    )
    spender = F.struct(
        F.col("cmte_id"), *[F.col(c) for c in _SPENDER_COLS]
    )
    payee = F.struct(
        F.col("payee").alias("name"),
        F.col("entity_tp"),
        F.col("state"),
        F.col("zip_code"),
    )
    content = F.struct(*[F.col(c) for c in _CONTENT_COLS])
    row = F.struct(
        F.col("type"),
        spender.alias("spender"),
        payee.alias("payee"),
        F.col("transaction_dt"),
        F.col("transaction_amt"),
        F.col("purpose"),
        F.col("category"),
        F.col("category_desc"),
        F.when(has_content, content).alias("content"),
        F.col("transaction_pgi"),
        F.col("amndt_ind"),
        F.col("image_num"),
        F.col("file_num"),
        F.col("tran_id"),
        F.col("line_num"),
        F.col("rpt_yr"),
        F.col("rpt_tp"),
        F.col("form_tp_cd"),
        F.col("sched_tp_cd"),
        F.col("rec_dt"),
        F.col("prev_file_num"),
        F.col("back_ref_tran_id"),
        F.col("sub_id").cast("string").alias("sub_id"),
    )
    norm_cand = F.when(has_content, process_name(F.col("cand_name")))
    processed = F.struct(
        F.struct(process_name(F.col("payee")).alias("name")).alias("payee"),
        F.when(
            norm_cand.isNotNull(), F.struct(norm_cand.alias("cand_name"))
        ).alias("content"),
    )
    return master.select(
        F.col("id").alias("_id"), row.alias("row"), processed.alias("processed")
    )


_CN_COLS = [
    "cand_id", "cand_name", "cand_pty_affiliation", "cand_election_yr",
    "cand_office_st", "cand_office", "cand_office_district", "cand_ici",
    "cand_status", "cand_pcc", "cand_st1", "cand_st2", "cand_city", "cand_st",
    "cand_zip",
]


def candidate_documents(cn: DataFrame) -> DataFrame:
    """Candidate envelope (load_elastic_candidates/main.py:35-96): the
    full cn row plus processed.cand_name."""
    row = F.struct(*[F.col(c) for c in _CN_COLS])
    processed = F.struct(process_name(F.col("cand_name")).alias("cand_name"))
    return cn.select(
        F.col("cand_id").alias("_id"), row.alias("row"), processed.alias("processed")
    )


_CM_COLS = [
    "cmte_id", "cmte_nm", "tres_nm", "cmte_st1", "cmte_st2", "cmte_city",
    "cmte_st", "cmte_zip", "cmte_dsgn", "cmte_tp", "cmte_pty_affiliation",
    "cmte_filing_freq", "org_tp", "connected_org_nm", "cand_id",
]


def committee_documents(cm: DataFrame) -> DataFrame:
    """Committee envelope (load_elastic_committees/main.py:34-90): the
    full cm row; no processed section in the reference."""
    row = F.struct(*[F.col(c) for c in _CM_COLS])
    return cm.select(F.col("cmte_id").alias("_id"), row.alias("row"))


def linkage_documents(ccl: DataFrame) -> DataFrame:
    """Two document sets from candidate-committee linkages, union-tagged:
    ('candidate', cand_id, committees[]) and ('committee', cmte_id,
    candidates[]). Last linkage_id row wins before grouping; arrays are
    sorted by linkage_id for determinism."""
    deduped_c = ccl.dropDuplicates(["cand_id", "linkage_id"])
    cand_docs = (
        deduped_c.groupBy(F.col("cand_id").alias("_id"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("linkage_id"), F.col("cmte_id"), F.col("cand_election_yr")
                    )
                )
            ).alias("linked")
        )
        .select(F.lit("candidate").alias("kind"), "_id", "linked")
    )
    deduped_m = ccl.dropDuplicates(["cmte_id", "linkage_id"])
    cmte_docs = (
        deduped_m.groupBy(F.col("cmte_id").alias("_id"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("linkage_id"), F.col("cand_id"), F.col("cand_election_yr")
                    )
                )
            ).alias("linked")
        )
        .select(F.lit("committee").alias("kind"), "_id", "linked")
    )
    return cand_docs.unionByName(cmte_docs, allowMissingColumns=True)
