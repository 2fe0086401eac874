"""Explicit schemas for the FEC bulk files (SURVEY §1.2: STRING/FLOAT/
INTEGER only; dates arrive as strings and are repaired downstream).

Column lists follow the reference's declared BigQuery schemas
(federal_fec_ingest_import_bigquery/main.py:44-363) as catalogued in
FIXTURES.md. Spark mapping: STRING→StringType, FLOAT→DoubleType,
INTEGER→LongType.
"""

from __future__ import annotations

from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType


def _schema(*cols: tuple[str, str]) -> StructType:
    types = {"s": StringType(), "d": DoubleType(), "l": LongType()}
    return StructType([StructField(n, types[t], True) for n, t in cols])


CN = _schema(
    ("cand_id", "s"), ("cand_name", "s"), ("cand_pty_affiliation", "s"),
    ("cand_election_yr", "l"), ("cand_office_st", "s"), ("cand_office", "s"),
    ("cand_office_district", "s"), ("cand_ici", "s"), ("cand_status", "s"),
    ("cand_pcc", "s"), ("cand_st1", "s"), ("cand_st2", "s"), ("cand_city", "s"),
    ("cand_st", "s"), ("cand_zip", "s"),
)

CM = _schema(
    ("cmte_id", "s"), ("cmte_nm", "s"), ("tres_nm", "s"), ("cmte_st1", "s"),
    ("cmte_st2", "s"), ("cmte_city", "s"), ("cmte_st", "s"), ("cmte_zip", "s"),
    ("cmte_dsgn", "s"), ("cmte_tp", "s"), ("cmte_pty_affiliation", "s"),
    ("cmte_filing_freq", "s"), ("org_tp", "s"), ("connected_org_nm", "s"),
    ("cand_id", "s"),
)

CCL = _schema(
    ("cand_id", "s"), ("cand_election_yr", "l"), ("fec_election_yr", "l"),
    ("cmte_id", "s"), ("cmte_tp", "s"), ("cmte_dsgn", "s"), ("linkage_id", "l"),
)

# indiv (individual contributions) and oth (committee-to-committee
# transactions) share the transaction layout.
_TXN_COLS = (
    ("cmte_id", "s"), ("amndt_ind", "s"), ("rpt_tp", "s"), ("transaction_pgi", "s"),
    ("image_num", "s"), ("transaction_tp", "s"), ("entity_tp", "s"), ("name", "s"),
    ("city", "s"), ("state", "s"), ("zip_code", "s"), ("employer", "s"),
    ("occupation", "s"), ("transaction_dt", "s"), ("transaction_amt", "d"),
    ("other_id", "s"), ("tran_id", "s"), ("file_num", "l"), ("memo_cd", "s"),
    ("memo_text", "s"), ("sub_id", "l"),
)
INDIV = _schema(*_TXN_COLS)
OTH = _schema(*_TXN_COLS)

# pas (committee→candidate contributions): the transaction layout with
# cand_id inserted between other_id and tran_id
# (import_bigquery/main.py:210-234).
PAS = _schema(
    *_TXN_COLS[:16], ("cand_id", "s"), *_TXN_COLS[16:],
)

OPPEXP = _schema(
    ("cmte_id", "s"), ("amndt_ind", "s"), ("rpt_yr", "l"), ("rpt_tp", "s"),
    ("image_num", "s"), ("line_num", "s"), ("form_tp_cd", "s"), ("sched_tp_cd", "s"),
    ("name", "s"), ("city", "s"), ("state", "s"), ("zip_code", "s"),
    ("transaction_dt", "s"), ("transaction_amt", "d"), ("transaction_pgi", "s"),
    ("purpose", "s"), ("category", "s"), ("category_desc", "s"), ("memo_cd", "s"),
    ("memo_text", "s"), ("entity_tp", "s"), ("sub_id", "l"), ("file_num", "l"),
    ("tran_id", "s"), ("back_ref_tran_id", "s"), ("empty", "s"),
)

INDEPENDENT_EXPENDITURE = _schema(
    ("can_id", "s"), ("can_nam", "s"), ("spe_id", "s"), ("spe_nam", "s"),
    ("ele_typ", "s"), ("can_off_sta", "s"), ("can_off_dis", "s"), ("can_off", "s"),
    ("can_par_aff", "s"), ("exp_amo", "d"), ("exp_dat", "s"), ("agg_amo", "d"),
    ("sup_opp", "s"), ("pur", "s"), ("pay", "s"), ("file_num", "l"),
    ("amn_ind", "s"), ("tra_id", "s"), ("ima_num", "s"), ("rec_dt", "s"),
    ("fec_election_yr", "l"), ("prev_file_num", "l"), ("dissem_dt", "s"),
)

_MONEY_WEB = [
    "ttl_receipts", "trans_from_auth", "ttl_disb", "trans_to_auth", "coh_bop",
    "coh_cop", "cand_contrib", "cand_loans", "other_loans", "cand_loan_repay",
    "other_loan_repay", "debts_owed_by", "ttl_indiv_contrib",
]

WEBALL = _schema(
    ("cand_id", "s"), ("cand_name", "s"), ("cand_ici", "s"), ("pty_cd", "s"),
    ("cand_pty_affiliation", "s"),
    *[(c, "d") for c in _MONEY_WEB],
    ("cand_office_st", "s"), ("cand_office_district", "s"), ("spec_election", "s"),
    ("prim_election", "s"), ("run_election", "s"), ("gen_election", "s"),
    ("gen_election_precent", "d"), ("other_pol_cmte_contrib", "d"),
    ("pol_pty_contrib", "d"), ("cvg_end_dt", "s"), ("indiv_refunds", "d"),
    ("cmte_refunds", "d"),
)
WEBL = WEBALL

WEBK = _schema(
    ("cmte_id", "s"), ("cmte_nm", "s"), ("cmte_tp", "s"), ("cmte_dsgn", "s"),
    ("cmte_filing_freq", "s"),
    *[
        (c, "d")
        for c in [
            "ttl_receipts", "trans_from_aff", "indv_contrib", "other_pol_cmte_contrib",
            "cand_contrib", "cand_loans", "ttl_loans_received", "ttl_disb",
            "tranf_to_aff", "indv_refunds", "other_pol_cmte_refunds",
            "cand_loan_repay", "loan_repay", "coh_bop", "coh_cop", "debts_owed_by",
            "nonfed_trans_received", "contrib_to_other_cmtes", "ind_exp",
            "pty_coord_exp",
        ]
    ],
    ("nonfed_share_exp", "d"),
    ("cvg_end_dt", "s"),
)

# ElectioneeringComm / CommunicationCosts CSVs
# (import_bigquery/main.py:314-363).
ELECTIONEERING_COMM = _schema(
    ("candidate_id", "s"), ("candidate_name", "s"), ("candidate_office", "s"),
    ("candidate_state", "s"), ("candidate_office_district", "s"),
    ("committee_id", "s"), ("committee_name", "s"), ("sb_image_num", "s"),
    ("payee_name", "s"), ("payee_street", "s"), ("payee_city", "s"),
    ("payee_state", "s"), ("disbursement_description", "s"),
    ("disbursement_date", "s"), ("communication_date", "s"),
    ("public_distribution_date", "s"), ("reported_disbursement_amount", "d"),
    ("number_of_candidates", "l"), ("calculated_candidate_share", "d"),
)

COMMUNICATION_COSTS = _schema(
    ("cmte_id", "s"), ("cmte_name", "s"), ("candidate_id", "s"),
    ("candidate_name", "s"), ("candidate_office", "s"),
    ("candidate_office_state", "s"), ("candidate_office_district", "s"),
    ("cand_pty_affiliation", "s"), ("transaction_dt", "s"),
    ("transaction_amt", "d"), ("transaction_tp", "s"),
    ("communication_tp", "s"), ("communication_class", "s"),
    ("support_oppose_ind", "s"), ("image_num", "s"), ("line_num", "l"),
    ("form_tp_cd", "s"), ("sched_tp_cd", "s"), ("tran_id", "s"),
    ("sub_id", "l"), ("file_num", "l"), ("rpt_yr", "l"),
    ("cand_state_description", "s"), ("cand_pty_affiliation_description", "s"),
    ("purpose", "s"),
)

#: file-prefix → schema, mirroring the per-prefix dispatch in the
#: reference's import step (all 13 prefixes,
#: import_bigquery/main.py:44-363).
BY_PREFIX = {
    "cn": CN,
    "cm": CM,
    "ccl": CCL,
    "indiv": INDIV,
    "oth": OTH,
    "pas": PAS,
    "oppexp": OPPEXP,
    "independent_expenditure": INDEPENDENT_EXPENDITURE,
    "weball": WEBALL,
    "webl": WEBL,
    "webk": WEBK,
    "ElectioneeringComm": ELECTIONEERING_COMM,
    "CommunicationCosts": COMMUNICATION_COSTS,
}
