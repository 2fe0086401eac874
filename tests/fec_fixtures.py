"""Deterministic FEC fixtures per FIXTURES.md §1 (seed 42): small
tables that exercise every edge case the master build and view layer
branch on (memo_cd, 9-digit zips, MMDDYYYY/%d-%b-%y/empty dates,
transaction-type classifier boundaries 24I/24T, dangling FKs,
duplicate rows across indiv/oth, amendment prev_file_num chains).
"""

from __future__ import annotations

import random

import pandas as pd

SEED = 42


def _candidates() -> pd.DataFrame:
    rows = [
        ("H001", "SMITH, JOHN MR", "DEM", 2022, "CA", "H", "01", "I", "C", "C001", "94105"),
        ("H002", "DOE, JANE PHD", "REP", 2022, "TX", "H", "02", "C", "C", "C002", "75001"),
        ("S001", "O'BRIEN, PAT JR", None, 2022, "NY", "S", "00", "O", "C", "C003", "10001"),
        ("S002", "WASHINGTON, GEORGE III", "IND", 2024, "VA", "S", "00", "I", "C", "C004", "22201"),
        ("P001", "ADAMS, SAMUEL DR", "DEM", 2024, "US", "P", "00", "C", "C", "C005", "02101"),
        ("H003", "KING, M L REV", "DEM", 2022, "GA", "H", "05", "I", "C", "C006", "30301"),
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "cand_id", "cand_name", "cand_pty_affiliation", "cand_election_yr",
            "cand_office_st", "cand_office", "cand_office_district", "cand_ici",
            "cand_status", "cand_pcc", "cand_zip",
        ],
    ).assign(cand_st1=None, cand_st2=None, cand_city=None, cand_st=None)


def _committees() -> pd.DataFrame:
    rows = []
    for i in range(1, 11):
        rows.append(
            (
                f"C{i:03d}", f"COMMITTEE {i}", f"TREASURER {i}", None, None,
                "CITY", "CA", f"9410{i % 10}", "B", "H" if i % 2 else "S",
                None if i == 3 else ("DEM" if i % 2 else "REP"),
                "Q", "C" if i % 4 else None,
                None if i % 3 == 0 else f"ORG {i}",
                f"H00{i}" if i <= 6 else None,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "cmte_id", "cmte_nm", "tres_nm", "cmte_st1", "cmte_st2", "cmte_city",
            "cmte_st", "cmte_zip", "cmte_dsgn", "cmte_tp", "cmte_pty_affiliation",
            "cmte_filing_freq", "org_tp", "connected_org_nm", "cand_id",
        ],
    )


def _linkages() -> pd.DataFrame:
    rows = [
        ("H001", 2022, 2022, "C001", "H", "P", 1001),
        ("H001", 2022, 2022, "C007", "H", "A", 1002),
        ("H002", 2022, 2022, "C002", "H", "P", 1003),
        ("H002", 2022, 2022, "C002", "H", "P", 1003),  # duplicate linkage_id
        ("S001", 2022, 2022, "C003", "S", "P", 1004),
        ("P001", 2024, 2024, "C005", "P", "P", 1005),
        ("P001", 2024, 2026, "C005", "P", "P", 1006),
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "cand_id", "cand_election_yr", "fec_election_yr", "cmte_id", "cmte_tp",
            "cmte_dsgn", "linkage_id",
        ],
    )


_TXN_COLUMNS = [
    "cmte_id", "amndt_ind", "rpt_tp", "transaction_pgi", "image_num",
    "transaction_tp", "entity_tp", "name", "city", "state", "zip_code",
    "employer", "occupation", "transaction_dt", "transaction_amt", "other_id",
    "tran_id", "file_num", "memo_cd", "memo_text", "sub_id",
]


def _transactions(kind: str, start_sub_id: int, n: int) -> pd.DataFrame:
    rng = random.Random(SEED if kind == "indiv" else SEED + 1)
    entity_pool = (
        ["IND"] * 6 + ["ORG"] * 2 + ["CAN", "CCM", "COM", "PAC", "PTY"]
        if kind == "oth"
        else ["IND"] * 8 + ["ORG", "CAN"]
    )
    tp_pool = ["15", "15E", "22Y", "24I", "24T", "24K", "20", "20Y", "41", "10"]
    names = [
        "SMITH, JOHN MR", "DOE, JANE PHD", "ACME, INC", "ACME, LLC",
        "DR JOHN DOE", "LEE, ANN MD", None, "PUBLIC, JOHN Q",
    ]
    zips = ["945301234", "94530", "00000", "", None, "123", "0"]
    dates = ["11072020", "01152021", None, "02292020", "1107202", "12312021"]
    rows = []
    for i in range(n):
        ent = entity_pool[i % len(entity_pool)]
        other = (
            None
            if i % 5 == 0
            else (f"C{(i % 9) + 1:03d}" if i % 2 == 0 else f"H{(i % 6) + 1:03d}")
        )
        rows.append(
            (
                f"C{(i % 10) + 1:03d}" if i % 7 else None,
                "N", "Q1", "P", f"IMG{i}",
                tp_pool[i % len(tp_pool)], ent,
                names[i % len(names)], "CITY", "CA",
                zips[i % len(zips)],
                "EMPLOYER" if ent == "IND" else None,
                "JOB" if ent == "IND" else None,
                dates[i % len(dates)],
                round(rng.uniform(5, 5000), 2),
                other, f"T{i}", 700000 + i, None if i % 4 else "X", None,
                start_sub_id + i,
            )
        )
    df = pd.DataFrame(rows, columns=_TXN_COLUMNS)
    return df


def _pas(start_sub_id: int, n: int) -> pd.DataFrame:
    """pas layout = transaction layout + cand_id between other_id and
    tran_id; exercises memo_cd filter, dangling cand FKs, dup rows."""
    base = _transactions("oth", start_sub_id, n)
    cand_ids = [
        f"H{(i % 6) + 1:03d}" if i % 5 else ("S001" if i % 2 else None)
        for i in range(n)
    ]
    base.insert(base.columns.get_loc("tran_id"), "cand_id", cand_ids)
    # exact duplicate pair for DISTINCT coverage
    return pd.concat([base, base.iloc[:2]], ignore_index=True)


def _weballs() -> pd.DataFrame:
    money = [
        "ttl_receipts", "trans_from_auth", "ttl_disb", "trans_to_auth", "coh_bop",
        "coh_cop", "cand_contrib", "cand_loans", "other_loans", "cand_loan_repay",
        "other_loan_repay", "debts_owed_by", "ttl_indiv_contrib",
    ]
    rows = []
    for i in range(8):
        rows.append(
            {
                "cand_id": f"H{(i % 6) + 1:03d}",
                "cand_name": f"CAND {i}",
                "cand_ici": "I" if i % 2 else "C",
                "pty_cd": "1",
                "cand_pty_affiliation": "DEM" if i % 2 else "REP",
                **{m: round(1000.0 * (i + 1) + j, 2) for j, m in enumerate(money)},
                "cand_office_st": "CA",
                "cand_office_district": "01",
                "spec_election": None,
                "prim_election": "W" if i % 3 else None,
                "run_election": None,
                "gen_election": "W" if i % 2 else "L",
                "gen_election_precent": round(40.0 + i, 2),
                "other_pol_cmte_contrib": round(10.0 + i, 2),
                "pol_pty_contrib": round(5.0 + i, 2),
                "cvg_end_dt": "12/31/2022",
                "indiv_refunds": round(1.0 + i, 2),
                "cmte_refunds": round(0.5 + i, 2),
            }
        )
    return pd.DataFrame(rows)


def _webk() -> pd.DataFrame:
    money = [
        "ttl_receipts", "trans_from_aff", "indv_contrib", "other_pol_cmte_contrib",
        "cand_contrib", "cand_loans", "ttl_loans_received", "ttl_disb",
        "tranf_to_aff", "indv_refunds", "other_pol_cmte_refunds",
        "cand_loan_repay", "loan_repay", "coh_bop", "coh_cop", "debts_owed_by",
        "nonfed_trans_received", "contrib_to_other_cmtes", "ind_exp",
        "pty_coord_exp",
    ]
    rows = []
    for i in range(6):
        rows.append(
            {
                "cmte_id": f"C{i + 1:03d}",
                "cmte_nm": f"COMMITTEE {i + 1}",
                "cmte_tp": "H" if i % 2 else "S",
                "cmte_dsgn": "B",
                "cmte_filing_freq": "Q",
                **{m: round(2000.0 * (i + 1) + j, 2) for j, m in enumerate(money)},
                "nonfed_share_exp": round(3.0 + i, 2),
                "cvg_end_dt": "12/31/2022",
            }
        )
    return pd.DataFrame(rows)


def _electioneering() -> pd.DataFrame:
    rows = []
    for i in range(7):
        rows.append(
            (
                f"H{(i % 6) + 1:03d}", f"CAND {i}", "H", "CA", "01",
                f"C{(i % 10) + 1:03d}", f"COMMITTEE {(i % 10) + 1}", f"SB{i}",
                f"PAYEE {i}", "1 MAIN ST", "CITY", "CA", "TV ADS",
                f"{(i % 12) + 1}/{(i % 27) + 1}/2022", f"{(i % 12) + 1}/{(i % 27) + 2}/2022",
                None if i % 3 == 0 else f"{(i % 12) + 1}/{(i % 27) + 3}/2022",
                round(10_000.0 + i, 2), (i % 3) + 1,
                round((10_000.0 + i) / ((i % 3) + 1), 2),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "candidate_id", "candidate_name", "candidate_office", "candidate_state",
            "candidate_office_district", "committee_id", "committee_name",
            "sb_image_num", "payee_name", "payee_street", "payee_city",
            "payee_state", "disbursement_description", "disbursement_date",
            "communication_date", "public_distribution_date",
            "reported_disbursement_amount", "number_of_candidates",
            "calculated_candidate_share",
        ],
    )


def _communication_costs() -> pd.DataFrame:
    rows = []
    for i in range(9):
        rows.append(
            (
                f"C{(i % 10) + 1:03d}", f"COMMITTEE {(i % 10) + 1}",
                f"H{(i % 6) + 1:03d}", f"CAND {i}", "H", "CA", "01",
                "DEM" if i % 2 else "REP", "11072022", round(500.0 + i, 2),
                "24F", "DM" if i % 2 else "TV", "C", "S" if i % 3 else "O",
                f"IMG{i}", (i % 4) + 1, "F7", "SF", f"T{i}", 40_000 + i,
                850_000 + i, 2022, "CALIFORNIA",
                "DEMOCRATIC PARTY" if i % 2 else "REPUBLICAN PARTY", "MAILER",
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "cmte_id", "cmte_name", "candidate_id", "candidate_name",
            "candidate_office", "candidate_office_state",
            "candidate_office_district", "cand_pty_affiliation", "transaction_dt",
            "transaction_amt", "transaction_tp", "communication_tp",
            "communication_class", "support_oppose_ind", "image_num", "line_num",
            "form_tp_cd", "sched_tp_cd", "tran_id", "sub_id", "file_num",
            "rpt_yr", "cand_state_description",
            "cand_pty_affiliation_description", "purpose",
        ],
    )


def fixtures() -> dict[str, pd.DataFrame]:
    indiv = _transactions("indiv", 10_000, 60)
    oth = _transactions("oth", 20_000, 60)
    # exact duplicate rows across indiv/oth (DISTINCT coverage): copy 5
    # rows from indiv into oth verbatim
    oth = pd.concat([oth, indiv.iloc[:5]], ignore_index=True)

    oppexp_rows = []
    for i in range(20):
        oppexp_rows.append(
            (
                f"C{(i % 10) + 1:03d}", "N", 2022, "Q1", f"IMG{i}", "21", "F3", "SB",
                f"VENDOR {i}", "CITY", "CA", "945301234" if i % 2 else "94105",
                f"{(i % 12) + 1}/{(i % 27) + 1}/2021", round(100.0 + i, 2), "P",
                "ADS", "004", "Advertising", None if i % 3 else "X", None, "ORG",
                30_000 + i, 800_000 + i, f"E{i}", None, None,
            )
        )
    oppexp = pd.DataFrame(
        oppexp_rows,
        columns=[
            "cmte_id", "amndt_ind", "rpt_yr", "rpt_tp", "image_num", "line_num",
            "form_tp_cd", "sched_tp_cd", "name", "city", "state", "zip_code",
            "transaction_dt", "transaction_amt", "transaction_pgi", "purpose",
            "category", "category_desc", "memo_cd", "memo_text", "entity_tp",
            "sub_id", "file_num", "tran_id", "back_ref_tran_id", "empty",
        ],
    )

    indep_rows = []
    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun"]
    for i in range(15):
        indep_rows.append(
            (
                f"H{(i % 6) + 1:03d}" if i % 4 else None,
                "LASTNAME, CAND", f"C{(i % 10) + 1:03d}", f"SPENDER {i}", "G",
                "CA", "01", "H", "DEMOCRATIC" if i % 2 else "REP",
                round(1000.0 + i, 2),
                "" if i % 5 == 0 else f"{(i % 27) + 1}-{months[i % 6]}-21",
                round(5000.0 + i, 2), "S" if i % 2 else "O", "ADS", f"PAYEE {i}",
                900_000 + i, "N",
                # amendments (i%5==4) keep the predecessor's tran_id: the
                # reference matches {file_num: prev_file_num, tran_id}
                f"TR{i - 3}" if i % 5 == 4 else f"TR{i}",
                f"IMG{i}",
                "" if i % 6 == 0 else f"{(i % 27) + 1}-{months[(i + 1) % 6]}-21",
                2022,
                900_000 + i - 3 if i % 5 == 4 else None,  # amendment chain
                None,
            )
        )
    independent = pd.DataFrame(
        indep_rows,
        columns=[
            "can_id", "can_nam", "spe_id", "spe_nam", "ele_typ", "can_off_sta",
            "can_off_dis", "can_off", "can_par_aff", "exp_amo", "exp_dat",
            "agg_amo", "sup_opp", "pur", "pay", "file_num", "amn_ind", "tra_id",
            "ima_num", "rec_dt", "fec_election_yr", "prev_file_num", "dissem_dt",
        ],
    )
    independent["prev_file_num"] = independent["prev_file_num"].astype("Int64")

    weball = _weballs()
    return {
        "cn": _candidates(),
        "cm": _committees(),
        "ccl": _linkages(),
        "indiv": indiv,
        "oth": oth,
        "pas": _pas(40_000, 30),
        "oppexp": oppexp,
        "independent_expenditure": independent,
        "weball": weball,
        "webl": weball.copy(),
        "webk": _webk(),
        "ElectioneeringComm": _electioneering(),
        "CommunicationCosts": _communication_costs(),
    }


def write_fixtures(dirpath: str) -> dict[str, str]:
    import os

    paths = {}
    for name, df in fixtures().items():
        p = os.path.join(dirpath, f"fec_{name}.parquet")
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
