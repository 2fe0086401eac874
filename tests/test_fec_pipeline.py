"""FEC pipeline parity tests: Spark master/view layer vs a DuckDB oracle
running a faithful translation of the reference's BigQuery SQL
(create_master_tables/main.py:49-137; contributions.sql:3-129) over the
same fixture parquet. BigQuery-isms translated: SUBSTR 0-based→1-based,
CONCAT-null-propagation via ||, PARSE_DATE→try_strptime."""

from __future__ import annotations

import duckdb
import pytest

from data_spark.fec.docs import (
    candidate_documents,
    committee_documents,
    contribution_documents,
    expenditure_documents,
    linkage_documents,
)
from data_spark.fec.master import (
    build_contributions_master,
    build_expenditures_master,
    build_pas_master,
)
from data_spark.fec.views import (
    contributions_elastic,
    contributions_from_candidates,
    contributions_from_committees,
    contributions_from_ind_donors,
    pas_elastic,
)
from tests.fec_fixtures import write_fixtures
from tools.check_correctness import frame_key


@pytest.fixture(scope="module")
def fec(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fec")
    paths = write_fixtures(str(d))
    tables = {name: spark.read.parquet(p) for name, p in paths.items()}
    con = duckdb.connect()
    for name, p in paths.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    return tables, con


def _assert_match(sdf, con, sql):
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    sc, sk = frame_key(scols, srows)
    dc, dk = frame_key(dcols, drows)
    assert sc == dc, f"columns: {sc} != {dc}"
    assert len(sk) == len(dk), f"rows: {len(sk)} != {len(dk)}"
    mismatches = [(a, b) for a, b in zip(sk, dk) if a != b]
    assert not mismatches, f"first mismatch:\n {mismatches[0][0]}\n {mismatches[0][1]}"


CONTRIB_MASTER_SQL = """
SELECT DISTINCT cmte_id, other_id, amndt_ind, rpt_tp, transaction_pgi,
       transaction_tp, entity_tp, name, state,
       substr(zip_code, 1, 5) AS zip_code, employer, occupation,
       substr(transaction_dt, 5, 4) || '-' || substr(transaction_dt, 1, 2)
         || '-' || substr(transaction_dt, 3, 2) AS transaction_dt,
       transaction_amt, memo_text, image_num, file_num, tran_id, sub_id
FROM (
  SELECT * FROM oth WHERE memo_cd IS NULL
  UNION ALL
  SELECT * FROM indiv WHERE memo_cd IS NULL
)
"""


def test_contributions_master_matches_reference_sql(fec):
    tables, con = fec
    master = build_contributions_master(tables["oth"], tables["indiv"])
    _assert_match(master, con, CONTRIB_MASTER_SQL)
    # date repair spot check: MMDDYYYY reordered, NULL propagates
    got = {r["sub_id"]: r["transaction_dt"] for r in master.collect()}
    assert got[10006] == "2020-11-07"  # MMDDYYYY reordered to ISO
    assert got[10002] is None  # NULL date propagates
    assert got[10010] == "202-11-07"  # malformed 7-char input preserved as-is


EXP_MASTER_SQL = """
SELECT CAST(a.sub_id AS VARCHAR) AS id, 'operating' AS type, a.cmte_id, b.cmte_nm,
       b.cmte_zip, b.cmte_dsgn, b.cmte_tp, b.cmte_pty_affiliation,
       b.cmte_filing_freq, b.org_tp, b.connected_org_nm,
       CAST(CAST(try_strptime(a.transaction_dt, '%m/%d/%Y') AS DATE) AS VARCHAR) AS transaction_dt,
       a.transaction_amt, a.purpose, NULL AS sup_opp, NULL AS cand_id,
       NULL AS cand_name, NULL AS cand_pty_affiliation,
       CAST(NULL AS BIGINT) AS cand_election_yr, NULL AS cand_office_st,
       NULL AS cand_office, NULL AS cand_office_district, NULL AS cand_ici,
       NULL AS cand_pcc, NULL AS cand_zip, a.category, a.category_desc,
       a.name AS payee, a.entity_tp, a.state, substr(a.zip_code, 1, 5) AS zip_code,
       a.transaction_pgi, a.amndt_ind, a.image_num, a.file_num, a.tran_id,
       a.line_num, a.rpt_yr, a.rpt_tp, a.form_tp_cd, a.sched_tp_cd,
       NULL AS rec_dt, CAST(NULL AS BIGINT) AS prev_file_num,
       a.back_ref_tran_id, a.sub_id
FROM oppexp a LEFT JOIN cm b ON a.cmte_id = b.cmte_id
WHERE a.memo_cd IS NULL
UNION ALL
SELECT CAST(a.file_num AS VARCHAR) || '-' || a.tra_id, 'independent', a.spe_id,
       COALESCE(b.cmte_nm, a.spe_nam), b.cmte_zip, b.cmte_dsgn, b.cmte_tp,
       b.cmte_pty_affiliation, b.cmte_filing_freq, b.org_tp, b.connected_org_nm,
       CAST(CAST(try_strptime(CASE WHEN a.exp_dat = '' THEN NULL ELSE a.exp_dat END,
            '%d-%b-%y') AS DATE) AS VARCHAR),
       a.exp_amo, a.pur, a.sup_opp, a.can_id,
       COALESCE(c.cand_name, a.can_nam),
       substr(COALESCE(c.cand_pty_affiliation, a.can_par_aff), 1, 3),
       COALESCE(c.cand_election_yr, a.fec_election_yr),
       COALESCE(c.cand_office_st, a.can_off_sta),
       COALESCE(c.cand_office, a.can_off),
       COALESCE(c.cand_office_district, a.can_off_dis),
       c.cand_ici, c.cand_pcc, c.cand_zip, NULL, NULL, a.pay, NULL, NULL, NULL,
       a.ele_typ || CAST(a.fec_election_yr AS VARCHAR), a.amn_ind, a.ima_num,
       a.file_num, a.tra_id, NULL, NULL, NULL, NULL, NULL,
       CAST(CAST(try_strptime(CASE WHEN a.rec_dt = '' THEN NULL ELSE a.rec_dt END,
            '%d-%b-%y') AS DATE) AS VARCHAR),
       a.prev_file_num, NULL, NULL
FROM independent_expenditure a
LEFT JOIN cm b ON a.spe_id = b.cmte_id
LEFT JOIN cn c ON a.can_id = c.cand_id
"""


def test_expenditures_master_matches_reference_sql(fec):
    tables, con = fec
    exp = build_expenditures_master(
        tables["oppexp"], tables["independent_expenditure"], tables["cm"], tables["cn"]
    )
    _assert_match(exp, con, EXP_MASTER_SQL)


_DISB = (
    "((substr(transaction_tp,1,1) = '2' OR substr(transaction_tp,1,1) = '4')"
    " AND transaction_tp != '24I' AND transaction_tp != '24T')"
)
_EDGE = (
    "transaction_dt, transaction_amt, amndt_ind, rpt_tp, transaction_pgi,"
    " transaction_tp, image_num, file_num, tran_id, sub_id"
)


def test_view_candidates_matches_reference_sql(fec, spark):
    tables, con = fec
    master = build_contributions_master(tables["oth"], tables["indiv"])
    sdf = contributions_from_candidates(master)
    _assert_match(
        sdf,
        con,
        f"""
        WITH master AS ({CONTRIB_MASTER_SQL})
        SELECT other_id AS source, cmte_id AS target, {_EDGE}
        FROM master
        WHERE entity_tp = 'CAN' AND other_id NOT LIKE 'C%' AND NOT {_DISB}
          AND other_id IS NOT NULL AND cmte_id IS NOT NULL
        """,
    )


def test_view_ind_donors_matches_reference_sql(fec):
    tables, con = fec
    master = build_contributions_master(tables["oth"], tables["indiv"])
    _assert_match(
        contributions_from_ind_donors(master),
        con,
        f"""
        WITH master AS ({CONTRIB_MASTER_SQL})
        SELECT entity_tp, name, state, COALESCE(zip_code,'') AS zip_code,
               employer, occupation, cmte_id AS target, {_EDGE}
        FROM master
        WHERE entity_tp = 'IND' AND NOT {_DISB}
          AND name IS NOT NULL AND cmte_id IS NOT NULL
        """,
    )


def test_view_committees_union_matches_reference_sql(fec):
    tables, con = fec
    master = build_contributions_master(tables["oth"], tables["indiv"])
    _assert_match(
        contributions_from_committees(master),
        con,
        f"""
        WITH master AS ({CONTRIB_MASTER_SQL})
        SELECT other_id AS source, cmte_id AS target, {_EDGE} FROM master
        WHERE entity_tp IN ('CCM','COM','PAC','PTY') AND NOT {_DISB}
          AND other_id IS NOT NULL AND cmte_id IS NOT NULL
        UNION ALL
        SELECT cmte_id, other_id, {_EDGE} FROM master
        WHERE entity_tp IN ('CCM','COM','PAC','PTY') AND {_DISB}
          AND cmte_id IS NOT NULL AND other_id IS NOT NULL
        UNION ALL
        SELECT cmte_id, other_id, {_EDGE} FROM master
        WHERE entity_tp = 'CAN' AND other_id LIKE 'C%' AND {_DISB}
          AND cmte_id IS NOT NULL AND other_id IS NOT NULL
        UNION ALL
        SELECT other_id, cmte_id, {_EDGE} FROM master
        WHERE entity_tp = 'ORG' AND other_id LIKE 'C%' AND NOT {_DISB}
          AND other_id IS NOT NULL AND cmte_id IS NOT NULL
        UNION ALL
        SELECT cmte_id, other_id, {_EDGE} FROM master
        WHERE entity_tp = 'ORG' AND other_id LIKE 'C%' AND {_DISB}
          AND cmte_id IS NOT NULL AND other_id IS NOT NULL
        """,
    )


def test_elastic_union_shape_and_classification(fec):
    tables, con = fec
    master = build_contributions_master(tables["oth"], tables["indiv"])
    elastic = contributions_elastic(master, tables["cn"], tables["cm"])
    rows = elastic.collect()
    assert len(rows) > 0
    classes = {r["classification"] for r in rows}
    assert classes <= {"candidate", "individual", "organization", "committee"}
    assert "individual" in classes and "committee" in classes
    # dim enrichment: committee arm carries source committee name when the
    # dim row exists
    com = [r for r in rows if r["classification"] == "committee" and r["source"].startswith("C")]
    assert any(r["source_cmte_nm"] is not None for r in com)
    # every arm has the same 44-column schema (1 classification + 6 donor
    # + 1 source + 9 cand dims + 8 cmte dims + 1 target + 8 target dims
    # + 10 edge columns)
    assert len(elastic.columns) == 44


def test_contribution_documents_variants(fec):
    tables, _ = fec
    master = build_contributions_master(tables["oth"], tables["indiv"])
    elastic = contributions_elastic(master, tables["cn"], tables["cm"])
    docs = contribution_documents(elastic)
    rows = docs.collect()
    assert len(rows) == elastic.count()
    for r in rows:
        cls = r["row"]["source"]["classification"]
        if cls in ("individual", "organization"):
            assert r["row"]["source"]["donor"] is not None
            assert r["row"]["source"]["candidate"] is None
        elif cls == "candidate":
            assert r["row"]["source"]["candidate"] is not None
        elif cls == "committee":
            assert r["row"]["source"]["committee"] is not None
    # process_name applied in processed.source
    named = [
        r for r in rows
        if r["row"]["source"]["classification"] == "individual"
        and r["row"]["source"]["donor"]["name"] == "DOE, JANE PHD"
    ]
    assert named
    assert named[0]["processed"]["source"]["donor"]["name"] == "JANE DOE"


PAS_MASTER_SQL = """
SELECT DISTINCT cmte_id, other_id, cand_id, amndt_ind, rpt_tp, transaction_pgi,
       transaction_tp, entity_tp, name, state,
       substr(zip_code, 1, 5) AS zip_code, employer, occupation,
       substr(transaction_dt, 5, 4) || '-' || substr(transaction_dt, 1, 2)
         || '-' || substr(transaction_dt, 3, 2) AS transaction_dt,
       transaction_amt, memo_text, image_num, file_num, tran_id, sub_id
FROM pas WHERE memo_cd IS NULL
"""


def test_pas_master_matches_reference_sql(fec):
    tables, con = fec
    master = build_pas_master(tables["pas"])
    _assert_match(master, con, PAS_MASTER_SQL)


def test_pas_elastic_matches_oracle_sql(fec):
    tables, con = fec
    view = pas_elastic(build_pas_master(tables["pas"]), tables["cn"], tables["cm"])
    _assert_match(
        view,
        con,
        f"""
        WITH m AS ({PAS_MASTER_SQL})
        SELECT 'committee_candidate' AS classification,
               m.cmte_id AS source,
               s.cmte_nm AS source_cmte_nm, s.cmte_zip AS source_cmte_zip,
               s.cmte_dsgn AS source_cmte_dsgn, s.cmte_tp AS source_cmte_tp,
               s.cmte_pty_affiliation AS source_cmte_pty_affiliation,
               s.cmte_filing_freq AS source_cmte_filing_freq,
               s.org_tp AS source_org_tp,
               s.connected_org_nm AS source_connected_org_nm,
               m.cand_id AS target,
               t.cand_name AS target_cand_name,
               t.cand_pty_affiliation AS target_cand_pty_affiliation,
               t.cand_election_yr AS target_cand_election_yr,
               t.cand_office_st AS target_cand_office_st,
               t.cand_office AS target_cand_office,
               t.cand_office_district AS target_cand_office_district,
               t.cand_ici AS target_cand_ici, t.cand_pcc AS target_cand_pcc,
               t.cand_zip AS target_cand_zip,
               m.entity_tp AS donor_entity_tp, m.name AS donor_name,
               m.state AS donor_state,
               m.transaction_dt, m.transaction_amt, m.amndt_ind, m.rpt_tp,
               m.transaction_pgi, m.transaction_tp, m.image_num, m.file_num,
               m.tran_id, m.sub_id
        FROM m
        LEFT JOIN cm s ON m.cmte_id = s.cmte_id
        LEFT JOIN cn t ON m.cand_id = t.cand_id
        WHERE m.cmte_id IS NOT NULL AND m.cand_id IS NOT NULL
        """,
    )


def test_expenditure_documents_envelope(fec):
    tables, con = fec
    master = build_expenditures_master(
        tables["oppexp"], tables["independent_expenditure"], tables["cm"], tables["cn"]
    )
    docs = expenditure_documents(master)
    rows = {r["_id"]: r for r in docs.collect()}
    assert len(rows) == master.count()

    # content presence matches the reference's OR-condition exactly
    # (load_elastic_expenditures/main.py:129-142), cross-checked in SQL
    con.execute("CREATE OR REPLACE VIEW exp_m AS " + EXP_MASTER_SQL)
    with_content = {
        r[0]
        for r in con.execute(
            "SELECT id FROM exp_m WHERE sup_opp IS NOT NULL OR cand_id IS NOT NULL"
            " OR cand_name IS NOT NULL"
        ).fetchall()
    }
    got_content = {k for k, r in rows.items() if r["row"]["content"] is not None}
    assert got_content == with_content
    assert with_content and with_content != set(rows)  # both branches exercised

    for mr in master.collect():
        doc = rows[mr["id"]]["row"]
        assert doc["type"] == mr["type"]
        assert doc["spender"]["cmte_id"] == mr["cmte_id"]
        assert doc["spender"]["cmte_nm"] == mr["cmte_nm"]
        assert doc["payee"]["name"] == mr["payee"]
        assert doc["sub_id"] == (str(mr["sub_id"]) if mr["sub_id"] is not None else None)
        if doc["content"] is not None:
            assert doc["content"]["cand_id"] == mr["cand_id"]
            assert doc["content"]["sup_opp"] == mr["sup_opp"]
    # processed payee name is process_name'd
    any_payee = next(r for r in rows.values() if r["row"]["payee"]["name"])
    assert any_payee["processed"]["payee"]["name"] is not None


def test_candidate_and_committee_documents(fec):
    tables, _ = fec
    cn, cm = tables["cn"], tables["cm"]
    cand = {r["_id"]: r for r in candidate_documents(cn).collect()}
    assert set(cand) == {r["cand_id"] for r in cn.collect()}
    for src in cn.collect():
        doc = cand[src["cand_id"]]
        for c in ["cand_name", "cand_pty_affiliation", "cand_election_yr",
                  "cand_status", "cand_zip"]:
            assert doc["row"][c] == src[c], c
    # process_name: "SMITH, JOHN MR" → comma-reordered, suffix stripped
    assert cand["H001"]["processed"]["cand_name"] == "JOHN SMITH"

    com = {r["_id"]: r for r in committee_documents(cm).collect()}
    assert set(com) == {r["cmte_id"] for r in cm.collect()}
    for src in cm.collect():
        doc = com[src["cmte_id"]]
        for c in ["cmte_nm", "tres_nm", "cmte_tp", "cand_id"]:
            assert doc["row"][c] == src[c], c
    assert "processed" not in com["C001"].asDict()  # reference has none


def test_linkage_documents_last_write_wins(fec):
    tables, _ = fec
    docs = linkage_documents(tables["ccl"])
    by_key = {(r["kind"], r["_id"]): r["linked"] for r in docs.collect()}
    # duplicate linkage_id 1003 collapses to one entry
    h002 = by_key[("candidate", "H002")]
    assert [l["linkage_id"] for l in h002] == [1003]
    # candidate with two committees keeps both, sorted
    h001 = by_key[("candidate", "H001")]
    assert [l["linkage_id"] for l in h001] == [1001, 1002]
    # committee-side grouping
    c005 = by_key[("committee", "C005")]
    assert [l["linkage_id"] for l in c005] == [1005, 1006]
