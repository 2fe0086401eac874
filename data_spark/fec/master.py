"""Master-table builds (SURVEY §2 U1/U3/A1 + §2.8 date/zip repair).

Semantics follow federal_fec_ingest_create_master_tables/main.py:
  - contributions master (:49-63): memo_cd IS NULL filter inside each
    union arm, DISTINCT over the union, zip truncated to 5 chars,
    MMDDYYYY date string rebuilt to ISO via substring reorder.
  - expenditures master (:120-137): two reshaped arms — operating
    (oppexp ⋈ cm) and independent (independent_expenditure ⋈ cm ⋈ cn
    with IFNULL fallbacks) — unioned with NULL padding.

BigQuery quirks preserved: SUBSTR(x, 0, n) is 1-based with 0→1 (first n
chars); CONCAT of any NULL → NULL; PARSE_DATE('%d-%b-%y') with
empty-string→NULL guard. Dates stay STRING columns, as in the
reference.

Scale: the master build is scan → union → hash-distinct; the dim joins
(cm/cn) are broadcast. Distinct shuffles once on all columns — at
100 TB, partition the output by file_num/cycle on write
(io.validated_overwrite + partitionBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONTRIB_COLS = [
    "cmte_id", "other_id", "amndt_ind", "rpt_tp", "transaction_pgi",
    "transaction_tp", "entity_tp", "name", "state", "zip_code", "employer",
    "occupation", "transaction_dt", "transaction_amt", "memo_text", "image_num",
    "file_num", "tran_id", "sub_id",
]


def _rebuild_mmddyyyy(col):
    """'MMDDYYYY' → 'YYYY-MM-DD' pure string rebuild (no validation —
    the reference stores whatever the substring shuffle yields)."""
    return F.concat(
        F.substring(col, 5, 4), F.lit("-"), F.substring(col, 1, 2), F.lit("-"),
        F.substring(col, 3, 2),
    )


def _parse_dby(col):
    """BigQuery CAST(PARSE_DATE('%d-%b-%y', NULLIF(x,'')) AS STRING)."""
    guarded = F.when(col == "", F.lit(None)).otherwise(col)
    return F.date_format(F.try_to_timestamp(guarded, F.lit("d-MMM-yy")), "yyyy-MM-dd")


def build_contributions_master(oth: DataFrame, indiv: DataFrame) -> DataFrame:
    """contributions master = DISTINCT(oth ∪ indiv WHERE memo_cd IS NULL)
    with zip truncation and date rebuild."""
    def arm(df: DataFrame) -> DataFrame:
        return df.filter(F.col("memo_cd").isNull()).select(_CONTRIB_COLS)

    unioned = arm(oth).unionByName(arm(indiv))
    return unioned.select(
        *[c for c in _CONTRIB_COLS if c not in ("zip_code", "transaction_dt")],
        F.substring("zip_code", 1, 5).alias("zip_code"),
        _rebuild_mmddyyyy(F.col("transaction_dt")).alias("transaction_dt"),
    ).select(_CONTRIB_COLS).distinct()


_PAS_COLS = [
    "cmte_id", "other_id", "cand_id", "amndt_ind", "rpt_tp", "transaction_pgi",
    "transaction_tp", "entity_tp", "name", "state", "zip_code", "employer",
    "occupation", "transaction_dt", "transaction_amt", "memo_text", "image_num",
    "file_num", "tran_id", "sub_id",
]


def build_pas_master(pas: DataFrame) -> DataFrame:
    """pas master (committee→candidate contributions,
    import_bigquery/main.py:210-234 layout): same repair discipline as
    the contributions master — memo_cd IS NULL filter, DISTINCT, zip
    truncated to 5, MMDDYYYY date rebuilt — keeping the cand_id edge
    key the other transaction files lack."""
    return (
        pas.filter(F.col("memo_cd").isNull())
        .select(
            *[c for c in _PAS_COLS if c not in ("zip_code", "transaction_dt")],
            F.substring("zip_code", 1, 5).alias("zip_code"),
            _rebuild_mmddyyyy(F.col("transaction_dt")).alias("transaction_dt"),
        )
        .select(_PAS_COLS)
        .distinct()
    )


_EXP_COLS = [
    "id", "type", "cmte_id", "cmte_nm", "cmte_zip", "cmte_dsgn", "cmte_tp",
    "cmte_pty_affiliation", "cmte_filing_freq", "org_tp", "connected_org_nm",
    "transaction_dt", "transaction_amt", "purpose", "sup_opp", "cand_id",
    "cand_name", "cand_pty_affiliation", "cand_election_yr", "cand_office_st",
    "cand_office", "cand_office_district", "cand_ici", "cand_pcc", "cand_zip",
    "category", "category_desc", "payee", "entity_tp", "state", "zip_code",
    "transaction_pgi", "amndt_ind", "image_num", "file_num", "tran_id",
    "line_num", "rpt_yr", "rpt_tp", "form_tp_cd", "sched_tp_cd", "rec_dt",
    "prev_file_num", "back_ref_tran_id", "sub_id",
]


def _null(name: str, dtype: str = "string"):
    return F.lit(None).cast(dtype).alias(name)


def build_expenditures_master(
    oppexp: DataFrame, independent: DataFrame, cm: DataFrame, cn: DataFrame
) -> DataFrame:
    """expenditures master: operating + independent arms, dim-enriched."""
    cmb = F.broadcast(
        cm.select(
            "cmte_id", "cmte_nm", "cmte_zip", "cmte_dsgn", "cmte_tp",
            "cmte_pty_affiliation", "cmte_filing_freq", "org_tp", "connected_org_nm",
        )
    )
    operating = (
        oppexp.alias("a")
        .filter(F.col("memo_cd").isNull())
        .join(cmb.alias("b"), F.col("a.cmte_id") == F.col("b.cmte_id"), "left")
        .select(
            F.col("a.sub_id").cast("string").alias("id"),
            F.lit("operating").alias("type"),
            F.col("a.cmte_id").alias("cmte_id"),
            *[F.col(f"b.{c}").alias(c) for c in [
                "cmte_nm", "cmte_zip", "cmte_dsgn", "cmte_tp",
                "cmte_pty_affiliation", "cmte_filing_freq", "org_tp",
                "connected_org_nm",
            ]],
            F.date_format(
                F.try_to_timestamp(F.col("a.transaction_dt"), F.lit("M/d/yyyy")),
                "yyyy-MM-dd",
            ).alias("transaction_dt"),
            F.col("a.transaction_amt").alias("transaction_amt"),
            F.col("a.purpose").alias("purpose"),
            _null("sup_opp"), _null("cand_id"), _null("cand_name"),
            _null("cand_pty_affiliation"), _null("cand_election_yr", "bigint"),
            _null("cand_office_st"), _null("cand_office"),
            _null("cand_office_district"), _null("cand_ici"), _null("cand_pcc"),
            _null("cand_zip"),
            F.col("a.category").alias("category"),
            F.col("a.category_desc").alias("category_desc"),
            F.col("a.name").alias("payee"),
            F.col("a.entity_tp").alias("entity_tp"),
            F.col("a.state").alias("state"),
            F.substring(F.col("a.zip_code"), 1, 5).alias("zip_code"),
            F.col("a.transaction_pgi").alias("transaction_pgi"),
            F.col("a.amndt_ind").alias("amndt_ind"),
            F.col("a.image_num").alias("image_num"),
            F.col("a.file_num").alias("file_num"),
            F.col("a.tran_id").alias("tran_id"),
            F.col("a.line_num").alias("line_num"),
            F.col("a.rpt_yr").alias("rpt_yr"),
            F.col("a.rpt_tp").alias("rpt_tp"),
            F.col("a.form_tp_cd").alias("form_tp_cd"),
            F.col("a.sched_tp_cd").alias("sched_tp_cd"),
            _null("rec_dt"), _null("prev_file_num", "bigint"),
            F.col("a.back_ref_tran_id").alias("back_ref_tran_id"),
            F.col("a.sub_id").alias("sub_id"),
        )
    )
    cnb = F.broadcast(
        cn.select(
            "cand_id", "cand_name", "cand_pty_affiliation", "cand_election_yr",
            "cand_office_st", "cand_office", "cand_office_district", "cand_ici",
            "cand_pcc", "cand_zip",
        )
    )
    independent_arm = (
        independent.alias("a")
        .join(cmb.alias("b"), F.col("a.spe_id") == F.col("b.cmte_id"), "left")
        .join(cnb.alias("c"), F.col("a.can_id") == F.col("c.cand_id"), "left")
        .select(
            F.concat(F.col("a.file_num").cast("string"), F.lit("-"), F.col("a.tra_id")).alias("id"),
            F.lit("independent").alias("type"),
            F.col("a.spe_id").alias("cmte_id"),
            F.coalesce(F.col("b.cmte_nm"), F.col("a.spe_nam")).alias("cmte_nm"),
            F.col("b.cmte_zip").alias("cmte_zip"),
            F.col("b.cmte_dsgn").alias("cmte_dsgn"),
            F.col("b.cmte_tp").alias("cmte_tp"),
            F.col("b.cmte_pty_affiliation").alias("cmte_pty_affiliation"),
            F.col("b.cmte_filing_freq").alias("cmte_filing_freq"),
            F.col("b.org_tp").alias("org_tp"),
            F.col("b.connected_org_nm").alias("connected_org_nm"),
            _parse_dby(F.col("a.exp_dat")).alias("transaction_dt"),
            F.col("a.exp_amo").alias("transaction_amt"),
            F.col("a.pur").alias("purpose"),
            F.col("a.sup_opp").alias("sup_opp"),
            F.col("a.can_id").alias("cand_id"),
            F.coalesce(F.col("c.cand_name"), F.col("a.can_nam")).alias("cand_name"),
            F.substring(
                F.coalesce(F.col("c.cand_pty_affiliation"), F.col("a.can_par_aff")), 1, 3
            ).alias("cand_pty_affiliation"),
            F.coalesce(F.col("c.cand_election_yr"), F.col("a.fec_election_yr")).alias(
                "cand_election_yr"
            ),
            F.coalesce(F.col("c.cand_office_st"), F.col("a.can_off_sta")).alias("cand_office_st"),
            F.coalesce(F.col("c.cand_office"), F.col("a.can_off")).alias("cand_office"),
            F.coalesce(F.col("c.cand_office_district"), F.col("a.can_off_dis")).alias(
                "cand_office_district"
            ),
            F.col("c.cand_ici").alias("cand_ici"),
            F.col("c.cand_pcc").alias("cand_pcc"),
            F.col("c.cand_zip").alias("cand_zip"),
            _null("category"), _null("category_desc"),
            F.col("a.pay").alias("payee"),
            _null("entity_tp"), _null("state"), _null("zip_code"),
            F.concat(F.col("a.ele_typ"), F.col("a.fec_election_yr").cast("string")).alias(
                "transaction_pgi"
            ),
            F.col("a.amn_ind").alias("amndt_ind"),
            F.col("a.ima_num").alias("image_num"),
            F.col("a.file_num").alias("file_num"),
            F.col("a.tra_id").alias("tran_id"),
            _null("line_num"), _null("rpt_yr", "bigint"), _null("rpt_tp"),
            _null("form_tp_cd"), _null("sched_tp_cd"),
            _parse_dby(F.col("a.rec_dt")).alias("rec_dt"),
            F.col("a.prev_file_num").alias("prev_file_num"),
            _null("back_ref_tran_id"), _null("sub_id", "bigint"),
        )
    )
    return operating.select(_EXP_COLS).unionByName(independent_arm.select(_EXP_COLS))
