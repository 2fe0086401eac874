"""SQL catalog: expose the engine through ``spark.sql``.

The reference's BigQuery layer is views-on-views
(contributions.sql:3-129); Catalyst inlines temp views the same way
BigQuery defers them, so registering the cascade costs nothing until a
query selects from it — and then each arm's predicates push down into
the shared master scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_spark.io import TESTDATA_TABLES, read_table
from data_spark.fec import master as fec_master
from data_spark.fec import views as fec_views


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata parquet table as a temp view."""
    registered = []
    for name in TESTDATA_TABLES:
        try:
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)
            registered.append(name)
        except Exception:
            continue
    return registered


def register_fec_views(
    spark: SparkSession,
    oth: DataFrame,
    indiv: DataFrame,
    cn: DataFrame,
    cm: DataFrame,
) -> list[str]:
    """Register the FEC master + 9-view cascade as temp views, mirroring
    the reference's view names (sans dataset prefix/cycle suffix)."""
    cn.createOrReplaceTempView("cn")
    cm.createOrReplaceTempView("cm")
    master = fec_master.build_contributions_master(oth, indiv)
    master.createOrReplaceTempView("contributions")
    layer = {
        "contributions_from_candidates": fec_views.contributions_from_candidates(master),
        "contributions_from_ind_donors": fec_views.contributions_from_ind_donors(master),
        "contributions_from_org_donors": fec_views.contributions_from_org_donors(master),
        "contributions_com_receipts": fec_views.contributions_com_receipts(master),
        "contributions_com_disbursements": fec_views.contributions_com_disbursements(master),
        "contributions_can_disbursements": fec_views.contributions_can_disbursements(master),
        "contributions_org_receipts": fec_views.contributions_org_receipts(master),
        "contributions_org_disbursements": fec_views.contributions_org_disbursements(master),
        "contributions_from_committees": fec_views.contributions_from_committees(master),
        "contributions_elastic": fec_views.contributions_elastic(master, cn, cm),
    }
    for name, df in layer.items():
        df.createOrReplaceTempView(name)
    return ["cn", "cm", "contributions", *layer]


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Text-SQL entry point (thin, but the intended user surface for
    ad-hoc queries over the registered views)."""
    return spark.sql(query)
