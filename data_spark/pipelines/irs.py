"""IRS 990 pipeline (federal_irs_ingest_get_990s/main.py:50-136).

The CSV index drives the work: skip pre-2014 object ids, parse the
two-format Eastern submission timestamp, route each filing to its index
by schedule presence (990EZ / 990PF / 990), and coerce schedule leaf
values by key pattern (sources.xmlutil.coerce_by_key_pattern — the
Spark-side schema'd equivalent is explicit casts).

``prepare_index`` is the distributed part (index rows → typed work
list + routing); the per-filing XML fetch stays connector-side
(sources.pagination disciplines), feeding docs back as rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_spark.functions.dates import parse_date_multi

INDEX_COLUMNS = [
    "return_id", "filing_type", "ein", "tax_period", "sub_date",
    "taxpayer_name", "return_type", "dln", "object_id",
]


def prepare_index(index_rows: DataFrame) -> DataFrame:
    """Typed, filtered work list from the 990 index CSV rows.

    - drops object_ids with year prefix < 2014 (unprocessable upstream);
    - parses sub_date with the %m/%d/%Y %I:%M:%S %p → %m/%d/%Y fallback
      and localizes US-Eastern → ISO with offset semantics (emitted as
      UTC instant string).
    """
    ts = parse_date_multi(F.col("sub_date"), ["M/d/yyyy h:mm:ss a", "M/d/yyyy"])
    utc = F.to_utc_timestamp(ts, "America/New_York")
    return (
        index_rows.filter(F.substring("object_id", 1, 4).cast("int") >= 2014)
        .select(
            *[c for c in INDEX_COLUMNS if c != "sub_date"],
            F.date_format(utc, "yyyy-MM-dd'T'HH:mm:ssZ").alias("sub_date"),
        )
    )


def route_filings(docs: DataFrame, obj_col: str = "obj") -> DataFrame:
    """Index routing by schedule presence: IRS990EZ → '990ez',
    IRS990PF → '990pf', else '990' (main.py:101-107). ``obj`` is the
    schedule map (map<string,string-json> or struct)."""
    keys = F.map_keys(F.col(obj_col))
    return docs.withColumn(
        "index",
        F.when(F.array_contains(keys, "IRS990EZ"), "990ez")
        .when(F.array_contains(keys, "IRS990PF"), "990pf")
        .otherwise("990"),
    )
