"""Date/time functions (SURVEY §2.8 "Date/time").

The reference parses dates with per-row Python fallback chains (10+
strptime formats, federal_house_lobbying_ingest_get_disclosures/
main.py:238-309), rebuilds MMDDYYYY strings with SUBSTR/CONCAT
(create_master_tables/main.py:51), localizes naive strings to
US/Eastern then converts to UTC (load_elastic_contributions/main.py:
50-57), and expands delivery day ranges row-per-day
(facebook_compute_load_graph/main.py:138-147). All of that is native
Spark below — ``coalesce(try_to_timestamp…)`` replaces the try/except
chain, ``explode(sequence(...))`` replaces the Python day loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java datetime patterns equivalent to the reference's strptime chain
# (house…disclosures/main.py:239-309).
FALLBACK_FORMATS = [
    "M/d/yyyy h:mm:ss a",
    "M/d/yyyy H:mm",
    "M/d/yyyy",
    "M/d/yy",
    "M-d-yyyy",
    "M-d-yy",
    "yyyy-M-d",
    "MMddyyyy",
    "MMddyy",
    "d-MMM-yy",
    "MMM d, yyyy",
]


def parse_date_multi(col: Column, formats: list[str] | None = None) -> Column:
    """Multi-format fallback timestamp parse: first format that parses
    wins; empty string and all-formats-fail → NULL."""
    formats = formats or FALLBACK_FORMATS
    guarded = F.when(F.trim(col) == "", F.lit(None)).otherwise(F.trim(col))
    return F.coalesce(*[F.try_to_timestamp(guarded, F.lit(fmt)) for fmt in formats])


def mmddyyyy_to_date(col: Column) -> Column:
    """FEC bulk ``transaction_dt`` repair: 'MMDDYYYY' string → DATE via
    substring reorder (the reference does CONCAT(SUBSTR(dt,5,4),'-',
    SUBSTR(dt,0,2),'-',SUBSTR(dt,3,2)), create_master_tables/main.py:51).
    Invalid or short strings → NULL."""
    iso = F.concat_ws(
        "-",
        F.substring(col, 5, 4),
        F.substring(col, 1, 2),
        F.substring(col, 3, 2),
    )
    return F.when(F.length(col) == 8, F.try_to_timestamp(iso, F.lit("yyyy-MM-dd")).cast("date"))


def to_utc_from_eastern(ts: Column) -> Column:
    """Interpret a naive timestamp as US Eastern wall-clock and convert
    to UTC (load_elastic_contributions/main.py:50-57)."""
    return F.to_utc_timestamp(ts, "America/New_York")


def day_range(start: Column, stop: Column) -> Column:
    """Array of consecutive days [start, stop] — explode it to get the
    reference's one-row-per-delivery-day expansion
    (facebook_compute_load_graph/main.py:138-147). NULL stop → [start]."""
    s = start.cast("date")
    e = F.coalesce(stop.cast("date"), s)
    return F.sequence(s, e, F.expr("interval 1 day"))


def election_cycle(year: Column) -> Column:
    """Two-year election cycle containing ``year``: ceil(year/2)*2
    (federal_fec_ingest_get_receipts/main.py:96)."""
    return (F.ceil(year.cast("double") / 2) * 2).cast("int")


def date_parts(ts: Column) -> list[Column]:
    """Decompose to the (year, month, day, hour, minute) component columns
    the graph layer keys Day nodes on (load_graph_contributions/main.py:31-38)."""
    return [
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.hour(ts).alias("hour"),
        F.minute(ts).alias("minute"),
    ]
