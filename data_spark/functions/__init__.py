"""Scalar function library (SURVEY §2.8).

Policy: everything is a native Column expression (whole-stage-codegen
friendly, no Python in the hot path). The only pandas-UDF is simhash64
(bit-voting needs per-row loops; Arrow-batched).
"""

from data_spark.functions.text import (
    clean_zip,
    get_domain,
    parse_amount,
    process_name,
    slugify_key,
    strip_url,
)
from data_spark.functions.dates import (
    date_parts,
    day_range,
    mmddyyyy_to_date,
    parse_date_multi,
    to_utc_from_eastern,
)
from data_spark.functions.hashing import (
    minhash_signature,
    sha512_hex,
    simhash64,
    token_shingles,
)

__all__ = [
    "clean_zip",
    "get_domain",
    "parse_amount",
    "process_name",
    "slugify_key",
    "strip_url",
    "date_parts",
    "day_range",
    "mmddyyyy_to_date",
    "parse_date_multi",
    "to_utc_from_eastern",
    "minhash_signature",
    "sha512_hex",
    "simhash64",
    "token_shingles",
]
