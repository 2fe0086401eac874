"""XML quirk normalization (SURVEY §2.8 JSON/XML; §7.4 risk 6).

Three hazards the reference handles per-row in Python, as pure
functions used by connectors before rows enter Spark:

- ``strip_junk_prefix``: lobbying XML arrives with garbage before the
  first '<' (house…disclosures/main.py:123-127).
- ``ensure_list``: xmltodict returns a dict for a single child and a
  list for many — downstream code must always see a list
  (house…disclosures/main.py:310-312).
- ``coerce_by_key_pattern``: IRS 990 schedule values are all strings;
  keys ending Amt/Hrs are numeric, Dt are dates
  (federal_irs_ingest_get_990s/utilities.py:181-199). Here as a
  recursive dict coercion; in Spark schemas this is explicit casts.
"""

from __future__ import annotations

import datetime
from typing import Any


def strip_junk_prefix(xml_text: str) -> str:
    """Drop everything before the first '<'."""
    idx = xml_text.find("<")
    return xml_text[idx:] if idx > 0 else xml_text


def ensure_list(value: Any) -> list:
    """Singleton→list normalization: None → [], dict/scalar → [x]."""
    if value is None:
        return []
    if isinstance(value, list):
        return value
    return [value]


def coerce_by_key_pattern(obj: Any, key: str | None = None) -> Any:
    """Recursively coerce string leaves by key suffix: *Amt/*Hrs → float,
    *Dt → ISO date string (unparseable values pass through unchanged)."""
    if isinstance(obj, dict):
        return {k: coerce_by_key_pattern(v, k) for k, v in obj.items()}
    if isinstance(obj, list):
        return [coerce_by_key_pattern(v, key) for v in obj]
    if isinstance(obj, str) and key is not None:
        if key.endswith(("Amt", "Hrs")):
            try:
                return float(obj)
            except ValueError:
                return obj
        if key.endswith("Dt"):
            try:
                return datetime.date.fromisoformat(obj).isoformat()
            except ValueError:
                return obj
    return obj
