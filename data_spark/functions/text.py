"""String normalization functions (SURVEY §2.8 "String").

Each function mirrors the row-wise Python of the reference but is built
from native Spark expressions so it runs JVM-side inside whole-stage
codegen (the reference executes these per-row in Python over pandas
``iterrows`` — the single biggest throughput difference at scale).

Reference semantics sites:
  - process_name: federal_fec_compute_load_elastic_candidates/utilities.py:1-86
  - clean_zip:    federal_fec_compute_load_graph_contributions/main.py:41-50
  - strip_url:    twitter_compute_load_graph/utilities.py:13-30
  - get_domain:   twitter_compute_extract_domains/main.py:24-28
  - slugify_key:  reddit_ingest_get_ads/main.py:53-61
  - parse_amount: federal_house_lobbying_ingest_get_contributions/main.py:294
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Title suffixes stripped from the END of a name, one per pass.
# Ordered so that longer variants ("( RET)", " DR ND") win over their
# prefixes when both could anchor at end-of-string.
_TITLES_END = [
    " DR ND",
    " DR DO",
    " \\(RET\\)",
    " MSGT",
    " USAF",
    " MRS",
    " HON",
    " ESQ",
    " REV",
    " MBA",
    " PHD",
    " RET",
    " USN",
    " CDR",
    " SGT",
    " MAJ",
    " THE",
    " MR",
    " MS",
    " FR",
    " DR",
    " MD",
    " JD",
]
_TITLES_END_RE = "(" + "|".join(_TITLES_END) + ")$"


def _strip_title_end(c: Column) -> Column:
    """One pass of end-title removal (removes at most one suffix)."""
    return F.regexp_replace(c, _TITLES_END_RE, "")


def _strip_titles4(c: Column) -> Column:
    for _ in range(4):
        c = _strip_title_end(c)
    return c


def process_name(col: Column) -> Column:
    """FEC name normalizer.

    Upper-case, drop periods, fix ", LLC"/", INC", strip title suffixes
    (three passes), reorder "LAST, FIRST [JR|SR|II|III|IV]" into
    "FIRST LAST [suffix]" with four title-strip passes per part, squeeze
    double spaces, trim, and drop a leading "DR ".
    """
    n = F.upper(col)
    n = F.replace(n, F.lit("."), F.lit(""))
    n = F.when(n.endswith(", LLC"), F.replace(n, F.lit(", LLC"), F.lit(" LLC"))).otherwise(n)
    n = F.when(n.endswith(", INC"), F.replace(n, F.lit(", INC"), F.lit(" INC"))).otherwise(n)
    for _ in range(3):
        n = _strip_title_end(n)

    first = F.split_part(n, F.lit(","), F.lit(2))
    last = F.split_part(n, F.lit(","), F.lit(1))

    def _reorder(trimmed: Column, suffix: str) -> Column:
        f = F.split_part(trimmed, F.lit(","), F.lit(2))
        l = F.split_part(trimmed, F.lit(","), F.lit(1))
        out = F.concat(_strip_titles4(f), F.lit(" "), _strip_titles4(l))
        return F.concat(out, F.lit(suffix)) if suffix else out

    reordered = (
        F.when(n.endswith(" JR"), _reorder(F.left(n, F.length(n) - 3), " JR"))
        .when(n.endswith(" SR"), _reorder(F.left(n, F.length(n) - 3), " SR"))
        .when(n.endswith(" III"), _reorder(F.left(n, F.length(n) - 4), " III"))
        .when(n.endswith(" II"), _reorder(F.left(n, F.length(n) - 3), " II"))
        .when(n.endswith(" IV"), _reorder(F.left(n, F.length(n) - 3), " IV"))
        .otherwise(F.concat(_strip_titles4(first), F.lit(" "), _strip_titles4(last)))
    )
    n = F.when(n.contains(","), reordered).otherwise(n)
    n = F.replace(n, F.lit("  "), F.lit(" "))
    n = F.trim(n)
    n = F.when(n.startswith("DR "), F.substr(n, F.lit(4))).otherwise(n)
    return n


def clean_zip(col: Column) -> Column:
    """Zip cleaner: int-castable values are zero-padded to 5 digits
    (zero itself → empty), non-castable strings are left-padded only if
    shorter than 5 (Python ``zfill`` never truncates)."""
    as_int = F.trim(col).try_cast("long")
    int_str = as_int.cast("string")
    zf = lambda s: F.when(F.length(s) >= 5, s).otherwise(F.lpad(s, 5, "0"))
    return (
        F.when(col.isNull() | (col == ""), F.lit(""))
        .when(as_int.isNotNull() & (as_int == 0), F.lit(""))
        .when(as_int.isNotNull(), zf(int_str))
        .otherwise(zf(col))
    )


def get_domain(col: Column) -> Column:
    """Host from a scheme-less URL: text before the first '/', minus a
    single leading 'www.'."""
    host = F.split_part(col, F.lit("/"), F.lit(1))
    return F.regexp_replace(host, r"^www\.", "")


def strip_url(col: Column) -> Column:
    """Strip scheme, leading www., query string and fragment; preserve
    only the ``v`` parameter for YouTube watch URLs.

    The reference also un-shortens <30-char URLs via HTTP HEAD — that is
    connector-side I/O, not a column transform, so it lives with the
    ingestion connectors (data_spark.sources), not here.
    """
    base = F.regexp_replace(col, r"[?#].*$", "")
    v = F.regexp_extract(col, r"[?&#]v=([^&#]*)", 1)
    u = F.when(
        col.contains("youtube.com/watch") & (v != ""),
        F.concat(base, F.lit("?v="), v),
    ).otherwise(base)
    after_www = F.substr(u, F.instr(u, "://www.") + 7)
    after_scheme = F.substr(u, F.instr(u, "://") + 3)
    return (
        F.when(u.contains("://www."), after_www)
        .when(u.contains("://"), after_scheme)
        .otherwise(u)
    )


def slugify_key(col: Column) -> Column:
    """Lower-case, map ``-``, ``/``, and spaces to ``_``, drop everything
    that is not ``[a-z0-9_]``."""
    s = F.lower(F.trim(col))
    s = F.regexp_replace(s, r"[-/ ]", "_")
    return F.regexp_replace(s, r"[^a-z0-9_]", "")


def parse_amount(col: Column) -> Column:
    """Money-string → double: strip '$', ',', and spaces, then try-cast
    (unparseable → NULL)."""
    return F.regexp_replace(col, r"[$, ]", "").try_cast("double")


# Simplified-soundex translate table: a..z -> digit class (vowels/h/w=0,
# bfpv=1, cgjkqsxz=2, dt=3, l=4, mn=5, r=6). Shared constant so the
# Spark column chain and the DuckDB oracle SQL encode the SAME spec.
PHONETIC_ALPHABET = "abcdefghijklmnopqrstuvwxyz"
PHONETIC_CODES = "01230120022455012623010202"


def phonetic_key(col: Column) -> Column:
    """Simplified-soundex phonetic key (4 chars, e.g. 'robert' → R163).

    Deterministic simplified spec (NOT Knuth's full H/W adjacency rule
    — the reference point is cross-engine reproducibility, so the
    identical algebra runs in both engines; see the paired SQL in
    queries that use this):
      1. lowercase, strip non-letters; empty → empty key
      2. drop h/w AFTER the head letter
      3. map every letter (head included) through the translate table
      4. collapse adjacent equal digits (head participates, so a head
         whose code equals the next letter's absorbs it)
      5. drop the head's own digit, drop zeros, keep 3, right-pad '0'
      6. key = upper(head) + the 3 digits
    """
    s = F.regexp_replace(F.lower(col), "[^a-z]", "")
    head = F.substring(s, 1, 1)
    s2 = F.concat(head, F.regexp_replace(F.substring(s, 2, 1 << 20), "[hw]", ""))
    digits = F.translate(s2, PHONETIC_ALPHABET, PHONETIC_CODES)
    for d in "123456":
        digits = F.regexp_replace(digits, f"{d}{d}+", d)
    rest = F.regexp_replace(F.substring(digits, 2, 1 << 20), "0", "")
    key = F.concat(F.upper(head), F.rpad(F.substring(rest, 1, 3), 3, "0"))
    return F.when(s == "", F.lit("")).otherwise(key)


def phonetic_key_sql(expr: str) -> str:
    """The identical simplified-soundex algebra as DuckDB SQL over
    ``expr`` — paired with :func:`phonetic_key` for oracle queries."""
    s = f"regexp_replace(lower({expr}), '[^a-z]', '', 'g')"
    head = f"substr({s}, 1, 1)"
    s2 = f"({head} || regexp_replace(substr({s}, 2), '[hw]', '', 'g'))"
    digits = f"translate({s2}, '{PHONETIC_ALPHABET}', '{PHONETIC_CODES}')"
    for d in "123456":
        digits = f"regexp_replace({digits}, '{d}{d}+', '{d}', 'g')"
    rest = f"regexp_replace(substr({digits}, 2), '0', '', 'g')"
    return (
        f"CASE WHEN {s} = '' THEN '' "
        f"ELSE upper({head}) || rpad(substr({rest}, 1, 3), 3, '0') END"
    )
