"""Type-2 slowly-changing-dimension (SCD2) history builder.

The reference's amendment handling (delete-then-replace, S10/streaming
concepts) keeps only the LATEST version of each row. SCD2 is the
warehouse-side completion of that story: compress a change log into
versioned history rows with validity intervals, so point-in-time joins
("what did this dimension look like when the fact happened") become
ordinary range predicates.

Plan shape: everything happens inside ONE key-partitioned shuffle — the
change-detection lag, the run-compression filter, and the valid_to lead
all share the same window partitioning, so Catalyst plans a single
Exchange followed by two Window operators and a Filter. No self-joins,
no global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Compress a change log into SCD2 history rows.

    ``df`` holds one row per observed version: business key columns
    ``keys``, tracked attribute columns ``attrs``, and ``order_cols``
    giving the (deterministic — include a unique tiebreaker) version
    order. Returns one row per run of consecutive identical attribute
    values per key:

      keys…, attrs…, valid_from (first order_col of the run),
      valid_to (start of the next run, NULL for the open run),
      is_current (valid_to IS NULL).

    Attribute comparison is null-safe: NULL → NULL is "no change",
    NULL → value and value → NULL both open a new version.
    """
    keys = list(keys)
    attrs = list(attrs)
    order_cols = list(order_cols)
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in order_cols])

    changed: Column = F.lit(False)
    row_is_first = F.lag(order_cols[0]).over(w).isNull()
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    changes = df.withColumn("__new_version", row_is_first | changed).filter(
        F.col("__new_version")
    )

    # same partitioning ⇒ the second window reuses the first shuffle
    w2 = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in order_cols])
    valid_to = F.lead(order_cols[0]).over(w2)
    return changes.select(
        *keys,
        *attrs,
        F.col(order_cols[0]).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


def asof_against_history(
    facts: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Point-in-time join of facts against SCD2 history: each fact row
    picks the history version whose [valid_from, valid_to) interval
    contains its timestamp. Versions partition time, so the equi-join on
    the business key plus the range predicate matches at most one row —
    a plain hash join with a residual filter, never a nested loop.

    The range predicate lives INSIDE the join condition (not a
    post-filter): a fact whose key exists in history but whose ts
    predates the earliest valid_from must survive with NULL history
    columns, exactly like a keyless fact — a left join followed by an
    interval filter would silently drop it."""
    keys = list(keys)
    f, h = facts.alias("__f"), history.alias("__h")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__f.{k}") == F.col(f"__h.{k}"))
    cond = (
        cond
        & (F.col(ts_col) >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col(ts_col) < F.col("valid_to")))
    )
    hist_cols = [c for c in history.columns if c not in keys]
    return f.join(h, cond, "left").select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__h.{c}") for c in hist_cols],
    )
