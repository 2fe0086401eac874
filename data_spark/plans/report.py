"""Structured physical-plan inspection.

``plan_report`` parses ``df.explain`` output into the properties that
matter for scale review (SURVEY §4 posture): join strategies chosen,
whether scan-level pushdown happened, how many exchanges (shuffles) the
plan performs, and whether whole-stage codegen covers the hot path.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees.

    AQE's pre-execution plan reports 0 subtrees (codegen is decided per
    finalized stage), so probe a fresh plan of the same query with AQE
    off — the count reflects the non-adaptive physical plan, which is
    what the codegen-coverage question is about.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        from pyspark.sql import functions as F

        text = explain_text(df.where(F.lit(True)), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def plan_report(df: DataFrame) -> dict:
    """Summarize the physical plan into scale-relevant booleans/counts."""
    text = explain_text(df, "formatted")
    simple = explain_text(df, "simple")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", text)
    return {
        # counts come from the simple tree (formatted mode prints each
        # operator twice: once in the tree, once in the details section)
        "broadcast_hash_joins": simple.count("BroadcastHashJoin"),
        "sort_merge_joins": simple.count("SortMergeJoin"),
        "nested_loop_joins": simple.count("BroadcastNestedLoopJoin")
        + simple.count("CartesianProduct"),
        "exchanges": len(re.findall(r"\bExchange\b", simple)),
        "has_take_ordered": "TakeOrderedAndProject" in text,
        "pushed_filters": [p for p in pushed if p.strip()],
        "wholestage_codegen_spans": _codegen_spans(df),
        "partition_filters": bool(pf and pf.group(1).strip()),
    }


# Queries whose physical plan legitimately contains a
# BroadcastNestedLoopJoin: deliberate 1-row scalar broadcasts, bounded
# lattices, or documented exact-mode baselines. Canonical list —
# test_plans' nested-loop sweep and tools/plan_audit.py both import it.
NESTED_LOOP_ALLOWED = frozenset(
    {
        "e_watermark_split",  # 1-row watermark broadcast
        "sq_above_avg_price",  # 1-row global-average broadcast
        "q15_top_supplier",  # 1-row max-revenue broadcast
        "q22_idle_customers",  # 1-row average-balance broadcast
        "q11_important_parts",  # 1-row global-threshold broadcast
        "d_bigram_lm",  # 1-row vocabulary-size broadcast
        "d_tfidf_topterms",  # 1-row corpus-size broadcast
        "d_temperature_mix",  # 1-row alpha-normalizer broadcast
        "d_bm25_search",  # 1-row (n_docs, avgdl) stats broadcast
        "v_tfidf_cosine_pairs",  # 1-row corpus-size broadcast
        "a_histogram_fixed_bins",  # 1-row min/max broadcast
        "s_relational_division",  # 1-row universe-count broadcast
        "v_cosine_topk",  # deliberate query-set x corpus broadcast
        "d_embed_near_dup",  # all-pairs baseline (LSH variant is the scale path)
        "v_lsh_ann",
        "v_ivf_topk",  # tiny centroid-set broadcasts
        "v_ivf_kmeans_topk",  # same, with trained centroids
        "d_kmeans",  # k-row centroid-model broadcast per Lloyd round
        "d_semantic_dedup",  # same centroid broadcast inside the fit
        "j_range_tier",  # interval join against a 4-row broadcast
        "a_hll_set_algebra",  # <=|types|^2-row pair lattice over 5 event types
        "a_market_basket",  # 1-row order-universe-count broadcast
        "a_median_via_rank",  # 1-row total-count broadcast onto the ranked frame
        "dq_benford_digits",  # 1-row digit-total broadcast onto the 9-row lattice
        "v_rrf_hybrid",  # 1-row query-vector + 1-row BM25-stats broadcasts
    }
)
