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


def _bracket_groups(line: str, start: int) -> list[str]:
    """Top-level ``[...]`` group bodies from ``start`` to end of line —
    window specs nest brackets inside aggregate expressions, so a plain
    regex can't tell ``Window [fns], [order]`` (partition-less) from
    ``Window [fns], [keys], [order]`` (partitioned) or ``Window [fns],
    [keys]`` (partitioned, no order)."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in line[start:]:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


def count_unpartitioned_windows(simple_plan: str) -> int:
    """Window nodes with NO partition spec — these execute on a single
    partition (WindowExec moves every row through one task), the serial
    bottleneck the two-phase rank in operators/order.py exists to
    avoid. A global Sort, by contrast, range-partitions and stays
    parallel, so it is recorded separately, not gated."""
    n = 0
    for line in simple_plan.splitlines():
        # WindowGroupLimit is excluded on purpose: it prints
        # ``[partition], [order], rank_fn, k`` (2 groups when
        # partitioned) and is itself a bounded rank-pushdown — the
        # underlying Window node is what carries the partition spec.
        m = re.search(r"\bWindow \[", line)
        if not m:
            continue
        groups = _bracket_groups(line, m.end() - 1)
        if len(groups) >= 3:
            continue  # [fns], [partition], [order]
        if len(groups) == 2:
            # second group is an ORDER spec (sort directions) for a
            # partition-less window, or a PARTITION spec (bare cols)
            # for an order-less partitioned one
            second = groups[1]
            if second.strip() and not re.search(r"\b(ASC|DESC)\b", second):
                continue
        n += 1
    return n


def count_global_sorts(simple_plan: str) -> int:
    return len(re.findall(r"\bSort \[[^\n]*\], true,", simple_plan))


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
        "unpartitioned_windows": count_unpartitioned_windows(simple),
        "global_sorts": count_global_sorts(simple),
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
        "v_hamming_topk",  # deliberate query-code x corpus broadcast (8 B/code)
        "a_ks_two_sample",  # |langs|^2-row pair lattice over bounded languages
        "a_mann_whitney_u",  # same bounded language-pair lattice
        "g_modularity",  # 1-row directed-edge-count broadcast
        "d_perplexity_filter",  # 1-row vocabulary-size broadcast
        "d_curation_ppl_e2e",  # same 1-row vocabulary broadcast via bigram_nll
        "pipe_stream_drift_e2e",  # |types|x24-row bounded state x 1-ref-histogram join
        "a_bootstrap_ci",  # 1-row (n_days, point_total) stats broadcasts
        "a_welch_t",  # |langs|^2-row pair lattice over bounded languages
        "d_dsir_select",  # 1-row (raw_total, target_total) stats broadcasts
        "v_matryoshka_eval",  # deliberate query-set x corpus broadcast (v_cosine_topk shape)
        "a_woe_iv",  # 1-row min/max range broadcast (a_histogram_fixed_bins shape)
        "a_two_proportion_z",  # |types|^2-row pair lattice over bounded event types
        "d_vocab_coverage",  # 1-row (total_tokens, vocab_size) stats broadcast
        "e_decayed_engagement",  # 1-row max-day anchor broadcast
        "a_benjamini_hochberg",  # 1-row corpus language-marginals broadcast
        "v_bq_rerank",  # deliberate query-code x corpus broadcast (v_hamming_topk shape)
        "v_bq_index_probe",  # same query-code x corpus broadcast, codes read from the persisted index
    }
)


# Queries whose physical plan legitimately contains a PARTITION-LESS
# Window node (single-task WindowExec — every row of its input crosses
# one executor thread). Each entry documents the provable bound on that
# input, converting the docstring convention into a regression gate
# (VERDICT r4 "Next round" #4): test_plan_budget sweeps every registry
# plan and fails on any unlisted occurrence, and on any listed query
# that no longer has one (stale-entry guard). Canonical list —
# tools/plan_audit.py enforces the same contract when regenerating
# PLAN_AUDIT.json.
#
# Entries marked "exact-semantics member" are deliberate: the registry
# pairs each with a sketch/distributed twin that IS the 100 TB path
# (ntile → a_kll_quantile_sketch / a_percentiles; global rank at data
# scale always goes through operators/order.global_row_number's
# two-phase rank instead).
UNPARTITIONED_WINDOW_ALLOWED: dict[str, str] = {
    "a_chi2_cells": "global sum over the |hour_band|x|event_type| lattice (20 cells)",
    "a_cramers_v": "global sum over the same |hour_band|x|event_type| cell lattice (20 cells)",
    "a_histogram_equidepth": "exact-semantics member; KLL sketch is the scale path (docstring)",
    "a_rfm_segments": "customer-grain NTILEs, documented exact member (quartile cut-points at scale)",
    "a_seasonal_index": "calendar-bounded: one row per month of the fixture year (<=12)",
    "a_yoy_growth": "calendar-bounded: month-grain frame (<=12 rows/year x years)",
    "d_kl_source_drift": "vocabulary-bounded: corpus-head term frame (max_terms=400 by construction)",
    "d_pmi_bigrams": "vocabulary-bounded: bigram/unigram frames capped by min_count + top-k cut",
    "s_skyline_2d": "part-grain single sorted pass, documented frontier member (dimension table)",
    "v_rrf_hybrid": "both arms TakeOrdered to top-100 before the fusion windows",
    "w_ntile_decile": "exact-semantics member; a_percentiles cut-points are the scale path (docstring)",
    "a_benjamini_hochberg": "hypothesis-bounded: rank + step-up max over the 21-row test lattice",
}
