"""Driver-checked query inventory: name → callable(spark, sf_dir) →
DataFrame, plus the matching DuckDB oracle SQL (absent for approximate
operators, which are pytest-gated instead).

The driver's CORRECTNESS gate records only the FIRST 50 registry
entries (observed in round 1: entries 51-77 had no row in
CORRECTNESS_r01.json). ``_PRIORITY`` therefore front-loads the queries
that most need a fresh driver witness this round — previously
unwitnessed operators, rows whose hash canonicalization changed, and
queries whose plans were rewritten — and proven-green relational shapes
rotate to the tail.
"""

from data_spark.queries import (
    analytics,
    analytics2,
    analytics3,
    analytics4,
    analytics5,
    documents,
    events,
    graphq,
    matching,
    mining,
    quality,
    ranking,
    relational,
    relational2,
    relational3,
    relational4,
    temporal,
    vectors,
)

_ALL_QUERIES = {
    **relational.QUERIES,
    **relational2.QUERIES,
    **relational3.QUERIES,
    **relational4.QUERIES,
    **events.QUERIES,
    **documents.QUERIES,
    **vectors.QUERIES,
    **graphq.QUERIES,
    **ranking.QUERIES,
    **temporal.QUERIES,
    **analytics.QUERIES,
    **analytics2.QUERIES,
    **analytics3.QUERIES,
    **analytics4.QUERIES,
    **analytics5.QUERIES,
    **matching.QUERIES,
    **mining.QUERIES,
    **quality.QUERIES,
}

ORACLE = {
    **relational.ORACLE,
    **relational2.ORACLE,
    **relational3.ORACLE,
    **relational4.ORACLE,
    **events.ORACLE,
    **documents.ORACLE,
    **vectors.ORACLE,
    **graphq.ORACLE,
    **ranking.ORACLE,
    **temporal.ORACLE,
    **analytics.ORACLE,
    **analytics2.ORACLE,
    **analytics3.ORACLE,
    **analytics4.ORACLE,
    **analytics5.ORACLE,
    **matching.ORACLE,
    **mining.ORACLE,
    **quality.ORACLE,
}

# Round-6 window (the driver records the first 50 entries; see
# WITNESS.md for the per-query ledger this ordering is derived from).
# Composition — VERDICT r5 "Next round" #2, exactly as pre-planned in
# the r5 WITNESS.md:
#   1-9:   the 9 entries with no driver row for their CURRENT contract:
#          the 6 r5-created queries (pipe_incremental_e2e + the five
#          analytics3 additions; v_hamming_topk additionally changed
#          plan this round — truncate_lineage replaced the leaked
#          session cache, VERDICT r5 #1) and the 3 r5 rows-only →
#          portable-hash EXACT oracle conversions (d_minhash_lsh /
#          v_lsh_ann / d_embed_near_dup_lsh) whose old greens witnessed
#          the retired oracle.
#  10-13:  the 4 queries whose oracle CONTRACT changed in r6 —
#          g_pagerank / g_hits / g_ppr_personalized moved from plain
#          FLOOR(·1e8) to the boundary-safe round-half snap, and
#          v_mmr_rerank now takes its shortlist/arg-max decisions on
#          e6-snapped similarities (VERDICT r5 #5) — their r4/r5 rows
#          witnessed the retired contract.
#  14-50:  the 37 oldest stale greens, oldest-first in ledger order —
#          all r2-witnessed (q12 ... mm_frame_sample). The remaining 7
#          r2-witnessed queries (d_bigram_lm, v_cosine_topk,
#          v_ivf_topk, d_embed_near_dup, j_suffix_containment,
#          g_triangles, g_clustering_coeff) did not fit and MUST open
#          the r7 window together with anything added or changed later
#          in r6.
_PRIORITY = [
    # --- never driver-witnessed under current contract (r5 additions
    #     + r5 oracle conversions) ---
    "pipe_incremental_e2e",
    "g_resource_alloc",
    "e_cusum_changepoint",
    "d_quality_classifier",
    "m_schema_evolution",
    "v_hamming_topk",
    "d_minhash_lsh",
    "v_lsh_ann",
    "d_embed_near_dup_lsh",
    # --- r6 oracle-contract changes (round-half / snapped decisions) ---
    "g_pagerank",
    "g_hits",
    "g_ppr_personalized",
    "v_mmr_rerank",
    # --- oldest stale greens: the r2-witnessed block, ledger order ---
    "q12_shipmode_case",
    "q11_important_parts",
    "q20_heavy_suppliers",
    "q21_lone_returned_supplier",
    "w_distinct_over_window",
    "a_salted_skew_agg",
    "j_salted_skew_join",
    "q6_forecast_revenue",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue",
    "q13_customer_distribution",
    "m_scd2_history",
    "w_analytic_battery",
    "e_sessionize",
    "e_session_window_native",
    "e_gap_fill_ffill",
    "e_rollup_hierarchy",
    "d_dedup_exact",
    "d_ngram_jaccard",
    "d_dedup_resolve",
    "d_token_stats",
    "d_bpe_tokens",
    "d_quality",
    "d_repetition",
    "d_source_quota",
    "d_contamination",
    "d_pii_redact",
    "d_split_assign",
    "d_pack_sequences",
    "d_lang_id",
    "d_fingerprint",
    "d_top_terms",
    "d_curation_e2e",
    "mm_binary_meta",
    "mm_frame_sample",
    # ---- window boundary (driver records the 50 above) ----
    # r7 must open with: d_bigram_lm, v_cosine_topk, v_ivf_topk,
    # d_embed_near_dup, j_suffix_containment, g_triangles,
    # g_clustering_coeff (r2-witnessed, displaced from this window by
    # the r6 contract changes), PLUS the 18 never-witnessed r6
    # additions (a_ks_two_sample, a_mann_whitney_u, g_modularity,
    # d_perplexity_filter, d_cdc_chunking, d_curation_ppl_e2e,
    # d_shard_assign, pipe_stream_drift_e2e — analytics4.py;
    # d_chunk_dedup_rewrite, a_bootstrap_ci, a_hll_sliding_7d,
    # d_weighted_jaccard — analytics5.py; g_mis_luby — graphq.py;
    # e_m4_downsample — temporal.py; dq_langid_eval — quality.py;
    # e_asof_tolerance — events.py; pipe_stream_mg_e2e, a_welch_t —
    # analytics5.py), then the r3-witnessed block.
    "d_bigram_lm",
    "v_cosine_topk",
    "v_ivf_topk",
    "d_embed_near_dup",
    "j_suffix_containment",
    "g_triangles",
    "g_clustering_coeff",
]

assert set(_PRIORITY) <= set(_ALL_QUERIES), sorted(set(_PRIORITY) - set(_ALL_QUERIES))

QUERIES = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update(_ALL_QUERIES)

__all__ = ["QUERIES", "ORACLE"]
