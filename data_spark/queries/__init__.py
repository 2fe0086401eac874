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
    **matching.ORACLE,
    **mining.ORACLE,
    **quality.ORACLE,
}

# Round-5 window (the driver records the first 50 entries; see
# WITNESS.md for the per-query ledger this ordering is derived from).
# Composition — exactly the never-driver-witnessed backlog (VERDICT r4
# "Next round" #1), 47 + 3 = 50:
#   1-15:  the 15 late-r4 additions that landed at ledger #51-65, just
#          past the r4 window (d_dup_passages ... d_kl_source_drift).
#  16-20:  the 5 post-snapshot sketch/graph/phrase additions
#          (a_cms_heavy_hitters ... a_market_basket, ledger #159-163).
#  21-40:  the 20 post-snapshot mining-tier additions
#          (g_label_propagation ... dq_benford_digits, ledger #164-183).
#  41-47:  the 7 r4-continuation additions (v_rrf_hybrid ... dq_profile,
#          ledger #184-190).
#  48-50:  the 3 late-r4 rows-only -> BIT-EXACT oracle conversions
#          (d_kmeans / d_semantic_dedup / v_ivf_kmeans_topk) — their
#          new oracles have never had a driver row.
# Every r4-window query rotates out (all 48 witnessed green in r4); the
# oldest remaining greens are r2-witnessed (q12, q11, q20, q21,
# w_distinct_over_window, a_salted_skew_agg, ...) and open the r6
# window after the backlog clears.
_PRIORITY = [
    # --- added late r4, missed the r4 window by 1-15 slots ---
    "d_dup_passages",
    "m_cdc_apply",
    "a_hll_exact_rollup",
    "a_autocorr_lag1",
    "a_linreg_trend",
    "a_mad_outliers",
    "e_pattern_seq",
    "e_transition_matrix",
    "f_null_semantics",
    "dq_constraint_audit",
    "s_spatial_grid_join",
    "h_bom_rollup",
    "m_incr_agg_maintain",
    "a_chi2_cells",
    "d_kl_source_drift",
    # --- post-snapshot r4: mergeable-sketch / graph / phrase tier ---
    "a_cms_heavy_hitters",
    "g_sssp_bellman",
    "d_pmi_bigrams",
    "a_hll_set_algebra",
    "a_market_basket",
    # --- post-snapshot r4: mining tier ---
    "g_label_propagation",
    "a_itemcf_recommend",
    "a_yoy_growth",
    "d_sorted_neighborhood",
    "d_containment_pairs",
    "d_rake_keywords",
    "d_winsorize",
    "g_ppr_personalized",
    "a_seasonal_index",
    "j_multitouch_attrib",
    "f_phonetic_block",
    "d_bpe_train",
    "d_bpe_apply",
    "w_max_drawdown",
    "a_gini_revenue",
    "m_incr_join_maintain",
    "a_median_via_rank",
    "g_walk_sample",
    "d_er_score_fusion",
    "dq_benford_digits",
    # --- r4 continuation: retrieval / storage / profiling tier ---
    "v_rrf_hybrid",
    "v_pq_adc_topk",
    "m_snapshot_diff",
    "g_hits",
    "v_mmr_rerank",
    "a_theilsen_slope",
    "dq_profile",
    # --- late-r4 rows-only -> exact-oracle conversions, new oracle
    #     never driver-witnessed ---
    "d_kmeans",
    "d_semantic_dedup",
    "v_ivf_kmeans_topk",
    # ---- window boundary (driver records the 50 above) ----
    # r6 opens with the r5 additions/oracle conversions that missed
    # this window (pipe_incremental_e2e and the five analytics3 queries
    # are new; the three portable-hash conversions changed oracle+plan,
    # so their old rows-only greens no longer witness them), then the
    # oldest r2-witnessed greens
    "pipe_incremental_e2e",
    "g_resource_alloc",
    "e_cusum_changepoint",
    "d_quality_classifier",
    "m_schema_evolution",
    "v_hamming_topk",
    "d_minhash_lsh",
    "v_lsh_ann",
    "d_embed_near_dup_lsh",
    "q12_shipmode_case",
    "q11_important_parts",
    "q20_heavy_suppliers",
    "q21_lone_returned_supplier",
    "w_distinct_over_window",
    "a_salted_skew_agg",
]

assert set(_PRIORITY) <= set(_ALL_QUERIES), sorted(set(_PRIORITY) - set(_ALL_QUERIES))

QUERIES = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update(_ALL_QUERIES)

__all__ = ["QUERIES", "ORACLE"]
