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
    documents,
    events,
    graphq,
    ranking,
    relational,
    relational2,
    relational3,
    relational4,
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
}

# Round-3 window (the driver records the first 50 entries; see
# WITNESS.md for the per-query ledger this ordering is derived from):
#   1-15: the 12 never-driver-witnessed queries (r1+r2 both missed
#         them) plus the 3 r2 driver-red queries whose array outputs
#         are now JSON-serialized — these need a green row most.
#  16-27: the 12 queries ADDED mid-r3 (ranking/analytics/PCA tier) —
#         never-witnessed outranks regression re-witness.
#  28-50: regression re-witness of the oldest r1-only-witnessed
#         queries (23 of 48 fit; the spill-over leads the r4 window).
# r2-witnessed greens rotate fully out of the window this round.
_PRIORITY = [
    # --- never witnessed in r1 or r2 ---
    "e_funnel_3step",
    "e_retention_cohorts",
    "e_interval_merge",
    "a_histogram_fixed_bins",
    "a_median_per_group",
    "s_relational_division",
    "v_lsh_ann",
    "v_ivf_kmeans_topk",
    "d_minhash_lsh",
    "d_simhash_near",
    "g_pagerank",
    "g_components",
    # --- r2 driver-red, fixed this round (arrays → to_json strings) ---
    "f_array_battery",
    "f_map_struct_json",
    "d_inverted_index",
    # --- added mid-r3, never witnessed ---
    "d_tfidf_topterms",
    "d_bm25_search",
    "v_tfidf_cosine_pairs",
    "w_ewma_taps",
    "s_skyline_2d",
    "a_rfm_segments",
    "g_bfs_levels",
    "v_pca_project",
    "d_weighted_sample",
    "w_rolling_median",
    "d_temperature_mix",
    "d_chunk_windows",
    "e_anomaly_zscore",
    "g_cube_2d",
    "a_hll_daily_rollup",
    "a_kll_quantile_sketch",
    "d_fuzzy_dedup_resolve",
    "a_histogram_equidepth",
    # --- r1-only witnessed: oldest hard signal, re-witness for
    #     regression coverage (the first 17 make the window) ---
    "q1_pricing_summary",
    "q3_top_orders",
    "q4_order_priority",
    "q5_nation_revenue",
    "q7_nation_volume",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_brand_supplier_cnt",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive",
    "q19_disjunctive_join",
    "q22_idle_customers",
    "u_distinct_master",
    "u_union_pad_distinct",
    "u_unpivot_metrics",
    "p_compound_filter",
    "p_pivot_status",
    "j_anti_unloaded",
    "j_left_join_dim",
    "j_outer_coalesce",
    "j_range_tier",
    "j_semi_active",
    "m_upsert_latest",
    "w_first_per_group",
    "w_lag_delta",
    "w_ntile_decile",
    "w_rank_in_group",
    "w_running_total",
    "w_sample_deterministic",
    "w_stratified_sample",
    "w_topk_global",
    "a_collect_group_array",
    "a_percentiles",
    "a_approx_distinct",
    "a_approx_percentiles",
    "e_asof_latest_view",
    "e_day_expand",
    "e_json_extract",
    "e_range_frame_7d",
    "e_tumbling_hourly",
    "e_watermark_split",
    "f_epoch_roundtrip",
    "f_scalar_repair",
    "g_grouping_sets",
    # --- tail: r1-only spill-over (lead the r4 window), then
    #     everything else (r2-witnessed greens) in module order ---
    "g_rollup_region",
    "s_intersect_except",
    "sq_above_avg_price",
]

assert set(_PRIORITY) <= set(_ALL_QUERIES), sorted(set(_PRIORITY) - set(_ALL_QUERIES))

QUERIES = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update(_ALL_QUERIES)

__all__ = ["QUERIES", "ORACLE"]
