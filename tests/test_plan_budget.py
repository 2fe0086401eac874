"""Shuffle-budget regression guard: each listed query's physical plan
must not exceed its recorded Exchange count.

Every Exchange is a cluster-wide shuffle at 100 TB, so a plan picking
up extra exchanges is a scale regression even when sf0.001 wall-clock
hides it — exactly how the ranking tier briefly ran its tokenize→tf
pipeline three times (34 exchanges) before the shared frames were
materialized. Budgets are the measured counts at sf0.001 (AQE on,
8 shuffle partitions); a legitimate plan change that adds a shuffle
should update the budget in the same commit, with the justification in
its message.
"""

from __future__ import annotations

import pytest

from data_spark.queries import QUERIES

EXCHANGE_BUDGET = {
    # relational core
    "q1_pricing_summary": 1,
    "q3_top_orders": 3,
    "q5_nation_revenue": 6,
    "w_topk_global": 0,
    "e_sessionize": 1,
    # curation / dedup
    "d_dedup_exact": 1,
    "d_ngram_jaccard": 16,
    "d_curation_e2e": 1,
    "m_scd2_history": 1,
    "d_bigram_lm": 10,
    # ranking tier (post shared-frame materialization: the cosine
    # self-join was 34 before)
    "d_tfidf_topterms": 7,
    "d_bm25_search": 7,
    "v_tfidf_cosine_pairs": 6,
    # windows (single key-partitioned shuffle each)
    "w_ewma_taps": 1,
    "w_rolling_median": 1,
    "e_anomaly_zscore": 1,
    # analytics
    "a_rfm_segments": 2,
    "s_skyline_2d": 3,
    "d_temperature_mix": 6,
    "d_chunk_windows": 0,
    "d_weighted_sample": 0,
    "g_cube_2d": 1,
    "a_hll_daily_rollup": 2,
    "a_kll_quantile_sketch": 1,
    # r4 temporal joins: the as-of rewrite is ONE user-keyed shuffle +
    # the click pre-dedup; OHLC's window and groupBy share an Exchange
    "j_asof_click_attrib": 2,
    "e_ohlc_hourly": 1,
    "e_sliding_1h_15m": 1,
    "j_interval_overlap": 3,
    # r4 analytics / exact sketches
    "a_mode_per_group": 2,
    "a_corr_pearson": 1,
    "g_degree_distribution": 4,
    "d_minhash_sig": 1,
    "d_minhash_band_pairs": 3,
    "d_simhash_exact_pairs": 5,
    # r4 late additions: the SMB join's 2 = broadcast-agg exchange pair
    # around a ZERO-exchange join stage (the join itself is asserted
    # shuffle-free in test_matching.py); k-core's 1 is the final degree
    # count — per-peel plans are materialized via truncate_lineage
    "j_bucketed_smb": 2,
    "d_edit_distance_block": 4,
    "g_kcore_peel": 1,
    "a_weighted_median": 1,
    "d_dup_passages": 5,
    "m_cdc_apply": 1,
    # exact-HLL rollup: facts → per-day registers → merged registers →
    # per-type sums, +1 for the true distinct-day side-aggregate joined
    # back on the 5-value type key; autocorr: daily totals + window/agg
    "a_hll_exact_rollup": 5,
    "a_autocorr_lag1": 2,
    # stats/CEP batch: MAD needs two windowed passes + two median joins;
    # the pattern join's three legs share the user_id shuffle key
    "a_linreg_trend": 1,
    "a_mad_outliers": 6,
    "e_pattern_seq": 3,
    "e_transition_matrix": 3,
    "f_null_semantics": 8,
    # quality tier: the audit's 6 = single-row exchanges around the
    # remaining branches (the 3 lineitem rules share one scan/agg);
    # the spatial join is ONE cell-key shuffle
    "dq_constraint_audit": 6,
    "s_spatial_grid_join": 1,
    "h_bom_rollup": 5,
    # state fold: one groupBy per side + the union re-fold
    "m_incr_agg_maintain": 3,
    "a_chi2_cells": 2,
    "d_kl_source_drift": 9,  # +1 vs per-source windows: the corpus-head total rides an all-rows window over the 20-row corpus table
    # post-snapshot r4: CMS = day-regs + merged-regs + register
    # BroadcastExchange + final probe groupBy (facts shuffle and top-10
    # head are materialized); SSSP's per-round plans are materialized so
    # the final select is shuffle-free; PMI = bigram count + 2
    # single-partition windows over vocab-bounded frames + 4 vocab-side
    # BroadcastExchanges
    "a_cms_heavy_hitters": 4,
    "g_sssp_bellman": 0,
    "d_pmi_bigrams": 7,
    # register build is materialized; 8 = single sums + type distinct +
    # pair-member merge groupBys, their broadcasts, and the final joins
    "a_hll_set_algebra": 8,
    # items are materialized; 9 = pair self-join alignment + support
    # groupBy + part counts and their join broadcasts + TakeOrdered
    "a_market_basket": 9,
    # mining tier: LPA's per-round plans are materialized so the final
    # select is shuffle-free; itemCF = pair groupBy + two seed
    # broadcasts + final score groupBy + TakeOrdered (items and seed
    # materialized); growth = monthly agg + the single-partition
    # calendar window
    "g_label_propagation": 0,
    "a_itemcf_recommend": 5,
    "a_yoy_growth": 2,
    # sorted-neighborhood: ranked frame is materialized (the two-phase
    # global rank pays its own range shuffle before the checkpoint);
    # 2 = the shifted-rank join alignment. containment: guarded shingle
    # frame materialized; 6 = df window + sizes/common groupBys + joins
    "d_sorted_neighborhood": 2,
    "d_containment_pairs": 6,
    # RAKE: phrase frame materialized; 5 = doc-keyed segmentation
    # window + word-score/distinct-phrase groupBys + broadcast + final
    # TakeOrdered. winsorize: percentile agg + its broadcast + final agg
    "d_rake_keywords": 5,
    "d_winsorize": 3,
    # PPR inherits pagerank's materialized-per-iteration discipline
    # (final select shuffle-free); seasonal = monthly agg + calendar
    # window; multitouch = user-keyed join + purchase window + day agg
    "g_ppr_personalized": 0,
    "a_seasonal_index": 2,
    "j_multitouch_attrib": 3,
    # one word-keyed distinct + one key-keyed agg
    "f_phonetic_block": 2,
    # per-round pair aggregates and vocab rewrites are materialized; the
    # final 5-row union is shuffle-free
    "d_bpe_train": 0,
    "d_bpe_apply": 0,
    # drawdown: both windows + final agg share the user_id key;
    # gini: per-customer agg + the two-phase rank's range exchange +
    # the rank-weighted 1-row fold (ranked frame is materialized)
    "w_max_drawdown": 1,
    "a_gini_revenue": 3,
    # join maintenance: state and delta legs share the orderkey shuffle
    # (3 = two join alignments + final priority agg under AQE broadcast);
    # median: rank range exchange + count broadcast + 1-row fold
    "m_incr_join_maintain": 3,
    "a_median_via_rank": 3,
    # per-step walker frames are materialized; 3 = the final hop joins
    "g_walk_sample": 3,
    # fusion rides the materialized global rank; 2 = shifted-rank join
    "d_er_score_fusion": 2,
    # digit count + 1-row total broadcast + 9-row expected lattice join
    "dq_benford_digits": 5,
    # r6 statistical-testing tier (executedPlan counts both the lang
    # histogram legs the two merged sides re-scan): histogram x2 +
    # lattice distinct x2 + merged regroup + pair windows; both tests
    # share the shape
    "a_ks_two_sample": 12,
    "a_mann_whitney_u": 12,
    # bigram explode feeds 3 aggregates (cnt/ctx/vocab) + scoring join
    # legs + final doc agg
    "d_perplexity_filter": 8,
    # per-doc chunk window + fingerprint groupBy
    "d_cdc_chunking": 2,
    # perplexity stages + the distributed rank's range exchange +
    # chunk-dedup joins over the ppl-kept survivors (rank materialized)
    "d_curation_ppl_e2e": 17,
    # token-size projection + the rank's range exchange + final join-back
    "d_shard_assign": 2,
    # reader over the folded state: dense-merge regroup + per-group
    # windows + argmax window (the streaming fold runs before the
    # returned plan; state is metadata-sized)
    "pipe_stream_drift_e2e": 4,
    # chunk window + chunk-fingerprint regroup + occurrence window +
    # per-doc totals/survivor aggs + join-back
    "d_chunk_dedup_rewrite": 5,
    # daily agg + the rank's range exchange (ranked table materialized
    # once for its three consumers) + slot explode + resample groupBy +
    # single-group order-statistic collect
    "a_bootstrap_ci": 7,
    # daily-register groupBy + type-day distinct + lattice join legs +
    # (type,bucket)-keyed sliding window + per-day harmonic regroup
    "a_hll_sliding_7d": 5,
    # the returned frame unions per-round checkpointed outputs — every
    # round's joins are materialized behind truncate_lineage
    "g_mis_luby": 0,
    # guarded posting table materialized once; 6 = totals groupBy +
    # shared-term self-join alignment + pair groupBy + the totals joins
    "d_weighted_jaccard": 6,
    # all four M4 ROW_NUMBERs share the (series, bucket) Exchange
    "e_m4_downsample": 1,
    # prediction pass + confusion groupBy + the two label-keyed share windows
    "dq_langid_eval": 3,
    # same single user-keyed union+window shuffle as the untolerated as-of
    "e_asof_tolerance": 1,
    # reader over the promoted MG state: one keys-join alignment
    # (the streaming fold runs before the returned plan)
    "pipe_stream_mg_e2e": 1,
    # per-lang sufficient-stats groupBy + its broadcast legs; the pair
    # lattice is the allowlisted bounded-language NLJ
    "a_welch_t": 3,
    # r7 additions (measured at sf0.001, shuffle=8, AQE on)
    # two partitioned rank windows share the flag shuffle; + ties
    # count windows + final group agg
    "a_spearman_rank": 3,
    # 5 profiled keys x (per-key count groupBy + 1-row summary agg)
    "dq_skew_profile": 10,
    # daily agg + per-series collect + final explode sort
    "e_holt_winters": 3,
    # two censuses over the versioned store (merge-on-read + purged)
    # with their status groupBys; the tombstone anti-join broadcasts
    "m_tombstone_delete": 5,
    # materialized token frame feeds raw/target/doc-feature groupBys;
    # + weight-table broadcasts + the stats 1-row broadcasts +
    # TakeOrdered — the tokenize scan itself runs ONCE (checkpointed)
    "d_dsir_select": 12,
    # greedy rounds run before the returned plan; the k-row result is
    # a local literal frame
    "v_kcenter_coreset": 0,
    # count groupBy + the 20-cell lattice windows + final 1-row agg
    "a_cramers_v": 4,
    # one broadcast pair scan + two snapped-rank windows + overlap agg
    "v_matryoshka_eval": 3,
    # reader over the CDC-applied versioned store: tombstone anti-join
    # alignments + final sort (the stream fold runs before the plan)
    "pipe_stream_cdc_e2e": 5,
    # daily agg + stats broadcast + per-series collect + posexplode
    "e_burst_detect": 6,
    # user-span agg materialized once (its only fact-sized shuffle);
    # 5 = cohort/time groupBys + the risk join + cumulative window
    "e_kaplan_meier": 5,
    # multi-source frontier: per-level joins ride the src-keyed sym
    # repartition; 2 = edge distinct + final node groupBy
    "g_landmark_closeness": 2,
    # 10-row cell table materialized once; 3 = label count + totals fold
    # + final sort over 10 rows
    "a_woe_iv": 3,
    # |types|-row cell table materialized once; 2 = count groupBy + the
    # lattice sort
    "a_two_proportion_z": 2,
    # the pruned read resolves to explicit file paths; AQE folds the
    # 3-row census into a local aggregate
    "m_versioned_pruned_scan": 2,
    # one count groupBy + the k-row closing fold
    "a_anova_f": 2,
    # per-source rank windows share one source shuffle; the pooled rank
    # pays its own range exchange behind the checkpoint; + target join
    "d_quantile_normalize": 3,
    # LEAD window and groupBy share the (type, day) shuffle + final sort
    "e_time_weighted_avg": 3,
    # --- r8 tier ---
    # narrow double-posexplode, one 2080-group aggregation
    "v_pca_moments": 1,
    # daily groupBy + per-series min-day window + segment/stats aggs
    "e_sax_symbolize": 5,
    # one scalar confusion aggregate
    "a_cohens_kappa": 1,
    # edge distinct + degree agg + witness self-join + pair agg + top-k
    "g_adamic_adar": 10,
    # pair shuffle + component loop (truncated lineage hides rounds) +
    # cluster windows/joins
    "d_dedup_canonical": 4,
    # term counts + three TakeOrdered heads + scalar totals
    "d_vocab_coverage": 6,
    # symmetric edge frame + 3 attenuation join+agg rounds + top-k
    "g_katz_centrality": 33,
    # anchor broadcast + one cohort groupBy
    "e_decayed_engagement": 3,
    # the optimized read resolves explicit file paths; two censuses
    "m_versioned_optimize_scan": 2,
    # group cells + corpus marginals + 21-row lattice windows
    "a_benjamini_hochberg": 4,
    # --- r9 tier ---
    # merge-on-read final scan: tombstone anti-join + status groupBy
    "m_wap_publish": 3,
    # per-spec basePath scans union into one event_type groupBy
    "m_partition_evolution": 1,
    # drained sink scan + per-user groupBy (the join ran in the stream)
    "pipe_stream_join_e2e": 1,
    # one corpus scan folding to five counters
    "a_mcnemar_test": 1,
    # code build + broadcast shortlist window + rerank join/agg + top-k
    "v_bq_rerank": 6,
    # one cell-key shuffle + per-query top-k window
    "s_knn_grid_join": 2,
    # --- r10 tier ---
    # merge-on-read pruned scan: tombstone anti-join + status groupBy
    "m_merge_upsert": 3,
    # pruned union of 3 clustered commits + tombstone anti-join + groupBy
    "m_optimize_incremental": 3,
    # codes are a zero-shuffle projection; broadcast shortlist window +
    # rerank join/agg + top-k (same spine as v_bq_rerank)
    "v_bq_index_probe": 6,
    # --- r11 tier ---
    # 3-version feed: append insert scan, merge reconstructed by ONE
    # pruned pre-image semi-join + the single-shuffle union/groupBy
    # classification (the per-class semi/anti form was 22 exchanges,
    # the r11 full-outer form 4), delete served from its commit-time
    # stored change files (zero joins)
    "m_change_feed": 3,
    # the returned frame is one groupBy over the drained sink
    "pipe_stream_source_e2e": 2,
    # pruned 2-d scan + status groupBy
    "m_multi_prune_scan": 1,
    # --- r12 tier ---
    # the returned frame is the downstream merge-on-read scan: 4
    # per-tombstone-scope anti-join groups + final union (fixed by the
    # gate's version count, not by data volume)
    "pipe_stream_cdf_e2e": 8,
}


@pytest.fixture(autouse=True)
def _no_leaked_cache(spark):
    """Audited plans must be what a fresh session would produce: a
    query that leaves frames in the session cache substitutes an
    InMemoryRelation into any other query sharing that subtree and
    silently changes ITS plan (VERDICT r5 #1: v_hamming_topk's leaked
    sig cache flipped d_simhash_exact_pairs from 5 to 9 exchanges in
    full-suite runs only — the budget gate was session-order-dependent).
    Clearing before AND after each case makes every audited plan
    independent of which tests ran earlier, and keeps this module from
    leaking cache state into later modules."""
    spark.catalog.clearCache()
    yield
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGET))
def test_exchange_budget(spark, sf_small, name):
    plan = (
        QUERIES[name](spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    got = plan.count("Exchange")
    assert got <= EXCHANGE_BUDGET[name], (
        f"{name}: {got} exchanges > budget {EXCHANGE_BUDGET[name]} — a new "
        f"shuffle crept into the plan; justify and update the budget if "
        f"intentional\n{plan[:2000]}"
    )


@pytest.mark.slow
def test_unpartitioned_window_allowlist(spark, sf_small):
    """Every partition-less Window node in every registry plan must be
    on UNPARTITIONED_WINDOW_ALLOWED with its bound documented (VERDICT
    r4 #4 — the convention is now a gate). Sweeps all plans in one
    test: a parametrize would rebuild the session context 190x.

    Also guards the allowlist itself: an entry whose query no longer
    exhibits an unpartitioned window is stale and must be removed, so
    the list can only ever describe the actual plans at HEAD."""
    from data_spark.plans.report import (
        UNPARTITIONED_WINDOW_ALLOWED,
        count_unpartitioned_windows,
        explain_text,
    )

    found: dict[str, int] = {}
    for name, fn in sorted(QUERIES.items()):
        n = count_unpartitioned_windows(explain_text(fn(spark, sf_small), "simple"))
        if n:
            found[name] = n
    unlisted = sorted(set(found) - set(UNPARTITIONED_WINDOW_ALLOWED))
    assert not unlisted, (
        f"partition-less Window nodes outside the allowlist: "
        f"{ {q: found[q] for q in unlisted} } — a single-task WindowExec is a "
        f"100 TB serialization point; either partition the window, route "
        f"through operators/order.global_row_number, or document the bound "
        f"in UNPARTITIONED_WINDOW_ALLOWED"
    )
    stale = sorted(set(UNPARTITIONED_WINDOW_ALLOWED) - set(found))
    assert not stale, f"allowlist entries with no unpartitioned window at HEAD (remove them): {stale}"


def test_plan_audit_artifact_matches_registry():
    """PLAN_AUDIT.json must cover exactly the registry (VERDICT r4 #2:
    the artifact went 7 queries stale without anything failing). A new
    query, a renamed query, or a deleted one now breaks the suite until
    tools/plan_audit.py is re-run."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.json")
    with open(path) as f:
        audit = json.load(f)
    audited = set(audit["queries"])
    registry = set(QUERIES)
    assert audited == registry, (
        f"PLAN_AUDIT.json diverged from the registry — regenerate with "
        f"`python tools/plan_audit.py > PLAN_AUDIT.json`; "
        f"missing={sorted(registry - audited)} extra={sorted(audited - registry)}"
    )
    assert audit["nested_loop_outside_allowlist"] == []
    assert audit.get("unpartitioned_window_outside_allowlist") == []


def test_bench_headline_names_resolve():
    """A typo'd HEADLINE entry would crash the driver's bench run —
    catch it at test time instead."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
    # and the headline has no duplicates (a dup would double-count a
    # query in the totals)
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_bench_stdout_line_survives_driver_tail():
    """The driver keeps only a ~2,000-byte TAIL of bench stdout; three
    rounds of BENCH_r*.json recorded "parsed": null because the line's
    FRONT was cut off (VERDICT r5 #3). Simulate the worst case — every
    headline query present with a long name and a large warm value —
    and require that the tail of a full captured stream still parses."""
    import json as _json

    import bench

    warm = {f"{n}_{'x' * 10}": 123.456 for n in bench.HEADLINE}
    line = bench.stdout_line(
        1234.5678,
        warm,
        len(bench.HEADLINE),
        3,
        0.1,
        load_start=(99.99, 99.99, 99.99),
        warm_median_total=98765.4321,
    )
    # the line itself fits the tail budget with headroom
    assert len(line) <= 1500
    # and survives the driver's capture: last 2000 bytes of the full
    # stdout stream (line + newline) must contain the complete line
    captured = (line + "\n").encode()[-2000:]
    parsed = _json.loads(captured.decode().strip())
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert "_others_warm_total" in parsed["queries"]
    assert parsed["detail"] == "BENCH_local.json"
    # r9: host-load + median-drift fields ride the same line
    assert parsed["load_start"] == [99.99, 99.99, 99.99]
    assert parsed["warm_median_total"] == 98765.4321
