"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE compact JSON line on stdout: {"metric": ..., "value": cold_total,
"unit": "sec", "queries": {8 slowest warm medians + _others_warm_total},
"warm_total": ..., "reps": n, "sf": ..., "detail": "BENCH_local.json"}.
The line is guarded ≤1,500 bytes because the driver keeps only a
~2,000-byte stdout tail (VERDICT r5 #3). Full-precision cold AND warm
per-query maps go to BENCH_local.json next to this file; everything
else (progress, Spark chatter, anything a child process emits on fd 1)
is routed to stderr so the JSON line is the entire stdout.

Each query is executed to completion (count action) so lazy plans can't
fake speed; per-query wall-clock includes planning. Every query runs
$SPARK_GRAFT_REPS times (default 5): the FIRST run is the cold number
(comparable to earlier rounds' single-run benches — it pays Catalyst
planning + whole-stage codegen compilation, measured ~2-3× warm
steady-state), and the MIN OF THE REMAINING runs is the warm number.
At 100 TB the same plans run for minutes and the per-plan compile cost
vanishes, so the warm number — not the cold total — is the
scale-relevant signal; the cold column exists so compile-noise
regressions (r2's q3 +18% artifact) are distinguishable from real ones.

Jitter defense (VERDICT r7 #2): this host is a memory-overcommitted
hypervisor with roaming multi-second IO stalls, and a stall spanning a
query's whole window poisons any averaging statistic — r7 recorded a
phantom 12x "regression" on v_rrf_hybrid (18.8 s recorded, 2.2 s idle,
code untouched). Stalls only ever ADD time, so (1) warm is the MIN of
the warm reps, and (2) after the sweep, any query whose warm still
exceeds 1.5x its best-ever recorded warm (BENCH_BEST.json, keyed by
sf) is re-run and the better number kept — by then the storm that
inflated it has usually passed. BENCH_BEST.json is updated monotonically
(per-query min over all runs) so one clean round inoculates the next.

Drift observability (ADVICE r8 / VERDICT r8 #7): min-of-warm plus the
outlier retry systematically bias the headline downward and can hide a
real sustained regression below the 1.5x threshold, so BENCH_local.json
also records (a) the warm MEDIAN per query and its total, (b) every
pre-retry warm value in ``outlier_log`` before the retry is folded in,
and (c) ``os.getloadavg()`` at sweep start — enough to tell an idle run
from a contended one across rounds. The stdout envelope carries
``load_start`` and ``warm_median_total`` too.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from data_spark.session import get_spark
from data_spark.queries import QUERIES

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "p_compound_filter",
    "j_left_join_dim",
    "j_anti_unloaded",
    "u_distinct_master",
    "w_topk_global",
    "w_first_per_group",
    "m_upsert_latest",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q9_product_profit",
    "q11_important_parts",
    "q16_brand_supplier_cnt",
    "q18_large_orders",
    "q21_lone_returned_supplier",
    "g_rollup_region",
    "w_running_total",
    "e_tumbling_hourly",
    "e_sessionize",
    "d_dedup_exact",
    "d_ngram_jaccard",
    "d_minhash_lsh",
    "d_token_stats",
    "d_repetition",
    "d_contamination",
    "d_split_assign",
    "d_curation_e2e",
    "d_embed_near_dup",
    "d_embed_near_dup_lsh",  # the 100TB scale path next to the exact baseline
    "e_asof_latest_view",
    "v_cosine_topk",
    "j_suffix_containment",
    "d_bigram_lm",
    "m_scd2_history",
    "d_tfidf_topterms",
    "d_bm25_search",
    "v_tfidf_cosine_pairs",  # inverted-index cosine join (max_df-guarded)
    "w_ewma_taps",
    "v_pca_project",  # Arrow-batched moment partials + codegen projection
    # iterative/graph tier (VERDICT r3 #6): the per-iteration join+agg
    # cost is exactly the kind the headline must track — BFS was the
    # slowest gate query of r3 (11.5 s) before its partition fix
    "g_bfs_levels",
    "g_pagerank",
    "g_components",
    "g_triangles",
    # r4 temporal-join + exact-sketch families
    "j_asof_click_attrib",
    "e_ohlc_hourly",
    "e_sliding_1h_15m",
    "j_interval_overlap",
    "d_minhash_band_pairs",
    "d_simhash_exact_pairs",
    # r4 late additions: storage-layout / ER / CDC family. j_bucketed_smb
    # deliberately pays the bucketed WRITE inside the query — the number
    # is the sink+co-located-join round trip, not just the join
    "j_bucketed_smb",
    "d_edit_distance_block",
    "g_kcore_peel",
    "a_weighted_median",
    "d_dup_passages",
    "m_cdc_apply",
    "a_hll_exact_rollup",  # cross-engine-exact HLL with in-query merge
    "a_autocorr_lag1",
    "a_linreg_trend",
    "a_mad_outliers",
    "e_pattern_seq",  # MATCH_RECOGNIZE-shape triple join, user-keyed
    "e_transition_matrix",
    "f_null_semantics",
    "dq_constraint_audit",
    "s_spatial_grid_join",  # grid-file radius join, one cell-key shuffle
    "h_bom_rollup",
    "m_incr_agg_maintain",  # materialized-view maintenance law, hash-verified
    "a_chi2_cells",
    "d_kl_source_drift",
    # post-snapshot r4: mergeable-sketch, iterative-graph, and
    # phrase-mining additions
    "a_cms_heavy_hitters",
    "g_sssp_bellman",
    "d_pmi_bigrams",
    "a_hll_set_algebra",
    "a_market_basket",
    "g_label_propagation",  # mode-update iterative member (2 shuffles/round)
    "a_itemcf_recommend",
    "a_yoy_growth",
    "d_sorted_neighborhood",  # two-phase global rank + w·n candidate join
    "d_containment_pairs",
    "d_rake_keywords",
    "d_winsorize",
    "g_ppr_personalized",
    "a_seasonal_index",
    "j_multitouch_attrib",
    "f_phonetic_block",
    "d_bpe_train",  # vocab-bounded iterative merge training
    "d_bpe_apply",
    "w_max_drawdown",
    "a_gini_revenue",  # second fact-scale consumer of the distributed rank
    "m_incr_join_maintain",
    "a_median_via_rank",  # selection over the distributed rank, no single-buffer sort
    "g_walk_sample",  # deterministic hash-driven walks (embedding sampling)
    "d_er_score_fusion",  # multi-signal ER scoring in integer micro-units
    "dq_benford_digits",
    # r4 continuation: hybrid retrieval (two TakeOrdered arms + fusion)
    "v_rrf_hybrid",
    "m_snapshot_diff",  # versioned store: 4 commits + time-travel anti-join diffs
    "g_hits",  # second coupled-recurrence iterative member (2 agg rounds/iter)
    "v_mmr_rerank",  # one corpus scan + constant-bounded greedy rounds
    "a_theilsen_slope",  # calendar-bounded pairwise-slope median
    "dq_profile",  # one-scan multi-column profiler
    # r5: the composed incremental pipeline (VERDICT r4 #5) — the wall
    # number IS the deliverable: 12 stateful passes (4 batches x
    # scan/probe/merge) incl. all parquet writes, ~22 s warm at sf0.1
    "pipe_incremental_e2e",
    # r5 additions: link prediction / drift / classifier / evolution / binary ANN
    "g_resource_alloc",  # witness-centric RA-index self-join, deg<=50 cutoff
    "e_cusum_changepoint",  # CUSUM via prefix-min closed form, 2 windows
    "d_quality_classifier",  # hashing-trick linear scorer, 1024 fixed buckets
    "m_schema_evolution",  # versioned store: merge-schema read + NULL backfill
    "v_hamming_topk",  # 8-byte binary codes, broadcast queries, XOR+popcount
    # r6 additions: statistical-testing & corpus-scoring tier
    "a_ks_two_sample",  # exact-integer KS over per-value histograms
    "a_mann_whitney_u",  # doubled-midrank rank-sum, same histogram scan
    "g_modularity",  # integer-unit community quality over LPA(3) labels
    "d_perplexity_filter",  # bigram-LM self-scoring (model groupBy + equi-join)
    "d_cdc_chunking",  # content-defined chunk fingerprint dedup
    "d_curation_ppl_e2e",  # composed LM-score rank-cut + chunk-dedup disposition
    "d_shard_assign",  # serpentine token-balanced sharding over the global rank
    "pipe_stream_drift_e2e",  # real file stream -> hist-state fold -> KS reader
    # r6 continuation: corpus rewriting + resampling inference
    "d_chunk_dedup_rewrite",  # C4-style duplicated-span removal + reassembly
    "a_bootstrap_ci",  # deterministic bootstrap CI over the daily aggregate
    "a_hll_sliding_7d",  # trailing-7d distinct via register-MAX RANGE window
    "g_mis_luby",  # derandomized Luby MIS, 3 hash-priority rounds
    "d_weighted_jaccard",  # exact multiset Jaccard over the guarded inverted index
    "e_m4_downsample",  # M4 pixel-bucket min/max/first/last row selection
    "dq_langid_eval",  # confusion matrix + ppm precision/recall shares
    "e_asof_tolerance",  # merge_asof tolerance semantics, one keyed shuffle
    "pipe_stream_mg_e2e",  # file stream -> MG fold/prune/promote -> reader
    "a_welch_t",  # parametric drift member: integer sufficient stats, one float
    "a_spearman_rank",  # tie-averaged rank correlation, two partitioned windows
    "dq_skew_profile",  # key-frequency concentration: the salting decision input
    "e_holt_winters",  # level+trend fold over per-series daily arrays
    "m_tombstone_delete",  # key-tombstone DELETE: merge-on-read + purge equivalence
    "d_dsir_select",  # hashed-unigram importance selection, broadcast weights
    "v_kcenter_coreset",  # greedy farthest-point diversity coreset, O(n*k)
    "a_cramers_v",  # chi2 effect size via decimal-summed snapped cells
    "v_matryoshka_eval",  # recall@k of prefix-dim retrieval vs full-dim
    "pipe_stream_cdc_e2e",  # file stream -> tombstone LWW -> versioned store
    "e_burst_detect",  # Kleinberg 2-state automaton, integer Viterbi fold
    "e_kaplan_meier",  # right-censored retention curves, decimal-log products
    "g_landmark_closeness",  # shared multi-source BFS, integer harmonic
    "a_woe_iv",  # WOE binning with exact-integer IV numerators
    "a_two_proportion_z",  # pooled z^2 over the bounded type lattice
    "m_versioned_pruned_scan",  # manifest file skipping, correctness gate
    "a_anova_f",  # k-group mean test, decimal-snapped cross-group terms
    "d_quantile_normalize",  # cross-source feature alignment, integer ranks
    "e_time_weighted_avg",  # TWAP: integer-microsecond duration weights
    # r8 additions: moment-matrix gate, symbolic series, agreement,
    # log-diluted link prediction, dedup canonicalization, Zipf coverage
    "v_pca_moments",  # narrow double-posexplode pair moments, 2080-group agg
    "e_sax_symbolize",  # exact-integer PAA + breakpoint symbols
    "a_cohens_kappa",  # one scalar agg, four integer confusion counts
    "g_adamic_adar",  # witness-bounded self-join, integer 1/ln dilution
    "d_dedup_canonical",  # fuzzy clusters + quality-argmax keeper per cluster
    "d_vocab_coverage",  # three TakeOrdered vocab heads, no global rank
    "g_katz_centrality",  # 3 exact attenuated-path join rounds (pagerank shape)
    "e_decayed_engagement",  # power-of-two decay, exact BIGINT contributions
    "m_versioned_optimize_scan",  # OPTIMIZE ZORDER + stats-pruned census
    "a_benjamini_hochberg",  # FDR step-up on the 21-row hypothesis lattice
    # r9 additions: WAP branch workflow, spec evolution, stream-stream
    # join e2e, paired test, BQ+rerank retrieval, grid kNN join
    "m_wap_publish",  # branch write + audit tombstone + publish + scan
    "m_partition_evolution",  # two specs, basePath-scoped pruned scan
    "pipe_stream_join_e2e",  # watermarked stream-stream join, 3 eras/side
    "a_mcnemar_test",  # one scan to five integer counters
    "v_bq_rerank",  # 8-byte Hamming shortlist + exact integer rerank
    "s_knn_grid_join",  # cell-key shuffle + per-query top-k window
    # r10 additions: atomic MERGE INTO with per-commit stats pruning,
    # O(delta) incremental OPTIMIZE cycles, persisted word-code BQ index
    "m_merge_upsert",  # merge commit + stats-pruned merge-on-read scan
    "m_optimize_incremental",  # 2 append->optimize cycles, prefix untouched
    "v_bq_index_probe",  # persisted 96-dim word codes, append + probe
    # r11 additions: the CDF reader (pre-image scans pruned by the
    # tombstone bounds each commit records) and the versioned_table
    # stream source drained through the engine (executor-side reads)
    "m_change_feed",  # append -> merge -> delete feed vs SQL reconstruction
    "pipe_stream_source_e2e",  # snapshot+appends+merge-inserts via the source
    "m_multi_prune_scan",  # 2-d stats pruning on a two-column z-ordered table
    # r12 addition: the streaming change feed folded into a downstream
    # table (foreachBatch merge per commit version)
    "pipe_stream_cdf_e2e",
    # r12 addition: key-bloom membership pruning of CDF pre-image
    # recovery on a layout where min/max bounds provably can't prune
    "m_cdf_bloom_scatter",
    # d_kmeans / d_semantic_dedup / v_pq_adc_topk are gate-checked at sf0.01 but not
    # benched: Lloyd-iteration counts are cluster-shape properties, not
    # scan-throughput signals, and would drown the headline in one query
]


def stdout_line(
    cold_total: float,
    warm: dict[str, float],
    n_queries: int,
    reps: int,
    sf_val,
    load_start=(),
    warm_median_total: float = 0.0,
    top_n: int = 8,
) -> str:
    """The ONE line printed to real stdout. The driver's capture keeps
    only a ~2,000-byte TAIL of stdout, so a long line survives with its
    FRONT cut off and parses as null (BENCH_r03..r05 — VERDICT r5 #3).
    Envelope + the ``top_n`` slowest warm medians + a rollup of the
    rest stays well under the tail budget; the full per-query cold/warm
    maps live exclusively in BENCH_local.json."""
    slowest = dict(sorted(warm.items(), key=lambda kv: -kv[1])[:top_n])
    rest = round(sum(v for k, v in warm.items() if k not in slowest), 2)
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(cold_total, 4),
            "unit": "sec",
            "queries": {
                **{k: round(v, 2) for k, v in slowest.items()},
                "_others_warm_total": rest,
            },
            "warm_total": round(sum(warm.values()), 4),
            "warm_median_total": round(warm_median_total, 4),
            "n_queries": n_queries,
            "reps": reps,
            "load_start": list(load_start),
            "sf": sf_val,
            "detail": "BENCH_local.json",
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1500, f"bench stdout line {len(line)}B > 1500B tail budget"
    return line


def main() -> None:
    # Driver-parseability contract (VERDICT r4 #3 / r5 #3: BENCH_r03
    # through r05 all recorded "parsed": null because the stdout JSON
    # line overflowed the driver's ~2,000-byte surviving tail). Three
    # defenses: (1) duplicate the real stdout fd, then point fd 1 at
    # stderr for the whole run so nothing the JVM or a child process
    # prints can precede the JSON line; (2) write the full-precision
    # per-query detail to BENCH_local.json instead of stdout; (3) the
    # printed line is envelope-only (stdout_line above, guarded at
    # 1,500 bytes).
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # Shuffle scratch stays on the default local disk. A /dev/shm
    # redirect was tried in r6 to dodge the host's transient IO stalls
    # and measured SLOWER (d_ngram_jaccard warm 1.2-1.5 s on disk vs
    # 3-8 s on tmpfs across interleaved A/B runs): this box's hypervisor
    # appears memory-overcommitted, so tmpfs page writes trigger host
    # reclaim that costs more than the disk ever did. Leaving the knob
    # to the environment (SPARK_LOCAL_DIRS) rather than hardcoding it.
    # partition-to-data-size discipline: at bench scale (<1 GB) 16 initial
    # shuffle partitions + AQE coalescing beats the 32 default tuned for
    # bigger inputs; override with SPARK_GRAFT_SHUFFLE
    spark = get_spark("bench", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", 16)))
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", 5)))
    here = os.path.dirname(os.path.abspath(__file__))
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    best_path = os.path.join(here, "BENCH_BEST.json")
    try:
        with open(best_path) as f:
            best_all = json.load(f)
    except (FileNotFoundError, ValueError):
        best_all = {}
    sf_best: dict[str, float] = best_all.get(str(sf_val), {})

    def timed(fn) -> float:
        start = time.perf_counter()
        fn(spark, sf_dir).count()
        return time.perf_counter() - start

    # host load at sweep start (VERDICT r8 #7): lets adjudication tell an
    # idle run from a contended one when cross-round warm numbers drift
    load_start = tuple(round(x, 2) for x in os.getloadavg())

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    # warm MEDIAN recorded next to the min (ADVICE r8): min-of-warm is
    # the stall-immune headline, but min alone hides sustained drift
    # below the 1.5x outlier threshold; the median keeps it observable
    warm_median: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        print(f"bench: {name} ...", file=sys.stderr, flush=True)
        runs = [timed(fn) for _ in range(reps)]
        cold[name] = round(runs[0], 4)
        warm_runs = runs[1:] if len(runs) > 1 else runs
        warm[name] = round(min(warm_runs), 4)
        warm_median[name] = round(statistics.median(warm_runs), 4)
        print(
            f"bench: {name} cold={cold[name]}s warm={warm[name]}s",
            file=sys.stderr,
            flush=True,
        )

    # outlier pass: a query whose warm is still >1.5x its best-ever
    # recorded warm (and >0.3 s over it — tiny-query jitter is not a
    # stall) gets re-measured after the sweep, when a transient host
    # storm has usually passed; keep the better number
    reruns = 0
    # every pre-retry value is logged (ADVICE r8): nothing folds into
    # warm/BENCH_BEST without its un-retried number surviving in
    # BENCH_local.json for drift adjudication
    outlier_log: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        prev = sf_best.get(name)
        if prev is None or warm[name] <= max(1.5 * prev, prev + 0.3):
            continue
        reruns += 1
        retry = min(timed(QUERIES[name]) for _ in range(2))
        print(
            f"bench: outlier re-run {name} warm={warm[name]}s best={prev}s retry={round(retry, 4)}s",
            file=sys.stderr,
            flush=True,
        )
        outlier_log[name] = {
            "pre_retry_warm": warm[name],
            "retry": round(retry, 4),
            "best_prev": prev,
        }
        warm[name] = round(min(warm[name], retry), 4)

    # best-ever ledger: monotone per-query min, keyed by sf — one clean
    # round's numbers become the next round's outlier baseline
    for name, w in warm.items():
        prev = sf_best.get(name)
        sf_best[name] = w if prev is None else min(prev, w)
    best_all[str(sf_val)] = sf_best
    with open(best_path, "w") as f:
        json.dump(best_all, f, indent=1, sort_keys=True)
    with open(os.path.join(here, "BENCH_local.json"), "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": round(sum(cold.values()), 4),
                "unit": "sec",
                "queries": cold,
                "queries_warm": warm,
                "queries_warm_median": warm_median,
                "warm_total": round(sum(warm.values()), 4),
                "warm_median_total": round(sum(warm_median.values()), 4),
                "reps": reps,
                "outlier_reruns": reruns,
                "outlier_log": outlier_log,
                "load_start": load_start,
                "sf": sf_val,
            },
            f,
            indent=1,
        )

    line = stdout_line(
        sum(cold.values()),
        warm,
        len(HEADLINE),
        reps,
        sf_val,
        load_start=load_start,
        warm_median_total=sum(warm_median.values()),
    )
    os.write(real_stdout, line.encode() + b"\n")


if __name__ == "__main__":
    main()
