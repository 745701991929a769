"""Dump formatted physical plans for the headline queries into
PLANS.md — the plan-shape evidence (pushed filters, broadcasts, no
cartesian products, exchange counts) that the per-query docstrings
claim. Regenerate after any operator change:

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

KEYS = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "nation_pair_volume",
    "gold_kpi_component_tier",
    "asof_join_orders_events",
    "range_join_events",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_bruteforce_topk",
    "training_corpus_filter",
    "snapshot_diff",
    "sessionize_events",
    "neardup_embedding_cosine",
    "pii_redact",
    "vocab_stats",
    "national_market_share",
    "excess_supply_suppliers",
    "decontaminate_bloom",
    "dsir_importance_weights",
    "semdedup",
    "q6_forecast_revenue",
    "bpe_pair_counts",
    "cross_source_overlap",
    "quality_classifier",
    "concurrent_sessions",
    "trailing_window_user_value",
    "dq_violations",
    "ttr_stats",
    "weighted_sample",
    "plan_token_shards",
    "embedding_norm_outliers",
    "edit_distance_pairs",
    "bigram_perplexity",
    "winnow_overlap_pairs",
    "source_drift_kl",
    "revenue_concentration",
    "event_path_match",
    "session_window_batch",
    "cross_split_leakage",
    "variant_events",
    "unpivot_lineitem_metrics",
    "time_weighted_value",
    "vocab_coverage",
    "duplication_profile",
    "tokenizer_fertility",
    "hard_negative_mining",
    "modality_qa_join",
    # round 3 additions
    "gopher_quality_rules",
    "doc_entropy",
    "zipf_slope",
    "term_source_association",
    "embedding_covariance",
    "event_dedup_windowed",
    "kmv_distinct_terms",
    "cms_term_counts",
    "label_association_rules",
    "daily_anomaly_events",
    "mixture_resample",
    "redact_contaminated_spans",
    "event_order_inversions",
    "weighted_median_price",
    "weighted_quantiles_price",
    "length_bucketed_batches",
    "source_interleave_plan",
    "yoy_revenue",
    # round 3 continuation (this session)
    "supplier_cosupply_triangles",
    "part_copurchase_lift",
    "equi_depth_histogram",
    "table_stats_mart",
    "attribution_touchpoints",
    "ewma_user_value",
    "term_cooccurrence_pmi",
    "feature_hash_counts",
    "pca_top_component",
    "bpe_merge_learning",
    "bm25_topk",
    "rrf_hybrid_topk",
    "seasonal_decompose_daily",
    "cusum_changepoint",
    "corr_matrix_lineitem",
    "join_key_skew",
    "bpe_tokenize_stats",
    "ab_test_conversion",
    "supplier_neighbor_jaccard",
    # round 4
    "gold_sla_stability",
    "customer_rfm",
    "order_seasonality",
    "lsh_recall_vs_exact",
    "embedding_decontaminate",
    "dedup_exact_substrings",
    # round 5
    "gold_sla_mom",
    "weighted_median_price",
    "weighted_quantiles_price",
    "substring_phase_audit",
    "minhash_calibration",
    "quality_length_bias",
    "pack_efficiency",
    "dedup_cluster_size_profile",
    "media_dedup_stats",
    # round 5 second wave
    "hll_distinct_terms",
    "quantile_sketch_price",
    "dedup_against_index",
    "neardup_against_index",
    "token_budget_apportionment",
    "curriculum_plan",
    "span_corruption_plan",
    "normalization_impact",
    "holt_linear_daily",
    "rendezvous_shard_plan",
    "benford_first_digit",
    "gini_revenue",
    "ks_promo_price",
    "autocorr_daily",
    "boilerplate_prefix_stats",
    "bloom_fpr_audit",
    "event_entropy_rate",
    "markov_stationary_events",
    "vocab_growth_curve",
    "simpson_diversity_by_source",
    "contingency_dependence",
    "lorenz_deciles",
    "fano_daily_dispersion",
    "stopword_mass_by_source",
    "theil_hoover_indices",
    "referential_integrity_audit",
    "k_anonymity_audit",
    "forecast_backtest_holt",
    "source_vocab_overlap",
    "anova_price_by_returnflag",
    "embedding_sim_histogram",
    "minhash_band_tuning",
    "fulfillment_latency_percentiles",
    "user_survival_curve",
    "quality_temporal_drift",
    "pareto_frontier_parts",
    "market_concentration_hhi",
    "aov_mix_shift_bridge",
    "ivf_nprobe_recall_curve",
    "jaccard_threshold_sweep",
    "time_to_conversion",
    # round 5 closing wave
    "mmr_diverse_topk",
    "detector_kappa",
    "hll_union_overlap",
    "theil_sen_trend",
    "ann_ndcg_at_k",
    "mann_whitney_price",
    "spearman_daily_trend",
    "classifier_calibration",
    "trimmed_winsorized_price",
    "containment_pairs",
    "epoch_shuffle_plan",
    "markov_attribution",
    "bot_regularity_flags",
    "rake_keyphrases",
    "shapley_attribution",
    "incremental_mart_rebuild",
    "functional_dependency_audit",
    "pq_codebook_stats",
    "pq_adc_recall",
    "quality_rank_normalize",
    "order_total_reconciliation",
    "idf_jaccard_pairs",
    "table_checksum_manifest",
    "embedding_dup_clusters",
    "embedding_dup_clusters_banded",
    "banded_neardup_recall",
    "embedding_band_skew_audit",
    "term_burst_detection",
    # r6 additions
    "mad_anomaly_events",
    "mad_anomaly_from_counts_daily",
    "hits_hub_authority",
    "shard_local_dedup_loss",
    "lsh_bucket_skew_audit",
    "tail_head_overlap_pairs",
    "memorization_risk_ngrams",
    "quality_decile_lift",
    "ann_mrr_at_k",
    "event_freshness_mart",
    "ngram_kneser_ney_counts",
    "source_pair_dup_matrix",
    "stitch_against_index",
    "watermark_lateness_audit",
    "ab_srm_check",
    "cluster_chaining_audit",
    "pii_rate_by_source",
    # r8 addition: the streaming tier's driver surface (D12 drain + D33 readout)
    "stream_daily_anomaly_readout",
    "stream_freshness_readout",
    "stream_reconciliation_readout",
    "stream_dedup_index_readout",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.plans.introspect import _plan_str
    from github_issues_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", cpus=8, shuffle_partitions=8)
    qs = Q.queries()

    out = [
        "# Physical plans (generated by tools/dump_plans.py)",
        "",
        f"Scale factor dir: `{sf_dir}`. Summary per query: shuffle/broadcast",
        "exchange counts, whether filters reached the parquet scan, and the",
        "full formatted plan.",
        "",
    ]
    for key in KEYS:
        plan = _plan_str(qs[key](spark, sf_dir))
        n_shuffle = len(re.findall(r"\(\d+\) Exchange\b", plan))
        n_bcast = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
        pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
        cartesian = "CartesianProduct" in plan
        out += [
            f"## {key}",
            "",
            f"- shuffle exchanges: {n_shuffle}, broadcast exchanges: {n_bcast}",
            f"- scans with pushed filters: {pushed}; cartesian product: {cartesian}",
            "",
            "```",
            plan.strip(),
            "```",
            "",
        ]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(KEYS)} plans)")


if __name__ == "__main__":
    main()
