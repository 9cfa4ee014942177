"""Regenerate docs/PLANS.md: captured `.explain("formatted")` trees for
the headline plans at sf0.01. Usage:

    python tools/capture_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhw3d_detection_spark import queries as Q  # noqa: E402
from mhw3d_detection_spark.session import get_spark  # noqa: E402

PLANS = [
    "q_mhw_pipeline",
    "q_mhw_pipeline_dense",
    "q_pooled_grid_clim",
    "q_similarity_topk",
    "q_dedup_minhash_pairs",
    "q_dedup_embedding_lsh",
    "q_event_rank_return",
    "q_autocorr",
    "q_inverted_index",
    "q_cooc_pmi",
    "q_dup_span_frac",
    "q_area_weighted_stats",
    "q_clim_partial_merge",
    "q_annual_event_trends",
    "q_source_overlap",
    "q_semantic_dedup",
    "q_token_cardinality",
    "q_token_countmin",
    "q_length_quantile_sketch",
    "q_decontaminate_bloom",
    "q_quality_classifier",
    "q_curate_corpus",
    "q_dedup_simhash_pairs",
    "q_similarity_topk_int8",
    "q_similarity_ivf_int8",
    "q_bm25_topk",
    "q_bpe_merge_pairs",
    "q_hybrid_retrieval_rrf",
    "q_dedup_winnowing",
    "q_similarity_pq_adc",
    "q_similarity_ivfpq",
    "q_retrieval_pipeline",
    "q_cusum_changepoint",
    "q_dedup_setsim_prefix",
    "q_join_salted",
    "q_data_quality",
    "q_embed_pca_power",
    "q_retrieval_mmr",
    "q_ewma_smooth",
    "q_despike_mad",
    "q_quantile_normalize",
    "q_source_divergence",
    "q_spatial_regrid",
    "q_knn_classify",
    "q_hard_negatives",
    "q_embed_outliers",
    "q_dedup_keep_best",
    "q_dsir_select",
    "q_retrieval_ndcg",
    "q_dedup_snapshot_delta",
    "q_retrieval_mrr",
    "q_tokenizer_fertility",
    "q_ann_index_delta",
    "q_tpch_q5_shape",
    "q_embedding_drift_psi",
    "q_token_triangles",
    "q_text_drift_psi",
    "q_trend_bootstrap_ci",
    "q_ks_drift",
    "q_containment_pairs",
    "q_theilsen_trend",
    "q_kcenter_sample",
    "q_harmonic_clim",
    "q_wasserstein_drift",
    "q_mann_kendall",
    "q_vocab_growth",
    "q_curriculum_buckets",
    "q_mean_excess",
    "q_xcorr_lagged",
    "q_token_burstiness",
    "q_dedup_cluster_stats",
    "q_split_leakage",
    "q_source_dedup_matrix",
    "q_boilerplate_frac",
    "q_trimmed_mean",
    "q_retrieval_map",
    "q_dedup_report",
    "q_srp_lsh_pairs",
    "q_token_gini",
    "q_keyness_llr",
    "q_zipf_fit",
    "q_source_overlap_matrix",
    "q_mutual_nn",
    "q_dedup_edit_verify",
    "q_mann_kendall_z",
    "q_dau_hll",
    "q_source_quality_cusum",
    "q_srp_dedup_apply",
    "q_text_normalize",
    "q_dedup_normalized",
    "q_weighted_containment",
    "q_corpus_report",
    "q_component_split",
    "q_quality_length_spearman",
    "q_gate_agreement_kappa",
    "q_training_manifest",
    "q_source_ks_drift",
    "q_funnel_ab_z",
    "q_srp_calibration",
    "q_seasonal_mk",
    "q_source_ks_fdr",
    "q_chi2_independence",
    "q_anova_length",
    "q_kendall_tau",
    "q_silhouette",
    "q_embed_norm_audit",
    "q_lang_confusion",
    "q_drift_report",
    "q_event_transitions",
    "q_benford_digits",
    "q_tpch_q1_shape",
    "q_tpch_q3_shape",
    "q_token_clustering",
    "q_readability",
    "q_load_profile",
    "q_events_report",
    "q_join_full_outer",
    "q_agg_cube",
    "q_corr_matrix",
    "q_session_stats",
    "q_spatial_moran",
    "q_gpd_moments",
    "q_variance_decomposition",
    "q_weekly_trend",
    "q_user_rfm",
    "q_session_entry_exit",
    "q_volume_anomalies",
    "q_centroid_distances",
    "q_dedup_sentences",
    "q_funnel_bootstrap_ci",
    "q_topk_with_ties",
    "q_cohort_ltv",
    "q_tpch_q6_shape",
    "q_window_drift",
    "q_mann_whitney",
    "q_gumbel_topk_sample",
    "q_balanced_downsample",
    "q_source_simpson",
    "q_markov_entropy",
    "q_tukey_outliers",
    "q_temporal_split",
    "q_bootstrap_mean_diff",
    "q_coverage_curve",
    "q_js_divergence",
    "q_source_scorecard",
    "q_dau_mau_stickiness",
    "q_json_extract",
    "q_json_null_contract",
    "q_tpch_q14_shape",
    "q_tpch_q19_shape",
    "q_tpch_q9_shape",
    "q_kruskal_wallis",
    "q_levene_bf",
    "q_survival_km",
    "q_survival_km_cohort",
    "q_survival_logrank",
    # r13: correlated-subquery family (decorrelation evidence), the
    # composed survival report, SCD2, and the lifecycle DQ screen
    "q_tpch_q2_shape",
    "q_tpch_q4_shape",
    "q_tpch_q13_shape",
    "q_tpch_q16_shape",
    "q_tpch_q17_shape",
    "q_tpch_q18_shape",
    "q_tpch_q20_shape",
    "q_tpch_q21_shape",
    "q_tpch_q22_shape",
    "q_survival_report",
    "q_scd2_intervals",
    "q_order_lifecycle_dq",
]

HEADER = """# Physical plans — explain evidence

Captured `.explain("formatted")` operator trees for the headline plans
(sf0.01 inputs; regenerate with `python tools/capture_plans.py`). What
to look for, per README's scale design: parquet scans carry
PushedFilters / pruned ReadSchema; the clim dim enters severity via
BroadcastHashJoin (one row per cell in the array form); the production
grid+arrays clim is a fused two-aggregate cascade — (cell, doy) day
groups then a per-cell collect, no Generate/explode, no persist
barrier, all pooling as per-cell higher-order functions (the row-form
grid plan keeps the explode + persisted day-group shape); the
detection tail is one per-(cell, run) partial aggregate fed directly
by the enrich window (no exchange between them — the SortAggregate
there reflects the struct-ordered argmax buffers, its Sort riding the
window's partitioning), with event assembly and the metric merge on
the tiny runs table; top-k shows the two-phase salted windows;
ranking shows rangepartitioning + a per-partition rank (no
single-partition window over the data). These shapes are pinned by
tests/test_plan_shape.py.
"""


#: everything from this line on in docs/PLANS.md is hand-written
#: analysis (profiling notes, audit summaries) and survives regeneration
NOTES_MARKER = "<!-- NOTES -->"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plans")
    out = [HEADER]
    for name in PLANS:
        df = Q.REGISTRY[name].spark_fn(spark, sf_dir)
        tree = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # keep the operator tree, drop the verbose per-node detail dump
        tree = tree.split("\n\n\n")[0].rstrip()
        out.append(f"## {name}\n\n```\n{tree}\n```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "PLANS.md")
    notes = ""
    if os.path.exists(path):
        old = open(path).read()
        if NOTES_MARKER in old:
            notes = old[old.index(NOTES_MARKER):]
    with open(path, "w") as f:
        f.write("\n".join(out))
        if notes:
            f.write("\n" + notes)
    print(f"wrote {path} ({len(PLANS)} plans, notes preserved: {bool(notes)})")


if __name__ == "__main__":
    main()
