"""Query plans: the engine's public query surface.

``registry`` holds every implemented query/operator; ``analytics`` (DataFrame
API) and ``elt`` (pure spark.sql) populate it. ``__spark_entry__`` at the
repo root exposes the registry to the driver's correctness gate.
"""

from . import (  # noqa: F401  (import for registration side effects)
    analytics,
    corpus_quality,
    corpus_spans,
    elt,
    extensions,
    iterative,
    relational,
    sources_gate,
    star,
    statistics,
    transform_queries,
)
from .registry import REGISTRY, register

# ---------------------------------------------------------------------------
# Driver gate-window rotation (round 3).
#
# The driver's correctness gate verifies the FIRST 50 registry entries per
# round. History: r01 gated entries 0-49 in import order (47 green, 3
# DECIMAL-vs-DOUBLE fails, fixed in r02); r02 gated the star/transform/
# dedup/similarity/event families (48/50 green; the one hash fail,
# ev_rolling_7d_activity, was DuckDB HUGEINT typing drift, fixed this round
# across all 21 affected oracles + guarded by the oracle output-type lint in
# tests/test_oracle_parity.py). Green r01/r02 rows stand; those queries
# rotate to the back.
#
# This round's window = the two NEW source/sink roundtrip gates (the
# S-family's first driver rows) + the first 48 never-driver-gated queries in
# registration order: the corpus-prep (docs_*), drift/entropy (text_*),
# multimodal decode (mm_*), dedup-observability, and event-analytics
# families. The three rows-only queries (sim_ann_lsh, sim_ivf_topk,
# mm_frame_sample) stay deferred — no oracle, weaker rows-only row either
# way; mm_frame_sample's geometry IS hash-gated this round via its new
# mm_frame_sample_digest twin.
#
# ROUND-4 ROTATION PLAN (57 queries remain ungated after this window; put
# the first 50 in registration order into the r04 window, the last 7 plus
# the rows-only trio's weak rows into r05 or wherever slots free up):
#   sim_ann_lsh, sim_ivf_topk, mm_frame_sample (rows-only trio),
#   dedup_lsh_scurve_validation, docs_repetition_metrics,
#   docs_gopher_quality_filter, docs_oov_rate, docs_split_counts,
#   emb_dim_stats, emb_quantize_error, supplier_pareto_cumshare,
#   text_unigram_logprob, emb_l2_norm_stats, docs_dsir_weights,
#   docs_zipf_fit, emb_covariance_top_pairs, docs_heaps_law_fit,
#   docs_duplicate_ngram_spans, docs_ngram_containment, docs_token_rarity,
#   dedup_semdedup_prune, docs_pmi_collocations, sim_kmeans_lloyd1,
#   graph_pagerank_3iter, graph_copurchase_triangles, orders_returned_semi,
#   cust_big_basket_orders, cust_idle_rich_anti, part_supplier_diversity,
#   supplier_top_quarter_revenue, set_ops_all_part_multisets,
#   wh_snapshot_delta_orders, star_one_big_table, stat_corr_discount_qty,
#   stat_ols_price_vs_qty, stat_mad_outlier_counts,
#   stat_daily_zscore_anomaly, stat_markov_transitions,
#   stat_equidepth_hist_totalprice, stat_countmin_heavy_hitters,
#   stat_chi2_priority_status, stat_kmv_distinct_custkeys,
#   stat_bloom_customer_probe, dq_k_anonymity_customer,
#   stat_ks_price_by_status, stat_welch_t_price_by_status,
#   supplier_nation_herfindahl, stat_gini_user_activity,
#   stat_autocorr_daily_revenue, dq_benford_first_digit,
#   li_return_rate_wilson, stat_cusum_daily_revenue, li_basket_type_lift,
#   stat_runs_test_daily_revenue, wh_orders_checksum, ev_error_rate_pchart,
#   stat_mannwhitney_price_by_status,
#   plus the queries ADDED in round 3 after this window froze:
#   sim_hard_negatives, scale_global_rank_orders, emb_pca_project,
#   src_jsonl_roundtrip_digest, docs_data_card, wh_merge_upsert_orders,
#   ev_top_session_paths, emb_pq_encode_stats, src_orc_roundtrip_digest,
#   dedup_lsh_precision_recall, ev_cohort_ltv, docs_bpe_train_merges
#   (the 15 stat_*/dq_*/wh_* entries here carried the HUGEINT oracle bug —
#   already cast + lint-guarded this round, so their r04 rows start green).
# ---------------------------------------------------------------------------
_GATE_WINDOW = [
    # NEW this round: source/sink roundtrip digests (S1/S6 + S7/S8)
    "src_csv_roundtrip_digest",
    "src_table_roundtrip_digest",
    # never-gated queries, registration order
    "li_value_share_parts",
    "li_last_shipper_blame",
    "trend_price_percentile_bands",
    "mm_frame_sample_digest",
    "mm_decode_channel_stats",
    "docs_sequence_packing",
    "docs_decontaminate",
    "docs_pii_redaction",
    "docs_vocab_top_terms",
    "docs_quality_percentile_filter",
    "scd2_customer_segments",
    "ev_dedup_tolerance",
    "ent_resolve_part_names",
    "docs_mixture_plan",
    "trend_gapfill_monthly_big_orders",
    "fe_target_encode_priority",
    "dedup_clusters_star",
    "docs_chunking",
    "dedup_incremental_batch",
    "text_mixed_lang",
    "agg_weighted_avg_unit_price",
    "ev_daily_volume_anomaly",
    "tr_unpivot_kpis",
    "dq_profile_orders",
    "docs_sequence_packing_sharded",
    "trend_ma3_revenue",
    "dq_full_outer_reconcile",
    "ev_funnel_strict_steps",
    "trend_ema12_revenue",
    "mm_audio_channel_stats",
    "agg_window_function_suite",
    "docs_cap_per_source",
    "ev_session_overlap_pairs",
    "text_hellinger_source_drift",
    "docs_bpe_pair_counts",
    "dedup_cluster_size_hist",
    "mm_decode_mixed_codecs",
    "dedup_minhash_estimate_error",
    "ev_pit_features_at_purchase",
    "dedup_lsh_bucket_skew",
    "ev_attribution_linear_7d",
    "dedup_quality_impact",
    "dedup_threshold_sweep",
    "ev_new_vs_returning_daily",
    "ev_dau_wau_stickiness",
    "ev_user_behavior_entropy",
    "text_jsd_source_drift",
    "ev_out_of_order_profile",
]


def _reorder(registry: dict, window: list[str]) -> None:
    missing = [n for n in window if n not in registry]
    if missing:
        raise ValueError(f"gate window names not in registry: {missing}")
    tail = [n for n in registry if n not in set(window)]
    ordered = {n: registry[n] for n in window + tail}
    registry.clear()
    registry.update(ordered)


_reorder(REGISTRY, _GATE_WINDOW)

__all__ = ["REGISTRY", "register"]
