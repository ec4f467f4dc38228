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
    similarity_gate,
    sources_gate,
    star,
    statistics,
    transform_queries,
)
from . import wave6  # noqa: F401  (round-6 additions; imported LAST so new
# queries append to the registry after every already-gated name — keeps
# gate-window rotation order stable)
from . import wave7  # noqa: F401  (round-7 TPC-H completions; after wave6)
from .registry import REGISTRY, register

# ---------------------------------------------------------------------------
# Driver gate-window rotation (round 6).
#
# The driver's correctness gate verifies the FIRST 50 registry entries per
# round; green rows stand once earned, gated queries rotate to the back.
# History: r01 entries 0-49 (47 green, 3 DECIMAL-vs-DOUBLE fails fixed in
# r02); r02 star/transform/dedup/similarity/event families (48/50; HUGEINT
# oracle typing fixed in r03, lint-guarded); r03 source-roundtrip + corpus-
# prep + multimodal + event families (50/50); r04 statistics + graph +
# embedding + relational-skeleton families (50/50); r05 the final 50 of the
# original 250-query backlog — digest twins, stat/dq/wh tails, wave-2/3
# (50/50). Cumulative: 247/250 original-registry queries gated, every row
# green at its gating; the only never-gated originals are the 3 rows-only
# queries (sim_ann_lsh, sim_ivf_topk, mm_frame_sample), which stay out of
# the window by design: with no oracle a gated row is only a weak rows-only
# check, and their geometry is already hash-gated through digest twins
# (mm_frame_sample_digest r03; sim_ann_candidate_digest /
# sim_ann_recall_digest / sim_ivf_cell_digest / agg_sketch_param_digest r05
# — see plans/similarity_gate.py).
#
# ROUND-6 WINDOW: the 50 queries newly registered in round 5 (registry grew
# 250 → 300), in registration order, computed by
# `python tools/gate_rotation.py` (run it at each round start and paste its
# output here).
#
# ROUND-7 WINDOW (this round): per the r06 verdict task 1 —
# `ev_rolling_7d_activity` (the single query whose only driver row is the
# r02 red; fixed in r03, locally green, never re-gated) + 49 of the 67
# round-6 wave6 additions, prioritizing the formula-heavy ones. Base list
# from `tools/gate_rotation.py` (never-gated, registration order) with 5
# formula-heavy remainder entries swapped in (stat_weekly_dft_power,
# stat_ljung_box_weekly, graph_ktruss_edge_support,
# graph_katz_centrality_3step, scale_zorder_file_skipping) and 6 deferred
# to r08 (nation_revenue_rank_migration, agg_hist2d_qty_price,
# dq_column_profile_wide, sim_ann_multiprobe_gain,
# wh_write_audit_publish_digest, ev_ab_power_mde).
#
# ROUND-8 ROTATION PLAN: the never-gated remainder after this round is the
# 12 tool-computed tail entries plus the 6 deferred above (~18 rows) plus
# the round-7 additions in plans/wave7.py (imported last, appended after
# every gated name): pricing_summary_q1, unshipped_topk_q3,
# local_supplier_volume_q5, forecast_revenue_change_q6,
# dedup_verified_keepers, docs_hash_sample_smallest_k,
# docs_shuffle_order_digest, docs_rrf_rank_fusion, docs_curriculum_stages,
# ev_retention_triangle, li_proportional_allocation,
# stat_cross_correlation_lags, trend_haar_wavelet_energy,
# stat_weighted_quartiles_unit_price (registry closes round 7 at 381). Re-run
# tools/gate_rotation.py at the r08 round start and
# paste its window here.
# ---------------------------------------------------------------------------
_GATE_WINDOW = [
    # round-7 window
    "ev_rolling_7d_activity",
    "part_min_cost_supplier_q2",
    "supplier_important_share_q11",
    "supplier_excess_ship_q20",
    "stat_anova_f_price_by_priority",
    "stat_kruskal_wallis_price_by_priority",
    "stat_chow_break_daily_revenue",
    "stat_hodges_lehmann_yoy_shift",
    "stat_weekly_dft_power",
    "stat_ljung_box_weekly",
    "graph_ktruss_edge_support",
    "graph_katz_centrality_3step",
    "scale_zorder_file_skipping",
    "ev_concurrent_sessions_peak",
    "ev_user_lifecycle_weekly",
    "ev_campaign_window_join",
    "trend_rolling28_anomaly_topdays",
    "docs_block_dedup_by_source",
    "docs_stopword_coverage_by_lang",
    "docs_tfidf_top_terms",
    "emb_knn_graph_reciprocity",
    "emb_simplified_silhouette",
    "mm_audio_zero_crossings",
    "mm_image_downsample2x_digest",
    "graph_jaccard_link_prediction",
    "dq_histogram_drift_l1",
    "src_codec_roundtrip_digest",
    "supplier_late_blame_q21",
    "elt_pivot_priority_year_sql",
    "elt_lateral_explode_sql",
    "ev_sliding_1h15m_peak",
    "stat_levene_brown_forsythe",
    "trend_ewma32_daily_revenue",
    "part_pair_association_topk",
    "ev_longest_error_streak",
    "stat_approx_percentile_contract",
    "trend_decomposition_monthly",
    "stat_group_quantiles_by_priority",
    "stat_hll_monthly_merge",
    "ev_simpsons_paradox_check",
    "src_csv_malformed_recovery_digest",
    "ev_replay_dedup_digest",
    "stat_cms_part_heavyhitters",
    "stat_kmv_intersection_years",
    "ev_rolling28_mau",
    "ev_funnel_anyorder",
    "cust_order_cohort_revenue",
    "trend_range7d_revenue",
    "src_dynamic_partition_overwrite_digest",
    "li_pareto_cum_share",
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
