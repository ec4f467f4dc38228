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
# ROUND-7 ROTATION PLAN: round 6 grew the registry 300 → 367 (all new
# entries in plans/wave6.py, imported last → appended in registration
# order). After the driver gates this round's window, the never-gated set
# is the 67 round-6 additions (+ the 3 rows-only originals). Re-run
# tools/gate_rotation.py at the r07 round start and paste its window here —
# it computes everything from CORRECTNESS_r*.json history automatically.
# ---------------------------------------------------------------------------
_GATE_WINDOW = [
    # round-6 window: the 50 round-5 additions, registration order
    "trend_wow_revenue_growth",
    "supplier_revenue_rank_profile",
    "trend_seasonal_index_monthly",
    "ev_ab_test_conversion",
    "ev_funnel_time_window",
    "text_token_fertility_by_lang",
    "ev_inter_event_gap_hist",
    "ev_stickiness_dau_mau",
    "wh_scd2_asof_resolve",
    "trend_backtest_ma3_mae",
    "ev_ab_srm_check",
    "ev_heatmap_hour_dow",
    "stat_poisson_dispersion_daily_orders",
    "docs_packing_fill_stats",
    "mm_audio_silence_windows",
    "mm_image_brightness_hist",
    "ev_bot_rate_heuristic",
    "text_readability_by_lang",
    "ev_bounce_rate_daily",
    "dq_freshness_lag",
    "wh_retention_policy_digest",
    "mm_image_contrast_stats",
    "docs_ttr_by_source",
    "text_char_trigram_entropy_by_lang",
    "wh_gdpr_erasure_digest",
    "docs_contamination_by_split",
    "emb_isotropy_mean_cosine",
    "emb_exact_dup_sizes",
    "graph_label_propagation",
    "graph_degree_distribution",
    "graph_clustering_coeff_hist",
    "graph_degree_assortativity",
    "graph_bfs_layers",
    "supplier_return_blame",
    "cust_returned_revenue_top",
    "part_supplier_cnt_q16",
    "mkt_share_nation_q8",
    "profit_nation_year_q9",
    "li_ship_latency_by_priority",
    "emb_jl_projection_distortion",
    "src_schema_evolution_digest",
    "wh_late_arriving_dim",
    "stat_hll_distinct_custkeys",
    "stat_mann_kendall_daily_revenue",
    "stat_cohens_d_price_by_status",
    "stat_theilsen_monthly_revenue",
    "stat_kendall_tau_revenue_orders",
    "ev_markov_3step_mass",
    "ev_session_duration_percentiles",
    "stat_bootstrap_ci_daily_revenue",
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
