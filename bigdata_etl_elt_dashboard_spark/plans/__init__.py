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
from . import wave8  # noqa: F401  (round-8 additions; after wave7)
from . import wave9  # noqa: F401  (round-9 additions; after wave8)
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
# ROUND-8 WINDOW (this round): per the r07 verdict task 1 — close the gate
# backlog for good. Entries 1-32 are the full never-gated oracle-backed
# remainder from `tools/gate_rotation.py` (18 wave6 tail incl. the 6
# r07-deferred + the 14 wave7 additions). Entries 33-48 are re-gates of the
# oldest formula-heavy green rows whose last driver word is r01/r02 (5+
# refactor rounds old): the MinHash/LSH/Jaccard/SimHash/embedding dedup
# chain, cosine similarity pair/top-k, TF-IDF/fingerprint/lang-id/quality
# text family, RFM/IQR/cohort statistics. Entries 49-50 are the round-8
# additions themselves (plans/wave8.py: the timer-processor batch twin and
# the composed corpus capstone), gated in their own round. After this
# round every oracle-backed registry query has a green driver row and the
# never-gated set is exactly the 3 rows-only digest-twinned originals.
#
# ROUND-9 ROTATION PLAN: both round-8 additions are gated IN this window,
# so the never-gated remainder entering r09 is exactly the 3 rows-only
# digest-twinned originals — gate any round-9 additions first, then fill
# remaining slots with re-gates of the next-oldest standing green rows
# (r02-era star/transform/event families, then r03 source/corpus rows).
# Re-run tools/gate_rotation.py at the r09 round start and paste its window
# here. Low-cardinality PARTITION BY window audit (done r08, plan-verified):
# every rank-LIMIT site (rn <= k filter) — topk_orders_per_region,
# docs_stratified_sample, docs_cap_per_source (+ its use inside the e2e
# digests), docs_tfidf_top_terms — gets Catalyst's WindowGroupLimit
# (Partial map-side top-k BEFORE the shuffle, verified 2 spans in the
# physical plan), so only k×n_partitions rows ever reach a hot group's
# task: natively scale-safe, no rewrite needed. Windows over already-
# aggregated dim-bounded frames (text_langid_confusion) are bounded by
# construction. The ONLY full-ranking low-cardinality site is
# agg_window_function_suite — intentionally so: it demonstrates the whole
# window-function surface in one keyed pass (its doc says one WindowExec).
# FULL per-group ranks / prefix sums over row-bearing low-card groups are
# the real funnel; those ride operators/scale.grouped_rank /
# grouped_running_sum (added r08; corpus_pipeline_v2_digest uses both).
# ---------------------------------------------------------------------------
_GATE_WINDOW = [
    "nation_revenue_rank_migration",
    "agg_hist2d_qty_price",
    "dq_column_profile_wide",
    "sim_ann_multiprobe_gain",
    "wh_write_audit_publish_digest",
    "ev_ab_power_mde",
    "emb_prefix_dim_recall",
    "trend_max_drawdown_daily",
    "li_vwap_part_month",
    "wh_merge_delete_branch_digest",
    "stat_weekly_block_maxima",
    "stat_turning_points_test",
    "graph_rich_club_coefficient",
    "stat_sign_test_paired_months",
    "emb_ivf_cell_purity",
    "src_nested_json_roundtrip_digest",
    "stat_mad_robust_outlier_days",
    "trend_backtest_snaive_mase",
    "pricing_summary_q1",
    "unshipped_topk_q3",
    "local_supplier_volume_q5",
    "forecast_revenue_change_q6",
    "dedup_verified_keepers",
    "docs_hash_sample_smallest_k",
    "docs_shuffle_order_digest",
    "docs_rrf_rank_fusion",
    "docs_curriculum_stages",
    "ev_retention_triangle",
    "li_proportional_allocation",
    "stat_cross_correlation_lags",
    "trend_haar_wavelet_energy",
    "stat_weighted_quartiles_unit_price",
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_jaccard_pairs",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "sim_topk_cosine",
    "sim_threshold_pairs",
    "text_tfidf_top_terms",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_len_percentiles_by_lang",
    "cust_rfm_segments",
    "tr_clip_iqr",
    "ev_cohort_retention",
    # r08 additions, gated in their own round (plans/wave8.py)
    "ev_timer_session_close_twin",
    "corpus_pipeline_v2_digest",
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
