"""Round-14 optimization equivalence twins + plan-shape pins.

Each r14 optimization rewrote a query/operator's INTERNALS while keeping
its results bit-identical (OPTIMIZATION_r14.md). These tests pin both
halves: the optimized form still equals the pre-r14 formulation
(equivalence twins, the same discipline as the salted-vs-unsalted tests),
and the plan property the optimization bought stays bought (shape pins,
so a refactor can't silently reintroduce the measured pathology).
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from bigdata_etl_elt_dashboard_spark.operators.scale import pin
from bigdata_etl_elt_dashboard_spark.plans import REGISTRY
from bigdata_etl_elt_dashboard_spark.sources.catalog import table


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# agg_sketch_param_digest: distinct count split from imperative buffers
# ---------------------------------------------------------------------------


def test_sketch_digest_split_equals_colocated_form(spark, sf_smoke):
    """The split (non-distinct ⋈ distinct) form returns exactly the rows of
    the pre-r14 co-located aggregation."""
    ev = table(spark, sf_smoke, "events")
    colocated = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx_users"),
            F.percentile_approx("value", 0.5, 10_000).alias("_approx_median"),
            F.expr("percentile(value, 0.4)").alias("_p40"),
            F.expr("percentile(value, 0.6)").alias("_p60"),
        )
        .select(
            "event_type",
            "n_events",
            "exact_users",
            (
                F.abs(F.col("_approx_users") - F.col("exact_users")) * 10
                <= F.col("exact_users")
            ).alias("users_within_5rsd"),
            (
                (F.col("_approx_median") >= F.col("_p40"))
                & (F.col("_approx_median") <= F.col("_p60"))
            ).alias("median_within_p40_p60"),
        )
        .orderBy("event_type")
    )
    optimized = REGISTRY["agg_sketch_param_digest"].fn(spark, sf_smoke)
    assert _rows(optimized) == _rows(colocated)


def test_sketch_digest_no_buffers_on_distinct_key_groups(spark, sf_smoke):
    """The measured pathology was the 4-phase plan building percentile/HLL
    buffers per (event_type, user_id) group: an ObjectHashAggregate whose
    grouping keys include user_id. The split form must not produce one."""
    import re

    df = REGISTRY["agg_sketch_param_digest"].fn(spark, sf_smoke)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for m in re.finditer(r"\(\d+\) ObjectHashAggregate[^\n]*\n((?:[A-Z][^\n]*\n)*)", plan):
        detail = m.group(0)
        keys = re.search(r"Keys \[\d+\]: \[([^\]]*)\]", detail)
        if keys and "user_id" in keys.group(1):
            pytest.fail(
                "imperative-buffer aggregate keyed on user_id — the r14 "
                "4-phase pathology is back:\n" + detail
            )


# ---------------------------------------------------------------------------
# _doc_metrics / quality_metrics: staged shared expressions
# ---------------------------------------------------------------------------


def test_doc_metrics_single_bigram_transform(spark, sf_smoke):
    """The bigram transform must be evaluated once per row (pre-r14: 4×)."""
    df = REGISTRY["docs_repetition_metrics"].fn(spark, sf_smoke)
    # final-plan node details: every Project's output expressions. The
    # whole formatted output (final section) must inline `transform(` at
    # most once per projection chain — with the staged form, exactly once.
    full = io.StringIO()
    with contextlib.redirect_stdout(full):
        df.explain("formatted")
    final_section = full.getvalue().split("== Initial Plan ==")[0]
    assert final_section.count("transform(") <= 1, (
        "bigram transform inlined multiple times — staging collapsed"
    )


def test_quality_metrics_single_tokenizer_split(spark, sf_smoke):
    """text_quality's tokenizer split must appear once (pre-r14: 6×)."""
    df = REGISTRY["text_quality"].fn(spark, sf_smoke)
    full = io.StringIO()
    with contextlib.redirect_stdout(full):
        df.explain("formatted")
    final_section = full.getvalue().split("== Initial Plan ==")[0]
    assert final_section.count("split(") <= 1, (
        "tokenizer split re-inlined — staging collapsed"
    )


def test_quality_metrics_equals_inline_form(spark, sf_smoke):
    """Staged quality metrics == the pre-r14 single-projection formulation."""
    from bigdata_etl_elt_dashboard_spark.operators.text import (
        LANG_STOPWORDS,
        punct_count,
        stopword_hits,
        token_count,
    )
    from bigdata_etl_elt_dashboard_spark.operators import text as X

    docs = table(spark, sf_smoke, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_tokens = token_count(t)
    sw = stopword_hits(t, LANG_STOPWORDS["en"])
    punct_ratio = punct_count(t) / F.nullif(n_chars.cast("double"), F.lit(0.0))
    stop_ratio = sw / F.nullif(n_tokens.cast("double"), F.lit(0.0))
    mean_tok_len = (F.length(F.regexp_replace(t, r"\s+", ""))) / F.nullif(
        n_tokens.cast("double"), F.lit(0.0)
    )
    bucket = (
        F.when((n_tokens < 5) | (mean_tok_len > 15), "poor")
        .when(stop_ratio >= 0.05, "good")
        .otherwise("fair")
    )
    inline = docs.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        bucket.alias("quality_bucket"),
    )
    assert _rows(X.quality_metrics(docs)) == _rows(inline)


# ---------------------------------------------------------------------------
# graph_pagerank_3iter: long node ids, names derived at the tail
# ---------------------------------------------------------------------------


def test_pagerank_long_ids_equal_string_id_twin(spark, sf_smoke):
    """The long-keyed iteration chain reproduces the pre-r14 string-keyed
    chain exactly (same integer rank algebra, same final top-20)."""
    from bigdata_etl_elt_dashboard_spark.plans.iterative import (
        _PR_ITERS,
        _PR_UNITS,
    )

    li = table(spark, sf_smoke, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    pn = F.concat(F.lit("P"), F.col("p").cast("string"))
    sn = F.concat(F.lit("S"), F.col("s").cast("string"))
    edges = (
        e0.select(pn.alias("src"), sn.alias("dst"))
        .unionAll(e0.select(sn.alias("src"), pn.alias("dst")))
        .transform(pin)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).transform(pin)
    n_nodes = deg.count()
    base = (_PR_UNITS * 15) // (100 * n_nodes)
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(_PR_UNITS // n_nodes).alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(F.col("dst"), F.expr("(r * 85) div (100 * deg)").alias("c"))
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(base) + F.sum("c")).alias("r")
        )
    twin = (
        ranks.select("node", F.col("r").alias("rank_units"))
        .orderBy(F.desc("rank_units"), "node")
        .limit(20)
    )
    optimized = REGISTRY["graph_pagerank_3iter"].fn(spark, sf_smoke)
    assert optimized.collect() == twin.collect()


# ---------------------------------------------------------------------------
# sim_kmeans_lloyd1: staged assignment struct
# ---------------------------------------------------------------------------


def test_kmeans_staged_struct_single_arraymin_per_field_pair(spark, sf_smoke):
    """Reading lbl and d2 must share ONE array_min evaluation: the final
    plan evaluates at most 2 array_min sites (a0's assignment + the staged
    best1), never 3 (the pre-r14 per-field duplication)."""
    df = REGISTRY["sim_kmeans_lloyd1"].fn(spark, sf_smoke)
    full = io.StringIO()
    with contextlib.redirect_stdout(full):
        df.explain("formatted")
    final_section = full.getvalue().split("== Initial Plan ==")[0]
    assert final_section.count("array_min(") <= 2, (
        "assignment struct re-inlined per field — staging collapsed"
    )
