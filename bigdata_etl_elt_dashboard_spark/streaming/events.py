"""Event-stream analytics (SURVEY §2.12, §7.5 extension).

The reference is batch-only; this module adds the streaming surface the
build target mandates. Every windowed aggregation exists in TWO forms with
identical semantics:

- a **batch** form (plain groupBy over the parquet `events` table) — this is
  what `queries()` registers, so the DuckDB oracle can check the windowing
  math (date_trunc / gaps-and-islands SQL);
- a **streaming** form (readStream + withWatermark + the same window
  expression) — exercised by tests/test_streaming.py with a rate/file
  source, proving the operators run under the micro-batch engine with
  late-data drop.

Spark's window()/session_window() produce identical results in batch and
streaming mode for on-time data (the watermark only governs state eviction
and late drops), which is what makes this dual registration honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact_agg import MICROS, xsum


def tumbling_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time window: count + sum(value) per (window, type)."""
    return (
        events.groupBy(
            F.window("ts", duration).alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), xsum(F.col("value"), MICROS).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding window (duration 1h, slide 30m): each event lands in
    duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), xsum(F.col("value"), MICROS).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_agg(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session window per user: sessions close after `gap` of inactivity.

    Batch-mode session_window — the same expression runs under
    applyInPandasWithState-free streaming (Spark's native session windows)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), xsum(F.col("value"), MICROS).alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def json_props_rollup(events: DataFrame) -> DataFrame:
    """Semi-structured path: parse the JSON `props` column (get_json_object,
    JVM-side) and aggregate on an extracted field."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ----------------------------- streaming forms -----------------------------


def stream_events_from_parquet(spark, path: str, schema) -> DataFrame:
    """readStream over a parquet directory (file micro-batch source)."""
    return spark.readStream.schema(schema).parquet(path)


def stream_tumbling(events_stream: DataFrame, duration: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming tumbling agg with watermark: late events beyond the
    watermark are dropped; state for closed windows is evicted."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), xsum(F.col("value"), MICROS).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def stream_session(events_stream: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Streaming session windows (native session_window + watermark)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def stream_upsert_daily_gold(events_stream: DataFrame, path: str, checkpoint_dir: str):
    """Gold-layer incremental rollup: a streaming per-(event_date,
    event_type) aggregate whose every trigger rewrites ONLY the partitions
    it touched, via foreachBatch + dynamic partition overwrite.

    Update output emits just the groups a micro-batch changed, and the
    gold table is partitioned by the FULL group key (event_date,
    event_type), so each emitted row exactly covers its partition — the
    surgical rewrite is lossless. The aggregate lives in streaming state,
    so a day spanning many micro-batches still converges to one correct
    rollup; re-running with the same checkpoint is a no-op, and a late
    backfill replaces exactly the partitions of the groups it changed.
    This is the parquet-lake stand-in for MERGE into a transactional
    table format. State is keyed by calendar day × event type (bounded);
    add a watermark only if days must age out of state.

    Returns the un-started DataStreamWriter so callers pick the trigger
    (tests use availableNow)."""
    from ..sources.sinks import overwrite_partitions

    daily = (
        events_stream.groupBy(
            F.to_date("ts").alias("event_date"), F.col("event_type")
        ).agg(
            F.count("*").alias("n_events"),
            xsum(F.col("value"), MICROS).alias("total_value"),
        )
    )

    def _upsert(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        overwrite_partitions(batch_df, path, ["event_date", "event_type"])

    return (
        daily.writeStream.foreachBatch(_upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )


def stream_click_view_join(
    clicks_stream: DataFrame,
    views_stream: DataFrame,
    window_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: each click pairs with the same
    user's views from the preceding ``window_minutes``.

    Both sides carry watermarks and the join condition bounds view time
    relative to click time, so the state store can evict: a buffered view
    is droppable once the click-side watermark passes view_ts + window
    (the engine derives this from the time-range predicate — an UNBOUNDED
    stream-stream join would otherwise buffer both streams forever). The
    batch twin is operators/temporal.range_join (epoch-bucketed equi-join);
    the streaming form trades its two-bucket probe for state-store lookups
    keyed by user_id."""
    c = clicks_stream.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    v = views_stream.select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    ).withWatermark("view_ts", watermark)
    return c.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (F.col("view_ts") < F.col("click_ts")),
    ).select("click_id", "user_id", "click_ts", "view_ts", "view_value")


def stream_click_view_join_outer(
    clicks_stream: DataFrame,
    views_stream: DataFrame,
    window_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every click is emitted —
    paired with the same user's views from the preceding ``window_minutes``,
    or null-extended when no view matched.

    The outer semantics the inner form (``stream_click_view_join``) can't
    express: "this click converted from nothing" is itself a result row,
    the row attribution pipelines aggregate into match rates. Emission is
    two-phased by construction of the engine: matched pairs emit in the
    micro-batch where both sides are present, but a null-extended row can
    only emit once the join PROVES no future view can match — i.e. when the
    global watermark passes click_ts, because any later-arriving view with
    view_ts < click_ts would itself be late beyond the watermark and
    dropped. Until that point the click stays buffered in the join state
    store; state is bounded by (arrival rate x (watermark delay + window)),
    exactly like the inner form. Both sides therefore MUST carry watermarks
    and the join condition MUST bound view_ts relative to click_ts — Spark
    rejects an outer stream-stream join without an evictability proof.

    The batch twin is ``operators/temporal.range_join`` (epoch-bucketed
    equi-join, exact row-level LEFT semantics), driver-gated as
    ``ev_click_view_outer_twin``; tests assert the drained streaming output
    equals the twin and that null emission is watermark-gated
    (tests/test_streaming.py::test_stream_click_view_outer_null_emission).
    """
    c = clicks_stream.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    v = views_stream.select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    ).withWatermark("view_ts", watermark)
    return c.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (F.col("view_ts") < F.col("click_ts")),
        "leftOuter",
    ).select("click_id", "user_id", "click_ts", "view_ts", "view_value")


def stream_click_view_join_full(
    clicks_stream: DataFrame,
    views_stream: DataFrame,
    window_minutes: int = 10,
    watermark: str = "30 minutes",
    keep_view_event_id: bool = False,
) -> DataFrame:
    """Watermarked stream-stream FULL OUTER join: both sides are total —
    every click emits (paired or null-extended, as in the leftOuter form)
    AND every view emits, null-extended when no click followed it within
    ``window_minutes`` (the "orphan view" class funnel analyses count).

    Eviction is side-symmetric but with different horizons derived from
    the same condition (view_ts in [click_ts − window, click_ts)): a
    click is provably closed once the watermark passes click_ts (no
    admissible view below it can still arrive), while a view must wait
    until the watermark passes view_ts + window — only then can no
    future click still claim it. So right-side null rows trail left-side
    ones by the match window; the contract test drives both classes
    through the same sentinel advance. State bounds are unchanged from
    the inner/leftOuter forms.

    Batch twin: ``ev_click_view_full_twin`` (plans/wave11.py) — the
    leftOuter ``range_join`` plan unioned with the bucket-anti-joined
    unmatched views, driver-gated against a plain FULL JOIN oracle.
    """
    c = clicks_stream.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    v_cols = [
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    ]
    if keep_view_event_id:
        # row-level view identity for fullOuter migration reconciliation
        # (streaming/migration.reconcile_full_join_outputs keys orphans on
        # it when present — payload-colliding true orphans survive)
        v_cols.append(F.col("event_id").alias("view_event_id"))
    v = views_stream.select(*v_cols).withWatermark("view_ts", watermark)
    out_cols = [
        F.col("click_id"),
        F.coalesce(F.col("user_id"), F.col("v_user_id")).alias("user_id"),
        F.col("click_ts"),
        F.col("view_ts"),
        F.col("view_value"),
    ]
    if keep_view_event_id:
        out_cols.append(F.col("view_event_id"))
    return c.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (F.col("view_ts") < F.col("click_ts")),
        "fullOuter",
    ).select(*out_cols)


def stream_dedup(
    events_stream: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exactly-once DEDUPLICATION over an at-least-once delivery:
    ``dropDuplicatesWithinWatermark`` keeps the first arrival of each
    event_id and drops replays that arrive within the watermark horizon —
    the state store evicts ids once the watermark passes them, so state is
    bounded by (arrival rate × watermark), never by stream length. The
    batch twin is a plain ``dropDuplicates`` (gated in the registry as
    ``ev_replay_dedup_digest``)."""
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
