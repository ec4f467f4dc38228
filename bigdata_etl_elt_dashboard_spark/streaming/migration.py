"""Checkpoint migration for stream-stream joins (round-12 operational
extension; r11 verdict task 5).

Round 11 proved checkpoint migration for transformWithState processors:
read the old checkpoint's state OFFLINE (sources/state_reader.py), seed a
NEW checkpoint via ``initialState``, continue. Stream-stream JOIN buffers
have no ``initialState`` surface in Spark 4.x — the state data source
reads them but nothing re-writes them — so a killed join query cannot be
grafted onto a new checkpoint by state injection.

What Spark's semantics DO support is re-seeding through the SOURCE: the
join's own eviction contract proves the buffered rows are exactly the
prefix the new query must re-ingest.

For the click/view range join (views in ``[click_ts − w, click_ts)``,
watermark delay d, global watermark W at kill time):

- a CLICK is buffered iff ``click_ts`` ≥/> W — precisely the clicks whose
  outcome (more matches, or the final null-extension in the outer forms)
  is still open; clicks below W are closed and their emitted rows final
  (append mode never retracts — streaming/events.py docstrings);
- a VIEW is buffered iff ``view_ts`` ≳ W − w — precisely the views a
  future on-time click (``click_ts`` ≥ W) can still claim.

So feeding the NEW query (fresh checkpoint, watermark starts from zero)
the offline-read buffers as its first batch, then the not-yet-ingested
tail of the stream, reproduces a continuous run's output EXCEPT for
bounded re-emission: pairs whose two sides were BOTH still buffered at
kill re-emit once. Those re-emissions are bit-identical rows, so the
downstream contract is the same idempotent-sink rule the medallion gold
layer already implements (MERGE upsert / dropDuplicates on the output
key) — tests/test_stream_join_migration.py asserts the deduplicated
union is ``exceptAll``-bit-equal to an uninterrupted run for the inner
AND leftOuter forms, and that no false null-extension appears (the
buffered-view horizon guarantees every replayed click still sees every
match it had). The fullOuter form needs one extra reconciliation step —
``reconcile_full_join_outputs`` below — because a re-seeded view whose
click closed pre-kill would otherwise flush as a false orphan.

Fidelity note: the join buffers hold the operator's PROJECTED rows
(click_id/user_id/click_ts and user_id/view_ts/view_value — see
streaming/events.py), not the raw source rows, so the reconstructed seed
carries exactly the fields the join's output depends on; source columns
the projection dropped (a view's event_id, a click's value) are
re-synthesized as nulls and never reach the output. The alternative
recipe — re-reading the original source filtered to the same per-side
frontiers (clicks above ``checkpoint_watermark(ckpt)``, views above
``checkpoint_watermark(ckpt) − w``) — lands byte-identical seed domains
when the source retains that window; the state-reader path works even
when the source has been compacted away, which is the migration scenario
that actually hurts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.state_reader import state_rows

#: source-side schema both join inputs stream under (events wire shape)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def reconcile_full_join_outputs(run_a: DataFrame, run_b: DataFrame) -> DataFrame:
    """Assemble the migrated FULL-outer output from the killed run's sink
    and the restarted run's sink.

    The fullOuter flavor has one seam the inner/leftOuter recipe lacks:
    a re-seeded view whose matching CLICK was already evicted before the
    kill (click closed at ``click_ts`` ≤ W, view still open until
    ``view_ts + w`` > W) re-enters the new query unmatchable and flushes
    as a FALSE orphan — the match it already had lives only in run A's
    output. The state store's exposed value struct carries no matched
    flag (measured on Spark 4.1 — the reader returns the buffered row
    only), but the operational truth is already durable: run A's sink
    holds every matched pair it emitted. So the reconciliation is pure
    output algebra — drop the run-B orphans whose view identity
    ``(user_id, view_ts, view_value)`` appears matched in run A, union,
    dedup (the bounded both-sides-buffered re-emission, as in the other
    flavors). The symmetric left-side hazard cannot occur: a buffered
    click's admissible views satisfy ``view_ts + w ≥ click_ts > W``, so
    none was evicted — proven by the leftOuter no-false-null assertion
    in tests/test_stream_join_migration.py.

    **View identity** (r12 advice): when the join projection retained the
    view's source ``event_id`` (``stream_click_view_join_full(...,
    keep_view_event_id=True)`` emits it as ``view_event_id``), the orphan
    reconciliation keys on that row-level identity — a genuine run-B
    orphan that merely collides payload-wise with a distinct matched view
    in run A is then correctly KEPT. Without it, identity is row-level
    only up to the join's projection — the same caveat plans/wave11.py
    documents for the batch twin: two distinct source views with
    identical (user, ts, value) are one identity at this seam, and a
    payload-colliding true orphan is wrongly dropped.
    """
    if "view_event_id" in run_a.columns and "view_event_id" in run_b.columns:
        identity = ["view_event_id"]
    else:
        identity = ["user_id", "view_ts", "view_value"]
    matched_a = (
        run_a.filter(F.col("click_id").isNotNull() & F.col("view_ts").isNotNull())
        .select(*identity)
        .distinct()
    )
    false_orphans = (
        run_b.filter(F.col("click_id").isNull())
        .join(matched_a, identity, "left_semi")
        .select(*run_b.columns)  # semi join fronts the join keys; restore order
    )
    return run_a.unionByName(run_b.exceptAll(false_orphans)).dropDuplicates()


def read_click_view_buffers(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> tuple[DataFrame, DataFrame]:
    """The two join buffers of a killed click/view join, as DataFrames of
    the operator's projected row shapes (left: click_id/user_id/click_ts;
    right: user_id/view_ts/view_value)."""
    left = state_rows(spark, checkpoint, operator_id=operator_id, join_side="left").select(
        "value.click_id", "value.user_id", "value.click_ts"
    )
    right = state_rows(spark, checkpoint, operator_id=operator_id, join_side="right").select(
        F.col("value.v_user_id").alias("user_id"), "value.view_ts", "value.view_value"
    )
    return left, right


def reseed_click_view_source(
    spark: SparkSession, old_checkpoint: str, seed_dir: str, operator_id: int = 0
) -> tuple[int, int]:
    """Write the old checkpoint's join buffers into ``seed_dir`` as
    source-shaped event rows — the first batch a restarted query (fresh
    checkpoint, same source directory) ingests before the live tail.

    Returns ``(n_clicks, n_views)`` re-seeded. The counts are
    horizon-bounded (arrival rate × (delay + window)), never
    stream-bounded — the same bound SCALING.md measures for the live
    buffers — so the seed write is a small batch even mid-flood.
    """
    left, right = read_click_view_buffers(spark, old_checkpoint, operator_id)
    clicks = left.select(
        F.col("click_id").alias("event_id"),
        F.col("click_ts").alias("ts"),
        F.col("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    )
    views = right.select(
        F.lit(None).cast("long").alias("event_id"),
        F.col("view_ts").alias("ts"),
        F.col("user_id"),
        F.lit("view").alias("event_type"),
        F.col("view_value").alias("value"),
    )
    seed = clicks.unionByName(views)
    # errorifexists (r12 advice): a pre-existing or twice-seeded directory
    # would silently inflate both the seed content and the returned counts
    # (duplicated seed rows also re-emit extra pairs that only the
    # idempotent-sink dedup hides) — fail loudly instead.
    seed.write.mode("errorifexists").parquet(seed_dir)
    # bounded counts (see docstring); read back so the numbers reflect
    # what actually landed
    landed = spark.read.parquet(seed_dir)
    n_clicks = landed.filter(F.col("event_type") == "click").count()
    n_views = landed.filter(F.col("event_type") == "view").count()
    return n_clicks, n_views


def migrate_session_state_v1_to_v2(
    spark: SparkSession, old_checkpoint: str, default_sum: float = 0.0
) -> DataFrame:
    """Schema-EVOLVED checkpoint migration, read side (r12 verdict task
    6): lift a v1 sessionizer checkpoint (state ``sess`` = start_ms /
    last_ms / n — streaming/stateful.session_close_on_timer) into the
    v2 state shape that gained ``sum_v``.

    Offline read → transform → the ``initial_state`` frame
    ``session_close_on_timer_v2`` seeds from. The new column is
    backfilled with a DEFINED default (0.0 — "nothing summed before the
    cutover"): v1 never tracked it, so any backfill is a declared
    convention, not recovered data. Consequence: for a session that
    STRADDLES the cutover, the migrated run's ``sum_v`` covers only
    post-cutover events, while every SHARED column (user_id, start_ms,
    end_ms, n_events, closed_by) converges bit-equal to a continuous v2
    run — proven by tests/test_schema_evolution_migration.py. Callers
    who can still read the historical lake may instead batch-compute the
    true per-open-session sums and overwrite ``sum_v`` before seeding
    (the backfill-then-stream recipe of running_type_counts_with_backfill).
    """
    v1 = state_rows(spark, old_checkpoint, state_var_name="sess").select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.start_ms").alias("start_ms"),
        F.col("value.last_ms").alias("last_ms"),
        F.col("value.n").alias("n"),
    )
    return v1.withColumn("sum_v", F.lit(float(default_sum)).cast("double"))


def read_session_state_v2(
    spark: SparkSession, checkpoint: str, state_var_name: str = "sess"
) -> DataFrame:
    """Offline read of a v2 sessionizer checkpoint's open sessions as the
    ``initial_state`` frame shape (user_id, start_ms, last_ms, n, sum_v) —
    the common front end of the rename and widening recipes below."""
    return state_rows(spark, checkpoint, state_var_name=state_var_name).select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.start_ms").alias("start_ms"),
        F.col("value.last_ms").alias("last_ms"),
        F.col("value.n").alias("n"),
        F.col("value.sum_v").alias("sum_v"),
    )


def migrate_session_state_rename(
    spark: SparkSession, old_checkpoint: str, old_name: str = "sess"
) -> DataFrame:
    """State-variable RENAME migration (r13 verdict task 5): the state
    store keys each variable's column family by NAME, so a processor that
    renames ``sess`` → ``session`` reads EMPTY state from an old
    checkpoint — silent total state loss, the nastiest failure mode of
    the three evolutions because nothing errors. The recipe: offline-read
    the old checkpoint UNDER THE OLD NAME, seed a fresh checkpoint via
    ``initialState`` on the processor declaring the new name
    (``session_close_on_timer_v2(state_var_name=...)``), which also
    re-registers every open session's close timer (handleInitialState).
    Values pass through untouched — a rename changes the store layout,
    never the data — so the migrated run converges bit-equal on ALL
    columns (including sum_v) to an uninterrupted run, proven by
    tests/test_schema_evolution_migration.py::test_state_variable_rename_migration.
    """
    return read_session_state_v2(spark, old_checkpoint, state_var_name=old_name)


def migrate_session_state_widen(
    spark: SparkSession, old_checkpoint: str, state_var_name: str = "sess"
) -> DataFrame:
    """Value-type WIDENING migration (r13 verdict task 5): a legacy
    deployment that declared its event counter ``n int`` upgrades to
    ``n long`` (the int→long widening every counting state hits first).
    Spark's state codec has no implicit upcast on read — the new
    processor's declared schema must match what it seeds — so the recipe
    is: offline-read the old checkpoint (the state source surfaces ``n``
    at its STORED width), cast the narrow column up, seed via
    ``initialState`` on the wide-schema processor. Widening is lossless
    (every int32 count is exactly representable as int64), so the
    migrated run converges bit-equal on ALL columns to an uninterrupted
    wide run — proven by tests/test_schema_evolution_migration.py::
    test_value_type_widening_migration, which also asserts the old
    checkpoint REALLY stored int32 (the test is vacuous otherwise).
    """
    return read_session_state_v2(
        spark, old_checkpoint, state_var_name=state_var_name
    ).withColumn("n", F.col("n").cast("long"))
