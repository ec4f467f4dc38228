"""Composed streaming medallion pipeline (round-9 streaming capstone).

The stateful surface (streaming/stateful.py, streaming/events.py) is
verified piecewise — each operator has its own test and batch twin. This
module chains three of them into ONE continuous query so the stage
INTERACTIONS are verified too (the streaming analogue of what
``corpus_pipeline_v2_digest`` does for the batch corpus stages):

    bronze: at-least-once event ingest (replays possible)
      → silver: exactly-once dedup (``dropDuplicatesWithinWatermark``)
      → sessions: event-time TIMER sessionization
        (``session_close_on_timer`` — gap closes inline, trailing
        sessions close when the watermark passes their expiry)
      → gold: MERGE upsert keyed by (user_id, start_ms)
        (``sources.sinks.merge_upsert_parquet``)

Chaining notes (Spark 4 multiple-stateful-operator rules):
- the watermark is defined ONCE, on the bronze stream, ahead of the
  dedup; the session processor runs with ``delay=None`` because Spark
  disallows REDEFINING a watermark between chained stateful operators;
- ``transformWithStateInPandas`` requires a multi-column-family state
  store: set ``spark.sql.streaming.stateStore.providerClass`` to
  RocksDBStateStoreProvider before starting (the HDFS-backed default
  throws STATE_STORE_MULTIPLE_COLUMN_FAMILIES) — which is the 100 TB
  posture anyway (state spills to disk instead of capping the heap).

Crash contract: the gold merge is idempotent (replaying a batch replaces
its keys rather than duplicating them), so a torn foreachBatch write —
some buckets committed, the streaming commit log not — converges to the
clean-run table on restart from the same checkpoint
(tests/test_streaming.py::test_stream_medallion_capstone_crash_recovery).

Batch twin: ``sessions_gold_batch`` below computes the same gold table
from the raw (replayed) events with plain DataFrame ops; the registry
gates its day-rollup against DuckDB as ``ev_stream_pipeline_gold_twin``
(plans/wave9.py).

Scale shape: dedup state is bounded by (arrival rate × watermark
horizon); session state is one (start, last, n) triple + one timer per
ACTIVE user; the gold merge rewrites only the hash buckets a batch
touches. All three stages partition by high-cardinality keys (event_id,
user_id, key-hash buckets) — no low-cardinality funnel anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .stateful import session_close_on_timer

GOLD_KEY_COLS = ["user_id", "start_ms"]


def stream_sessions_gold(
    events_stream: DataFrame,
    gold_path: str,
    checkpoint_dir: str,
    gap_ms: int = 600_000,
    dedup_horizon: str = "0 seconds",
    n_buckets: int = 16,
):
    """The composed bronze→silver→sessions→gold query (module docstring).

    Returns the un-started ``DataStreamWriter`` so callers pick the
    trigger (tests use availableNow). ``dedup_horizon`` is the single
    watermark delay for the whole chain: it bounds BOTH the dedup state
    horizon and how long timers lag the max seen event time."""
    deduped = events_stream.withWatermark(
        "ts", dedup_horizon
    ).dropDuplicatesWithinWatermark(["event_id"])
    sessions = session_close_on_timer(deduped, gap_ms=gap_ms, delay=None)

    def _upsert(batch_df: DataFrame, _batch_id: int) -> None:
        # late-bound module attribute so failure-injection tests (and
        # operators swapping the sink) take effect per micro-batch
        from ..sources import sinks

        if batch_df.isEmpty():
            return
        sinks.merge_upsert_parquet(
            batch_df, gold_path, GOLD_KEY_COLS, n_buckets=n_buckets
        )

    return (
        sessions.writeStream.foreachBatch(_upsert)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )


def sessions_gold_batch(
    events: DataFrame, gap_ms: int = 600_000, delay_ms: int = 0
) -> DataFrame:
    """Batch recompute of the composed pipeline's gold table — the twin a
    drained single-batch stream must equal.

    Input: (user_id, event_id, ts) events, possibly with REPLAYED rows
    (at-least-once delivery). Precondition: replays are byte-identical to
    their original (same id ⇒ same user/ts), which is what makes the
    batch dedup deterministic. Stages mirror the stream exactly:

    1. dedup — one row per event_id (``distinct``: replicas identical);
    2. gap sessionization per user (diff >= gap opens a new session);
    3. closed sessions only, with the TRUE timer adjudication
       (ev_timer_session_close_twin semantics): a session with a
       successor closed by 'gap' the moment that event processed; a
       user's LAST session closed by 'timer' iff the terminal watermark
       reached its expiry; otherwise it is still OPEN at drain and never
       reached gold.

    ``delay_ms`` is the chain's watermark delay (``dedup_horizon``): the
    terminal watermark a drained stream reaches is max event time MINUS
    the delay, so a nonzero-delay drain closes strictly fewer trailing
    sessions by timer (expiry <= max_ms - delay_ms). Precondition for
    twin equality at delay > 0: every disordered delivery stays within
    the admitted horizon (no row below the watermark of an earlier
    batch), since a batch recompute cannot see batch boundaries —
    tests/test_streaming.py::test_stream_medallion_disordered_nonzero_delay
    drives exactly that contract through the real chained query.
    """
    # null-key exclusion mirrors the streaming side: the tWS sessionizer
    # drops null user_ids (stateful.drop_null_keys — semantic contract +
    # the measured Spark 4.1.2 null-key partition-absorption hazard), so
    # the batch twin must too or the pair diverges on any corpus with
    # optional identity. The terminal WATERMARK, by contrast, is
    # computed over ALL events including null-key rows — the stream's
    # withWatermark sits on bronze, upstream of the sessionizer's guard,
    # so a null-key row's event time still advances eviction/timers.
    mx = events.select(F.expr("unix_micros(ts) div 1000").alias("ms")).agg(
        F.max("ms").alias("max_ms")
    )
    ev = (
        events.filter(F.col("user_id").isNotNull())
        .select("user_id", "event_id", F.expr("unix_micros(ts) div 1000").alias("ms"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    marked = ev.withColumn(
        "new_s",
        F.when(F.col("ms") - F.lag("ms").over(w) >= gap_ms, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sess = marked.withColumn(
        "sess", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    agg = sess.groupBy("user_id", "sess").agg(
        F.min("ms").alias("start_ms"),
        F.max("ms").alias("end_ms"),
        F.count("*").alias("n_events"),
    )
    last_end = F.max("end_ms").over(Window.partitionBy("user_id"))
    return (
        agg.join(F.broadcast(mx))
        .select(
            "user_id",
            "start_ms",
            "end_ms",
            "n_events",
            F.when(F.col("end_ms") < last_end, F.lit("gap"))
            .when(
                F.col("end_ms") + F.lit(gap_ms)
                <= F.col("max_ms") - F.lit(delay_ms),
                F.lit("timer"),
            )
            .alias("closed_by"),
        )
        .filter(F.col("closed_by").isNotNull())
    )
