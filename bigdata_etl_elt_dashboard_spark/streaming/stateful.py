"""Custom stateful streaming operator via applyInPandasWithState (§7.5).

Native window()/session_window() cover the reference-shaped aggregations in
streaming mode (streaming/events.py); this module is the escape hatch for
state machines they can't express — here, per-user RUNNING totals that
survive across micro-batches (a lifetime-counter, not a windowed count).

Shape notes for scale:
- State is partitioned by the group key (user_id): one state row per user,
  updated with Arrow-batched pandas frames per micro-batch — the streaming
  analog of a shuffled hash aggregation, never a global collect.
- Emission is one row per user per micro-batch that touched the user
  ("update" output mode), so downstream sinks see a changelog.
- State lives in the checkpoint; a restarted query resumes exactly
  (tested by running two availableNow passes over one checkpoint).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def drop_null_keys(df: DataFrame, key: str = "user_id") -> DataFrame:
    """Exclude null grouping keys ahead of every transformWithStateInPandas
    operator. Two reasons, one semantic and one MEASURED:

    - semantic: per-entity state (a session, a lifetime counter, a
      last-K register) is meaningless for rows with no entity identity —
      the batch twins express the same contract as
      ``WHERE user_id IS NOT NULL``;
    - operational (Spark 4.1.2, measured — tests/test_stateful_null_keys.py
      pins it): transformWithStateInPandas ABSORBS an entire partition's
      rows into the null-key group when a null key is present — every
      user co-partitioned with the null key loses its state and its rows
      are counted under key NULL (caught by the r14 null-join-key variant
      corpus: 15 of 150 users vanished from ``src_tws_state_digest``'s
      MapState, their 458 events miscounted under NULL).
      ``applyInPandasWithState`` does NOT share the bug (probed — each
      null-key row groups separately), so only the tWS operators guard.

    A null key is therefore not just semantically empty here — it
    corrupts OTHER keys' state. At 100 TB any feed with optional
    identity (logged-out events, redacted users) would silently poison
    one partition per batch without this filter."""
    return df.filter(F.col(key).isNotNull())


OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += int(len(pdf))
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def stream_dedup_exact(events_stream: DataFrame, key: str = "event_id") -> DataFrame:
    """Streaming exact dedup: emit each key once across ALL micro-batches
    (state = set of seen keys, kept in the checkpoint).

    This is the streaming twin of the batch hash-dedup
    (operators.dedup.exact_dedup): an at-most-once filter for continuous
    ingestion. Unbounded state by design here; bound it with
    ``withWatermark(ts, ...)`` + ``dropDuplicatesWithinWatermark`` when the
    key space only needs dedup within a time horizon."""
    return events_stream.dropDuplicates([key])


def stream_dedup_within_watermark(
    events_stream: DataFrame,
    ts_col: str = "ts",
    key: str = "event_id",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Bounded-state streaming dedup: drop a key re-delivered within the
    watermark ``horizon``; state for keys older than the watermark is
    evicted, so memory is O(keys-per-horizon), not O(all keys ever).

    This is the production form of ``stream_dedup_exact`` for unbounded
    key spaces (at-least-once sources re-deliver within a bounded delay —
    dedup state only needs to cover that delay). A key seen again AFTER
    the watermark has passed it is treated as a new event — by design."""
    return events_stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        [key]
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user lifetime (n_events, total_value), carried across batches.

    Use with ``outputMode("update")``. Equivalent batch form is a plain
    groupBy(user_id).agg(count, sum) — which is exactly how the test
    cross-checks the final state."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def _protobuf_available() -> bool:
    """transformWithState's Python worker speaks protobuf to the JVM state
    server; without a `google.protobuf` runtime the driver-side schema
    worker crashes before the first batch. Prefer a real install, fall
    back to the vendored pure-Python shim (vendor/google/protobuf — a
    clean-room wire-format subset sufficient for StateMessage_pb2).

    NOTE: the shim reaches JVM-spawned Python workers via PYTHONPATH, so
    ensure_protobuf() must run before the SparkSession's JVM launches
    (the session factory and tests/conftest.py both do)."""
    from ..vendor import ensure_protobuf

    return ensure_protobuf()


TYPE_COUNTS_SCHEMA = "user_id long, event_type string, n long"


def running_type_counts(events_stream: DataFrame) -> DataFrame:
    """Per-user lifetime count PER EVENT TYPE, carried across micro-batches —
    the arbitrary-state-v2 (`transformWithStateInPandas`, Spark 4) twin of
    ``running_user_totals``. MapState keyed by event_type holds one counter
    per (user, type); each batch emits changelog rows for the types it
    touched ("update" semantics).

    Why v2 over applyInPandasWithState: typed state variables (Value/List/
    Map) instead of one monolithic state tuple, per-entry TTL, timers, and
    schema evolution — the API Spark is converging on for custom stateful
    operators. State is RocksDB-backed (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider``), so per-key state spills to
    disk instead of capping executor heap — the 100 TB-ingest shape.

    Requires the `protobuf` package at runtime (absent in minimal
    containers — see ``_protobuf_available``); the plan construction
    itself is dependency-free."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("counts", "k string", "n long")

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            local: dict[str, int] = {}
            for pdf in rows:
                for t, c in pdf["event_type"].value_counts().items():
                    local[str(t)] = local.get(str(t), 0) + int(c)
            out: dict[str, list] = {"user_id": [], "event_type": [], "n": []}
            for t in sorted(local):
                prev = (
                    self._counts.getValue((t,))
                    if self._counts.containsKey((t,))
                    else None
                )
                n = (prev[0] if prev else 0) + local[t]
                self._counts.updateValue((t,), (n,))
                out["user_id"].append(key[0])
                out["event_type"].append(t)
                out["n"].append(n)
            yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return drop_null_keys(events_stream).groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TypeCounts(),
        outputStructType=TYPE_COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


LAST_K_SCHEMA = "user_id long, n_events long, last_values array<double>"


def running_last_k_values(events_stream: DataFrame, k: int = 3) -> DataFrame:
    """Per-user lifetime event count + the LAST ``k`` event values in
    arrival order — the bounded-recency feature ("most recent purchases")
    behind RFM-style scoring and next-event models, carried across
    micro-batches.

    Arbitrary-state-v2 form using BOTH typed state kinds the MapState twin
    (``running_type_counts``) does not: a ValueState for the lifetime
    counter and a ListState holding at most ``k`` (ts-ordered within each
    batch's arrival order) values — the list is truncated on every update,
    so state per user is O(k) regardless of stream length. Exercises the
    protocol surface ListState rides on (list-get iterators with paged
    fetches, put-with-truncation) on top of ValueState get/update.

    ``outputMode("update")``: each batch emits one changelog row per user
    it touched. Batch twin: per user — COUNT(*) plus the k latest values
    by (ts, event_id) — asserted by the recovery test."""

    def build(k_cap: int):
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class LastK(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._n = handle.getValueState("n", "n long")
                self._vals = handle.getListState("vals", "v double")

            def handleInputRows(
                self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
            ) -> Iterator[pd.DataFrame]:
                # Concatenate ALL Arrow chunks before sorting: a micro-batch
                # delivers a key's rows across ~10k-row chunks, and per-chunk
                # sorts concatenated in arrival order would not be globally
                # (ts, event_id)-ordered — the batch-twin contract is the k
                # latest values by (ts, event_id) over the whole batch.
                chunks = [pdf for pdf in rows]
                batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
                ordered = batch.sort_values(["ts", "event_id"])
                n_new = len(ordered)
                incoming = [(float(v),) for v in ordered["value"]]
                prev = self._n.get()
                n = (prev[0] if prev else 0) + n_new
                self._n.update((n,))
                kept = list(self._vals.get()) + incoming
                kept = kept[-k_cap:]
                self._vals.put(kept)  # overwrite: state stays O(k)
                yield pd.DataFrame(
                    {
                        "user_id": pd.Series([key[0]], dtype="int64"),
                        "n_events": pd.Series([n], dtype="int64"),
                        "last_values": pd.Series([[v[0] for v in kept]]),
                    }
                )

            def close(self) -> None:
                pass

        return LastK()

    return drop_null_keys(events_stream).groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=build(k),
        outputStructType=LAST_K_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_TIMER_SCHEMA = (
    "user_id long, start_ms long, end_ms long, n_events long, closed_by string"
)


def session_close_on_timer(
    events_stream: DataFrame,
    gap_ms: int = 600_000,
    delay: str | None = "0 seconds",
) -> DataFrame:
    """Timer-driven session close — the event-time TIMER surface of
    arbitrary state v2 (the one capability the MapState/ValueState/ListState
    twins don't touch).

    Semantics (gap sessionization, matching ``ev_session_10m``'s
    ``diff >= gap`` new-session rule): a user's events belong to one session
    while consecutive gaps stay under ``gap_ms``. Two close paths, each
    emitting one row per closed session:

    * ``closed_by='gap'`` — a later event in the SAME batch (or a later
      batch) arrives ``>= gap_ms`` after the session's last event; the old
      session closes inline in ``handleInputRows``.
    * ``closed_by='timer'`` — no successor event ever arrives: an
      event-time timer registered at ``last_ms + gap_ms`` fires once the
      WATERMARK passes it (``handleExpiredTimer``), closing the trailing
      session. This is the path only timers can express: closing on the
      *absence* of data.

    Scale shape: state per user is ONE (start, last, n) triple plus one
    registered timer — O(1) regardless of stream length; intra-batch
    closures never enter state. Timer hygiene: the previous timer is
    deleted whenever the session extends (re-registering at the new
    expiry), and a stale timer firing after a session extended is ignored
    by the ``expiry >= last + gap`` guard. Batch twin:
    ``ev_timer_session_close_twin`` (plans/wave8.py) — in a fully-drained
    single-batch stream, exactly a user's LAST session can close by timer
    (every earlier session closes inline in ``handleInputRows`` the moment
    its successor event is processed), and only if the terminal watermark
    reaches its expiry (``end + gap <= max event time``; otherwise it
    stays open at drain) — the twin's ``timer_closed`` column encodes
    that conjunction. Across MULTIPLE batches arrival order matters: a
    session whose successor arrives in a later query run may close by
    timer first (see tests/test_scale_sources.py::
    test_session_close_on_timer_v2 run 1 vs run 3). ``delay`` is the
    watermark delay on ``ts``; timers fire only when the watermark (max
    seen ts − delay) passes their expiry. Pass ``delay=None`` when the
    input ALREADY carries an event-time watermark (e.g. downstream of
    ``dropDuplicatesWithinWatermark`` in the composed medallion pipeline,
    streaming/pipeline.py) — Spark disallows redefining a watermark
    between chained stateful operators.

    Cross-batch DISORDER contract: rows below the watermark are dropped
    in the processor (transformWithState does not pre-filter them and an
    eager-emission sessionizer must not let a straggler stretch an
    already-emitted session backward); size ``delay`` to the ingestion
    disorder you need admitted. Admitted stragglers — even ones older
    than the currently-open session — merge through the same gap rule
    the batch twin uses (the open session walks as an atomic interval
    among the batch's sorted events). The one eager-emission residual:
    a straggler landing within ``gap`` of a session that ALREADY closed
    emits as its own session rather than retroactively extending it —
    native ``session_window`` avoids this by emitting only at the
    watermark, at the cost of never emitting inline 'gap' closures."""

    def build(gap: int):
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class SessionClose(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._handle = handle
                self._sess = handle.getValueState(
                    "sess", "start_ms long, last_ms long, n long"
                )

            def _row(self, key, start, last, n, how):
                return pd.DataFrame(
                    {
                        "user_id": pd.Series([key[0]], dtype="int64"),
                        "start_ms": pd.Series([start], dtype="int64"),
                        "end_ms": pd.Series([last], dtype="int64"),
                        "n_events": pd.Series([n], dtype="int64"),
                        "closed_by": [how],
                    }
                )

            def handleInputRows(
                self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
            ) -> Iterator[pd.DataFrame]:
                chunks = [pdf for pdf in rows]
                batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
                order_cols = (
                    ["ts", "event_id"] if "event_id" in batch.columns else ["ts"]
                )
                ordered = batch.sort_values(order_cols)
                ts_ms = (ordered["ts"].astype("int64") // 1_000_000).tolist()
                # Enforce the event-time contract the operator's eager 'gap'
                # emission depends on: rows below the watermark are late
                # beyond the declared delay, and transformWithState does NOT
                # pre-filter them (measured on Spark 4.1 — a straggler from
                # an out-of-order file batch reaches handleInputRows).
                # Admitting one would stretch already-emitted sessions
                # backward (a micro-batch engine cannot retract an emitted
                # row). Same drop rule every watermarked stateful op uses.
                wm = timerValues.getCurrentWatermarkInMs()
                if wm > 0:
                    ts_ms = [t for t in ts_ms if t >= wm]
                    if not ts_ms:
                        return
                prev = self._sess.get()
                # Interval-merge walk: the open session participates as an
                # atomic (start, last, n) interval SORTED among the batch
                # events, so an admitted straggler older than the open
                # session (possible when delay > 0) chains through the same
                # gap rule the batch twin uses — never absorbed into a
                # session it precedes by more than `gap`. Straggler chains
                # that stay >= gap older than the open session close as
                # 'gap' (the open session is their bounding successor).
                items = [(t, t, 1) for t in ts_ms]
                if prev:
                    items.append(tuple(prev))
                    # the old expiry is obsolete: the session will extend
                    # or close below either way
                    self._handle.deleteTimer(prev[1] + gap)
                    items.sort()
                cur_s, cur_e, cur_n = items[0]
                for s, e, c in items[1:]:
                    if s - cur_e < gap:
                        cur_s = min(cur_s, s)
                        cur_e = max(cur_e, e)
                        cur_n += c
                    else:
                        yield self._row(key, cur_s, cur_e, cur_n, "gap")
                        cur_s, cur_e, cur_n = s, e, c
                self._sess.update((cur_s, cur_e, cur_n))
                self._handle.registerTimer(cur_e + gap)

            def handleExpiredTimer(
                self, key: tuple, timerValues: Any, expiredTimerInfo: Any
            ) -> Iterator[pd.DataFrame]:
                prev = self._sess.get()
                if not prev:
                    return
                start, last, n = prev
                # a stale timer (session extended after registration but the
                # delete raced) must not close a still-live session
                if expiredTimerInfo.getExpiryTimeInMs() < last + gap:
                    return
                yield self._row(key, start, last, n, "timer")
                self._sess.clear()

            def close(self) -> None:
                pass

        return SessionClose()

    marked = (
        events_stream.withWatermark("ts", delay)
        if delay is not None
        else events_stream
    )
    return (
        drop_null_keys(marked)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=build(gap_ms),
            outputStructType=SESSION_TIMER_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


SESSION_TIMER_V2_SCHEMA = (
    "user_id long, start_ms long, end_ms long, n_events long, "
    "sum_v double, closed_by string"
)


def session_close_on_timer_v2(
    events_stream: DataFrame,
    gap_ms: int = 600_000,
    delay: str | None = "0 seconds",
    initial_state: DataFrame | None = None,
    state_var_name: str = "sess",
    count_type: str = "long",
) -> DataFrame:
    """The sessionizer AFTER a state-schema evolution: state gained a
    field (``sum_v`` — the session's summed event value), the upgrade
    production state stores hit first (r12 verdict task 6).

    Identical gap/timer semantics to ``session_close_on_timer`` (v1) —
    same interval-merge walk, same watermark drop rule, same stale-timer
    guard — with the value accumulator threaded through every path. Kept
    as a SEPARATE processor on purpose: v1 is the frozen migration
    SOURCE (its checkpoints exist in the field); sharing code would let
    a v2 edit silently change what v1 checkpoints replay into.

    ``initial_state``: a batch frame of (user_id, start_ms, last_ms, n,
    sum_v) — one row per user's OPEN v1 session, produced by
    ``streaming/migration.migrate_session_state_v1_to_v2`` (offline v1
    state read + the new column backfilled with a DEFINED default).
    ``handleInitialState`` loads it AND re-registers the close timer at
    ``last_ms + gap`` — without that, a migrated user who never sends
    another event would hold an open session forever (v1's registered
    timer lives in the OLD checkpoint and does not migrate).

    ``state_var_name`` / ``count_type`` (r13 verdict task 5) model the
    two OTHER schema evolutions production checkpoints hit beyond the
    gained-a-field case: a state-variable RENAME (the store keys state by
    variable name, so a renamed variable reads as empty from an old
    checkpoint — the migration recipe re-seeds it under the new name via
    ``streaming/migration.migrate_session_state_rename``) and a
    value-type WIDENING (a legacy deployment that declared ``n int``
    upgrades to ``n long`` — ``migrate_session_state_widen`` casts the
    offline-read state up). Both default to the shipped shape; the
    processor's Python logic is type-agnostic (plain ints), so the knobs
    change only the declared store codec — which is exactly what the
    migrations must bridge."""

    def build(gap: int):
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class SessionCloseV2(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._handle = handle
                self._sess = handle.getValueState(
                    state_var_name,
                    f"start_ms long, last_ms long, n {count_type}, sum_v double",
                )

            def _row(self, key, start, last, n, sv, how):
                return pd.DataFrame(
                    {
                        "user_id": pd.Series([key[0]], dtype="int64"),
                        "start_ms": pd.Series([start], dtype="int64"),
                        "end_ms": pd.Series([last], dtype="int64"),
                        "n_events": pd.Series([n], dtype="int64"),
                        "sum_v": pd.Series([sv], dtype="float64"),
                        "closed_by": [how],
                    }
                )

            def handleInitialState(
                self, key: tuple, initialState: pd.DataFrame, timerValues: Any
            ) -> None:
                start = int(initialState["start_ms"].iloc[0])
                last = int(initialState["last_ms"].iloc[0])
                n = int(initialState["n"].iloc[0])
                sv = float(initialState["sum_v"].iloc[0])
                self._sess.update((start, last, n, sv))
                self._handle.registerTimer(last + gap)

            def handleInputRows(
                self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
            ) -> Iterator[pd.DataFrame]:
                chunks = [pdf for pdf in rows]
                batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
                order_cols = (
                    ["ts", "event_id"] if "event_id" in batch.columns else ["ts"]
                )
                ordered = batch.sort_values(order_cols)
                ts_ms = (ordered["ts"].astype("int64") // 1_000_000).tolist()
                vals = ordered["value"].fillna(0.0).astype("float64").tolist()
                wm = timerValues.getCurrentWatermarkInMs()
                if wm > 0:  # same late-drop contract as v1 (see its doc)
                    pairs = [(t, v) for t, v in zip(ts_ms, vals) if t >= wm]
                    if not pairs:
                        return
                    ts_ms = [t for t, _ in pairs]
                    vals = [v for _, v in pairs]
                prev = self._sess.get()
                items = [(t, t, 1, v) for t, v in zip(ts_ms, vals)]
                if prev:
                    items.append(tuple(prev))
                    self._handle.deleteTimer(prev[1] + gap)
                    items.sort()
                cur_s, cur_e, cur_n, cur_v = items[0]
                for s, e, c, v in items[1:]:
                    if s - cur_e < gap:
                        cur_s = min(cur_s, s)
                        cur_e = max(cur_e, e)
                        cur_n += c
                        cur_v += v
                    else:
                        yield self._row(key, cur_s, cur_e, cur_n, cur_v, "gap")
                        cur_s, cur_e, cur_n, cur_v = s, e, c, v
                self._sess.update((cur_s, cur_e, cur_n, cur_v))
                self._handle.registerTimer(cur_e + gap)

            def handleExpiredTimer(
                self, key: tuple, timerValues: Any, expiredTimerInfo: Any
            ) -> Iterator[pd.DataFrame]:
                prev = self._sess.get()
                if not prev:
                    return
                start, last, n, sv = prev
                if expiredTimerInfo.getExpiryTimeInMs() < last + gap:
                    return
                yield self._row(key, start, last, n, sv, "timer")
                self._sess.clear()

            def close(self) -> None:
                pass

        return SessionCloseV2()

    marked = (
        events_stream.withWatermark("ts", delay)
        if delay is not None
        else events_stream
    )
    kwargs = {}
    if initial_state is not None:
        kwargs["initialState"] = initial_state.groupBy("user_id")
    return drop_null_keys(marked).groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=build(gap_ms),
        outputStructType=SESSION_TIMER_V2_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
        **kwargs,
    )


TTL_COUNTS_SCHEMA = "user_id long, event_type string, n long"


def recent_type_counts_ttl(events_stream: DataFrame, ttl_ms: int = 30_000) -> DataFrame:
    """Per-user per-type counts over a TTL-BOUNDED MapState — the state-TTL
    surface of arbitrary state v2: entries not rewritten for ``ttl_ms`` of
    processing time expire and silently drop out of reads, so a count
    "restarts" after an idle period instead of accumulating forever.

    This is the production answer to ``running_type_counts``' unbounded
    state at 100 TB-scale key cardinality: hot keys stay exact, cold keys
    age out at the store level (RocksDB TTL compaction) — no manual
    eviction pass, no full-state scan. TTL is wall-clock (processing-time)
    by definition, hence ``timeMode='ProcessingTime'``; expiry granularity
    is per map ENTRY (each (user, type) ages independently from its last
    write).

    Drain caveat: in ProcessingTime time mode the operator reports
    ``shouldRunAnotherBatch=true`` unconditionally (processing-time timers
    could fire with no new data), so an ``availableNow`` run NEVER
    self-terminates — drive this with a throttled ``processingTime``
    trigger and an explicit ``query.stop()``. The EventTime twin
    (``session_close_on_timer``) does drain under availableNow."""

    def build(ttl: int):
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class TTLCounts(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._counts = handle.getMapState(
                    "counts", "k string", "n long", ttlDurationMs=ttl
                )

            def handleInputRows(
                self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
            ) -> Iterator[pd.DataFrame]:
                local: dict[str, int] = {}
                for pdf in rows:
                    for t, c in pdf["event_type"].value_counts().items():
                        local[str(t)] = local.get(str(t), 0) + int(c)
                out: dict[str, list] = {"user_id": [], "event_type": [], "n": []}
                for t in sorted(local):
                    prev = (
                        self._counts.getValue((t,))
                        if self._counts.containsKey((t,))
                        else None
                    )
                    n = (prev[0] if prev else 0) + local[t]
                    self._counts.updateValue((t,), (n,))
                    out["user_id"].append(key[0])
                    out["event_type"].append(t)
                    out["n"].append(n)
                yield pd.DataFrame(out)

            def close(self) -> None:
                pass

        return TTLCounts()

    return drop_null_keys(events_stream).groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=build(ttl_ms),
        outputStructType=TTL_COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )


def running_type_counts_with_backfill(
    events_stream: DataFrame, history: DataFrame
) -> DataFrame:
    """``running_type_counts`` seeded from a BATCH backfill — the
    ``initialState`` surface of arbitrary state v2 (the last v2 capability
    the other processors don't touch): ``handleInitialState`` runs once
    per key in the FIRST micro-batch, loading precomputed per-(user, type)
    counts into MapState before any streaming row is processed, so the
    changelog continues from history instead of restarting at zero.

    This is the production "backfill then stream" cutover: compute
    lifetime aggregates over the historical lake with a BATCH job (cheap,
    massively parallel), then start the stream with that state — instead
    of replaying months of history through the streaming engine.
    ``history`` is a batch DataFrame of (user_id, event_type, n); pass it
    pre-aggregated (one row per (user, type)) — the operator groups it by
    user_id as the v2 API requires."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SeededTypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("counts", "k string", "n long")

        def handleInitialState(
            self, key: tuple, initialState: pd.DataFrame, timerValues: Any
        ) -> None:
            for t, n in zip(initialState["event_type"], initialState["n"]):
                self._counts.updateValue((str(t),), (int(n),))

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            local: dict[str, int] = {}
            for pdf in rows:
                for t, c in pdf["event_type"].value_counts().items():
                    local[str(t)] = local.get(str(t), 0) + int(c)
            out: dict[str, list] = {"user_id": [], "event_type": [], "n": []}
            for t in sorted(local):
                prev = (
                    self._counts.getValue((t,))
                    if self._counts.containsKey((t,))
                    else None
                )
                n = (prev[0] if prev else 0) + local[t]
                self._counts.updateValue((t,), (n,))
                out["user_id"].append(key[0])
                out["event_type"].append(t)
                out["n"].append(n)
            yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return drop_null_keys(events_stream).groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SeededTypeCounts(),
        outputStructType=TYPE_COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="None",
        initialState=history.groupBy("user_id"),
    )
