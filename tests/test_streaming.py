"""Structured Streaming tests (SURVEY §2.12 extension): the streaming forms
produce the batch results for on-time data, and the watermark drops late
events (the semantics the batch oracle can't check)."""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_etl_elt_dashboard_spark.streaming.events import (
    session_agg,
    stream_events_from_parquet,
    stream_session,
    stream_tumbling,
    tumbling_agg,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def event_dir(spark, tmp_path):
    path = str(tmp_path / "events_stream")
    _write_events(
        spark,
        path,
        [
            (1, _ts(10, 5), 1, "view", 1.0),
            (2, _ts(10, 45), 1, "view", 2.0),
            (3, _ts(11, 10), 2, "click", 3.0),
            (4, _ts(12, 0), 2, "view", 4.0),
        ],
    )
    return path


def test_stream_tumbling_equals_batch(spark, event_dir):
    batch = spark.read.parquet(event_dir)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_agg(batch).collect()
    }

    stream = stream_events_from_parquet(spark, event_dir, EVENT_SCHEMA)
    q = (
        tumbling_agg(stream)
        .writeStream.format("memory")
        .queryName("tumbling_eq")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_eq").collect()
    }
    assert got == expected and len(got) == 3  # 10:05+10:45 share the 10:00 window


def test_stream_session_windows_equal_batch(spark, tmp_path):
    """Native session_window under the micro-batch engine merges the same
    sessions the batch form computes: two bursts 5 min apart fuse into one
    session; a burst past the 10-min gap opens a new one."""
    path = str(tmp_path / "events_sess")
    _write_events(
        spark,
        path,
        [
            (1, _ts(10, 0), 1, "view", 1.0),
            (2, _ts(10, 5), 1, "view", 1.0),  # same session (gap 5m < 10m)
            (3, _ts(10, 30), 1, "view", 1.0),  # new session (gap 25m)
            (4, _ts(10, 0), 2, "click", 2.0),
        ],
    )
    batch = spark.read.parquet(path)
    expected = {
        (r["session_start"], r["user_id"]): r["n_events"]
        for r in session_agg(batch).collect()
    }
    assert expected[(_ts(10, 0), 1)] == 2 and expected[(_ts(10, 30), 1)] == 1

    stream = stream_events_from_parquet(spark, path, EVENT_SCHEMA)
    q = (
        stream_session(stream)
        .writeStream.format("memory")
        .queryName("sess_eq")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["session_start"], r["user_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_eq").collect()
    }
    assert got == expected


def test_stream_watermark_drops_late_events(spark, tmp_path):
    """Two sequential runs over one checkpoint (guaranteed watermark
    advancement between micro-batches): run 1 sets the watermark to
    12:00−2h = 10:00; run 2 brings an event at 05:30 (window end 06:00 <
    watermark → dropped) plus an on-time one. The 05:00 window must never
    reach the append output."""
    path = str(tmp_path / "events_late")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(_: str):
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
        q = (
            stream_tumbling(stream, duration="1 hour", watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {r["window_start"] for r in spark.read.parquet(out).collect()}

    _write_events(
        spark,
        path,
        [
            (1, _ts(10, 5), 1, "view", 1.0),
            (2, _ts(12, 0), 1, "view", 2.0),
        ],
    )
    run("late_run1")  # watermark now 10:00, no window closed yet

    _write_events(
        spark,
        path,
        [
            (3, _ts(5, 30), 2, "click", 9.0),  # LATE: beyond watermark
            (4, _ts(14, 0), 2, "view", 3.0),  # on time, advances watermark to 12:00
        ],
    )
    starts = run("late_run2")
    assert _ts(5) not in starts, f"late event leaked into append output: {starts}"
    # the 10:00 window closed once the watermark reached 12:00
    assert _ts(10) in starts


def test_stream_gold_upsert_incremental_backfill(spark, tmp_path):
    """foreachBatch gold-layer upsert: first run materializes per-(day,
    type) partitions; a backfill run with the SAME checkpoint updates only
    the groups the new files touch — day-1 partition files stay untouched
    on disk, day-2 totals converge to the full-history answer."""
    import glob
    import os

    from bigdata_etl_elt_dashboard_spark.streaming.events import (
        stream_events_from_parquet,
        stream_upsert_daily_gold,
    )

    src = str(tmp_path / "src")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    d1, d2 = dt.datetime(2024, 3, 1, 10), dt.datetime(2024, 3, 2, 10)
    _write_events(
        spark,
        src,
        [(1, d1, 1, "view", 1.0), (2, d1, 2, "view", 2.0), (3, d2, 1, "click", 3.0)],
    )

    def run():
        q = (
            stream_upsert_daily_gold(
                stream_events_from_parquet(spark, src, EVENT_SCHEMA), gold, ckpt
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    first = {
        (str(r["event_date"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(gold).collect()
    }
    assert first == {
        ("2024-03-01", "view"): (2, 3.0),
        ("2024-03-02", "click"): (1, 3.0),
    }
    day1_files = sorted(
        glob.glob(os.path.join(gold, "event_date=2024-03-01", "*", "*.parquet"))
    )
    day1_mtimes = [os.path.getmtime(f) for f in day1_files]

    # late backfill: more day-2 clicks + a brand-new day-2 view group
    _write_events(spark, src, [(4, d2, 3, "click", 5.0), (5, d2, 4, "view", 7.0)])
    run()
    second = {
        (str(r["event_date"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(gold).collect()
    }
    assert second == {
        ("2024-03-01", "view"): (2, 3.0),
        ("2024-03-02", "click"): (2, 8.0),
        ("2024-03-02", "view"): (1, 7.0),
    }
    # surgical: the untouched day-1 partition's files were not rewritten
    assert day1_files == sorted(
        glob.glob(os.path.join(gold, "event_date=2024-03-01", "*", "*.parquet"))
    )
    assert day1_mtimes == [os.path.getmtime(f) for f in day1_files]


@pytest.mark.slow
def test_stream_gold_upsert_crash_recovery(spark, tmp_path, monkeypatch):
    """Failure injection for the gold upsert's exactly-once claim: the
    first run CRASHES MID-SINK-WRITE (one partition written, the other
    not, foreachBatch raises before the commit log records the batch) —
    the worst torn-write state. A restart from the same checkpoint must
    replay the uncommitted batch and converge the gold table to exactly
    the single-clean-run result; a subsequent incremental run must keep
    working off the recovered checkpoint."""
    from bigdata_etl_elt_dashboard_spark.sources import sinks
    from bigdata_etl_elt_dashboard_spark.streaming.events import (
        stream_events_from_parquet,
        stream_upsert_daily_gold,
    )

    src = str(tmp_path / "src")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    d1, d2 = dt.datetime(2024, 3, 1, 10), dt.datetime(2024, 3, 2, 10)
    _write_events(
        spark,
        src,
        [(1, d1, 1, "view", 1.0), (2, d1, 2, "view", 2.0), (3, d2, 1, "click", 3.0)],
    )

    real_overwrite = sinks.overwrite_partitions
    crashed = {"n": 0}

    def torn_write(df, path, partition_by):
        # persist ONE of the two touched partitions, then die — the torn
        # state a mid-write executor/driver loss leaves behind
        crashed["n"] += 1
        real_overwrite(df.filter(F.col("event_type") == "click"), path, partition_by)
        raise RuntimeError("injected sink crash")

    monkeypatch.setattr(sinks, "overwrite_partitions", torn_write)

    def run():
        q = (
            stream_upsert_daily_gold(
                stream_events_from_parquet(spark, src, EVENT_SCHEMA), gold, ckpt
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="injected sink crash"):
        run()
    assert crashed["n"] == 1
    # torn: only the click partition landed
    torn = {
        (str(r["event_date"]), r["event_type"])
        for r in spark.read.parquet(gold).collect()
    }
    assert torn == {("2024-03-02", "click")}

    # recovery: same checkpoint, healthy sink — the uncommitted batch
    # replays (its offsets were logged but never committed) and the
    # dynamic-partition overwrite makes the replayed write idempotent
    monkeypatch.setattr(sinks, "overwrite_partitions", real_overwrite)
    run()
    recovered = {
        (str(r["event_date"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(gold).collect()
    }
    expected_single_run = {
        ("2024-03-01", "view"): (2, 3.0),
        ("2024-03-02", "click"): (1, 3.0),
    }
    assert recovered == expected_single_run

    # and the recovered checkpoint keeps serving incremental batches
    _write_events(spark, src, [(4, d2, 3, "click", 5.0)])
    run()
    after = {
        (str(r["event_date"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(gold).collect()
    }
    assert after == {
        ("2024-03-01", "view"): (2, 3.0),
        ("2024-03-02", "click"): (2, 8.0),
    }


@pytest.mark.slow
def test_stream_medallion_capstone_crash_recovery(spark, tmp_path, monkeypatch):
    """The COMPOSED streaming capstone: at-least-once ingest (replayed
    rows) → dropDuplicatesWithinWatermark → event-time timer
    sessionization → gold MERGE upsert, as ONE continuous query
    (streaming/pipeline.stream_sessions_gold). Three proofs in sequence:

    1. torn-write crash: the first gold merge persists only one user's
       rows then dies before the commit log records the batch — the
       worst partial-sink state;
    2. recovery: restarting from the same checkpoint replays the
       uncommitted batch, the idempotent merge converges, the timer
       no-data batch closes trailing sessions, and the gold table equals
       the composed BATCH recompute (sessions_gold_batch — whose day
       rollup is oracle-gated as ev_stream_pipeline_gold_twin);
    3. increment: a later event closes a checkpointed OPEN session by
       'gap'; gold again equals the batch recompute over all data.
    """
    from bigdata_etl_elt_dashboard_spark.sources import sinks
    from bigdata_etl_elt_dashboard_spark.streaming.pipeline import (
        sessions_gold_batch,
        stream_sessions_gold,
    )
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    src = str(tmp_path / "src")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    def mins(n):
        return _ts(10, 0) + dt.timedelta(minutes=n)

    def ms(n):
        return int(mins(n).timestamp() * 1000)

    def ev(eid, uid, n):
        return (eid, mins(n), uid, "view", 1.0)

    # u1: sessions (0-5) gap-closed inline + (30) timer-closed at drain;
    # u2: (45-50) still OPEN at drain (expiry 60 > max 50) — must NOT
    # reach gold; u3: (0) gap-closed + (20) timer-closed. Events 1 and 4
    # are REPLAYED byte-identically (at-least-once delivery).
    rows = [
        ev(1, 1, 0), ev(2, 1, 5), ev(3, 1, 30),
        ev(4, 2, 45), ev(5, 2, 50),
        ev(7, 3, 0), ev(8, 3, 20),
        ev(1, 1, 0), ev(4, 2, 45),  # replays
    ]
    _write_events(spark, src, rows)

    def run():
        q = (
            stream_sessions_gold(
                stream_events_from_parquet(spark, src, EVENT_SCHEMA),
                gold,
                ckpt,
                gap_ms=600_000,
                n_buckets=4,
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    def gold_rows():
        return sorted(
            (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"], r["closed_by"])
            for r in spark.read.parquet(gold).drop("_bucket").collect()
        )

    def batch_rows():
        return sorted(
            (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"], r["closed_by"])
            for r in sessions_gold_batch(
                spark.read.parquet(src), gap_ms=600_000
            ).collect()
        )

    real_merge = sinks.merge_upsert_parquet
    crashed = {"n": 0}

    def torn_merge(df, path, key_cols, n_buckets=16):
        # persist ONE user's slice of the batch, then die before the
        # streaming commit log records the batch — the torn state a
        # mid-merge executor/driver loss leaves behind
        crashed["n"] += 1
        real_merge(df.filter(F.col("user_id") == 1), path, key_cols, n_buckets)
        raise RuntimeError("injected merge crash")

    monkeypatch.setattr(sinks, "merge_upsert_parquet", torn_merge)

    from pyspark.errors.exceptions.captured import StreamingQueryException

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        with pytest.raises(StreamingQueryException, match="injected merge crash"):
            run()
        assert crashed["n"] == 1
        # torn: only u1's gap-closed session landed (u3's is missing)
        assert gold_rows() == [(1, ms(0), ms(5), 2, "gap")]

        # recovery: same checkpoint, healthy sink — the uncommitted batch
        # replays (idempotent merge), the timer no-data batch closes the
        # trailing sessions, and gold == the composed batch recompute
        monkeypatch.setattr(sinks, "merge_upsert_parquet", real_merge)
        run()
        expected = [
            (1, ms(0), ms(5), 2, "gap"),     # dedup: replay of id 1 collapsed
            (1, ms(30), ms(30), 1, "timer"),
            (3, ms(0), ms(0), 1, "gap"),
            (3, ms(20), ms(20), 1, "timer"),
        ]
        assert gold_rows() == expected
        assert gold_rows() == batch_rows()  # u2's open session in neither

        # increment: u2's successor at minute 70 closes the CHECKPOINTED
        # open session by 'gap' (and opens a new one that stays open)
        _write_events(spark, src, [ev(6, 2, 70)])
        run()
        assert gold_rows() == sorted(expected + [(2, ms(45), ms(50), 2, "gap")])
        assert gold_rows() == batch_rows()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.mark.slow
def test_stream_stream_range_join(spark, tmp_path):
    """Watermarked stream-stream join: clicks pair with the same user's
    views from the preceding 10 minutes — matches the batch range-join
    semantics on the same data ([ts-10m, ts) window, key-scoped)."""
    from bigdata_etl_elt_dashboard_spark.streaming.events import (
        stream_click_view_join,
        stream_events_from_parquet,
    )

    src = str(tmp_path / "src")
    _write_events(
        spark,
        src,
        [
            (1, _ts(10, 0), 1, "view", 1.0),    # 10:00 view
            (2, _ts(10, 5), 1, "view", 2.0),    # 10:05 view
            (3, _ts(10, 9), 1, "click", 0.0),   # click: pairs with BOTH views
            (4, _ts(10, 30), 1, "click", 0.0),  # click: no view in [10:20,10:30)
            (5, _ts(10, 4), 2, "click", 0.0),   # other user: 10:00 view is not theirs
        ],
    )
    stream = lambda et: stream_events_from_parquet(spark, src, EVENT_SCHEMA).filter(
        F.col("event_type") == et
    )
    q = (
        stream_click_view_join(stream("click"), stream("view"))
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["view_ts"].minute, r["view_value"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    assert got == {(3, 0, 1.0), (3, 5, 2.0)}


@pytest.mark.slow
def test_stream_click_view_outer_null_emission(spark, tmp_path):
    """LEFT OUTER stream-stream join contract, two sequential drains over
    one checkpoint:

    1. run 1 delivers all real traffic inside a 16-minute span, so the
       watermark (max ts − 30 min) stays BELOW every click: matched pairs
       emit eagerly, but no null-extended row may appear yet — the join
       cannot prove a late view won't still match those clicks;
    2. run 2 delivers only far-future sentinels that push both sides'
       watermarks past every real click: EXACTLY the unmatched clicks now
       emit once each, null-extended; the sentinel click itself (still
       inside the new watermark horizon) stays buffered and must NOT leak;
    3. the drained output equals the batch twin (operators/temporal
       .range_join row-level LEFT semantics, driver-gated as
       ev_click_view_outer_twin) on the real traffic.

    Between the runs, the checkpoint is audited OFFLINE with the state
    data source (sources/state_reader.py): the join's left buffer must
    hold exactly the three undecided clicks — matched ones included, they
    can still match more views — and the right buffer both views.
    """
    from bigdata_etl_elt_dashboard_spark.sources.state_reader import state_rows
    from bigdata_etl_elt_dashboard_spark.streaming.events import (
        stream_click_view_join_outer,
        stream_events_from_parquet,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        stream = lambda et: stream_events_from_parquet(  # noqa: E731
            spark, src, EVENT_SCHEMA
        ).filter(F.col("event_type") == et)
        q = (
            stream_click_view_join_outer(stream("click"), stream("view"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r["click_id"], None if r["view_ts"] is None else r["view_ts"].minute,
             r["view_value"])
            for r in spark.read.parquet(out).collect()
        }

    _write_events(
        spark,
        src,
        [
            (1, _ts(10, 0), 1, "view", 1.0),
            (2, _ts(10, 5), 1, "view", 2.0),
            (3, _ts(10, 9), 1, "click", 0.0),   # matches BOTH views
            (4, _ts(10, 16), 1, "click", 0.0),  # window [10:06,10:16): no view
            (5, _ts(10, 4), 2, "click", 0.0),   # other user: no view at all
        ],
    )
    got1 = drain()
    assert got1 == {(3, 0, 1.0), (3, 5, 2.0)}, (
        f"null rows may not emit before the watermark proves them: {got1}"
    )

    # offline audit of the stopped query's join state: key = the equi-join
    # key (user_id, exposed as field0), value = the buffered row
    left = {r["click_id"] for r in state_rows(spark, ckpt, join_side="left")
            .select("value.click_id").collect()}
    right = {r["view_ts"].minute for r in state_rows(spark, ckpt, join_side="right")
             .select("value.view_ts").collect()}
    assert left == {3, 4, 5} and right == {0, 5}

    _write_events(
        spark,
        src,
        [
            (90, _ts(13, 0), 99, "click", 0.0),  # sentinel: advances click WM
            (91, _ts(13, 0), 99, "view", 9.0),   # sentinel: advances view WM
        ],
    )
    got2 = drain()
    assert got2 == {(3, 0, 1.0), (3, 5, 2.0), (4, None, None), (5, None, None)}, (
        f"exactly the unmatched real clicks emit null-extended: {got2}"
    )

    # batch-twin equality on the real traffic (the driver gates the same
    # twin against DuckDB as ev_click_view_outer_twin)
    from bigdata_etl_elt_dashboard_spark.operators.temporal import range_join

    batch = spark.read.parquet(src).filter(F.col("event_id") < 90)
    twin = range_join(
        batch.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts"),
        batch.filter(F.col("event_type") == "view").select("user_id", "ts", "value"),
        key="user_id", left_ts="ts", right_ts="ts", window_seconds=600,
    )
    expected = {
        (r["event_id"], None if r["r_ts"] is None else r["r_ts"].minute, r["r_value"])
        for r in twin.collect()
    }
    assert got2 == expected


@pytest.mark.slow
def test_stream_click_view_full_outer_both_null_classes(spark, tmp_path):
    """FULL OUTER stream-stream join: the two null classes emit on their
    OWN watermark horizons, derived from one join condition. Run 1 (all
    traffic in a 16-minute span, watermark below everything): matched
    pairs only. Run 2 (sentinels push the watermark past all real
    traffic + match windows): the never-matched clicks null-emit (left
    horizon: click_ts), the orphan view null-emits (right horizon:
    view_ts + window), matched rows on BOTH sides emit nothing more,
    and the sentinels themselves stay buffered."""
    from bigdata_etl_elt_dashboard_spark.streaming.events import (
        stream_click_view_join_full,
        stream_events_from_parquet,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        stream = lambda et: stream_events_from_parquet(  # noqa: E731
            spark, src, EVENT_SCHEMA
        ).filter(F.col("event_type") == et)
        q = (
            stream_click_view_join_full(stream("click"), stream("view"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r["click_id"], None if r["view_ts"] is None else r["view_ts"].minute,
             r["view_value"])
            for r in spark.read.parquet(out).collect()
        }

    _write_events(
        spark,
        src,
        [
            (1, _ts(10, 0), 1, "view", 1.0),   # matched (click 3)
            (2, _ts(10, 5), 1, "view", 2.0),   # matched (click 3)
            (3, _ts(10, 9), 1, "click", 0.0),  # matched click
            (4, _ts(10, 16), 1, "click", 0.0), # unmatched click
            (5, _ts(10, 4), 2, "click", 0.0),  # unmatched click
            (6, _ts(10, 2), 3, "view", 5.0),   # ORPHAN view: user 3 never clicks
        ],
    )
    got1 = drain()
    assert got1 == {(3, 0, 1.0), (3, 5, 2.0)}, f"matched-only before watermark: {got1}"

    _write_events(
        spark,
        src,
        [
            (90, _ts(13, 0), 99, "click", 0.0),
            (91, _ts(13, 0), 99, "view", 9.0),
        ],
    )
    got2 = drain()
    assert got2 == {
        (3, 0, 1.0), (3, 5, 2.0),          # matched pairs (run 1)
        (4, None, None), (5, None, None),  # never-matched clicks
        (None, 2, 5.0),                    # the orphan view, click side null
    }, f"both null classes, nothing else: {got2}"
    # user_id must survive on the orphan row (coalesced from the view side)
    orphan = [r for r in spark.read.parquet(out).collect() if r["click_id"] is None]
    assert [(r["user_id"], r["view_value"]) for r in orphan] == [(3, 5.0)]


@pytest.mark.slow
def test_stream_click_view_outer_disorder_no_retraction(spark, tmp_path):
    """Outer-join disorder contract over four sequential drains:

    1. a click arrives FIRST — nothing emits (no match, and null emission
       would be premature);
    2. a view with an EARLIER event time arrives a batch later (disordered
       delivery, still above the watermark): it must match the buffered
       click across the batch boundary and emit the pair;
    3. sentinels push the watermark past all real traffic: the still
       unmatched click emits its null row; the already-matched click must
       NOT also emit one (matched state survives eviction);
    4. a view below the watermark arrives that WOULD have matched the
       null-emitted click: it is dropped — an emitted outer result is
       FINAL, append mode can never retract the null row or emit the
       late pair. Output is byte-stable across drains 3→4.
    """
    from bigdata_etl_elt_dashboard_spark.streaming.events import (
        stream_click_view_join_outer,
        stream_events_from_parquet,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        stream = lambda et: stream_events_from_parquet(  # noqa: E731
            spark, src, EVENT_SCHEMA
        ).filter(F.col("event_type") == et)
        q = (
            stream_click_view_join_outer(stream("click"), stream("view"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r["click_id"], None if r["view_ts"] is None else r["view_ts"].minute,
             r["view_value"])
            for r in spark.read.parquet(out).collect()
        }

    _write_events(spark, src, [(10, _ts(10, 20), 1, "click", 0.0)])
    assert drain() == set(), "a lone click emits nothing before its watermark"

    _write_events(
        spark,
        src,
        [
            (11, _ts(10, 15), 1, "view", 7.0),   # EARLIER than the click, later batch
            (12, _ts(10, 25), 2, "click", 0.0),  # will never match
        ],
    )
    assert drain() == {(10, 15, 7.0)}, "disordered view must match the buffered click"

    _write_events(
        spark,
        src,
        [
            (90, _ts(11, 30), 99, "click", 0.0),
            (91, _ts(11, 30), 99, "view", 9.0),
        ],
    )
    got3 = drain()
    assert got3 == {(10, 15, 7.0), (12, None, None)}, (
        f"watermark closes ONLY the unmatched click with a null row: {got3}"
    )

    # a view below the watermark that would have matched click 12
    _write_events(spark, src, [(13, _ts(10, 24), 2, "view", 9.9)])
    got4 = drain()
    assert got4 == got3, (
        f"late view must be dropped — outer results are final, no retraction "
        f"and no late pair: {got4 - got3 or got3 - got4}"
    )


def test_stream_static_enrich_join(spark, event_dir):
    """Stream-static join: a micro-batch stream broadcast-enriched against
    a static dimension — the streaming form of the fact→dim joins (J2-J5).
    Static side is re-resolvable per micro-batch; no watermark needed."""
    user_dim = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "user_id long, user_name string"
    )
    stream = stream_events_from_parquet(spark, event_dir, EVENT_SCHEMA)
    enriched = stream.join(F.broadcast(user_dim), "user_id").groupBy("user_name").count()
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_eq")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_name"]: r["count"] for r in spark.sql("SELECT * FROM enrich_eq").collect()}
    assert got == {"alice": 2, "bob": 2}


def test_stream_dedup_within_watermark_equals_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark collapses replayed event_ids to the
    same row set a batch dropDuplicates produces: duplicates delivered
    within the watermark horizon are dropped, and per-id state is evicted
    after the horizon (bounded state — the streaming exactly-once dedup
    contract the batch twin ev_replay_dedup_digest gates)."""
    from bigdata_etl_elt_dashboard_spark.streaming.events import stream_dedup

    path = str(tmp_path / "events_dup")
    _write_events(
        spark,
        path,
        [
            (1, _ts(10, 0), 1, "view", 1.0),
            (1, _ts(10, 1), 1, "view", 1.0),  # replay of id 1 (1 min later)
            (2, _ts(10, 2), 1, "click", 2.0),
            (2, _ts(10, 2), 1, "click", 2.0),  # exact duplicate delivery
            (3, _ts(10, 30), 2, "view", 3.0),
        ],
    )
    batch_ids = sorted(
        r["event_id"]
        for r in spark.read.parquet(path).dropDuplicates(["event_id"]).collect()
    )
    assert batch_ids == [1, 2, 3]

    stream = stream_events_from_parquet(spark, path, EVENT_SCHEMA)
    q = (
        stream_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_eq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["event_id"] for r in spark.sql("SELECT * FROM dedup_eq").collect()
    )
    assert got == batch_ids


@pytest.mark.slow
def test_stream_medallion_disordered_nonzero_delay(spark, tmp_path):
    """VERDICT r09 task 4: the COMPOSED medallion chain (at-least-once
    ingest → dropDuplicatesWithinWatermark → timer sessionization → gold
    MERGE) drained with a NONZERO watermark delay over a disordered
    multi-batch delivery — the straggler-admit path through the full
    chain, previously tested only on the sessionizer alone.

    gap = 10 min, dedup_horizon = 30 min. Three availableNow runs over
    one checkpoint:
      run 1: u1 [10:00, 10:05] and u2 [10:20, 10:25] open; watermark ends
             at 09:55 — nothing closes;
      run 2 (disordered): u1 straggler @10:12 is BELOW u2's prior events
             but inside the horizon — admitted, merges into u1's open
             session ([0..12], 3 events); a byte-identical replay of
             event 1 crosses the batch boundary and the dedup state
             (key held until watermark > ts + horizon) drops it; u3
             opens @10:35. Watermark ends at 10:05 — still nothing
             closes (u1's re-registered timer is 10:22 > 10:05);
      run 3: u2's successor @11:10 closes u2 [20,25] by 'gap'; the
             anchor @11:40 (u9) drives the terminal watermark to 11:10,
             firing timers for u1 (expiry 10:22) and u3 (10:45) while
             u2's new session (expiry 11:20) and u9's (11:50) stay OPEN
             and must NOT reach gold.

    Gold must equal the batch twin with the SAME delay (terminal
    watermark = max event time − delay), which is what makes the
    nonzero-delay timer adjudication cross-checked rather than assumed."""
    from bigdata_etl_elt_dashboard_spark.streaming.pipeline import (
        sessions_gold_batch,
        stream_sessions_gold,
    )
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    src = str(tmp_path / "src")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    def mins(n):
        return _ts(10, 0) + dt.timedelta(minutes=n)

    def ms(n):
        return int(mins(n).timestamp() * 1000)

    def ev(eid, uid, n):
        return (eid, mins(n), uid, "view", 1.0)

    batches = [
        [ev(1, 1, 0), ev(2, 1, 5), ev(10, 2, 20), ev(11, 2, 25)],
        [ev(3, 1, 12), ev(1, 1, 0), ev(30, 3, 35)],  # straggler + replay
        [ev(12, 2, 70), ev(90, 9, 100)],
    ]

    def run():
        q = (
            stream_sessions_gold(
                stream_events_from_parquet(spark, src, EVENT_SCHEMA),
                gold,
                ckpt,
                gap_ms=600_000,
                dedup_horizon="30 minutes",
                n_buckets=4,
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    def gold_rows():
        import os

        if not os.path.exists(gold):
            return []
        return sorted(
            (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"], r["closed_by"])
            for r in spark.read.parquet(gold).drop("_bucket").collect()
        )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_events(spark, src, batches[0])
        run()
        assert gold_rows() == []  # nothing closed at watermark 09:55

        _write_events(spark, src, batches[1])
        run()
        # straggler admitted and merged (no premature emission), replay
        # deduped across the batch boundary, still nothing closed
        assert gold_rows() == []

        _write_events(spark, src, batches[2])
        run()
        expected = [
            (1, ms(0), ms(12), 3, "timer"),   # merged straggler, 3 events
            (2, ms(20), ms(25), 2, "gap"),
            (3, ms(35), ms(35), 1, "timer"),
        ]
        assert gold_rows() == expected
        # equality with the batch twin at the SAME watermark delay
        twin = sorted(
            (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"], r["closed_by"])
            for r in sessions_gold_batch(
                spark.read.parquet(src), gap_ms=600_000, delay_ms=30 * 60_000
            ).collect()
        )
        assert gold_rows() == twin
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.mark.slow
def test_timer_vs_gap_arrival_order_contract(spark, tmp_path):
    """VERDICT r09 task 5: the 8-batch incremental drain left 4 rows that
    differed from the batch twin ONLY in `closed_by` as a prose
    tolerance. This test CONSTRUCTS that divergence deterministically
    and asserts its exact shape, so the contract is executable:

    gap = 10 min, delay = 0. Batch 1 holds u1@10:00 plus an anchor
    u9@10:30; the run-1 no-data batch advances the watermark to 10:30,
    firing u1's timer (expiry 10:10) → the stream closes u1 [0,0] by
    'timer'. Batch 2 then delivers u1's ≥-gap successor @10:40 — the
    single-drain batch twin sees a successor and calls the same session
    'gap'. The contract: arrival order may flip `closed_by` on exactly
    such sessions, but NEVER bounds, counts, or membership —
    the symmetric diff is {u1 [0,0]: stream='timer', twin='gap'} and
    nothing else, and every closed_by disagreement is in the one legal
    direction (stream 'timer' where the twin says 'gap' — a timer can
    fire early when the successor is still in flight; the reverse,
    stream 'gap' where the twin says 'timer', is impossible because a
    successor the stream processed also exists in the twin's input)."""
    from bigdata_etl_elt_dashboard_spark.streaming.pipeline import (
        sessions_gold_batch,
        stream_sessions_gold,
    )
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    src = str(tmp_path / "src")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    def mins(n):
        return _ts(10, 0) + dt.timedelta(minutes=n)

    def ms(n):
        return int(mins(n).timestamp() * 1000)

    def ev(eid, uid, n):
        return (eid, mins(n), uid, "view", 1.0)

    def run():
        q = (
            stream_sessions_gold(
                stream_events_from_parquet(spark, src, EVENT_SCHEMA),
                gold,
                ckpt,
                gap_ms=600_000,
                n_buckets=4,
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_events(spark, src, [ev(1, 1, 0), ev(2, 9, 30)])
        run()
        _write_events(spark, src, [ev(3, 1, 40), ev(4, 9, 60)])
        run()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    stream_rows = {
        (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"]): r["closed_by"]
        for r in spark.read.parquet(gold).drop("_bucket").collect()
    }
    twin_rows = {
        (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"]): r["closed_by"]
        for r in sessions_gold_batch(spark.read.parquet(src), gap_ms=600_000).collect()
    }
    # membership, bounds and counts NEVER differ
    assert stream_rows.keys() == twin_rows.keys()
    # the closed_by disagreement is exactly the constructed session, in
    # exactly the legal direction
    diffs = {
        k: (stream_rows[k], twin_rows[k])
        for k in stream_rows
        if stream_rows[k] != twin_rows[k]
    }
    assert diffs == {(1, ms(0), ms(0), 1): ("timer", "gap")}
    for k, (s, t) in diffs.items():
        assert (s, t) == ("timer", "gap"), f"illegal closed_by flip on {k}"
    # and the non-diverging rows are what the construction predicts
    assert twin_rows == {
        (1, ms(0), ms(0), 1): "gap",
        (1, ms(40), ms(40), 1): "timer",
        (9, ms(30), ms(30), 1): "gap",
    }
