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
