"""Offline state-store reader tests (sources/state_reader.py).

The state data source is an operational contract: what the checkpoint
holds must be auditable as DataFrames, without re-running the query. Each
test drives a REAL streaming query over a checkpoint, then reads the
state back and asserts its contents against the events that produced it —
never just "it loads".
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_etl_elt_dashboard_spark.sources.state_reader import (
    state_metadata,
    state_rows,
)
from bigdata_etl_elt_dashboard_spark.streaming.events import (
    stream_events_from_parquet,
)
from bigdata_etl_elt_dashboard_spark.streaming.stateful import stream_dedup_exact

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
def dedup_checkpoint(spark, tmp_path):
    """A drained dropDuplicates query: 4 distinct ids, one replayed."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_events(
        spark,
        src,
        [
            (1, _ts(10, 0), 1, "view", 1.0),
            (2, _ts(10, 5), 1, "view", 2.0),
            (2, _ts(10, 5), 1, "view", 2.0),  # replay: dropped, not re-keyed
            (3, _ts(10, 9), 2, "click", 0.0),
            (4, _ts(10, 30), 2, "click", 0.0),
        ],
    )
    q = (
        stream_dedup_exact(stream_events_from_parquet(spark, src, EVENT_SCHEMA))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return ckpt, out


def test_state_metadata_lists_the_dedup_operator(spark, dedup_checkpoint):
    ckpt, _ = dedup_checkpoint
    meta = state_metadata(spark, ckpt).collect()
    assert len(meta) == 1, f"one stateful operator expected: {meta}"
    row = meta[0]
    assert row["operatorId"] == 0
    assert row["operatorName"] == "dedupe"
    # the store partition count is the contract the statestore reader (and
    # any state-repair tooling) must address — it is the query's shuffle
    # partition setting at first run, NOT the current session default
    assert row["numPartitions"] == int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert row["maxBatchId"] >= 0


def test_statestore_rows_are_the_dedup_ledger(spark, dedup_checkpoint):
    """The dedup state IS the set of distinct keys the sink received —
    replays leave no extra state row; every emitted id has exactly one."""
    ckpt, out = dedup_checkpoint
    emitted = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert emitted == {1, 2, 3, 4}

    state = state_rows(spark, ckpt).select("key.event_id", "partition_id").collect()
    assert {r["event_id"] for r in state} == emitted
    assert len(state) == 4, "replayed id must not duplicate its state row"
    # rows land on the partition their key hashes to — the invariant that
    # lets an offline audit shard by partition_id at scale
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert all(0 <= r["partition_id"] < n_part for r in state)


def test_statestore_reads_transformwithstate_variable(spark, tmp_path):
    """stateVarName reads a transformWithState processor's typed state:
    after a drain that closes one session by gap and leaves the trailing
    session OPEN, the sessionizer's 'sess' ValueState must hold exactly
    the open session — per user, with the interval the processor will
    resume from (the state a restart, or an offline repair job, reads)."""
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
        session_close_on_timer,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    ev_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 3, 1, 10, 0)

    def m(mins):
        return t0 + dt.timedelta(minutes=mins)

    def ms(mins):
        return int(m(mins).timestamp() * 1000)

    spark.createDataFrame(
        [
            (1, 1, m(0)),   # session A
            (2, 1, m(5)),   # session A (gap 5m < 10m)
            (3, 1, m(30)),  # closes A by gap; opens trailing session B
            (4, 2, m(31)),  # user 2: single open session
        ],
        ev_schema,
    ).coalesce(1).write.parquet(src)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(ev_schema).parquet(src)
        q = (
            session_close_on_timer(stream, gap_ms=600_000)
            .writeStream.format("memory")
            .queryName("tws_state_read")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    meta = state_metadata(spark, ckpt).collect()
    assert [r["operatorName"] for r in meta] == ["transformWithStateInPandasExec"]

    # watermark = max ts (delay 0) => 10:31; expiries 10:40/10:41 are ahead
    # of it, so BOTH trailing sessions must still be open in state
    state = {
        r["user_id"]: (r["start_ms"], r["last_ms"], r["n"])
        for r in state_rows(spark, ckpt, state_var_name="sess")
        .select("key.user_id", "value.start_ms", "value.last_ms", "value.n")
        .collect()
    }
    assert state == {1: (ms(30), ms(30), 1), 2: (ms(31), ms(31), 1)}


@pytest.mark.slow
def test_state_migration_via_reader_and_initialstate(spark, tmp_path):
    """Checkpoint MIGRATION without source replay: read a retired query's
    state offline (statestore reader), hand it to a FRESH query as
    initialState, and the new checkpoint continues the changelog exactly
    where the old one stopped — per-(user, type) totals after the cutover
    equal a single continuous run over all events. This is the
    operational path for checkpoint-incompatible upgrades (operator
    topology, store provider, key schema): a batch read + seed, not a
    months-long source replay."""
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
        running_type_counts,
        running_type_counts_with_backfill,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    src_old = str(tmp_path / "src_old")
    src_new = str(tmp_path / "src_new")
    ckpt_old = str(tmp_path / "ckpt_old")
    ckpt_new = str(tmp_path / "ckpt_new")

    _write_events(
        spark,
        src_old,
        [
            (1, _ts(10, 0), 1, "view", 1.0),
            (2, _ts(10, 1), 1, "view", 1.0),
            (3, _ts(10, 2), 1, "click", 1.0),
            (4, _ts(10, 3), 2, "view", 1.0),
        ],
    )
    _write_events(
        spark,
        src_new,
        [
            (5, _ts(11, 0), 1, "view", 1.0),
            (6, _ts(11, 1), 2, "purchase", 1.0),
            (7, _ts(11, 2), 3, "view", 1.0),  # key unseen by the old query
        ],
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            running_type_counts(stream_events_from_parquet(spark, src_old, EVENT_SCHEMA))
            .writeStream.format("memory")
            .queryName("mig_old")
            .outputMode("append")
            .option("checkpointLocation", ckpt_old)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

        # offline: old state -> the (user_id, event_type, n) history frame
        history = (
            state_rows(spark, ckpt_old, state_var_name="counts")
            .select(
                F.col("key.user_id").alias("user_id"),
                F.col("user_map_key.k").alias("event_type"),
                F.col("user_map_value.n").alias("n"),
            )
        )
        assert {(r["user_id"], r["event_type"], r["n"]) for r in history.collect()} == {
            (1, "view", 2), (1, "click", 1), (2, "view", 1),
        }

        q = (
            running_type_counts_with_backfill(
                stream_events_from_parquet(spark, src_new, EVENT_SCHEMA), history
            )
            .writeStream.format("memory")
            .queryName("mig_new")
            .outputMode("append")
            .option("checkpointLocation", ckpt_new)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    # the migrated checkpoint's state == one continuous run over ALL events
    migrated = {
        (r["user_id"], r["event_type"], r["n"])
        for r in state_rows(spark, ckpt_new, state_var_name="counts")
        .select(
            F.col("key.user_id").alias("user_id"),
            F.col("user_map_key.k").alias("event_type"),
            F.col("user_map_value.n").alias("n"),
        )
        .collect()
    }
    continuous = {
        (r["user_id"], r["event_type"], r["n"])
        for r in spark.read.parquet(src_old).unionByName(spark.read.parquet(src_new))
        .groupBy("user_id", "event_type").agg(F.count("*").alias("n")).collect()
    }
    assert migrated == continuous


def test_statestore_batchid_reads_historic_snapshot(spark, tmp_path):
    """batchId selects the state AS OF an earlier committed batch: after a
    second drain adds ids, batch-0 state still shows only the first run's
    ledger (the versioned-checkpoint isolation audits depend on)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            stream_dedup_exact(stream_events_from_parquet(spark, src, EVENT_SCHEMA))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_events(spark, src, [(1, _ts(10, 0), 1, "view", 1.0)])
    drain()
    _write_events(spark, src, [(2, _ts(10, 5), 1, "view", 2.0)])
    drain()

    meta = state_metadata(spark, ckpt).collect()[0]
    first, last = meta["minBatchId"], meta["maxBatchId"]
    assert last > first
    old = {r["event_id"] for r in state_rows(spark, ckpt, batch_id=first).select("key.event_id").collect()}
    new = {r["event_id"] for r in state_rows(spark, ckpt, batch_id=last).select("key.event_id").collect()}
    assert old == {1}
    assert new == {1, 2}

def test_emitted_digest_counts_null_keyed_pairs(spark):
    """r12 advice: the src_state_reader_digest sink digest must count a
    null composite key the way the oracle's COUNT(*) over SELECT DISTINCT
    does — struct-wrapping makes count_distinct null-faithful (bare
    count_distinct(a, b) drops rows where either key is null)."""
    from bigdata_etl_elt_dashboard_spark.plans.wave12 import _emitted_digest

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (None, "a"), (1, None), (None, None)],
        T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
            ]
        ),
    )
    row = _emitted_digest(df).collect()[0]
    assert row["n_emitted"] == 5
    # distinct pairs: (1,a), (null,a), (1,null), (null,null)
    assert row["n_emitted_keys"] == 4
