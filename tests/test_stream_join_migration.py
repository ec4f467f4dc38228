"""Stream-stream join checkpoint migration (streaming/migration.py).

Round-11 proved checkpoint migration for transformWithState (offline state
read → initialState seed). Join buffers have no initialState surface, so
the migration path is SOURCE re-seeding: the old checkpoint's buffers —
read offline with sources/state_reader — are exactly the prefix a
restarted query must re-ingest (the eviction contract proves everything
older is closed-and-final). Each test kills a join query mid-stream,
migrates to a FRESH checkpoint seeded from the dead one's state, continues
with the not-yet-ingested tail, and asserts the deduplicated union of the
two runs' outputs is exceptAll-bit-equal to an uninterrupted run — with
re-emission bounded to both-sides-buffered pairs, and (leftOuter) no false
null-extension.

The scenario straddles every class the recipe must carry:
- a pair fully closed before the kill (must NOT be re-seeded or re-emit);
- a pair both of whose sides are buffered at the kill (re-emits once —
  the bounded duplication an idempotent sink absorbs);
- boundary views buffered at the kill whose clicks arrive after it;
- a still-open click whose matching view arrives LATE after the kill;
- (leftOuter) one unmatched click closed-as-null before the kill and one
  closed only after migration.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_etl_elt_dashboard_spark.sources.state_reader import (
    checkpoint_watermark,
)
from bigdata_etl_elt_dashboard_spark.streaming.events import (
    stream_click_view_join,
    stream_click_view_join_outer,
    stream_events_from_parquet,
)
from bigdata_etl_elt_dashboard_spark.streaming.migration import (
    read_click_view_buffers,
    reseed_click_view_source,
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


def _write(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


# phase 1 (ingested before the kill; max ts 11:59 → watermark 11:29)
P1 = [
    (1, _ts(10, 0), 1, "view", 1.0),    # closed pair, view evicted by kill
    (2, _ts(10, 5), 1, "click", 0.0),   #   ...emits in run A only
    (3, _ts(11, 50), 2, "view", 2.0),   # buffered view; click arrives post-kill
    (4, _ts(11, 58), 3, "view", 3.0),   # buffered view; click arrives post-kill
    (5, _ts(11, 59), 1, "click", 0.0),  # open click; its view arrives LATE post-kill
    (10, _ts(11, 32), 5, "view", 6.0),  # both-buffered pair: emits in run A
    (11, _ts(11, 40), 5, "click", 0.0), #   AND re-emits after migration
    (12, _ts(10, 45), 6, "click", 0.0), # unmatched; closed-as-null pre-kill
    (13, _ts(11, 45), 7, "click", 0.0), # unmatched; open at kill → null post-kill
    (14, _ts(11, 22), 8, "view", 7.0),  # buffered right-frontier view, never matched
    (16, _ts(11, 25), 10, "view", 9.0), # buffered view whose CLICK closes pre-kill
    (17, _ts(11, 27), 10, "click", 0.0),#   (the fullOuter false-orphan hazard)
    (18, _ts(10, 30), 11, "view", 10.0),# unmatched view closed-as-orphan pre-kill
]
# the watermark-advancing tick run A ingests second (ts below P1's max)
TICK = [(15, _ts(11, 58), 9, "view", 8.0)]
# phase 2 (only after the kill)
P2 = [
    (6, _ts(11, 55), 2, "click", 0.0),   # late-arriving click, claims view 3
    (7, _ts(12, 3), 3, "click", 0.0),    # on-time click, claims view 4
    (8, _ts(11, 56), 1, "view", 4.0),    # LATE view (ts < kill wm + 30m) for click 5
    (9, _ts(12, 20), 4, "view", 5.0),    # unmatched view
]
SENTINELS = [
    (9001, _ts(15, 0), 999, "click", 0.0),
    (9002, _ts(15, 0), 999, "view", 0.0),
]


def _drain(spark, join_fn, src, ckpt, out):
    stream = lambda et: stream_events_from_parquet(spark, src, EVENT_SCHEMA).filter(
        F.col("event_type") == et
    )
    q = (
        join_fn(stream("click"), stream("view"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def _result(spark, *outs):
    """Deduplicated union of run outputs, sentinels excluded, as a sorted
    row-tuple list (the idempotent-sink view of the migrated stream)."""
    df = spark.read.parquet(outs[0])
    for o in outs[1:]:
        df = df.unionByName(spark.read.parquet(o))
    rows = (
        df.filter(F.col("user_id") != 999)
        .dropDuplicates()
        .select("click_id", "user_id", "click_ts", "view_ts", "view_value")
        .collect()
    )
    return _sorted_rows((r[0], r[1], r[2], r[3], r[4]) for r in rows)


def _sorted_rows(tuples):
    # None-safe total order (full-outer rows carry nulls on either side)
    return sorted(tuples, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize(
    "join_fn", [stream_click_view_join, stream_click_view_join_outer],
    ids=["inner", "leftOuter"],
)
@pytest.mark.slow
def test_join_checkpoint_migration_converges(spark, tmp_path, join_fn):
    base = str(tmp_path / "base")
    mig = str(tmp_path / "mig")

    # --- uninterrupted baseline: same ingestion cadence, no kill
    _write(spark, f"{base}/src", P1)
    _drain(spark, join_fn, f"{base}/src", f"{base}/ckpt", f"{base}/out")
    _write(spark, f"{base}/src", TICK)
    _drain(spark, join_fn, f"{base}/src", f"{base}/ckpt", f"{base}/out")
    _write(spark, f"{base}/src", P2 + SENTINELS)
    _drain(spark, join_fn, f"{base}/src", f"{base}/ckpt", f"{base}/out")
    baseline = _result(spark, f"{base}/out")

    # --- interrupted run A over its own source/checkpoint, then the kill
    _write(spark, f"{mig}/src1", P1)
    _drain(spark, join_fn, f"{mig}/src1", f"{mig}/ckptA", f"{mig}/outA")
    _write(spark, f"{mig}/src1", TICK)
    _drain(spark, join_fn, f"{mig}/src1", f"{mig}/ckptA", f"{mig}/outA")
    # (availableNow terminated = the kill; ckptA is now a dead checkpoint)

    # the offsets log must expose the exact global watermark the buffers
    # were evicted against: the MIN of the per-side watermarks — the view
    # side's max event time 11:58 − 30 min delay (the click side sits a
    # minute higher at 11:29)
    assert checkpoint_watermark(f"{mig}/ckptA") == _ts(11, 28)

    # offline buffer audit: exactly the open clicks / matchable views
    left, right = read_click_view_buffers(spark, f"{mig}/ckptA")
    assert {r["click_id"] for r in left.collect()} == {5, 11, 13}
    assert {(r["user_id"], r["view_ts"]) for r in right.collect()} == {
        (2, _ts(11, 50)),
        (3, _ts(11, 58)),
        (5, _ts(11, 32)),
        (8, _ts(11, 22)),
        (9, _ts(11, 58)),   # the tick view is inside the horizon too
        (10, _ts(11, 25)),  # still open though its click already closed
    }

    # --- migration: seed a FRESH source from the dead checkpoint's state,
    # append the tail, run under a FRESH checkpoint
    n_clicks, n_views = reseed_click_view_source(
        spark, f"{mig}/ckptA", f"{mig}/src2"
    )
    assert (n_clicks, n_views) == (3, 6)
    _write(spark, f"{mig}/src2", P2 + SENTINELS)
    _drain(spark, join_fn, f"{mig}/src2", f"{mig}/ckptB", f"{mig}/outB")

    migrated = _result(spark, f"{mig}/outA", f"{mig}/outB")
    assert migrated == baseline

    # re-emission is real but bounded: exactly the both-sides-buffered
    # pair (click 11 × view 10) appears in both runs' raw outputs
    run_a = spark.read.parquet(f"{mig}/outA").filter(F.col("view_ts").isNotNull())
    run_b = spark.read.parquet(f"{mig}/outB").filter(F.col("view_ts").isNotNull())
    dup = run_a.select("click_id", "view_ts").intersect(
        run_b.select("click_id", "view_ts")
    )
    assert {r["click_id"] for r in dup.collect()} == {11}

    if join_fn is stream_click_view_join_outer:
        # null classes land on the correct side of the kill, and the
        # migrated run invents no false null for a replayed click whose
        # match it re-saw (5, 11) or first saw (5's late view)
        nulls_a = {
            r["click_id"]
            for r in spark.read.parquet(f"{mig}/outA")
            .filter(F.col("view_ts").isNull())
            .collect()
        }
        nulls_b = {
            r["click_id"]
            for r in spark.read.parquet(f"{mig}/outB")
            .filter(F.col("view_ts").isNull() & (F.col("user_id") != 999))
            .collect()
        }
        assert nulls_a == {12}
        assert nulls_b == {13}


@pytest.mark.slow
def test_full_join_migration_reconciles_false_orphans(spark, tmp_path):
    """FULL-outer migration: the re-seed recipe alone over-emits — view 16
    re-enters without its pre-kill-closed click 17 and flushes as a FALSE
    orphan in the restarted run — and reconcile_full_join_outputs removes
    exactly that class, converging the assembled output to the
    uninterrupted run bit-for-bit."""
    from bigdata_etl_elt_dashboard_spark.streaming.events import (
        stream_click_view_join_full,
    )
    from bigdata_etl_elt_dashboard_spark.streaming.migration import (
        reconcile_full_join_outputs,
    )

    base = str(tmp_path / "base")
    mig = str(tmp_path / "mig")
    join_fn = stream_click_view_join_full

    _write(spark, f"{base}/src", P1)
    _drain(spark, join_fn, f"{base}/src", f"{base}/ckpt", f"{base}/out")
    _write(spark, f"{base}/src", TICK)
    _drain(spark, join_fn, f"{base}/src", f"{base}/ckpt", f"{base}/out")
    _write(spark, f"{base}/src", P2 + SENTINELS)
    _drain(spark, join_fn, f"{base}/src", f"{base}/ckpt", f"{base}/out")
    baseline = _result(spark, f"{base}/out")

    _write(spark, f"{mig}/src1", P1)
    _drain(spark, join_fn, f"{mig}/src1", f"{mig}/ckptA", f"{mig}/outA")
    _write(spark, f"{mig}/src1", TICK)
    _drain(spark, join_fn, f"{mig}/src1", f"{mig}/ckptA", f"{mig}/outA")

    reseed_click_view_source(spark, f"{mig}/ckptA", f"{mig}/src2")
    # re-seeding into an existing directory must fail loudly (r12 advice):
    # a twice-seeded source would silently inflate counts and re-emissions
    with pytest.raises(Exception):
        reseed_click_view_source(spark, f"{mig}/ckptA", f"{mig}/src2")
    _write(spark, f"{mig}/src2", P2 + SENTINELS)
    _drain(spark, join_fn, f"{mig}/src2", f"{mig}/ckptB", f"{mig}/outB")

    run_a = spark.read.parquet(f"{mig}/outA")
    run_b = spark.read.parquet(f"{mig}/outB")

    # the false orphan is REAL before reconciliation: run B flushed view
    # 16 (user 10) unmatched, though run A holds its matched pair
    raw_orphans_b = {
        (r["user_id"], r["view_ts"])
        for r in run_b.filter(
            F.col("click_id").isNull() & (F.col("user_id") != 999)
        ).collect()
    }
    assert (10, _ts(11, 25)) in raw_orphans_b

    reconciled = reconcile_full_join_outputs(run_a, run_b)
    got = _sorted_rows(
        (r[0], r[1], r[2], r[3], r[4])
        for r in reconciled.filter(F.col("user_id") != 999)
        .select("click_id", "user_id", "click_ts", "view_ts", "view_value")
        .collect()
    )
    assert got == baseline

    # and the genuine orphan classes survive on the correct side: view 18
    # closed pre-kill (run A), views 9/14/tick closed post-migration
    orphan_users_a = {
        r["user_id"] for r in run_a.filter(F.col("click_id").isNull()).collect()
    }
    assert orphan_users_a == {11}
    assert {u for (u, _) in raw_orphans_b} == {4, 8, 9, 10}

def test_reconcile_keys_on_view_event_id_when_present(spark):
    """r12 advice: payload identity (user_id, view_ts, view_value) wrongly
    drops a GENUINE run-B orphan that collides payload-wise with a distinct
    matched view in run A. When the join projection retained the view's
    source event_id (keep_view_event_id=True), reconciliation keys on it
    and the colliding true orphan survives."""
    from bigdata_etl_elt_dashboard_spark.streaming.migration import (
        reconcile_full_join_outputs,
    )

    cols = ["click_id", "user_id", "click_ts", "view_ts", "view_value"]
    schema_payload = T.StructType(
        [
            T.StructField("click_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("click_ts", T.TimestampType()),
            T.StructField("view_ts", T.TimestampType()),
            T.StructField("view_value", T.DoubleType()),
        ]
    )
    schema_eid = schema_payload.add(T.StructField("view_event_id", T.LongType()))

    # run A: view event 100 (user 1, 10:00, 5.0) matched click 50
    run_a_rows = [(50, 1, _ts(10, 5), _ts(10, 0), 5.0, 100)]
    # run B: view event 101 — DIFFERENT source view, identical payload —
    # legitimately flushed as an orphan
    run_b_rows = [(None, 1, None, _ts(10, 0), 5.0, 101)]

    a_eid = spark.createDataFrame(run_a_rows, schema_eid)
    b_eid = spark.createDataFrame(run_b_rows, schema_eid)
    with_eid = reconcile_full_join_outputs(a_eid, b_eid)
    # the true orphan survives: 1 matched row + 1 orphan row
    assert with_eid.count() == 2
    assert with_eid.filter(F.col("click_id").isNull()).count() == 1

    # same rows WITHOUT the event_id column: the documented payload-identity
    # caveat drops the colliding orphan (this is the behavior the advice
    # flags — pinned here so the upgrade path is the measured difference)
    a_pay = a_eid.select(*cols)
    b_pay = b_eid.select(*cols)
    without_eid = reconcile_full_join_outputs(a_pay, b_pay)
    assert without_eid.count() == 1
    assert without_eid.filter(F.col("click_id").isNull()).count() == 0


def test_full_join_keep_view_event_id_projection(spark):
    """stream_click_view_join_full(keep_view_event_id=True) carries the
    view's source event_id through the fullOuter join (null on clicks that
    never matched), and default posture is bit-compatible (no extra
    column). withWatermark is a no-op on batch frames, so the projection
    and join semantics are exercised eagerly here."""
    from bigdata_etl_elt_dashboard_spark.streaming.events import (
        stream_click_view_join_full,
    )

    clicks = spark.createDataFrame(
        [(50, _ts(10, 5), 1, "click", 0.0), (51, _ts(12, 0), 2, "click", 0.0)],
        EVENT_SCHEMA,
    )
    views = spark.createDataFrame(
        [(100, _ts(10, 0), 1, "view", 5.0), (101, _ts(9, 0), 3, "view", 7.0)],
        EVENT_SCHEMA,
    )
    out = stream_click_view_join_full(clicks, views, keep_view_event_id=True)
    assert out.columns[-1] == "view_event_id"
    rows = {(r["click_id"], r["view_event_id"]) for r in out.collect()}
    assert rows == {(50, 100), (51, None), (None, 101)}

    default = stream_click_view_join_full(clicks, views)
    assert "view_event_id" not in default.columns
