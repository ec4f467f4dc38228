"""Schema-EVOLVED checkpoint migration (r12 verdict task 6).

A v1 sessionizer checkpoint (state ``sess`` = start_ms/last_ms/n) is
migrated into the v2 processor whose state GAINED a field (``sum_v``):
offline v1 state read → ``migrate_session_state_v1_to_v2`` (new column
backfilled with the declared default) → ``session_close_on_timer_v2``
seeded via ``initialState``. The test drives the same event history
through (a) a CONTINUOUS v2 run and (b) the v1-then-migrate-then-v2
cutover, and asserts:

- every SHARED column (user_id, start_ms, end_ms, n_events, closed_by)
  converges bit-equal — including a session that STRADDLES the cutover
  (extended post-migration), a v1-only user whose open session must
  close by a timer the v2 processor re-registers in
  ``handleInitialState`` (v1's timer lives only in the dead checkpoint),
  and a post-cutover user untouched by migration;
- the new column diverges EXACTLY as documented: a straddling session's
  migrated ``sum_v`` covers only post-cutover events (the backfill
  default is a convention, not recovered data), while a post-cutover
  session's ``sum_v`` is identical in both runs.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_etl_elt_dashboard_spark.streaming.migration import (
    migrate_session_state_rename,
    migrate_session_state_v1_to_v2,
    migrate_session_state_widen,
)
from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
    _protobuf_available,
    session_close_on_timer,
    session_close_on_timer_v2,
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

GAP_MS = 600_000  # 10 minutes


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


def _ms(h, m=0):
    return int(_ts(h, m).timestamp() * 1000)


# phase 1 (pre-cutover): user 1 has a gap-closed early session plus an
# open one; user 2 is phase-1-only (the timer-re-registration case)
P1 = [
    (1, _ts(8, 0), 1, "view", 5.0),
    (2, _ts(10, 0), 1, "view", 1.0),   # closes the 8:00 session by gap
    (3, _ts(10, 5), 1, "view", 2.0),
    (4, _ts(10, 2), 2, "view", 3.0),
]
# phase 2 (post-cutover): user 1 extends the straddling session; user 3
# is new; the sentinel advances the watermark so every timer fires
P2 = [
    (5, _ts(10, 8), 1, "view", 4.0),
    (6, _ts(11, 0), 3, "view", 9.0),
    (9001, _ts(15, 0), 999, "view", 0.0),
]


def _write(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, sessionizer, src, ckpt, out, **kwargs):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        sessionizer(stream, gap_ms=GAP_MS, **kwargs)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def _shared(spark, *outs):
    df = spark.read.parquet(outs[0])
    for o in outs[1:]:
        df = df.unionByName(spark.read.parquet(o), allowMissingColumns=True)
    rows = (
        df.filter(F.col("user_id") != 999)
        .select("user_id", "start_ms", "end_ms", "n_events", "closed_by")
        .collect()
    )
    return sorted((r[0], r[1], r[2], r[3], r[4]) for r in rows)


def test_v1_to_v2_schema_evolution_migration(spark, tmp_path):
    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    base = str(tmp_path / "cont")
    mig = str(tmp_path / "mig")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        # --- continuous v2 run, same ingestion cadence, no cutover
        _write(spark, f"{base}/src", P1)
        _drain(spark, session_close_on_timer_v2, f"{base}/src",
               f"{base}/ckpt", f"{base}/out")
        _write(spark, f"{base}/src", P2)
        _drain(spark, session_close_on_timer_v2, f"{base}/src",
               f"{base}/ckpt", f"{base}/out")
        _drain(spark, session_close_on_timer_v2, f"{base}/src",
               f"{base}/ckpt", f"{base}/out")  # no-data batch fires timers

        # --- v1 run up to the cutover (its checkpoint then dies)
        _write(spark, f"{mig}/src1", P1)
        _drain(spark, session_close_on_timer, f"{mig}/src1",
               f"{mig}/ckptA", f"{mig}/outA")

        # offline: v1 state → v2 shape with the new column backfilled
        seed = migrate_session_state_v1_to_v2(spark, f"{mig}/ckptA")
        got = {
            (r["user_id"], r["start_ms"], r["last_ms"], r["n"], r["sum_v"])
            for r in seed.collect()
        }
        assert got == {
            (1, _ms(10, 0), _ms(10, 5), 2, 0.0),  # open straddler
            (2, _ms(10, 2), _ms(10, 2), 1, 0.0),  # v1-only open session
        }

        # --- v2 run over the tail only, seeded from the migrated state
        _write(spark, f"{mig}/src2", P2)
        _drain(spark, session_close_on_timer_v2, f"{mig}/src2",
               f"{mig}/ckptB", f"{mig}/outB", initial_state=seed)
        _drain(spark, session_close_on_timer_v2, f"{mig}/src2",
               f"{mig}/ckptB", f"{mig}/outB")

        # shared columns converge bit-equal: v1's pre-cutover emissions
        # plus the migrated v2 run == the continuous v2 run
        continuous = _shared(spark, f"{base}/out")
        migrated = _shared(spark, f"{mig}/outA", f"{mig}/outB")
        assert migrated == continuous
        assert continuous == [
            (1, _ms(8, 0), _ms(8, 0), 1, "gap"),
            (1, _ms(10, 0), _ms(10, 8), 3, "timer"),   # straddler extended
            (2, _ms(10, 2), _ms(10, 2), 1, "timer"),   # re-registered timer
            (3, _ms(11, 0), _ms(11, 0), 1, "timer"),   # post-cutover user
        ]

        # the NEW column diverges exactly as documented
        def sums(out):
            return {
                (r["user_id"], r["start_ms"]): r["sum_v"]
                for r in spark.read.parquet(out)
                .filter(F.col("user_id") != 999)
                .collect()
            }

        cont_sums = sums(f"{base}/out")
        mig_sums = sums(f"{mig}/outB")
        key_straddle = (1, _ms(10, 0))
        assert cont_sums[key_straddle] == 7.0   # 1 + 2 + 4
        assert mig_sums[key_straddle] == 4.0    # backfill 0 + post-cutover 4
        assert cont_sums[(2, _ms(10, 2))] == 3.0
        assert mig_sums[(2, _ms(10, 2))] == 0.0  # declared default
        assert cont_sums[(3, _ms(11, 0))] == mig_sums[(3, _ms(11, 0))] == 9.0
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def _all_rows(spark, *outs):
    """Full-row view (ALL columns incl. sum_v) for the lossless
    migrations, sentinel user excluded."""
    df = spark.read.parquet(outs[0])
    for o in outs[1:]:
        df = df.unionByName(spark.read.parquet(o))
    rows = (
        df.filter(F.col("user_id") != 999)
        .select("user_id", "start_ms", "end_ms", "n_events", "sum_v", "closed_by")
        .collect()
    )
    return sorted(tuple(r) for r in rows)


@pytest.mark.slow
def test_state_variable_rename_migration(spark, tmp_path):
    """RENAME evolution (r13 verdict task 5): the store keys state by
    variable name, so v2-renamed (`sess` → `session`) reads an old
    checkpoint as EMPTY — migrate by offline-reading under the OLD name
    and seeding the new-name processor via initialState. A rename moves
    no data, so the cutover run converges bit-equal on ALL columns
    (sum_v included) to a continuous run."""
    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")
    base, mig = str(tmp_path / "cont"), str(tmp_path / "mig")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        _write(spark, f"{base}/src", P1)
        _drain(spark, session_close_on_timer_v2, f"{base}/src",
               f"{base}/ckpt", f"{base}/out")
        _write(spark, f"{base}/src", P2)
        _drain(spark, session_close_on_timer_v2, f"{base}/src",
               f"{base}/ckpt", f"{base}/out")
        _drain(spark, session_close_on_timer_v2, f"{base}/src",
               f"{base}/ckpt", f"{base}/out")

        # old deployment (variable still named `sess`) up to the cutover
        _write(spark, f"{mig}/src1", P1)
        _drain(spark, session_close_on_timer_v2, f"{mig}/src1",
               f"{mig}/ckptA", f"{mig}/outA")

        seed = migrate_session_state_rename(spark, f"{mig}/ckptA",
                                            old_name="sess")
        got = {
            (r["user_id"], r["start_ms"], r["last_ms"], r["n"], r["sum_v"])
            for r in seed.collect()
        }
        assert got == {
            (1, _ms(10, 0), _ms(10, 5), 2, 3.0),  # true sums travel intact
            (2, _ms(10, 2), _ms(10, 2), 1, 3.0),
        }

        # renamed deployment over the tail, seeded under the NEW name
        _write(spark, f"{mig}/src2", P2)
        _drain(spark, session_close_on_timer_v2, f"{mig}/src2",
               f"{mig}/ckptB", f"{mig}/outB", initial_state=seed,
               state_var_name="session")
        _drain(spark, session_close_on_timer_v2, f"{mig}/src2",
               f"{mig}/ckptB", f"{mig}/outB", state_var_name="session")

        assert _all_rows(spark, f"{mig}/outA", f"{mig}/outB") == _all_rows(
            spark, f"{base}/out"
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.mark.slow
def test_value_type_widening_migration(spark, tmp_path):
    """WIDENING evolution (r13 verdict task 5): a legacy deployment
    declared `n int`; the upgrade declares `n long`. The codec has no
    implicit upcast, so the recipe casts the offline-read state up and
    seeds the wide processor. Widening is lossless → bit-equal on ALL
    columns vs a continuous wide run."""
    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")
    base, mig = str(tmp_path / "cont"), str(tmp_path / "mig")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        _write(spark, f"{base}/src", P1)
        _drain(spark, session_close_on_timer_v2, f"{base}/src",
               f"{base}/ckpt", f"{base}/out")
        _write(spark, f"{base}/src", P2)
        _drain(spark, session_close_on_timer_v2, f"{base}/src",
               f"{base}/ckpt", f"{base}/out")
        _drain(spark, session_close_on_timer_v2, f"{base}/src",
               f"{base}/ckpt", f"{base}/out")

        # legacy NARROW deployment up to the cutover
        _write(spark, f"{mig}/src1", P1)
        _drain(spark, session_close_on_timer_v2, f"{mig}/src1",
               f"{mig}/ckptA", f"{mig}/outA", count_type="int")

        # the old checkpoint REALLY stored int32 (else this test proves
        # nothing) — the state source surfaces the stored type
        from bigdata_etl_elt_dashboard_spark.sources.state_reader import (
            state_rows,
        )

        stored = dict(
            state_rows(spark, f"{mig}/ckptA", state_var_name="sess")
            .select("value.*")
            .dtypes
        )
        assert stored["n"] == "int"

        seed = migrate_session_state_widen(spark, f"{mig}/ckptA")
        assert dict(seed.dtypes)["n"] == "bigint"
        got = {
            (r["user_id"], r["start_ms"], r["last_ms"], r["n"], r["sum_v"])
            for r in seed.collect()
        }
        assert got == {
            (1, _ms(10, 0), _ms(10, 5), 2, 3.0),
            (2, _ms(10, 2), _ms(10, 2), 1, 3.0),
        }

        # wide continuation over the tail
        _write(spark, f"{mig}/src2", P2)
        _drain(spark, session_close_on_timer_v2, f"{mig}/src2",
               f"{mig}/ckptB", f"{mig}/outB", initial_state=seed)
        _drain(spark, session_close_on_timer_v2, f"{mig}/src2",
               f"{mig}/ckptB", f"{mig}/outB")

        assert _all_rows(spark, f"{mig}/outA", f"{mig}/outB") == _all_rows(
            spark, f"{base}/out"
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
