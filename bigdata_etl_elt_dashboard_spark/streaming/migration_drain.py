"""Hermetic v1 → migrate → v2 cutover drain:
``python -m ...streaming.migration_drain <src_parquet> <work_dir>``.

The round-14 gate (plans/wave14.src_session_migration_digest) composes
the schema-evolved migration path END TO END against real data: a v1
sessionizer (state ``sess`` = start_ms/last_ms/n) drains the first half
of the event history into checkpoint A, the offline migration
(``migrate_session_state_v1_to_v2`` — v1 state read + the gained
``sum_v`` column backfilled) lifts checkpoint A's open sessions into the
v2 ``initialState`` seed, and the v2 processor drains the second half on
a FRESH checkpoint, re-registering every open session's close timer in
``handleInitialState``. A final no-data drain fires the terminal timers.

Subprocess for the same reason as tws_drain.py: transformWithState
worker processes need ``google.protobuf`` on PYTHONPATH at JVM LAUNCH,
which a harness-owned session cannot guarantee — a fresh interpreter
calls ``ensure_protobuf()`` first. The caller's session only reads the
emitted parquet.

Cutover choice: the midpoint of the event-time span (ms), computed from
the data — any split works because the converged output is
cutover-INVARIANT on shared columns; the midpoint guarantees both phases
are non-degenerate. Each phase lands as ONE file so each availableNow
drain is ONE micro-batch (the inline-gap vs timer-close adjudication the
oracle encodes assumes per-phase single-batch ingestion; a no-data batch
never closes a session by gap).
"""

from __future__ import annotations

import os
import sys

#: source-side schema (events wire shape, micros timestamps)
_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _drain(spark, sessionizer, src: str, ckpt: str, out: str, **kwargs) -> None:
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        sessionizer(stream, gap_ms=600_000, **kwargs)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        raise RuntimeError("migration drain did not terminate within 600 s")


def main(src: str, work: str) -> None:
    from bigdata_etl_elt_dashboard_spark.vendor import ensure_protobuf

    if not ensure_protobuf():  # must precede the JVM launch (see module doc)
        raise RuntimeError("no protobuf runtime (real or vendored shim)")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bigdata_etl_elt_dashboard_spark.streaming.migration import (
        migrate_session_state_v1_to_v2,
    )
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        session_close_on_timer,
        session_close_on_timer_v2,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("migration-drain")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        ev = spark.read.parquet(src)
        ms = F.expr("unix_micros(ts) div 1000")
        b = ev.agg(F.min(ms).alias("mn"), F.max(ms).alias("mx")).first()
        cut = b["mn"] + (b["mx"] - b["mn"]) // 2
        src1 = os.path.join(work, "src1")
        src2 = os.path.join(work, "src2")
        ev.filter(ms < cut).coalesce(1).write.parquet(src1)
        ev.filter(ms >= cut).coalesce(1).write.parquet(src2)

        ckpt_a = os.path.join(work, "ckptA")
        out_a = os.path.join(work, "outA")
        _drain(spark, session_close_on_timer, src1, ckpt_a, out_a)

        seed = migrate_session_state_v1_to_v2(spark, ckpt_a)

        ckpt_b = os.path.join(work, "ckptB")
        out_b = os.path.join(work, "outB")
        _drain(
            spark, session_close_on_timer_v2, src2, ckpt_b, out_b,
            initial_state=seed,
        )
        # no-data batch: the terminal watermark fires the remaining timers
        _drain(spark, session_close_on_timer_v2, src2, ckpt_b, out_b)
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
