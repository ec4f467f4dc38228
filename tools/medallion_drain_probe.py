#!/usr/bin/env python
"""Full-volume medallion drain at a NONZERO watermark delay (r10 verdict
task 4).

The round-9 real-volume drain (SCALING.md) ran the composed chain —
``dropDuplicatesWithinWatermark`` → timer sessionizer → bucketed gold
MERGE — at ``dedup_horizon="0 seconds"``; the nonzero-delay path was then
chain-tested only on a 9-event fixture. This probe re-runs the drain over
sf0.1's full 100k-event table at ``dedup_horizon="30 minutes"`` with
byte-identical replays AND disordered delivery injected, twice:

1. **single-drain**: the replayed frame, row order scattered, consumed in
   ONE availableNow micro-batch. Asserts FULL bit-equality (symmetric
   diff 0) with ``sessions_gold_batch(..., delay_ms=DELAY_MS)`` — the
   delay-aware trailing-close adjudication (terminal watermark = max −
   delay) verified on every one of ~10⁵ sessions, not 3.

2. **multi-batch**: 8 ts-contiguous file batches consumed in mtime order
   under ``maxFilesPerTrigger=1``; every original row within
   DISPLACE_MS of its batch's upper boundary is delivered one batch LATE
   (a real disordered delivery), and every replayed row rides the
   following batch too (cross-boundary replay dedup at volume). The
   displacement bound is chosen so the chain can never corrupt a
   session: with DISPLACE_MS + GAP_MS <= DELAY_MS, a straggler that
   belongs INSIDE an open session always arrives while that session's
   timer (end+gap) is still above the watermark (wm lags the frontier by
   DELAY_MS > DISPLACE_MS + GAP_MS), so it interval-merges instead of
   re-opening — bounds therefore must match the batch twin EXACTLY. What
   the twin cannot model in a multi-batch run is WHICH close path fired
   first for a user whose idle gap exceeds the delay (sf0.1 has same-user
   gaps up to 5.9 days vs the 30-minute delay): the stream's mid-run
   timer fires before the >=gap successor's batch arrives and the twin
   says 'gap' — the EXACT arrival-order contract pinned by
   tests/test_streaming.py::test_timer_vs_gap_arrival_order_contract.
   The probe asserts bounds/count bit-equality, then adjudicates every
   closed_by diff against that contract: stream='timer' where
   twin='gap', identical (user, start, end, n), NEVER the reverse.

Run solo (the gold/checkpoint dirs and the RocksDB provider conf are
process-wide): ``python tools/medallion_drain_probe.py``. Prints one JSON
line per probe; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_etl_elt_dashboard_spark.session import get_spark  # noqa: E402
from bigdata_etl_elt_dashboard_spark.sources.catalog import table  # noqa: E402
from bigdata_etl_elt_dashboard_spark.streaming.pipeline import (  # noqa: E402
    sessions_gold_batch,
    stream_sessions_gold,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_DRAIN_DIR", "/tmp/medallion_drain_probe")
GAP_MS = 600_000  # 10 min session gap
DELAY = "30 minutes"
DELAY_MS = 1_800_000
DISPLACE_MS = 900_000  # 15 min: DISPLACE + GAP <= DELAY (see module doc)
N_BATCHES = 8
N_BUCKETS = 16


def _drain(spark, src: str, tag: str, max_files=None) -> tuple[float, str]:
    gold = os.path.join(WORK, f"gold_{tag}")
    ckpt = os.path.join(WORK, f"ckpt_{tag}")
    reader = spark.readStream.schema(spark.read.parquet(src).schema)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(src)
    t0 = time.perf_counter()
    q = (
        stream_sessions_gold(
            stream, gold, ckpt, gap_ms=GAP_MS, dedup_horizon=DELAY,
            n_buckets=N_BUCKETS,
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(3600), f"{tag}: drain did not terminate"
    return time.perf_counter() - t0, gold


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    # Optional multi-executor posture (r14 extension): --master
    # local-cluster[W,C,M] runs the same drain + bit-equality assertions
    # with RocksDB state stores living on REAL separate executor JVMs —
    # state rides the checkpoint dir (shared fs here, HDFS/S3 on a
    # cluster), so a pass is distributed-state evidence, not just
    # thread-pool evidence.
    master = None
    if "--master" in sys.argv:
        master = sys.argv[sys.argv.index("--master") + 1]
    # --kill-executor (r14, needs --master local-cluster[...]): SIGKILL
    # one executor JVM ~1/3 into probe 1's drain, then assert the
    # engine's documented failure semantics for the gold-MERGE
    # materialization policy (one strategy per invocation; the session
    # does not reliably outlive an aborted-stream + app-teardown storm,
    # so the two strategies are two solo runs):
    #
    # --pin-strategy reliable (default): the preemptible-cluster posture
    #   `sinks.merge_upsert_parquet`'s docstring prescribes. The drain
    #   must COMPLETE and the gold table must still be bit-identical to
    #   the batch twin — exactly-once through executor loss (retried
    #   tasks re-read the merge's reliable-checkpoint files, RocksDB
    #   state reloads its last committed snapshot).
    # --pin-strategy local: the local[N] default. The merge's pinned
    #   blocks die with the executor, and the contract is LOUD failure:
    #   the drain must abort with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
    #   (surfaced via FOREACH_BATCH_USER_FUNCTION_ERROR), never a
    #   silently wrong gold table. First observed live: the kill
    #   scenario's maiden run used the default strategy and died exactly
    #   this way — the executor_loss_probe pin table biting the
    #   streaming path.
    kill_exec = "--kill-executor" in sys.argv
    if kill_exec and not (master or "").startswith("local-cluster"):
        raise SystemExit("--kill-executor requires --master local-cluster[...]")
    kill_pin = "reliable"
    if "--pin-strategy" in sys.argv:
        kill_pin = sys.argv[sys.argv.index("--pin-strategy") + 1]
        assert kill_pin in ("reliable", "local"), kill_pin
    from bigdata_etl_elt_dashboard_spark.session import local_cluster_conf

    spark = get_spark(
        app_name="medallion-drain-probe",
        master=master,
        extra_conf=local_cluster_conf(master) if master else None,
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    ev = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # at-least-once delivery: every 7th event re-delivered byte-identically
    delivered = ev.unionByName(ev.filter(F.col("event_id") % 7 == 0))
    twin = sessions_gold_batch(delivered, gap_ms=GAP_MS, delay_ms=DELAY_MS)
    # one compute, two probes. In --kill-executor mode the twin's pinned
    # blocks must OUTLIVE the executor we are about to murder — the first
    # run of the kill scenario used localCheckpoint here and died with
    # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND when the twin was consumed after
    # the kill: the pin-strategy table (executor_loss_probe) biting our
    # own tooling. Reliable checkpoint is exactly the documented fix.
    if kill_exec:
        spark.sparkContext.setCheckpointDir(os.path.join(WORK, "pins"))
        twin = twin.checkpoint(eager=True)
        # the strategy under test governs the gold MERGE's in-stream
        # materialization (sinks.merge_upsert_parquet reads it per batch)
        spark.conf.set("spark.graft.pin.strategy", kill_pin)
        spark.conf.set("spark.graft.pin.dir", os.path.join(WORK, "pins"))
    else:
        twin = twin.localCheckpoint(eager=True)

    # ---- probe 1: single-drain, scattered row order --------------------
    src1 = os.path.join(WORK, "src_single")
    delivered.repartition(8).write.parquet(src1)  # hash-scatter = disorder
    killed: dict = {}
    if kill_exec:
        import signal
        import subprocess
        import threading

        app_id = spark.sparkContext.applicationId

        def _assassin() -> None:
            # same discovery as tools/executor_loss_probe.py: this app's
            # CoarseGrainedExecutorBackend JVMs by commandline app-id
            time.sleep(20.0)  # ~1/3 into the ~60 s local-cluster drain
            out = subprocess.run(
                ["pgrep", "-f", f"CoarseGrainedExecutorBackend.*{app_id}"],
                capture_output=True, text=True,
            ).stdout
            pids = sorted(int(p) for p in out.split())
            if pids:
                os.kill(pids[0], signal.SIGKILL)
                killed["victim"] = pids[0]

        threading.Thread(target=_assassin, daemon=True).start()
        tag = f"kill_{kill_pin}"
        try:
            wall1, gold1 = _drain(spark, src1, tag)
        except Exception as ex:  # noqa: BLE001 — local's contracted abort
            assert killed.get("victim"), "drain failed but no executor killed"
            msg = str(ex)
            assert kill_pin == "local", f"{kill_pin} drain must survive: {msg[:400]}"
            assert "CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND" in msg, msg[:400]
            print(json.dumps({
                "probe": "kill_drain", "pin_strategy": "local",
                "executor_killed_mid_drain": killed["victim"],
                "outcome": "loud_abort",
                "error_class": "CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND",
            }))
            return
        assert killed.get("victim"), "kill thread found no executor to kill"
        assert kill_pin == "reliable", (
            "pin=local drain SURVIVED the kill — blocks happened to live "
            "on the survivor; rerun (contract is abort-or-correct, so a "
            "survival must still pass the bit-equality below)"
        )
        g1 = spark.read.parquet(gold1).drop("_bucket")
        extra1 = g1.exceptAll(twin).count()
        miss1 = twin.exceptAll(g1).count()
        print(json.dumps({
            "probe": "kill_drain", "pin_strategy": kill_pin,
            "executor_killed_mid_drain": killed["victim"],
            "outcome": "completed", "wall_s": round(wall1, 1),
            "gold_rows": g1.count(), "sym_diff": extra1 + miss1,
        }))
        assert extra1 == 0 and miss1 == 0, "kill-drain gold must be bit-equal"
        return
    wall1, gold1 = _drain(spark, src1, "single")
    g1 = spark.read.parquet(gold1).drop("_bucket")
    extra1 = g1.exceptAll(twin).count()
    miss1 = twin.exceptAll(g1).count()
    n1 = g1.count()
    print(json.dumps({
        "probe": "single_drain", "sf_dir": SF_DIR, "delay": DELAY,
        "wall_s": round(wall1, 1), "gold_rows": n1,
        "sym_diff": extra1 + miss1,
    }))
    assert extra1 == 0 and miss1 == 0, "single-drain must be bit-equal"

    # ---- probe 2: 8 disordered batches, maxFilesPerTrigger=1 -----------
    from pyspark.sql import Window

    w = Window.orderBy("ms", "event_id")
    base = ev.withColumn("ms", F.expr("unix_micros(ts) div 1000"))
    tiled = base.withColumn("b", F.ntile(N_BATCHES).over(w))
    bounds = tiled.groupBy("b").agg(F.max("ms").alias("b_max"))
    # originals: boundary-tail rows slip one batch later; replays (every
    # 7th) always ride the following batch (cross-boundary dedup)
    placed = (
        tiled.join(F.broadcast(bounds), "b")
        .withColumn(
            "deliver",
            F.when(
                (F.col("b") < N_BATCHES)
                & (F.col("b_max") - F.col("ms") <= DISPLACE_MS),
                F.col("b") + 1,
            ).otherwise(F.col("b")),
        )
    )
    replays = placed.filter(F.col("event_id") % 7 == 0).withColumn(
        "deliver", F.least(F.col("deliver") + 1, F.lit(N_BATCHES))
    )
    all_rows = placed.unionByName(replays).select(
        "event_id", "ts", "user_id", "event_type", "value", "deliver"
    ).localCheckpoint(eager=True)
    n_displaced = placed.filter(F.col("deliver") != F.col("b")).count()

    src2 = os.path.join(WORK, "src_multi")
    os.makedirs(src2)
    stamp = time.time()
    for k in range(1, N_BATCHES + 1):
        part_dir = os.path.join(WORK, f"part_{k}")
        (
            all_rows.filter(F.col("deliver") == k)
            .drop("deliver")
            .coalesce(1)
            .write.parquet(part_dir)
        )
        for f in os.listdir(part_dir):
            if f.endswith(".parquet"):
                dst = os.path.join(src2, f"batch_{k:02d}.parquet")
                shutil.copyfile(os.path.join(part_dir, f), dst)
                os.utime(dst, (stamp + k, stamp + k))  # strict mtime order
    wall2, gold2 = _drain(spark, src2, "multi", max_files=1)
    g2 = spark.read.parquet(gold2).drop("_bucket")
    n2 = g2.count()
    bounds_cols = ["user_id", "start_ms", "end_ms", "n_events"]
    extra_b = g2.select(*bounds_cols).exceptAll(twin.select(*bounds_cols)).count()
    miss_b = twin.select(*bounds_cols).exceptAll(g2.select(*bounds_cols)).count()
    # closed_by adjudication per the exact arrival-order contract
    joined = g2.withColumnRenamed("closed_by", "stream_by").join(
        twin.withColumnRenamed("closed_by", "twin_by"), bounds_cols
    )
    flips = joined.filter(F.col("stream_by") != F.col("twin_by"))
    allowed = flips.filter(
        (F.col("stream_by") == "timer") & (F.col("twin_by") == "gap")
    ).count()
    reverse = flips.count() - allowed
    print(json.dumps({
        "probe": "multi_batch", "n_batches": N_BATCHES,
        "displaced_rows": n_displaced, "wall_s": round(wall2, 1),
        "gold_rows": n2, "bounds_sym_diff": extra_b + miss_b,
        "timer_vs_gap_flips": allowed, "reverse_flips": reverse,
    }))
    assert extra_b == 0 and miss_b == 0, "bounds must be bit-equal"
    assert reverse == 0, "gap-where-twin-says-timer is a real defect"
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


if __name__ == "__main__":
    main()
