#!/usr/bin/env python
"""Executor-loss resilience probe (r14 extension of the multi-executor
evidence; SCALING.md "multi-executor" section).

On a 1000-executor / spot-instance cluster, losing executors mid-job is
ROUTINE, not exceptional — the engine's 100 TB claim is only credible if
its plans finish correctly through that. Single-JVM ``local[N]`` cannot
test it at all (there is nothing to lose); ``local-cluster[W,C,M]``
gives W real executor JVMs we can SIGKILL mid-flight while the
standalone Worker relaunches replacements, exercising the full recovery
machinery: ExecutorLostFailure task retry, FetchFailed-driven stage
resubmission recomputing the dead executor's shuffle map outputs, and
lost-cached-block handling.

Two scenarios, each asserted against an undisturbed baseline computed
FIRST (integer-exact measures — counts and cent-sums — so equality is
bitwise, not tolerance-based):

1. **shuffle-agg through executor loss**: a two-stage exact aggregation
   over lineitem replicated in-plan (explode x REP) — wide enough that
   the kill lands with live shuffle state on the victim. Asserts the
   job completes AND the full row set is bit-identical to baseline,
   and that the victim pid actually died mid-job (new executor ids
   appear; the relaunch is observed).

2. **pin() strategy failure semantics under real block loss**
   (`operators/scale.pin`): pin a deterministic frame, kill the
   executor holding ~half its blocks, then consume the pinned frame.
   The module doc's deployment guidance becomes a measured table:
   - ``reliable`` (checkpoint to shared fs): MUST survive — files
     outlive executors (this is the documented spot-cluster posture);
   - ``persist`` (MEMORY_AND_DISK, lineage kept): MUST survive — lost
     blocks recompute from source through the retained lineage;
   - ``local`` (localCheckpoint, lineage TRUNCATED): documented
     unrecoverable — the probe reports whether the consume failed
     (lost blocks) or survived (all blocks happened to live on the
     survivor); either way the result is never silently wrong: a
     surviving run must still be bit-identical to baseline.

Run solo: ``python tools/executor_loss_probe.py``. Prints one JSON line
per scenario; exit 1 on any assertion failure.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from bigdata_etl_elt_dashboard_spark.operators.scale import pin  # noqa: E402
from bigdata_etl_elt_dashboard_spark.session import (  # noqa: E402
    get_spark,
    local_cluster_conf,
)
from bigdata_etl_elt_dashboard_spark.sources.catalog import table  # noqa: E402

MASTER = os.environ.get("SPARK_GRAFT_LC_MASTER", "local-cluster[2,4,3072]")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = 16  # in-plan replication of lineitem for the shuffle-agg scenario


def _executor_pids(app_id: str) -> "list[int]":
    """OS pids of this app's live CoarseGrainedExecutorBackend JVMs."""
    try:
        out = subprocess.run(
            ["pgrep", "-f", f"CoarseGrainedExecutorBackend.*{app_id}"],
            capture_output=True,
            text=True,
        ).stdout
    except OSError:
        return []
    return [int(p) for p in out.split()]


def _wait_for_executors(app_id: str, n: int, timeout_s: float = 60.0) -> int:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        pids = _executor_pids(app_id)
        if len(pids) >= n:
            return len(pids)
        time.sleep(0.5)
    return len(_executor_pids(app_id))


def _rows(df) -> "list[tuple]":
    return sorted(tuple(r) for r in df.collect())


def _kill_one_mid_job(spark, delay_s: float) -> "dict":
    """After ``delay_s``, SIGKILL one executor JVM of this app; returns
    what was observed (victim pid, whether it died, relaunch count)."""
    app_id = spark.sparkContext.applicationId
    obs: dict = {"victim": None, "died": False}
    before = _executor_pids(app_id)
    time.sleep(delay_s)
    pids = _executor_pids(app_id)
    if not pids:
        return obs
    victim = sorted(pids)[0]
    obs["victim"] = victim
    try:
        os.kill(victim, signal.SIGKILL)
    except ProcessLookupError:
        return obs
    time.sleep(1.0)
    obs["died"] = victim not in _executor_pids(app_id)
    obs["before"] = sorted(before)
    return obs


def _run_with_kill(spark, thunk, delay_s: float):
    """Run ``thunk`` while a parallel thread kills one executor after
    ``delay_s``. Returns (thunk_result_or_exc, kill_observation)."""
    out: dict = {}

    def _job():
        try:
            out["result"] = thunk()
        except Exception as ex:  # noqa: BLE001 — reported, not swallowed
            out["error"] = f"{type(ex).__name__}: {str(ex)[:300]}"

    t = threading.Thread(target=_job)
    t.start()
    obs = _kill_one_mid_job(spark, delay_s)
    t.join()
    return out, obs


def shuffle_agg_scenario(spark) -> "dict":
    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    rep = li.withColumn(
        "r", F.explode(F.array(*[F.lit(i) for i in range(REP)]))
    ).withColumn("k", F.col("l_suppkey") * REP + F.col("r"))
    # two shuffle stages: wide partial agg, then a re-keyed exact rollup
    stage1 = rep.groupBy((F.col("k") % 4096).alias("g")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum((F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
    )
    final = (
        stage1.groupBy((F.col("g") % 97).alias("gg"))
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_qty").alias("sum_qty"),
            F.sum("cents").alias("cents"),
        )
    )
    t0 = time.perf_counter()
    baseline = _rows(final)
    base_wall = time.perf_counter() - t0
    app_id = spark.sparkContext.applicationId
    n_before = _wait_for_executors(app_id, 2)
    t0 = time.perf_counter()
    out, obs = _run_with_kill(spark, lambda: _rows(final), delay_s=max(1.0, base_wall * 0.3))
    kill_wall = time.perf_counter() - t0
    ok = (
        obs.get("died")
        and "result" in out
        and out["result"] == baseline
    )
    return {
        "probe": "shuffle_agg_executor_loss",
        "rows": len(baseline),
        "base_wall_s": round(base_wall, 1),
        "kill_wall_s": round(kill_wall, 1),
        "executors_before": n_before,
        "victim_died": bool(obs.get("died")),
        "completed": "result" in out,
        "bit_equal": out.get("result") == baseline,
        "error": out.get("error"),
        "ok": bool(ok),
    }


def pin_strategy_scenario(spark, strategy: str, workdir: str) -> "dict":
    app_id = spark.sparkContext.applicationId
    _wait_for_executors(app_id, 2)
    spark.conf.set("spark.graft.pin.strategy", strategy)
    if strategy == "reliable":
        spark.conf.set("spark.graft.pin.dir", os.path.join(workdir, "pins"))
    li = table(spark, SF_DIR, "lineitem").select("l_suppkey", "l_quantity")
    rep = li.withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(4)])))
    frame = rep.groupBy("l_suppkey", "r").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )
    consume = lambda df: _rows(  # noqa: E731
        df.groupBy((F.col("l_suppkey") % 13).alias("g")).agg(
            F.sum("n").alias("n"), F.sum("sum_qty").alias("sum_qty")
        )
    )
    baseline = consume(frame)
    pinned = pin(frame.repartition(8))  # blocks spread over both executors
    obs = _kill_one_mid_job(spark, delay_s=0.0)
    res: dict = {}
    try:
        res["result"] = consume(pinned)
    except Exception as ex:  # noqa: BLE001 — the local strategy's documented mode
        res["error"] = f"{type(ex).__name__}: {str(ex)[:200]}"
    survived = "result" in res
    equal = res.get("result") == baseline
    must_survive = strategy in ("reliable", "persist")
    ok = (survived and equal) if must_survive else (not survived or equal)
    if strategy == "persist":
        pinned.unpersist()
    return {
        "probe": f"pin_{strategy}_executor_loss",
        "victim_died": bool(obs.get("died")),
        "survived": survived,
        "bit_equal_when_survived": equal if survived else None,
        "must_survive": must_survive,
        "error": res.get("error"),
        "ok": bool(ok and obs.get("died")),
    }


def main() -> int:
    workdir = "/tmp/executor_loss_probe"
    spark = get_spark(
        app_name="executor-loss-probe",
        master=MASTER,
        shuffle_partitions=32,
        extra_conf=local_cluster_conf(MASTER),
    )
    results = [shuffle_agg_scenario(spark)]
    for strategy in ("reliable", "persist", "local"):
        results.append(pin_strategy_scenario(spark, strategy, workdir))
    for r in results:
        print(json.dumps(r))
    spark.stop()
    return 0 if all(r["ok"] for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
