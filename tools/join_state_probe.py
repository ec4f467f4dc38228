#!/usr/bin/env python
"""Full-volume outer/full stream-stream join probe (rounds 11-12).

Drives ``streaming/events.stream_click_view_join_outer`` (or ``_full``)
over sf0.1's full events table and checks the two properties that matter
at 100 TB:

1. **State is horizon-bounded, not stream-bounded.** After draining the
   whole stream in one run, the join buffers only the rows the watermark
   cannot yet prove closed — the trailing ~30-minute horizon on each
   side — NOT the history. Measured with the OFFLINE state reader
   (sources/state_reader.py), i.e. the audit a production operator would
   run against a live checkpoint: buffered-left must equal the clicks
   above the global watermark (boundary printed, both >= and > accepted
   since the engine's eviction predicate is an internal detail), and the
   buffer must be orders of magnitude below the stream length.

2. **The drained output is bit-equal to the batch twin.** A far-future
   sentinel pair flushes the horizon; the streaming output (sentinels
   excluded) must then equal the driver-gated batch twin
   (``ev_click_view_outer_twin`` / ``_full_twin``'s plans —
   operators/temporal.range_join, plus the row-identity orphan-view anti
   join for the full flavor) with symmetric ``exceptAll`` diff 0,
   null-extended rows included.

Round-12 scale axes (r11 verdict task 4) — ``--k N --mode rate|history``
replicates the events K× with disjoint id spaces before the drain:

- ``rate``: replicas keep their timestamps → K× arrival RATE over the
  same month. Horizon-bounded state must grow ~K× (more rows per horizon).
- ``history``: replica i shifts forward by i×31 days → K× HISTORY at the
  original rate. Horizon-bounded state must stay ~1× (the trailing
  horizon of the LAST replica only) — the axis that separates
  O(rate × horizon) from O(stream length).

Run solo (writes /tmp dirs, RocksDB conf is process-wide):
``python tools/join_state_probe.py [--k N] [--mode rate|history]
[--flavor outer|full]``. Prints one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_etl_elt_dashboard_spark.operators.temporal import range_join  # noqa: E402
from bigdata_etl_elt_dashboard_spark.session import get_spark  # noqa: E402
from bigdata_etl_elt_dashboard_spark.sources.catalog import table  # noqa: E402
from bigdata_etl_elt_dashboard_spark.sources.state_reader import state_rows  # noqa: E402
from bigdata_etl_elt_dashboard_spark.streaming.events import (  # noqa: E402
    stream_click_view_join_full,
    stream_click_view_join_outer,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/join_state_probe"

#: id shifts per replica — far above sf0.1's id ranges, far below the
#: sentinel ids (event 10_000_000+, user 999_999_999)
EVENT_SHIFT = 1_000_000
USER_SHIFT = 1_000_000


def _batch_twin(clicks, views, flavor: str):
    """The driver-gated batch-twin plan on the probe's frames: row-level
    LEFT range join; the full flavor adds orphan views by ROW IDENTITY
    (the probe's views still carry event_id, so no same-payload view can
    shadow another — the same row-level contract plans/wave11.py gates)."""
    left = range_join(
        clicks.select("event_id", "user_id", "ts"),
        views.select("user_id", "ts", "value"),
        key="user_id", left_ts="ts", right_ts="ts", window_seconds=600,
    ).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("r_ts").alias("view_ts"),
        F.col("r_value").alias("view_value"),
    )
    if flavor == "outer":
        return left
    # full: append views no click claimed — identity-keyed via the view's
    # event_id carried through the reversed match probe
    matched_ids = range_join(
        clicks.select("user_id", "ts"),
        views.select("event_id", "user_id", "ts"),
        key="user_id", left_ts="ts", right_ts="ts", window_seconds=600,
    ).select(F.col("r_event_id").alias("event_id")).distinct()
    orphans = views.join(matched_ids, "event_id", "left_anti").select(
        F.lit(None).cast("long").alias("click_id"),
        F.col("user_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return left.unionByName(orphans)


def migrate_probe() -> None:
    """Volume twin of tests/test_stream_join_migration.py: kill a
    leftOuter click/view join mid-month on sf0.1's full events table,
    re-seed a fresh source from the dead checkpoint's offline-read
    buffers (streaming/migration.reseed_click_view_source), continue
    with the unseen tail, and require the deduplicated union of the two
    runs' outputs to be exceptAll-bit-equal to an uninterrupted run on
    the same ingestion cadence. Also prints the re-seed size — the
    horizon bound that makes migration a small batch even mid-flood —
    and the offline watermark the recipe keyed on."""
    from bigdata_etl_elt_dashboard_spark.sources.state_reader import (
        checkpoint_watermark,
    )
    from bigdata_etl_elt_dashboard_spark.streaming.events import (
        stream_click_view_join_outer as join_fn,
    )
    from bigdata_etl_elt_dashboard_spark.streaming.migration import (
        reseed_click_view_source,
    )

    spark = get_spark(app_name="join-migrate-probe", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    ev = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).filter(F.col("event_type").isin("click", "view"))
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    cut = lo + (hi - lo) / 2
    p1 = ev.filter(F.col("ts") < F.lit(cut))
    p2 = ev.filter(F.col("ts") >= F.lit(cut))
    sentinels = spark.createDataFrame(
        [(10_000_000, hi + dt.timedelta(hours=2), 999_999_999, "click", 0.0),
         (10_000_001, hi + dt.timedelta(hours=2), 999_999_999, "view", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )

    def drain(src, ckpt, out) -> float:
        def side(et):
            return (
                spark.readStream.schema(
                    "event_id long, ts timestamp, user_id long, event_type string, value double"
                )
                .parquet(src)
                .filter(F.col("event_type") == et)
            )

        t0 = time.perf_counter()
        q = (
            join_fn(side("click"), side("view"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(1800):
            raise RuntimeError("drain did not terminate within 1800 s")
        return time.perf_counter() - t0

    def run(tag: str, interrupted: bool) -> tuple[str, dict]:
        base = f"{WORK}/{tag}"
        src1 = f"{base}/src1"
        p1.coalesce(4).write.parquet(src1)
        t1 = drain(src1, f"{base}/ckptA", f"{base}/outA")
        # second drain materializes the advanced watermark in the offsets
        # log (house pattern: a no-new-data availableNow run commits the
        # watermark batch)
        t2 = drain(src1, f"{base}/ckptA", f"{base}/outA")
        info = {"drain_p1_s": round(t1, 1), "drain_wm_s": round(t2, 1)}
        if not interrupted:
            p2.unionByName(sentinels).coalesce(4).write.mode("append").parquet(src1)
            info["drain_p2_s"] = round(drain(src1, f"{base}/ckptA", f"{base}/outA"), 1)
            return f"{base}/outA", info
        wm = checkpoint_watermark(f"{base}/ckptA")
        if wm is None:
            raise RuntimeError("no committed watermark in the dead checkpoint")
        t0 = time.perf_counter()
        n_clicks, n_views = reseed_click_view_source(
            spark, f"{base}/ckptA", f"{base}/src2"
        )
        info.update(
            {
                "watermark": wm.isoformat(),
                "seed_clicks": n_clicks,
                "seed_views": n_views,
                "reseed_s": round(time.perf_counter() - t0, 1),
            }
        )
        p2.unionByName(sentinels).coalesce(4).write.mode("append").parquet(f"{base}/src2")
        info["drain_b_s"] = round(drain(f"{base}/src2", f"{base}/ckptB", f"{base}/outB"), 1)
        merged = (
            spark.read.parquet(f"{base}/outA")
            .unionByName(spark.read.parquet(f"{base}/outB"))
            .dropDuplicates()
        )
        merged.write.parquet(f"{base}/merged")
        return f"{base}/merged", info

    base_out, base_info = run("baseline", interrupted=False)
    mig_out, mig_info = run("migrated", interrupted=True)
    # dedup BOTH sides before the exceptAll (r12 advice): the merged side
    # is already dropDuplicates'd, so a legitimately-duplicate projected
    # row in the continuous baseline (two identical-payload views matching
    # one click) would otherwise fail the probe spuriously
    baseline = (
        spark.read.parquet(base_out)
        .filter(F.col("user_id") != 999_999_999)
        .dropDuplicates()
    )
    migrated = (
        spark.read.parquet(mig_out)
        .filter(F.col("user_id") != 999_999_999)
        .dropDuplicates()
    )
    d1 = migrated.exceptAll(baseline).count()
    d2 = baseline.exceptAll(migrated).count()
    if d1 != 0 or d2 != 0:
        raise RuntimeError(f"migrated vs continuous diff: {d1}/{d2}")
    n_rows = baseline.count()
    n_stream = ev.count()
    print(json.dumps({
        "probe": "join_migration_sf0.1",
        "stream_rows": n_stream,
        "out_rows": n_rows,
        "baseline": base_info,
        "migration": mig_info,
        "merged_exceptall_diff": [d1, d2],
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--mode", choices=["rate", "history"], default="rate")
    ap.add_argument("--flavor", choices=["outer", "full"], default="outer")
    ap.add_argument("--migrate", action="store_true",
                    help="run the mid-stream kill + re-seed migration probe instead")
    args = ap.parse_args()
    if args.migrate:
        migrate_probe()
        return

    spark = get_spark(app_name="join-state-probe", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)
    src = f"{WORK}/src"
    ckpt = f"{WORK}/ckpt"
    out = f"{WORK}/out"

    # events.parquet is TIMESTAMP(NANOS): land it through the catalog
    # loader as micros so the file stream can read it
    ev = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).filter(F.col("event_type").isin("click", "view"))
    replicas = []
    for i in range(args.k):
        r = ev.select(
            (F.col("event_id") + F.lit(i * EVENT_SHIFT)).alias("event_id"),
            (
                F.col("ts") + F.expr(f"INTERVAL {i * 31} DAYS")
                if args.mode == "history"
                else F.col("ts")
            ).alias("ts"),
            (F.col("user_id") + F.lit(i * USER_SHIFT)).alias("user_id"),
            "event_type",
            "value",
        )
        replicas.append(r)
    full_src = replicas[0]
    for r in replicas[1:]:
        full_src = full_src.unionByName(r)
    full_src.coalesce(4 * args.k).write.parquet(src)

    join_fn = (
        stream_click_view_join_outer if args.flavor == "outer" else stream_click_view_join_full
    )

    def drain() -> float:
        def side(et):
            return (
                spark.readStream.schema(
                    "event_id long, ts timestamp, user_id long, event_type string, value double"
                )
                .parquet(src)
                .filter(F.col("event_type") == et)
            )

        t0 = time.perf_counter()
        q = (
            join_fn(side("click"), side("view"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(1800):
            raise RuntimeError("availableNow drain did not terminate within 1800 s")
        return time.perf_counter() - t0

    t_drain1 = drain()

    batch = spark.read.parquet(src)
    clicks = batch.filter(F.col("event_type") == "click")
    views = batch.filter(F.col("event_type") == "view")
    n_clicks, n_views = clicks.count(), views.count()
    max_click = clicks.agg(F.max("ts")).collect()[0][0]
    max_view = views.agg(F.max("ts")).collect()[0][0]
    wm = min(max_click, max_view) - dt.timedelta(minutes=30)

    buffered_left = {
        r["click_id"]
        for r in state_rows(spark, ckpt, join_side="left").select("value.click_id").collect()
    }
    expect_ge = {r["event_id"] for r in clicks.filter(F.col("ts") >= wm).collect()}
    expect_gt = {r["event_id"] for r in clicks.filter(F.col("ts") > wm).collect()}
    if buffered_left == expect_ge:
        boundary = ">="
    elif buffered_left == expect_gt:
        boundary = ">"
    else:
        raise AssertionError(
            f"buffered left != clicks above watermark: buffered={len(buffered_left)} "
            f"ge={len(expect_ge)} gt={len(expect_gt)} "
            f"diff_ge={sorted(buffered_left ^ expect_ge)[:10]}"
        )
    n_buffered_right = state_rows(spark, ckpt, join_side="right").count()

    # sentinel pair far past the horizon flushes every real click/view
    sentinel_ts = max(max_click, max_view) + dt.timedelta(hours=2)
    spark.createDataFrame(
        [(10_000_000, sentinel_ts, 999_999_999, "click", 0.0),
         (10_000_001, sentinel_ts, 999_999_999, "view", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).coalesce(1).write.mode("append").parquet(src)
    t_drain2 = drain()

    streamed = spark.read.parquet(out).filter(F.col("user_id") != 999_999_999)
    twin = _batch_twin(clicks, views, args.flavor)
    d1 = streamed.exceptAll(twin).count()
    d2 = twin.exceptAll(streamed).count()
    if d1 != 0 or d2 != 0:
        raise RuntimeError(f"stream vs batch twin diff: {d1}/{d2}")

    n_out = streamed.count()
    n_null_left = streamed.filter(F.col("view_ts").isNull()).count()
    n_null_right = streamed.filter(F.col("click_id").isNull()).count()
    print(json.dumps({
        "probe": f"{args.flavor}_join_sf0.1",
        "k": args.k, "mode": args.mode,
        "clicks": n_clicks, "views": n_views,
        "drain1_s": round(t_drain1, 1), "drain2_s": round(t_drain2, 1),
        "buffered_left_after_drain1": len(buffered_left),
        "buffered_right_after_drain1": n_buffered_right,
        "eviction_boundary": boundary,
        "out_rows": n_out, "null_left_rows": n_null_left,
        "null_right_rows": n_null_right,
        "twin_exceptall_diff": [d1, d2],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
