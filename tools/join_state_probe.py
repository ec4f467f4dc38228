#!/usr/bin/env python
"""Full-volume outer stream-stream join probe (round 11).

Drives ``streaming/events.stream_click_view_join_outer`` over sf0.1's
full events table (~20k clicks / ~20k views across 30 days) and checks
the two properties that matter at 100 TB:

1. **State is horizon-bounded, not stream-bounded.** After draining the
   whole month in one run, the join buffers only the rows the watermark
   cannot yet prove closed — the trailing ~30-minute horizon on each
   side — NOT the month. Measured with the OFFLINE state reader
   (sources/state_reader.py), i.e. the audit a production operator would
   run against a live checkpoint: buffered-left must equal the clicks
   above the global watermark (boundary printed, both >= and > accepted
   since the engine's eviction predicate is an internal detail), and the
   buffer must be orders of magnitude below the stream length.

2. **The drained output is bit-equal to the batch twin.** A far-future
   sentinel pair flushes the horizon; the streaming output (sentinels
   excluded) must then equal the driver-gated batch twin
   (``ev_click_view_outer_twin``'s plan — operators/temporal.range_join)
   with symmetric ``exceptAll`` diff 0 on all ~20k result rows,
   null-extended rows included.

Run solo (writes /tmp dirs, RocksDB conf is process-wide):
``python tools/join_state_probe.py``. Prints one JSON line; paste into
SCALING.md.
"""

from __future__ import annotations

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
    stream_click_view_join_outer,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/join_state_probe"


def main() -> None:
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
    )
    ev.filter(F.col("event_type").isin("click", "view")).coalesce(4).write.parquet(src)

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
            stream_click_view_join_outer(side("click"), side("view"))
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

    # sentinel pair far past the horizon flushes every real click
    sentinel_ts = max(max_click, max_view) + dt.timedelta(hours=2)
    spark.createDataFrame(
        [(10_000_000, sentinel_ts, 999_999_999, "click", 0.0),
         (10_000_001, sentinel_ts, 999_999_999, "view", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).coalesce(1).write.mode("append").parquet(src)
    t_drain2 = drain()

    streamed = spark.read.parquet(out).filter(F.col("user_id") != 999_999_999)
    twin = range_join(
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
    d1 = streamed.exceptAll(twin).count()
    d2 = twin.exceptAll(streamed).count()
    if d1 != 0 or d2 != 0:
        raise RuntimeError(f"stream vs batch twin diff: {d1}/{d2}")

    n_out = streamed.count()
    n_null = streamed.filter(F.col("view_ts").isNull()).count()
    print(json.dumps({
        "probe": "outer_join_sf0.1",
        "clicks": n_clicks, "views": n_views,
        "drain1_s": round(t_drain1, 1), "drain2_s": round(t_drain2, 1),
        "buffered_left_after_drain1": len(buffered_left),
        "buffered_right_after_drain1": n_buffered_right,
        "eviction_boundary": boundary,
        "out_rows": n_out, "null_rows": n_null,
        "twin_exceptall_diff": [d1, d2],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
