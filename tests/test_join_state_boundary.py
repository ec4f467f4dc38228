"""Eviction-boundary semantics of stream-stream join state (Spark 4.1.2),
measured with a µs-grid probe and PINNED here because the r13 driver gate
``src_join_state_digest`` (plans/wave13.py) encodes them in its DuckDB
oracle:

- committed watermark W = min over sides of (ms-floored per-side max
  event time − delay);
- LEFT (click) rows survive iff click_ts > W — strict and exact (a click
  at precisely W is evicted, W + 1 µs survives);
- RIGHT (view) rows survive iff view_ts > W − window − 1 ms (a view at
  exactly W − window − 1 ms is evicted, 1 µs above survives — Spark's
  state-value watermark for the range side lands 1 ms below the
  algebraic horizon).

If a Spark upgrade shifts any of these, this test fails FIRST with an
exact row-level diff, before the gate's digest goes red for opaque
reasons.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_etl_elt_dashboard_spark.sources.state_reader import (
    checkpoint_watermark,
)
from bigdata_etl_elt_dashboard_spark.streaming.events import (
    stream_click_view_join,
)
from bigdata_etl_elt_dashboard_spark.streaming.migration import (
    read_click_view_buffers,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(h, m, s=0, us=0):
    return dt.datetime(2024, 3, 1, h, m, s, us)


def test_join_state_eviction_boundaries(spark, tmp_path):
    # max setters: view max 12:00 → view wm 11:30; click max 12:30 →
    # click wm 12:00; global W = 11:30 (delay 30 min, window 10 min)
    rows = [
        (1, _ts(12, 0), 100, "view", 1.0),
        (2, _ts(12, 30), 101, "click", 0.0),
        # click grid around W = 11:30
        (10, _ts(11, 30), 1, "click", 0.0),               # == W: evicted
        (11, _ts(11, 30, 0, 1), 2, "click", 0.0),         # W+1µs: kept
        (12, _ts(11, 29, 59, 999999), 3, "click", 0.0),   # W−1µs: evicted
        # view grid around W − window − 1ms = 11:19:59.999
        (20, _ts(11, 20), 4, "view", 1.0),                # horizon: kept
        (21, _ts(11, 19, 59, 999001), 5, "view", 1.0),    # +1µs over cut: kept
        (22, _ts(11, 19, 59, 999000), 6, "view", 1.0),    # == cut: evicted
        (23, _ts(11, 19, 59, 998999), 7, "view", 1.0),    # below: evicted
    ]
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)

    def drain():
        side = lambda et: (  # noqa: E731
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .filter(F.col("event_type") == et)
        )
        q = (
            stream_click_view_join(side("click"), side("view"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    drain()  # no-data batch: commits the advanced watermark + evicts

    assert checkpoint_watermark(ckpt) == _ts(11, 30)
    left, right = read_click_view_buffers(spark, ckpt)
    assert sorted(r["click_id"] for r in left.collect()) == [2, 11]
    assert sorted(r["user_id"] for r in right.collect()) == [4, 5, 100]
