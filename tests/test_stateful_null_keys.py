"""Null grouping keys × transformWithStateInPandas (r14).

The r14 null-join-key variant corpus caught a real hazard: on Spark
4.1.2, a NULL grouping key fed to ``transformWithStateInPandas`` ABSORBS
the entire partition's rows into the null-key group — every user
co-partitioned with the null key loses its state and its rows are
counted under key NULL (15 of 150 users vanished from
``src_tws_state_digest``'s MapState on the variant corpus).

Two tests:

1. pin the RAW behavior (unguarded tWS, single shuffle partition, null
   key present → co-partitioned users' state is absorbed) — if a future
   Spark release fixes the absorption, this test fails and tells us the
   ``drop_null_keys`` guard has become purely semantic;
2. prove the GUARD (the shipped operators): same corpus, state holds
   exactly the non-null per-(user, type) counts and no null entry.

``applyInPandasWithState`` does not share the bug (probed during r14 —
null-key rows group separately), so only the tWS operators guard.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_etl_elt_dashboard_spark.sources.state_reader import state_rows
from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
    _protobuf_available,
    running_type_counts,
)

SCH = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ROWS = [
    (1, dt.datetime(2024, 3, 1, 8, 0), 1, "view", 1.0),
    (2, dt.datetime(2024, 3, 1, 8, 1), None, "view", 1.0),
    (3, dt.datetime(2024, 3, 1, 8, 2), None, "click", 1.0),
    (4, dt.datetime(2024, 3, 1, 8, 3), 2, "click", 1.0),
    (5, dt.datetime(2024, 3, 1, 8, 4), 3, "view", 1.0),
]


def _drain_raw(spark, src, ckpt, guarded: bool):
    """One availableNow tWS drain over ``src`` with shuffle partitions
    pinned to 1 so the null key shares a partition with every user."""
    stream = spark.readStream.schema(SCH).parquet(src)
    if guarded:
        plan = running_type_counts(stream)  # shipped operator (guards)
    else:
        # the RAW unguarded shape — groupBy straight into tWS
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )
        import pandas as pd

        class Raw(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._counts = handle.getMapState("counts", "k string", "n long")

            def handleInputRows(self, key, rows, timerValues):
                local: dict[str, int] = {}
                for pdf in rows:
                    for t, c in pdf["event_type"].value_counts().items():
                        local[str(t)] = local.get(str(t), 0) + int(c)
                out = {"user_id": [], "event_type": [], "n": []}
                for t in sorted(local):
                    prev = (
                        self._counts.getValue((t,))
                        if self._counts.containsKey((t,))
                        else None
                    )
                    n = (prev[0] if prev else 0) + local[t]
                    self._counts.updateValue((t,), (n,))
                    out["user_id"].append(key[0])
                    out["event_type"].append(t)
                    out["n"].append(n)
                yield pd.DataFrame(out)

            def close(self) -> None:
                pass

        plan = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=Raw(),
            outputStructType="user_id long, event_type string, n long",
            outputMode="Update",
            timeMode="None",
        )
    q = (
        plan.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def _state(spark, ckpt):
    st = state_rows(spark, ckpt, state_var_name="counts")
    return sorted(
        (
            (r["key"]["user_id"], r["user_map_key"]["k"], r["user_map_value"]["n"])
            for r in st.collect()
        ),
        key=str,
    )


@pytest.fixture()
def null_key_src(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCH).coalesce(1).write.parquet(src)
    return src


def _pinned(spark, tmp_path, src, guarded):
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ckpt = str(tmp_path / ("ckpt_g" if guarded else "ckpt_raw"))
        _drain_raw(spark, src, ckpt, guarded)
        return _state(spark, ckpt)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_raw_tws_null_key_absorbs_partition(spark, tmp_path, null_key_src):
    """The measured Spark 4.1.2 behavior the guard exists for: with one
    shuffle partition, EVERYTHING lands under key NULL — users 1/2/3
    lose their state entirely. If this ever fails with per-user entries
    present, Spark fixed the absorption and drop_null_keys is downgraded
    to a semantic-only filter (update its docstring)."""
    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")
    got = _pinned(spark, tmp_path, null_key_src, guarded=False)
    assert got == [(None, "click", 2), (None, "view", 3)]


def test_guarded_operator_keeps_copartitioned_users(spark, tmp_path, null_key_src):
    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")
    got = _pinned(spark, tmp_path, null_key_src, guarded=True)
    assert got == [(1, "view", 1), (2, "click", 1), (3, "view", 1)]
