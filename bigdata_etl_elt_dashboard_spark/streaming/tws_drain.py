"""Hermetic transformWithState drain: ``python -m ...streaming.tws_drain
<src_parquet> <checkpoint>``.

Why a subprocess module and not an in-session drain: the
transformWithStateInPandas runtime needs ``google.protobuf`` importable
by JVM-SPAWNED Python workers, which inherit PYTHONPATH from the JVM's
environment AT LAUNCH. On a harness-owned session the JVM is already up
before this package can export the vendored shim, and the driver-side
schema worker crashes (measured on Spark 4.1: "TransformWithState...
driver worker exited unexpectedly"). A fresh interpreter that calls
``ensure_protobuf()`` BEFORE building its own SparkSession sidesteps the
ordering entirely — so the r13 state-format gate drains here and the
caller's session only does what it can always do: read the checkpoint
offline through the state data source and digest it.

The drain itself: events parquet → ``running_type_counts`` (MapState
"counts" keyed by user_id, map key event_type → lifetime count) →
noop sink, availableNow, RocksDB state store. MapState content is
batch-count-invariant (running counts accumulate), so the digest does
not depend on file batching.
"""

from __future__ import annotations

import sys


def main(src: str, checkpoint: str) -> None:
    from bigdata_etl_elt_dashboard_spark.vendor import ensure_protobuf

    if not ensure_protobuf():  # must precede the JVM launch (see module doc)
        raise RuntimeError("no protobuf runtime (real or vendored shim)")

    from pyspark.sql import SparkSession

    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        running_type_counts,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tws-drain")
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
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double"
        ).parquet(src)
        q = (
            running_type_counts(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            raise RuntimeError("tws drain did not terminate within 600 s")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
