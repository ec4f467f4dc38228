#!/usr/bin/env python
"""64× capstone probe (r12 verdict task 7): one more decade of scaling
evidence past the standing 8×/32× points.

Replicates sf0.1 64× with the same key-shift discipline as
``tools/scaling_probe.py`` (events 6.4M rows, documents/lineitem/orders/
embeddings 64× with disjoint entity spaces) and runs the two COMPOSED
capstones once each at 1× and 64×:

1. ``corpus_pipeline_v2_digest`` — the 6-stage batch corpus pipeline
   (Gopher filter → verified dedup → allocation → curriculum → packing),
   timed with scaling_probe's build/warm methodology;
2. the medallion single-drain (``streaming/pipeline.stream_sessions_gold``:
   dropDuplicatesWithinWatermark → timer sessionizer → bucketed gold
   MERGE, RocksDB state) over the 64× events table with byte-identical
   replays injected (every 7th event re-delivered, the
   medallion_drain_probe recipe), asserted BIT-EQUAL against
   ``sessions_gold_batch`` — correctness at volume, not just wall-clock.

Run SOLO (wall-clock numbers feed SCALING.md):
``python tools/capstone64_probe.py [K]`` (default 64).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

import scaling_probe as sp  # noqa: E402  (same build + timing discipline)

from bigdata_etl_elt_dashboard_spark.session import get_spark  # noqa: E402
from bigdata_etl_elt_dashboard_spark.sources.catalog import table  # noqa: E402
from bigdata_etl_elt_dashboard_spark.streaming.pipeline import (  # noqa: E402
    sessions_gold_batch,
    stream_sessions_gold,
)

GAP_MS = 600_000
DELAY = "30 minutes"
DELAY_MS = 1_800_000
N_BUCKETS = 16


def medallion_drain(spark, sf_dir: str, work: str) -> dict:
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    delivered = ev.unionByName(ev.filter(F.col("event_id") % 7 == 0))
    src = os.path.join(work, "src")
    delivered.repartition(8).write.parquet(src)  # hash-scatter = disorder

    gold = os.path.join(work, "gold")
    ckpt = os.path.join(work, "ckpt")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    t0 = time.perf_counter()
    q = (
        stream_sessions_gold(
            stream, gold, ckpt, gap_ms=GAP_MS, dedup_horizon=DELAY,
            n_buckets=N_BUCKETS,
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(7200), "drain did not terminate"
    wall = time.perf_counter() - t0

    twin = sessions_gold_batch(delivered, gap_ms=GAP_MS, delay_ms=DELAY_MS)
    got = spark.read.parquet(gold).drop("_bucket")
    d1 = got.exceptAll(twin).count()
    d2 = twin.exceptAll(got).count()
    n = got.count()
    assert d1 == 0 and d2 == 0, f"single-drain must be bit-equal ({d1}/{d2})"
    return {"wall_s": round(wall, 1), "gold_rows": n, "diff": [d1, d2]}


def main() -> None:
    # --corpus-only (r14): time only the corpus-pipeline capstone, skip
    # the medallion drain — for re-measuring the dedup-verify scaling
    # segment after an operator change that does not touch streaming.
    corpus_only = "--corpus-only" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--corpus-only"]
    k = int(argv[0]) if argv else 64
    spark = get_spark(app_name="capstone64", shuffle_partitions=32)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    out_dir = os.path.join("/tmp", f"spark_graft_scaled_{k}x")
    t0 = time.perf_counter()
    sp.build_scaled(spark, out_dir, k)
    print(f"# {k}x corpus built in {time.perf_counter() - t0:.0f}s -> {out_dir}")

    name = "corpus_pipeline_v2_digest"
    b1, w1 = sp.timed(spark, sp.SF_DIR, name)
    bk, wk = sp.timed(spark, out_dir, name)
    print(f"| `{name}` | {w1:.3f} | {wk:.3f} | {wk / w1 if w1 else 0:.1f}x "
          f"| {b1:.2f} | {bk:.2f} |")

    if not corpus_only:
        base = medallion_drain(spark, sp.SF_DIR, "/tmp/capstone_drain_1x")
        big = medallion_drain(spark, out_dir, f"/tmp/capstone_drain_{k}x")
        print(json.dumps({"probe": f"medallion_drain_{k}x", "k": k,
                          "1x": base, f"{k}x": big}))
    spark.stop()


if __name__ == "__main__":
    main()
