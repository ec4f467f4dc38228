#!/usr/bin/env python
"""Runtime bloom-filter join-pruning probe (r13 verdict task 8).

Measures the money queries' warm wall-clock with Spark's runtime
bloom-filter injection ON vs OFF and reports whether a filter actually
injected (``bloom_filter_agg`` in the executed plan). Findings land in
SCALING.md with the default decision.

What the optimizer offers in THIS build (Spark 4.1.2, probed):

- ``spark.sql.optimizer.runtime.bloomFilter.enabled`` defaults TRUE, but
  injection is gated by ``applicationSideScanSizeThreshold`` (10 GB) and
  ``creationSideThreshold`` (10 MB) — at probe scale (sf0.1 ≈ 100 MB
  tables) the application side never crosses 10 GB, so the engine's
  shipped posture genuinely runs WITHOUT bloom filters until tables
  reach cluster scale. The probe lowers the application-side threshold
  to 0 to measure what a 100 TB deployment would get.
- ``spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled`` does
  NOT exist in Spark 4.1 (SQL_CONF_NOT_FOUND; present in 3.x as an
  internal conf) — the bloom filter is the one surviving runtime-filter
  strategy, so the verdict's "semiJoinReduction" half resolves to
  not-applicable-on-4.x.
- a broadcast-hash join needs no runtime filter (the build side IS the
  filter); bloom only injects on shuffle joins. The engine broadcasts
  every dim ≤ 64 MB, so at sf0.1 the candidates are the fact⋈fact
  shuffle joins. The probe also runs a no-broadcast posture
  (autoBroadcastJoinThreshold = -1) to expose the shuffle-join shape
  every fact⋈fact join has at 100 TB regardless of dim broadcasting.

Usage: ``python tools/bloom_probe.py [sf_dir]`` (default
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1). Run SOLO — wall-clock
numbers feed SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_etl_elt_dashboard_spark.plans import REGISTRY  # noqa: E402
from bigdata_etl_elt_dashboard_spark.session import get_spark  # noqa: E402

#: shuffle-join-heavy money queries — fact⋈fact chains with a selective
#: side, the shape runtime filters exist for
PROBES = [
    "unshipped_topk_q3",
    "local_supplier_volume_q5",
    "profit_nation_year_q9",
    "supplier_late_blame_q21",
    "part_min_cost_supplier_q2",
    "cust_returned_revenue_top",
    "cust_big_basket_orders",
]

_BLOOM_APP_THRESH = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
_BLOOM_ON = "spark.sql.optimizer.runtime.bloomFilter.enabled"
_BCAST = "spark.sql.autoBroadcastJoinThreshold"


def timed(spark, sf_dir: str, name: str) -> tuple[float, int]:
    """(warm min-of-3 wall-clock, #bloom_filter_agg sites in the executed
    plan). The first collect warms analysis/codegen and finalizes AQE."""
    df = REGISTRY[name].fn(spark, sf_dir)
    df.collect()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        df.collect()
        best = min(best, time.perf_counter() - t0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return best, plan.count("bloom_filter_agg(")


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark(app_name="bloom-probe", extra_conf={"spark.ui.enabled": "false"})
    rows = []
    for posture, bcast in (("broadcast-dims", str(64 * 1024 * 1024)),
                           ("all-shuffle", "-1")):
        spark.conf.set(_BCAST, bcast)
        for name in PROBES:
            try:
                spark.conf.set(_BLOOM_ON, "false")
                off_s, _ = timed(spark, sf_dir, name)
                spark.conf.set(_BLOOM_ON, "true")
                spark.conf.set(_BLOOM_APP_THRESH, "0")
                on_s, n_bloom = timed(spark, sf_dir, name)
            except Exception as ex:  # noqa: BLE001 — a query too big for
                # the probe host (e.g. an aggregation OOM at 128× under the
                # local heap) should cost one row, not the whole probe
                rows.append({"posture": posture, "query": name,
                             "error": f"{type(ex).__name__}: {str(ex)[:160]}"})
                print(f"| {posture} | `{name}` | ERROR {type(ex).__name__} |")
                continue
            rows.append({
                "posture": posture, "query": name,
                "off_s": round(off_s, 4), "on_s": round(on_s, 4),
                "delta_pct": round((on_s - off_s) / off_s * 100, 1),
                "n_bloom_sites": n_bloom,
            })
            print(f"| {posture} | `{name}` | {off_s:.4f} | {on_s:.4f} | "
                  f"{(on_s - off_s) / off_s:+.1%} | {n_bloom} |")
    print(json.dumps({"probe": "runtime_bloom_filter", "sf_dir": sf_dir,
                      "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
