#!/usr/bin/env python
"""Full-volume execution sweep, chunked across fresh JVMs.

Runs every ``queries()`` entry at the given SF with the harness-critical
posture pinned (ANSI on — the Spark 4 default, 200 shuffle partitions,
1g driver heap) and reports failures — the strongest pre-driver
EXECUTION check (the parity sweep checks values at sf0.01; this checks
the plans run at volume). As of r14 the child session comes from
``session.get_spark`` so the sweep also exercises the factory's
long-lived-driver defaults.

Why chunking exists: a single process accumulates ~45k stages across
390 queries and pinned localCheckpoint blocks are freed only by the
ASYNC ContextCleaner, which lags the allocation rate — under the
default 1g heap the r12 monolithic sweep failed a localCheckpoint on
the LAST queries (`graph_label_propagation` red monolithic, green
solo). Round 13 fixed the accumulation at the source — TWO leaks, both
long-lived-driver hygiene rather than plan properties:
1. pinned localCheckpoint blocks freed only by the async ContextCleaner
   -> the child calls ``operators.scale.release_pins`` after each
   fully-consumed query (synchronous reclamation);
2. the SQL UI store's default 1000 retained executions x giant plan
   graphs exhaust the 1g heap through the LISTENER (measured: the
   monolithic child died at query ~244 with block reclamation healthy)
   -> fixed by capping ``spark.sql.ui.retainedExecutions``, which as of
   r14 is a SESSION-FACTORY default (session.get_spark) — the child
   builds its session through the factory with the harness-critical
   knobs pinned (ANSI on is the Spark 4 default, 200 shuffle
   partitions, 1g driver heap), so the sweep also proves the factory
   default suffices with no child-side override.
With both, the monolithic form (``--chunk 392``) passes at sf0.1 under
the default heap (r12 verdict task 3). Chunking remains available as
isolation for DIAGNOSING a tail failure (a failure is real only if it
reproduces in its own chunk).

Usage: ``python tools/run_count_sweep.py [--sf DIR] [--chunk N]
[--master local-cluster[W,C,M]]`` — the ``--master`` form re-runs the
same full-volume sweep with real executor JVMs (the at-volume
complement of ``run_parity_subset.py --master``'s sf0.01 value check).
Prints one line per chunk and a final verdict; exit 1 on any failure.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

_CHILD = r"""
import json, sys
# The UI-retention cap that keeps a long-lived 1g driver alive through
# hundreds of giant plans is a SESSION-FACTORY default as of r14
# (session.get_spark pins spark.sql.ui.retainedExecutions=50) — the
# child takes it from the factory instead of overriding it locally, so
# the sweep now also PROVES the factory default suffices. The
# harness-posture-critical knobs stay pinned: ANSI (Spark 4 default on),
# 200 shuffle partitions, 1g driver heap.
#
# --master local-cluster[W,C,M] (r14): the same full-volume sweep with
# REAL executor JVMs (session.local_cluster_conf supplies the
# executor-memory fit + executorEnv PYTHONPATH). The 1 g driver heap
# stays — in cluster mode the driver only plans/collects, which is
# exactly the production shape the harness posture approximates.
from bigdata_etl_elt_dashboard_spark.session import get_spark, local_cluster_conf
master = sys.argv[1]
spark = get_spark(
    app_name="count-sweep-child",
    master=master,
    shuffle_partitions=200,
    extra_conf={
        **local_cluster_conf(master),
        "spark.driver.memory": "1g",
        "spark.ui.enabled": "false",
        # harness-posture broadcast budget: the factory's 64 MB threshold
        # is sized for its 8 g default driver; under this sweep's pinned
        # 1 g heap the Spark-default 10 MB applies (measured r14: 64 MB
        # broadcasts OOM the two graph tail queries monolithically)
        "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    },
)
import __spark_entry__ as e
from bigdata_etl_elt_dashboard_spark.operators.scale import release_pins
sf = sys.argv[2]
names = sys.argv[3:]
qs = e.queries()
fails = []
for name in names:
    try:
        qs[name](spark, sf).count()
    except Exception as ex:  # noqa: BLE001
        fails.append([name, f"{type(ex).__name__}: {str(ex)[:200]}"])
    finally:
        release_pins(spark)  # synchronous pinned-block reclamation
print("CHUNK_RESULT " + json.dumps(fails))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--chunk", type=int, default=60)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

    names = list(REGISTRY)
    all_fails: list[list[str]] = []
    for i in range(0, len(names), args.chunk):
        chunk = names[i : i + args.chunk]
        p = subprocess.run(
            [sys.executable, "-c", _CHILD, args.master, args.sf, *chunk],
            capture_output=True,
            text=True,
            cwd=_ROOT,
        )
        fails = None
        for line in p.stdout.splitlines():
            if line.startswith("CHUNK_RESULT "):
                fails = json.loads(line[len("CHUNK_RESULT "):])
        if fails is None:
            fails = [[f"<chunk {i}-{i + len(chunk) - 1}>",
                      f"child died rc={p.returncode}: {p.stderr[-300:]}"]]
        all_fails.extend(fails)
        print(f"chunk {i:4d}..{i + len(chunk) - 1:4d}: "
              f"{len(chunk) - len(fails)}/{len(chunk)} ok"
              + (f"  FAILS: {[f[0] for f in fails]}" if fails else ""))
    print(f"\n{len(names) - len(all_fails)}/{len(names)} ok")
    for name, err in all_fails:
        print(f"FAIL {name}: {err}")
    return 1 if all_fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
