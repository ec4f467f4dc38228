#!/usr/bin/env python
"""Harness-default execution sweep, chunked across fresh JVMs.

Runs every ``queries()`` entry on a DEFAULT SparkSession (the harness
posture: ANSI on, 200 shuffle partitions, 1g heap) at the given SF and
reports failures — the strongest pre-driver EXECUTION check (the parity
sweep checks values at sf0.01; this checks the plans run at volume).

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
   -> the child caps ``spark.sql.ui.retainedExecutions`` and disables
   the UI, exactly as a production long-lived driver does. ANSI, 200
   shuffle partitions, and the 1g heap remain harness defaults.
With both, the monolithic form (``--chunk 392``) passes at sf0.1 under
the default heap (r12 verdict task 3). Chunking remains available as
isolation for DIAGNOSING a tail failure (a failure is real only if it
reproduces in its own chunk).

Usage: ``python tools/run_count_sweep.py [--sf DIR] [--chunk N]``
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
from pyspark.sql import SparkSession
# Long-lived-driver hygiene, NOT plan tuning (ANSI / 200 shuffle
# partitions / 1g heap stay at harness defaults): the SQL UI store
# retains 1000 executions' full plan graphs by default, and ~400
# registered queries' worth of giant plans (iterative unrolls, composed
# digests) exhaust the 1g heap through the LISTENER, not the executors —
# measured r13: the monolithic child died at query ~244 with healthy
# release_pins block reclamation. Production drivers cap this the same
# way (spark.sql.ui.retainedExecutions).
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.ui.retainedExecutions", "50")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
from bigdata_etl_elt_dashboard_spark.operators.scale import release_pins
sf = sys.argv[1]
names = sys.argv[2:]
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
    args = ap.parse_args()

    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

    names = list(REGISTRY)
    all_fails: list[list[str]] = []
    for i in range(0, len(names), args.chunk):
        chunk = names[i : i + args.chunk]
        p = subprocess.run(
            [sys.executable, "-c", _CHILD, args.sf, *chunk],
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
