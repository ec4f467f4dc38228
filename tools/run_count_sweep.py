#!/usr/bin/env python
"""Harness-default execution sweep, chunked across fresh JVMs.

Runs every ``queries()`` entry on a DEFAULT SparkSession (the harness
posture: ANSI on, 200 shuffle partitions, 1g heap) at the given SF and
reports failures — the strongest pre-driver EXECUTION check (the parity
sweep checks values at sf0.01; this checks the plans run at volume).

Why chunked: a single process accumulates ~45k stages across 390
queries and the default 1g heap eventually fails a localCheckpoint with
GC pressure on the LAST queries (observed r12: `graph_label_propagation`
red in the monolithic sweep, green solo). Process-lifetime pressure is a
sweep artifact, not a plan property — so the sweep isolates it away:
chunks of ``--chunk`` queries (default 60) each get a fresh interpreter
and JVM, and a failure is only reported if it reproduces in its chunk
(where at most chunk-1 queries preceded it).

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
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
sf = sys.argv[1]
names = sys.argv[2:]
qs = e.queries()
fails = []
for name in names:
    try:
        qs[name](spark, sf).count()
    except Exception as ex:  # noqa: BLE001
        fails.append([name, f"{type(ex).__name__}: {str(ex)[:200]}"])
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
