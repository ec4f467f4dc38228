#!/usr/bin/env python
"""Diff two bench JSON lines and flag per-query regressions.

Usage: ``python tools/bench_diff.py [BENCH_rNN.json [bench_now.json]]``
With no arguments, the baseline is the NEWEST parseable BENCH_r*.json in
the repo root (so the tripwire never goes stale against an old round)
and the current bench runs live (same interpreter). Exit code 1 if any
query regressed more than the threshold (default 20%,
BENCH_DIFF_THRESHOLD_PCT).

Keeps the round-over-round contract honest: BENCH_r{N} must report the
same warm per-query metric as BENCH_r{N-1}, and any regression > 20%
is flagged rather than silently absorbed into the sum.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def load(path: str) -> dict:
    """Accept either bench.py's one-line JSON or the driver's BENCH_r{N}
    wrapper (pretty JSON whose 'tail' embeds the bench line)."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if "queries" in doc:
            return doc
        for line in doc.get("tail", "").splitlines():
            if line.startswith('{"metric"'):
                return json.loads(line)
        raise SystemExit(f"no bench line inside wrapper {path}")
    except json.JSONDecodeError:
        for line in text.splitlines():
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
        raise SystemExit(f"no JSON bench line found in {path}")


def latest_baseline() -> str:
    """Newest parseable baseline by round number. Prefers the builder's
    full record (bench_full_r{N}.json — carries extension_queries, so the
    extension suite gets tripwires too) over the driver's BENCH_r{N}.json
    wrapper (whose 2000-byte tail truncates the extension record)."""
    import glob
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    candidates = []
    for pattern, pref in (("bench_full_r*.json", 1), ("BENCH_r*.json", 0)):
        for p in glob.glob(os.path.join(root, pattern)):
            m = re.search(r"r(\d+)", os.path.basename(p))
            if m:
                candidates.append((int(m.group(1)), pref, p))
    for _, _, path in sorted(candidates, reverse=True):
        try:
            load(path)
            return path
        except SystemExit:
            continue  # unparseable wrapper (e.g. the r03 emission bug)
    raise SystemExit("no parseable bench baseline found")


def main() -> None:
    base_path = sys.argv[1] if len(sys.argv) > 1 else latest_baseline()
    print(f"# baseline: {os.path.basename(base_path)}")
    base = load(base_path)
    if len(sys.argv) > 2:
        cur = load(sys.argv[2])
    else:
        proc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
            capture_output=True,
            text=True,
            check=True,
        )
        # bench.py prints the FULL record (with extension timings) to
        # stderr and only the compact headline to stdout — prefer the full
        lines = [
            l for l in proc.stderr.splitlines() if l.startswith('{"metric"')
        ] or [l for l in proc.stdout.splitlines() if l.startswith("{")]
        cur = json.loads(lines[-1])

    thresh = float(os.environ.get("BENCH_DIFF_THRESHOLD_PCT", "20")) / 100.0
    # Canary normalization (r13 verdict task 3): both records carry a
    # fixed-work canary (bench.py:_canary) whose cost depends only on the
    # host. Dividing each query's ratio by the jvm-canary ratio cancels
    # uniform host drift (the r12 +6% / r13 +17% whole-suite shifts with
    # byte-identical plans), so the flagging basis becomes engine-relative:
    # a REAL uniform regression (session-conf mistake) survives, pure host
    # drift normalizes to ~0. Raw deltas stay printed for the record.
    host = None
    if base.get("canary") and cur.get("canary"):
        bc, cc = base["canary"], cur["canary"]
        host = cc["jvm_s"] / bc["jvm_s"] if bc.get("jvm_s") else None
        print(
            f"# canary: jvm {bc['jvm_s']} -> {cc['jvm_s']} "
            f"({(cc['jvm_s'] - bc['jvm_s']) / bc['jvm_s']:+.1%}), "
            f"cpu {bc['cpu_s']} -> {cc['cpu_s']} "
            f"({(cc['cpu_s'] - bc['cpu_s']) / bc['cpu_s']:+.1%}); "
            f"flagging on canary-NORMALIZED deltas"
        )
    regressions = []
    for section in ("queries", "extension_queries"):
        b, c = base.get(section, {}), cur.get(section, {})
        for k in sorted(set(b) & set(c)):
            delta = (c[k] - b[k]) / b[k] if b[k] > 0 else 0.0
            if host:
                norm = (c[k] / host - b[k]) / b[k] if b[k] > 0 else 0.0
                flag_delta, norm_txt = norm, f"  norm {norm:+6.1%}"
            else:
                flag_delta, norm_txt = delta, ""
            marker = ""
            if flag_delta > thresh:
                marker = "  <-- REGRESSION"
                regressions.append(k)
            print(
                f"{k:36s} {b[k]:8.4f} -> {c[k]:8.4f}  {delta:+6.1%}"
                f"{norm_txt}{marker}"
            )
    only_new = sorted(
        set(cur.get("extension_queries", {})) - set(base.get("extension_queries", {}))
    )
    if only_new:
        print("new queries (no baseline):", ", ".join(only_new))
    print(f"sum: {base.get('value')} -> {cur.get('value')}")
    if regressions:
        print(f"FAILED: {len(regressions)} regression(s) > {thresh:.0%}: {regressions}")
        raise SystemExit(1)
    print("OK: no per-query regression over threshold")


if __name__ == "__main__":
    main()
