#!/usr/bin/env python
"""Print the next driver gate window: never-gated oracle-backed queries in
registration order (the _GATE_WINDOW maintenance helper).

Usage: ``python tools/gate_rotation.py [N]`` (window size, default 50).
Reads every CORRECTNESS_r*.json in the repo root as the gated-ever set,
subtracts it from the registry, and prints (a) the window as a Python list
literal ready to paste into plans/__init__.py and (b) the remainder for
the following round's rotation note. Rows-only queries (oracle=None) are
listed separately — gating them yields only a weak rows-only row, so they
stay out of the window unless slots are free.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_etl_elt_dashboard_spark.plans import REGISTRY  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gated: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        gated |= set(json.load(open(path)))
    never = [q for q in REGISTRY if q not in gated]
    oracle_backed = [q for q in never if REGISTRY[q].oracle is not None]
    rows_only = [q for q in never if REGISTRY[q].oracle is None]
    window, rest = oracle_backed[:n], oracle_backed[n:]
    print(f"# gated ever: {len(gated)}  never-gated: {len(never)} "
          f"(oracle-backed {len(oracle_backed)}, rows-only {len(rows_only)})")
    print(f"# next window ({len(window)}):")
    print("_GATE_WINDOW = [")
    for q in window:
        print(f'    "{q}",')
    print("]")
    if rest:
        print(f"# remainder for the round after ({len(rest)}):")
        for q in rest:
            print(f"#   {q}")
    if rows_only:
        print(f"# rows-only (weak rows; gate only if slots remain): "
              f"{', '.join(rows_only)}")


if __name__ == "__main__":
    main()
