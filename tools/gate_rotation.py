#!/usr/bin/env python
"""Print the next driver gate window and the freshness ledger.

Usage:
    python tools/gate_rotation.py [N]          never-gated window (size N, default 50)
    python tools/gate_rotation.py --freshness  last-gated round per live query,
                                               oldest cohorts first (the re-gate
                                               rotation planner)

Reads every CORRECTNESS_r*.json in the repo root as the gated-ever set.
The default mode subtracts it from the registry and prints (a) the window
as a Python list literal ready to paste into plans/__init__.py and (b) the
remainder for the following round's rotation note. Rows-only queries
(oracle=None) are listed separately — gating them yields only a weak
rows-only row, so they stay out of the window unless slots are free.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_etl_elt_dashboard_spark.plans import REGISTRY  # noqa: E402

#: Ledger rows that look old but gate NOTHING live — excluded from the
#: freshness report so the oldest-evidence ledger stays interpretable
#: (r10 verdict task 5; full rationale in plans/__init__.py's round-11
#: rotation note):
#: - set_ops_priority_years: query REMOVED in r10 (vacuous INTERSECT/
#:   EXCEPT gate), superseded by set_ops_customer_years — its r01 row is
#:   a dead ledger line, not stale evidence.
#: - agg_approx_sketches: the r02 row is `no_oracle` rows-only BY DESIGN;
#:   the query's geometry is hash-gated via agg_sketch_param_digest. Its
#:   live freshness is tracked like any query through later green rows.
_RETIRED = {"set_ops_priority_years"}
_ROWS_ONLY_BY_DESIGN_ROWS = {"agg_approx_sketches": "r02 no_oracle row"}


def _history() -> dict[str, int]:
    """query -> last round with a CORRECTNESS row (retired names excluded)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for q in json.load(open(path)):
            if q not in _RETIRED:
                last[q] = max(rnd, last.get(q, 0))
    return last


def emit_plan(window: int = 50) -> None:
    """Write the NEXT round's rotation plan from the current ledger (r12
    verdict task 8 — the last manual rotation step, automated).

    Output: a paste-ready comment block + ``_GATE_WINDOW`` list literal.
    Policy (the standing freshness program): the next round's own
    additions gate FIRST (they don't exist at plan time — the block says
    so and the builder trims the tail to keep the window at ``window``),
    then oldest-evidence cohorts in freshness order, registry order
    within a cohort, rows-only queries excluded (a gated row without an
    oracle is only a weak rows-only check; their geometry rides the
    digest twins)."""
    last = _history()
    next_round = max(last.values(), default=0) + 1
    cohorts: dict[int, list[str]] = defaultdict(list)
    never: list[str] = []
    for q in REGISTRY:
        if REGISTRY[q].oracle is None:
            continue
        rnd = last.get(q)
        (never if rnd is None else cohorts[rnd]).append(q)
    ordered = never + [q for rnd in sorted(cohorts) for q in cohorts[rnd]]
    plan = ordered[:window]
    taken: dict[int | None, int] = defaultdict(int)
    for q in plan:
        taken[last.get(q)] += 1
    oldest_after = min(
        (rnd for rnd in cohorts if taken.get(rnd, 0) < len(cohorts[rnd])),
        default=None,
    )
    # never-gated rows left OUTSIDE the window void any rXX freshness bound
    # (they have no round at all — older than any cohort); r13 advice.
    never_remaining = len(never) - taken.get(None, 0)
    print(f"# ROUND-{next_round} ROTATION PLAN (emitted by tools/gate_rotation.py"
          f" --plan from the post-r{next_round - 1} ledger): gate any"
          f" round-{next_round} additions first,")
    print(f"# then the {len(plan)} oldest-evidence oracle-backed rows below"
          f" (freshness order; trim the")
    print(f"# tail to keep the window at {window} once the additions are known)."
          f" After r{next_round}")
    if never_remaining > 0:
        print(f"# {never_remaining} never-gated oracle-backed row(s) remain"
              f" OUTSIDE this window — no rXX freshness bound holds until"
              f" they gate.")
    elif oldest_after is not None:
        print(f"# no standing row for a live query should be older than"
              f" r{oldest_after:02d}.")
    print("_GATE_WINDOW = [")
    print(f"    # round-{next_round} additions first (trim the tail below to fit)")
    for q in plan:
        print(f'    "{q}",  # r{last[q]:02d}-last' if q in last
              else f'    "{q}",  # never gated')
    print("]")


def main() -> None:
    if "--plan" in sys.argv:
        idx = sys.argv.index("--plan")
        n = (int(sys.argv[idx + 1])
             if len(sys.argv) > idx + 1 and sys.argv[idx + 1].isdigit() else 50)
        emit_plan(n)
        return
    if "--freshness" in sys.argv:
        last = _history()
        cohorts: dict[int | None, list[str]] = defaultdict(list)
        for q in REGISTRY:  # registry order within each cohort
            cohorts[last.get(q)].append(q)
        never = cohorts.pop(None, [])
        for rnd in sorted(cohorts):
            names = cohorts[rnd]
            print(f"# r{rnd:02d}-last ({len(names)}):")
            for q in names:
                print(f"#   {q}")
        if never:
            print(f"# never-gated ({len(never)}): {', '.join(never)}")
        dead = sorted(set(last) - set(REGISTRY))
        if dead:
            print(f"# dead ledger rows (gated name no longer live): {', '.join(dead)}")
        for q, why in _ROWS_ONLY_BY_DESIGN_ROWS.items():
            print(f"# note: {q} — {why}; digest-twinned, see rotation note")
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    gated = set(_history())
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
