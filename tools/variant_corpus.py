#!/usr/bin/env python
"""Variant-data corpus generator (round 12, r11 verdict task 2).

Every oracle row ever earned rides ONE fixed generated dataset per scale
factor, so the parity evidence is blind to distribution-dependent
degeneracy: a predicate that never fires at the fixture's skew, a tie
that never occurs at its value spread, a group that never empties. The
vacuity lints (r09-r10) guard empty RESULTS; this tool attacks the input
side: it derives an alternate corpus from ``/root/testdata/sf0.01`` by
DETERMINISTIC key-hash transforms (no RNG, no timestamps — re-runs are
byte-stable) and the full registry is then re-swept against it with
``python tools/run_parity_subset.py --sf <out>`` — Spark and DuckDB both
read the SAME variant files, so every oracle stays a valid differential
oracle on the new distribution.

The five distribution classes the variant injects, chosen to hit the
blind spots the r11 verdict names:

- **single-row dimension**: ``region`` keeps exactly one row — every
  region join collapses to one group and four nations lose their FK
  target (the degenerate-cardinality class);
- **null-heavy facts**: 20% of ``orders`` lose ``o_totalprice`` and a
  disjoint 10% lose ``o_orderdate`` — every revenue sum, date bucket,
  and join-through-aggregate now carries null groups and null measures;
- **tie-heavy values**: a further 30% of ``o_totalprice`` round to the
  nearest 100 — rank/top-k cutoffs now land ON ties, so any query whose
  ORDER BY is not a total order goes nondeterministic and diverges;
- **hot-key skew**: half of ``events`` remap ``user_id`` into {0..4} —
  five mega-users absorb ~50% of traffic (the salting/skew class; also
  flips many per-user predicates from never-fires to fires);
- **duplicate-heavy + empty docs**: 20% of ``documents`` take the text
  of a hash-partner doc (real cross-doc duplicates for the dedup
  family) and 2% become empty strings (the tokenizer/quality-score
  zero-length edge); ``n_chars`` is recomputed so the metadata invariant
  holds.

Round 13 (r12 verdict task 1) extends the sweep to the three big tables
the r12 corpus copied through unchanged:

- **lineitem** (feeds the most money queries — pricing_summary_q1, the
  ``li_*`` family, the moment statistics): 20% lose ``l_shipdate``
  (every date bucket / ship-window predicate now carries a null class),
  a truly disjoint ~7% lose ``l_discount`` (the mod-11 hit is suppressed
  inside the null-shipdate class — r13 advice; revenue = price×(1−disc)
  must treat a missing discount identically on both engines), and a further
  30% of ``l_extendedprice`` round to the nearest 100 (rank/top-k/
  percentile cutoffs land ON ties);
- **customer**: one mktsegment absorbs ~60% of customers (the group-skew
  class — per-segment aggregates get one mega-group) and ~10% lose
  ``c_acctbal`` (null-measure class for balance stats and filters);
- **part**: surface-form perturbations for the entity-resolution /
  fuzzy-match family (~14% names uppercased, ~8% truncated to 2 chars,
  ~6% gain a 1-char trailing token — the fixture's names are already
  64-distinct over 2000 rows, so a duplicate-name class would be
  vacuous) and ~9% lose ``p_type`` (null group keys in the
  margin-by-type rollups).

Round 14 (r13 verdict task 4) closes the last two gaps:

- **nation/supplier** (previously copied through unchanged): ~50% of
  ``n_name`` case-perturbed (NATION_7 exempt — it is literal-matched)
  and ~10% null ``s_acctbal``;
- **NULL JOIN KEYS**: ~3% of ``events`` lose ``user_id`` and ~2.4% of
  ``orders`` lose ``o_custkey`` — r12 made the state DIGESTS
  null-faithful; this proves the OPERATORS are too (sessionizer,
  funnel/retention joins, star FK resolution, stream-stream join all
  key on these columns).

``embeddings`` keeps the r12 zero-norm class.

Usage: ``python tools/variant_corpus.py [out_dir] [src_dir]`` (defaults
``/tmp/spark_graft_variant/sf0.01v`` and ``/root/testdata/sf0.01``; r13
adds the src_dir knob so the same transforms generate an sf0.1 variant
for full-volume EXECUTION sweeps — parity stays at sf0.01 where the
DuckDB oracle is cheap). Writes one single ``.parquet`` file per table
(the layout ``tests/oracle_harness.duck_connection`` registers)
preserving each source schema bit-for-bit.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
OUT = "/tmp/spark_graft_variant/sf0.01v"


def _set_src(src: str) -> None:
    global SRC
    SRC = src

COPY: list[str] = []


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def variant_region(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "region.parquet"))
    keys = t.column("r_regionkey").to_pylist()
    keep = [i for i, k in enumerate(keys) if k == 0]
    _write(out_dir, "region", t.take(keep))


def variant_nation(out_dir: str) -> None:
    """r14 class (r13 verdict task 4a): case-perturbed ``n_name`` —
    ~25% lowercased (key % 4 == 2), ~25% first-letter-only capitalized
    (key % 4 == 3) — every query that carries n_name into a group key,
    ORDER BY, or surface-form matcher now sees mixed case on both
    engines (case-sensitive compare/sort must agree). ``n_nationkey``
    7 is EXEMPT: ``supplier_important_share_q11``
    (plans/relational.py:830) literal-matches 'NATION_7' and must stay
    non-vacuous on the variant corpus."""
    t = pq.read_table(os.path.join(SRC, "nation.parquet"))
    keys = t.column("n_nationkey").to_pylist()
    names = t.column("n_name").to_pylist()
    new_names = []
    for k, x in zip(keys, names):
        if x is None or k == 7:
            new_names.append(x)
        elif k % 4 == 2:
            new_names.append(x.lower())
        elif k % 4 == 3:
            new_names.append(x.capitalize())
        else:
            new_names.append(x)
    cols = {name: t.column(name) for name in t.schema.names}
    cols["n_name"] = pa.array(new_names, type=t.schema.field("n_name").type)
    _write(out_dir, "nation", pa.table(cols, schema=t.schema))


def variant_supplier(out_dir: str) -> None:
    """r14 class (r13 verdict task 4a): ~10% null ``s_acctbal``
    (suppkey % 10 == 3) — the supplier-side twin of the null-balance /
    null-measure classes; balance filters, min-cost supplier election
    (q2's tie-break chain), and account rollups must treat the missing
    measure identically on both engines."""
    t = pq.read_table(os.path.join(SRC, "supplier.parquet"))
    keys = t.column("s_suppkey").to_pylist()
    bal = t.column("s_acctbal").to_pylist()
    new_bal = [None if k % 10 == 3 else b for k, b in zip(keys, bal)]
    cols = {name: t.column(name) for name in t.schema.names}
    cols["s_acctbal"] = pa.array(new_bal, type=t.schema.field("s_acctbal").type)
    _write(out_dir, "supplier", pa.table(cols, schema=t.schema))


def variant_orders(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "orders.parquet"))
    keys = t.column("o_orderkey").to_pylist()
    cust = t.column("o_custkey").to_pylist()
    price = t.column("o_totalprice").to_pylist()
    date = t.column("o_orderdate").to_pylist()
    new_price, new_date = [], []
    for k, p, d in zip(keys, price, date):
        m = k % 10
        if m in (0, 1):
            new_price.append(None)
        elif m in (3, 4, 5) and p is not None:
            new_price.append(float(round(p / 100.0) * 100.0))
        else:
            new_price.append(p)
        new_date.append(None if m == 2 else d)
    # r14 NULL-JOIN-KEY class (r13 verdict task 4b): ~2.4% of orders lose
    # o_custkey — every customer⋈orders star resolve, order-count
    # histogram, and LTV rollup must drop/group the null FK identically.
    new_cust = [None if k % 41 == 13 else c for k, c in zip(keys, cust)]
    cols = {name: t.column(name) for name in t.schema.names}
    cols["o_custkey"] = pa.array(new_cust, type=t.schema.field("o_custkey").type)
    cols["o_totalprice"] = pa.array(new_price, type=t.schema.field("o_totalprice").type)
    cols["o_orderdate"] = pa.array(new_date, type=t.schema.field("o_orderdate").type)
    _write(out_dir, "orders", pa.table(cols, schema=t.schema))


def variant_events(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    eid = t.column("event_id").to_pylist()
    uid = t.column("user_id").to_pylist()
    val = t.column("value").to_pylist()
    # r14 NULL-JOIN-KEY class (r13 verdict task 4b): ~3% of events lose
    # user_id entirely (event_id % 29 == 11) — the sessionizer, funnel
    # windows, retention joins, and stream-stream joins all key on it, so
    # null-key grouping/join-drop semantics must agree across engines,
    # not just the digests' null-faithful struct wrapping (r12).
    new_uid = [
        None if e % 29 == 11 else (u % 5 if e % 2 == 0 else u)
        for e, u in zip(eid, uid)
    ]
    # ~9% null measurements (event_id % 11 == 7): the events-side twin of
    # the null-price class — purchase values, A/B readouts, and LTV
    # rollups must treat a missing measurement identically on both engines
    new_val = [None if e % 11 == 7 else v for e, v in zip(eid, val)]
    cols = {name: t.column(name) for name in t.schema.names}
    cols["user_id"] = pa.array(new_uid, type=t.schema.field("user_id").type)
    cols["value"] = pa.array(new_val, type=t.schema.field("value").type)
    _write(out_dir, "events", pa.table(cols, schema=t.schema))


def variant_documents(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    ids = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    by_id = dict(zip(ids, text))
    new_text = []
    for i, x in zip(ids, text):
        if i % 50 == 3:
            new_text.append("")
        elif i % 5 == 4 and (i - 4) in by_id:
            new_text.append(by_id[i - 4])  # exact cross-doc duplicate
        else:
            new_text.append(x)
    n_chars = [None if x is None else len(x) for x in new_text]
    cols = {name: t.column(name) for name in t.schema.names}
    cols["text"] = pa.array(new_text, type=t.schema.field("text").type)
    cols["n_chars"] = pa.array(n_chars, type=t.schema.field("n_chars").type)
    _write(out_dir, "documents", pa.table(cols, schema=t.schema))


def variant_embeddings(out_dir: str) -> None:
    """Zero-norm vectors (~1%, vec_id % 97 == 5): the cosine-degeneracy
    class — dot/(|a||b|) divides by zero unless both engines' plans carry
    the same NULLIF guard. Kept OUT of the r12 main sweep note's scope
    and added as its own class: a divergence here is a guard bug, not a
    distribution accident."""
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    ids = t.column("vec_id").to_pylist()
    emb = t.column("embedding").to_pylist()
    new_emb = [
        ([0.0] * len(v) if v is not None else None) if i % 97 == 5 else v
        for i, v in zip(ids, emb)
    ]
    cols = {name: t.column(name) for name in t.schema.names}
    cols["embedding"] = pa.array(new_emb, type=t.schema.field("embedding").type)
    _write(out_dir, "embeddings", pa.table(cols, schema=t.schema))


def variant_lineitem(out_dir: str) -> None:
    """r13 class: null ship dates (key-hash 20%), null discounts (~9%,
    DISJOINT from the null-shipdate class — the mod-11 hit is suppressed
    where mod-10 already nulled the date; r13 advice: the raw residues
    overlap at 70 and 81 mod 110), tie-rounded extended prices (30%).
    The mod classes key on (l_orderkey*7 + l_linenumber) so multi-line
    orders spread across classes instead of nulling whole orders."""
    t = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    okey = t.column("l_orderkey").to_pylist()
    lno = t.column("l_linenumber").to_pylist()
    ship = t.column("l_shipdate").to_pylist()
    disc = t.column("l_discount").to_pylist()
    price = t.column("l_extendedprice").to_pylist()
    new_ship, new_disc, new_price = [], [], []
    for k, n, s, d, p in zip(okey, lno, ship, disc, price):
        m = (k * 7 + n) % 10
        new_ship.append(None if m in (0, 1) else s)
        new_disc.append(None if (k * 7 + n) % 11 == 4 and m not in (0, 1) else d)
        if m in (3, 4, 5) and p is not None:
            new_price.append(float(round(p / 100.0) * 100.0))
        else:
            new_price.append(p)
    cols = {name: t.column(name) for name in t.schema.names}
    cols["l_shipdate"] = pa.array(new_ship, type=t.schema.field("l_shipdate").type)
    cols["l_discount"] = pa.array(new_disc, type=t.schema.field("l_discount").type)
    cols["l_extendedprice"] = pa.array(
        new_price, type=t.schema.field("l_extendedprice").type
    )
    _write(out_dir, "lineitem", pa.table(cols, schema=t.schema))


def variant_customer(out_dir: str) -> None:
    """r13 class: segment skew (custkey % 5 in {0,1,2} remaps to the
    first segment in sorted order → one ~60% mega-segment) and ~10% null
    account balances (custkey % 10 == 7)."""
    t = pq.read_table(os.path.join(SRC, "customer.parquet"))
    keys = t.column("c_custkey").to_pylist()
    seg = t.column("c_mktsegment").to_pylist()
    bal = t.column("c_acctbal").to_pylist()
    hot = sorted({s for s in seg if s is not None})[0]
    new_seg = [hot if k % 5 in (0, 1, 2) else s for k, s in zip(keys, seg)]
    new_bal = [None if k % 10 == 7 else b for k, b in zip(keys, bal)]
    cols = {name: t.column(name) for name in t.schema.names}
    cols["c_mktsegment"] = pa.array(new_seg, type=t.schema.field("c_mktsegment").type)
    cols["c_acctbal"] = pa.array(new_bal, type=t.schema.field("c_acctbal").type)
    _write(out_dir, "customer", pa.table(cols, schema=t.schema))


def variant_part(out_dir: str) -> None:
    """r13 class: the fixture's p_name is ALREADY duplicate-heavy (64
    distinct names over 2000 parts), so the variant attacks the surface
    forms the entity-resolution family depends on instead —
    case perturbation (~14%, partkey % 7 == 2 uppercases: case-sensitive
    LIKE/equality paths flip), short-name truncation (~8%, partkey % 13
    == 5 keeps the first 2 chars: the substr(1,2)/substr(4)/levenshtein
    deletion-grid boundary), a single-char trailing token (~6%, partkey
    % 17 == 3 appends ' x': the regexp last-token blocking key changes),
    and ~9% null p_type (partkey % 11 == 6 — null group keys in the
    margin-by-type rollups)."""
    t = pq.read_table(os.path.join(SRC, "part.parquet"))
    keys = t.column("p_partkey").to_pylist()
    name_ = t.column("p_name").to_pylist()
    ptype = t.column("p_type").to_pylist()
    new_name = []
    for k, x in zip(keys, name_):
        if x is not None:
            if k % 7 == 2:
                x = x.upper()
            if k % 13 == 5:
                x = x[:2]
            if k % 17 == 3:
                x = x + " x"
        new_name.append(x)
    new_type = [None if k % 11 == 6 else x for k, x in zip(keys, ptype)]
    cols = {name: t.column(name) for name in t.schema.names}
    cols["p_name"] = pa.array(new_name, type=t.schema.field("p_name").type)
    cols["p_type"] = pa.array(new_type, type=t.schema.field("p_type").type)
    _write(out_dir, "part", pa.table(cols, schema=t.schema))


def main(out_dir: str = OUT) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for name in COPY:
        shutil.copyfile(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )
    variant_region(out_dir)
    variant_nation(out_dir)
    variant_supplier(out_dir)
    variant_orders(out_dir)
    variant_events(out_dir)
    variant_documents(out_dir)
    variant_embeddings(out_dir)
    variant_lineitem(out_dir)
    variant_customer(out_dir)
    variant_part(out_dir)
    for name in sorted(os.listdir(out_dir)):
        print(f"{out_dir}/{name}: {os.path.getsize(os.path.join(out_dir, name))} bytes")
    return out_dir


if __name__ == "__main__":
    if len(sys.argv) > 2:
        _set_src(sys.argv[2])
    main(sys.argv[1] if len(sys.argv) > 1 else OUT)
