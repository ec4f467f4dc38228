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

``lineitem``/``customer``/``supplier``/``part``/``nation``/``embeddings``
copy through unchanged: the transformed tables already reshape every join
that touches them, and the embedding geometry is digest-gated (a zero-
vector variant is a knowingly-separate future class — NaN-vs-NULL cosine
normalization differs BETWEEN engines by design, so it needs per-query
adjudication, not a blanket sweep).

Usage: ``python tools/variant_corpus.py [out_dir]`` (default
``/tmp/spark_graft_variant/sf0.01v``). Writes one single ``.parquet``
file per table (the layout ``tests/oracle_harness.duck_connection``
registers) preserving each source schema bit-for-bit — ``events.ts``
stays TIMESTAMP(NANOS), so ``sources/catalog.table``'s nanos flip is
exercised on the variant too.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
OUT = "/tmp/spark_graft_variant/sf0.01v"

COPY = ["nation", "customer", "supplier", "part", "lineitem"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def variant_region(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "region.parquet"))
    keys = t.column("r_regionkey").to_pylist()
    keep = [i for i, k in enumerate(keys) if k == 0]
    _write(out_dir, "region", t.take(keep))


def variant_orders(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "orders.parquet"))
    keys = t.column("o_orderkey").to_pylist()
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
    cols = {name: t.column(name) for name in t.schema.names}
    cols["o_totalprice"] = pa.array(new_price, type=t.schema.field("o_totalprice").type)
    cols["o_orderdate"] = pa.array(new_date, type=t.schema.field("o_orderdate").type)
    _write(out_dir, "orders", pa.table(cols, schema=t.schema))


def variant_events(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    eid = t.column("event_id").to_pylist()
    uid = t.column("user_id").to_pylist()
    val = t.column("value").to_pylist()
    new_uid = [u % 5 if e % 2 == 0 else u for e, u in zip(eid, uid)]
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


def main(out_dir: str = OUT) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for name in COPY:
        shutil.copyfile(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )
    variant_region(out_dir)
    variant_orders(out_dir)
    variant_events(out_dir)
    variant_documents(out_dir)
    variant_embeddings(out_dir)
    for name in sorted(os.listdir(out_dir)):
        print(f"{out_dir}/{name}: {os.path.getsize(os.path.join(out_dir, name))} bytes")
    return out_dir


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else OUT)
