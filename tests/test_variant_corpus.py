"""Variant-corpus generator contract (tools/variant_corpus.py).

The variant sweep's value rests on the corpus actually injecting the
distribution classes it claims, deterministically, without mutating
schemas. Pure pyarrow — no Spark session needed."""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import variant_corpus  # noqa: E402


def _gen(tmp_path):
    out = str(tmp_path / "variant")
    variant_corpus.main(out)
    return out


def test_variant_injects_documented_distribution_classes(tmp_path):
    out = _gen(tmp_path)

    region = pq.read_table(os.path.join(out, "region.parquet"))
    assert region.num_rows == 1  # single-row dimension

    orders = pq.read_table(os.path.join(out, "orders.parquet"))
    src_orders = pq.read_table(os.path.join(variant_corpus.SRC, "orders.parquet"))
    assert orders.schema == src_orders.schema  # bit-preserved schema
    assert orders.num_rows == src_orders.num_rows
    keys = orders.column("o_orderkey").to_pylist()
    price = orders.column("o_totalprice").to_pylist()
    date = orders.column("o_orderdate").to_pylist()
    for k, p, d in zip(keys, price, date):
        m = k % 10
        assert (p is None) == (m in (0, 1))  # null-heavy measures
        assert (d is None) == (m == 2)  # null time keys
        if m in (3, 4, 5):
            assert p is not None and p == round(p / 100.0) * 100.0  # tie-heavy

    events = pq.read_table(os.path.join(out, "events.parquet"))
    src_events = pq.read_table(os.path.join(variant_corpus.SRC, "events.parquet"))
    assert events.schema == src_events.schema  # TIMESTAMP(NANOS) preserved
    eid = events.column("event_id").to_pylist()
    uid = events.column("user_id").to_pylist()
    src_uid = src_events.column("user_id").to_pylist()
    assert all(
        (u == s % 5) if e % 2 == 0 else (u == s)
        for e, u, s in zip(eid, uid, src_uid)
    )  # hot-key skew is exactly the documented remap

    docs = pq.read_table(os.path.join(out, "documents.parquet"))
    ids = docs.column("doc_id").to_pylist()
    text = docs.column("text").to_pylist()
    n_chars = docs.column("n_chars").to_pylist()
    by_id = dict(zip(ids, text))
    n_empty = sum(1 for i, t in zip(ids, text) if i % 50 == 3 and t == "")
    n_dup = sum(
        1
        for i, t in zip(ids, text)
        if i % 5 == 4 and i % 50 != 3 and (i - 4) in by_id and t == by_id[i - 4]
    )
    assert n_empty > 0 and n_dup > 0  # zero-length + cross-doc duplicate classes
    assert all(
        (c is None and t is None) or c == len(t) for t, c in zip(text, n_chars)
    )  # metadata invariant holds after the rewrite

    embs = pq.read_table(os.path.join(out, "embeddings.parquet"))
    src_embs = pq.read_table(os.path.join(variant_corpus.SRC, "embeddings.parquet"))
    assert embs.schema == src_embs.schema
    vids = embs.column("vec_id").to_pylist()
    vecs = embs.column("embedding").to_pylist()
    n_zero = sum(
        1 for i, v in zip(vids, vecs) if i % 97 == 5 and v is not None and not any(v)
    )
    assert n_zero > 0  # the cosine zero-norm degeneracy class is present
    assert all(
        (v is not None and any(v)) for i, v in zip(vids, vecs) if i % 97 != 5
    )  # and only where documented


def test_variant_generation_is_byte_deterministic(tmp_path):
    a = _gen(tmp_path / "a")
    b = _gen(tmp_path / "b")
    for name in sorted(os.listdir(a)):
        with open(os.path.join(a, name), "rb") as fa, open(
            os.path.join(b, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name
