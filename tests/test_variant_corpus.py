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
    ocust = orders.column("o_custkey").to_pylist()
    for k, c, p, d in zip(keys, ocust, price, date):
        m = k % 10
        assert (p is None) == (m in (0, 1))  # null-heavy measures
        assert (d is None) == (m == 2)  # null time keys
        assert (c is None) == (k % 41 == 13)  # r14 null FK join keys
        if m in (3, 4, 5):
            assert p is not None and p == round(p / 100.0) * 100.0  # tie-heavy
    assert any(k % 41 == 13 for k in keys)

    events = pq.read_table(os.path.join(out, "events.parquet"))
    src_events = pq.read_table(os.path.join(variant_corpus.SRC, "events.parquet"))
    assert events.schema == src_events.schema  # TIMESTAMP(NANOS) preserved
    eid = events.column("event_id").to_pylist()
    uid = events.column("user_id").to_pylist()
    src_uid = src_events.column("user_id").to_pylist()
    assert all(
        (u is None) if e % 29 == 11
        else (u == s % 5) if e % 2 == 0
        else (u == s)
        for e, u, s in zip(eid, uid, src_uid)
    )  # hot-key skew + r14 null-join-key class, exactly as documented
    assert any(e % 29 == 11 for e in eid)

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

    # r13 classes: lineitem null dates / null discounts / tie prices
    li = pq.read_table(os.path.join(out, "lineitem.parquet"))
    src_li = pq.read_table(os.path.join(variant_corpus.SRC, "lineitem.parquet"))
    assert li.schema == src_li.schema
    okey = li.column("l_orderkey").to_pylist()
    lno = li.column("l_linenumber").to_pylist()
    ship = li.column("l_shipdate").to_pylist()
    disc = li.column("l_discount").to_pylist()
    lprice = li.column("l_extendedprice").to_pylist()
    for k, n, s, d, p in zip(okey, lno, ship, disc, lprice):
        m = (k * 7 + n) % 10
        assert (s is None) == (m in (0, 1))  # null ship dates
        # r13-advice fix: the discount-null class is now TRULY disjoint
        # from the shipdate-null class (suppressed inside mod-10 ∈ {0,1})
        assert (d is None) == ((k * 7 + n) % 11 == 4 and m not in (0, 1))
        assert not (s is None and d is None)  # disjointness, directly
        if m in (3, 4, 5):
            assert p is not None and p == round(p / 100.0) * 100.0  # ties

    # r13 classes: customer segment skew + null balances
    cust = pq.read_table(os.path.join(out, "customer.parquet"))
    src_cust = pq.read_table(os.path.join(variant_corpus.SRC, "customer.parquet"))
    assert cust.schema == src_cust.schema
    ckeys = cust.column("c_custkey").to_pylist()
    seg = cust.column("c_mktsegment").to_pylist()
    bal = cust.column("c_acctbal").to_pylist()
    src_seg = src_cust.column("c_mktsegment").to_pylist()
    hot = sorted({s for s in src_seg if s is not None})[0]
    for k, s, b, s0 in zip(ckeys, seg, bal, src_seg):
        assert s == (hot if k % 5 in (0, 1, 2) else s0)  # mega-segment
        assert (b is None) == (k % 10 == 7)  # null balances
    assert sum(1 for s in seg if s == hot) * 2 > len(seg)  # it dominates

    # r13 classes: part surface-form perturbations + null p_type
    prt = pq.read_table(os.path.join(out, "part.parquet"))
    src_prt = pq.read_table(os.path.join(variant_corpus.SRC, "part.parquet"))
    assert prt.schema == src_prt.schema
    pkeys = prt.column("p_partkey").to_pylist()
    names = prt.column("p_name").to_pylist()
    ptypes = prt.column("p_type").to_pylist()
    src_names = src_prt.column("p_name").to_pylist()
    for k, x, t, x0 in zip(pkeys, names, ptypes, src_names):
        expect = x0
        if expect is not None:
            if k % 7 == 2:
                expect = expect.upper()
            if k % 13 == 5:
                expect = expect[:2]
            if k % 17 == 3:
                expect = expect + " x"
        assert x == expect  # exactly the documented surface pipeline
        assert (t is None) == (k % 11 == 6)  # null group keys
    assert any(k % 7 == 2 for k in pkeys)
    assert any(k % 13 == 5 for k in pkeys)
    assert any(k % 17 == 3 for k in pkeys)

    # r14 classes: nation case perturbation (NATION_7 exempt) + supplier
    # null balances — the last two tables close the copy-through gap
    nat = pq.read_table(os.path.join(out, "nation.parquet"))
    src_nat = pq.read_table(os.path.join(variant_corpus.SRC, "nation.parquet"))
    assert nat.schema == src_nat.schema
    nkeys = nat.column("n_nationkey").to_pylist()
    nnames = nat.column("n_name").to_pylist()
    src_nnames = src_nat.column("n_name").to_pylist()
    for k, x, x0 in zip(nkeys, nnames, src_nnames):
        if x0 is None or k == 7:
            assert x == x0  # the literal-matched nation is exempt
        elif k % 4 == 2:
            assert x == x0.lower()
        elif k % 4 == 3:
            assert x == x0.capitalize()
        else:
            assert x == x0
    assert any(k % 4 == 2 and k != 7 for k in nkeys)
    assert any(k % 4 == 3 and k != 7 for k in nkeys)

    sup = pq.read_table(os.path.join(out, "supplier.parquet"))
    src_sup = pq.read_table(os.path.join(variant_corpus.SRC, "supplier.parquet"))
    assert sup.schema == src_sup.schema
    skeys = sup.column("s_suppkey").to_pylist()
    sbal = sup.column("s_acctbal").to_pylist()
    for k, b in zip(skeys, sbal):
        assert (b is None) == (k % 10 == 3)  # null supplier balances
    assert any(k % 10 == 3 for k in skeys)

    # nothing copies through unchanged anymore
    assert variant_corpus.COPY == []


def test_variant_generation_is_byte_deterministic(tmp_path):
    a = _gen(tmp_path / "a")
    b = _gen(tmp_path / "b")
    for name in sorted(os.listdir(a)):
        with open(os.path.join(a, name), "rb") as fa, open(
            os.path.join(b, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name
