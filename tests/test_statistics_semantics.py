"""Semantic audit of the statistics family: recompute each statistic from
the raw parquet with INDEPENDENT textbook numpy formulations and compare.

The DuckDB differential gate proves Spark and the oracle agree; it cannot
catch a bug BOTH sides share (round-2 advice found two: the p-chart's extra
total-count factor and CUSUM's missing S_0). These tests close that class:
a third, structurally different implementation must agree too."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from bigdata_etl_elt_dashboard_spark.plans import REGISTRY


def _r(x: float) -> int:
    """SQL ROUND (half away from zero) — Python's round() is banker's and
    diverges on exact .5 values, which accumulates across day sums."""
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _rows(spark, sf, name):
    return REGISTRY[name].fn(spark, sf).collect()


def _col(sf, tbl, col):
    return pq.read_table(f"{sf}/{tbl}.parquet", columns=[col])[col].to_pylist()


def _cols(sf, tbl, cols):
    t = pq.read_table(f"{sf}/{tbl}.parquet", columns=cols)
    return list(zip(*[t[c].to_pylist() for c in cols]))


def test_welch_t_matches_textbook(spark, sf_smoke):
    xs = {"O": [], "F": []}
    for st, x in _cols(sf_smoke, "orders", ["o_orderstatus", "o_totalprice"]):
        if st in xs:
            xs[st].append(_r(x))
    a, b = np.array(xs["O"], float), np.array(xs["F"], float)
    ref = (a.mean() - b.mean()) / math.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    got = _rows(spark, sf_smoke, "stat_welch_t_price_by_status")[0]["t_stat"]
    assert abs(got - ref) < 1e-9


def test_mannwhitney_matches_textbook(spark, sf_smoke):
    data = [
        (st, _r(x * 100))
        for st, x in _cols(sf_smoke, "orders", ["o_orderstatus", "o_totalprice"])
        if st in ("O", "F")
    ]
    vals = np.array([v for _, v in data], float)
    grp = np.array([s for s, _ in data])
    order = np.argsort(vals, kind="mergesort")
    sv = vals[order]
    r = np.empty(len(sv))
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        r[i : j + 1] = (i + j) / 2 + 1
        i = j + 1
    ranks = np.empty(len(vals))
    ranks[order] = r
    n1, n2 = (grp == "O").sum(), (grp == "F").sum()
    u1 = ranks[grp == "O"].sum() - n1 * (n1 + 1) / 2
    _, counts = np.unique(vals, return_counts=True)
    ties = (counts.astype(float) ** 3 - counts).sum()
    N = n1 + n2
    var = n1 * n2 / 12 * ((N + 1) - ties / (N * (N - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    got = _rows(spark, sf_smoke, "stat_mannwhitney_price_by_status")[0]
    assert got["u1"] == pytest.approx(u1, abs=1e-6)
    assert got["z"] == pytest.approx(z, abs=1e-9)


def test_ks_matches_textbook(spark, sf_smoke):
    data = [
        (st, _r(x * 100))
        for st, x in _cols(sf_smoke, "orders", ["o_orderstatus", "o_totalprice"])
        if st in ("O", "F")
    ]
    a = np.sort([v for s, v in data if s == "O"])
    b = np.sort([v for s, v in data if s == "F"])
    grid = np.unique(np.concatenate([a, b]))
    ref = np.abs(
        np.searchsorted(a, grid, side="right") / len(a)
        - np.searchsorted(b, grid, side="right") / len(b)
    ).max()
    got = _rows(spark, sf_smoke, "stat_ks_price_by_status")[0]["ks_d"]
    assert got == pytest.approx(ref, abs=1e-12)


def test_gini_matches_textbook(spark, sf_smoke):
    per = collections.Counter(_col(sf_smoke, "events", "user_id"))
    x = np.sort(np.array(list(per.values()), float))
    n, i = len(x), np.arange(1, len(x) + 1)
    ref = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
    got = _rows(spark, sf_smoke, "stat_gini_user_activity")[0]["gini"]
    assert got == pytest.approx(ref, abs=1e-12)


def test_cusum_matches_recursion(spark, sf_smoke):
    """The closed form S_t − min_{0≤i≤t} S_i must equal the textbook
    recursion C_t = max(0, C_{t−1} + (x_t − mean)) — the round-2 advice
    bug (S_0 missing from the running min) breaks exactly this."""
    daily = collections.defaultdict(int)
    for d, x in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        daily[str(d)[:10]] += _r(x)
    xs = np.array([v for _, v in sorted(daily.items())], float)
    mu = xs.mean()
    c, ref = 0.0, []
    for x in xs:
        c = max(0.0, c + (x - mu))
        ref.append(c)
    got = [r["cusum_units"] for r in _rows(spark, sf_smoke, "stat_cusum_daily_revenue")]
    assert len(got) == len(ref)
    assert max(abs(a - b) for a, b in zip(ref, got)) < 1e-6


def test_pchart_flags_match_3sigma(spark, sf_smoke):
    """Every day's out_of_control flag must equal the plain (un-cleared)
    3σ binomial test — the round-2 advice bug (extra factor N) made the
    limits ~√N too wide, flags always false."""
    per = collections.defaultdict(lambda: [0, 0])
    for ts, et in _cols(sf_smoke, "events", ["ts", "event_type"]):
        d = str(ts)[:10]
        per[d][0] += 1
        per[d][1] += et == "error"
    N = sum(n for n, _ in per.values())
    E = sum(e for _, e in per.values())
    pbar = E / N
    got = {
        str(r["d"]): r["out_of_control"]
        for r in _rows(spark, sf_smoke, "ev_error_rate_pchart")
    }
    assert len(got) == len(per)
    for d, (n, e) in per.items():
        ref = abs(e / n - pbar) > 3 * math.sqrt(pbar * (1 - pbar) / n)
        assert got[d] == ref, (d, e, n)
    # the audit is only meaningful if 3-sigma excursions can exist at all:
    # at least assert the flag column is boolean and present for every day
    assert all(isinstance(v, bool) for v in got.values())


def test_autocorr_matches_numpy(spark, sf_smoke):
    import datetime as dt

    daily = collections.defaultdict(int)
    for d, x in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        daily[d.date() if isinstance(d, dt.datetime) else d] += _r(x)
    pairs = [
        (float(daily[d]), float(daily[d + dt.timedelta(days=1)]))
        for d in daily
        if d + dt.timedelta(days=1) in daily
    ]
    xa = np.array([a for a, _ in pairs])
    ya = np.array([b for _, b in pairs])
    ref = np.corrcoef(xa, ya)[0, 1]
    got = _rows(spark, sf_smoke, "stat_autocorr_daily_revenue")[0]["lag1_autocorr"]
    assert got == pytest.approx(ref, abs=1e-9)


def test_entropy_within_quantization(spark, sf_smoke):
    per = collections.Counter(
        _cols(sf_smoke, "events", ["user_id", "event_type"])
    )
    by_user = collections.defaultdict(list)
    for (u, _t), n in per.items():
        by_user[u].append(n)
    got = {
        r["user_id"]: r["entropy_bits"]
        for r in _rows(spark, sf_smoke, "ev_user_behavior_entropy")
    }
    for u, cs in by_user.items():
        p = np.array(cs, float)
        p /= p.sum()
        ref = -(p * np.log2(p)).sum()
        # micro-bit quantization bound: |err| <= n_types/1e6-ish
        assert abs(got[u] - ref) < 1e-4, u


def test_triangle_count_matches_bruteforce(spark, sf_smoke):
    """graph_copurchase_triangles' oriented wedge-close count must equal a
    brute-force set-intersection triangle count over the same edge list."""
    li = {
        (o, p)
        for o, p in _cols(sf_smoke, "lineitem", ["l_orderkey", "l_partkey"])
    }
    baskets = collections.defaultdict(set)
    for o, p in li:
        baskets[o].add(p)
    edges = set()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        len(adj[a] & adj[b]) for a, b in edges
    ) // 3  # each triangle counted once per edge
    deg = {n: len(v) for n, v in adj.items()}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    got = _rows(spark, sf_smoke, "graph_copurchase_triangles")[0]
    assert got["n_edges"] == len(edges)
    assert got["n_nodes"] == len(adj)
    assert got["n_wedges"] == wedges
    assert got["n_triangles"] == tri


def test_jsd_matches_numpy(spark, sf_smoke):
    """text_jsd_source_drift's micro-bit integer algebra must land on the
    float Jensen-Shannon divergence within quantization error."""
    from bigdata_etl_elt_dashboard_spark.plans.extensions import (
        _DRIFT_SRC_A,
        _DRIFT_SRC_B,
    )

    cnt_a: collections.Counter = collections.Counter()
    cnt_b: collections.Counter = collections.Counter()
    for src, text in _cols(sf_smoke, "documents", ["source", "text"]):
        if src not in (_DRIFT_SRC_A, _DRIFT_SRC_B) or not text.strip():
            continue
        toks = [t for t in text.strip().lower().split() if t]
        (cnt_a if src == _DRIFT_SRC_A else cnt_b).update(toks)
    ta, tb = sum(cnt_a.values()), sum(cnt_b.values())
    vocab = set(cnt_a) | set(cnt_b)
    jsd = 0.0
    for w in vocab:
        p = cnt_a.get(w, 0) / ta
        q = cnt_b.get(w, 0) / tb
        m = (p + q) / 2
        if p:
            jsd += p * math.log2(p / m) / 2
        if q:
            jsd += q * math.log2(q / m) / 2
    got = _rows(spark, sf_smoke, "text_jsd_source_drift")[0]
    assert got["tot_a"] == ta and got["tot_b"] == tb
    assert abs(got["jsd_bits"] - jsd) < 1e-4


def _toks(text: str) -> list[str]:
    return [w for w in text.strip().lower().split() if w] if text.strip() else []


def test_unigram_surprisal_matches_textbook(spark, sf_smoke):
    """CCNet-style mean token surprisal under the corpus' own unigram LM:
    the micro-bit integer algebra must land on the float -log2 p mean."""
    rows_ = _cols(sf_smoke, "documents", ["doc_id", "text"])
    cnt: collections.Counter = collections.Counter()
    for _, text in rows_:
        cnt.update(_toks(text))
    N = sum(cnt.values())
    got = {r["doc_id"]: r["mean_bits"] for r in _rows(spark, sf_smoke, "text_unigram_logprob")}
    worst = 0.0
    for did, text in rows_:
        ts = _toks(text)
        if not ts or did not in got:
            continue
        ref = sum(math.log2(N) - math.log2(cnt[w]) for w in ts) / len(ts)
        worst = max(worst, abs(ref - got[did]))
    assert worst < 1e-4, worst


def test_gopher_filter_matches_reimplementation(spark, sf_smoke):
    """The Gopher keep/drop rules recomputed in plain Python per doc must
    yield the identical per-source keep counts."""
    from bigdata_etl_elt_dashboard_spark.plans.corpus_quality import (
        _MAX_DUP_BIGRAM_RATIO,
        _MAX_DUP_TOKEN_RATIO,
        _MAX_TOKENS,
        _MAX_TOP_TOKEN_RATIO,
        _MIN_TOKENS,
    )

    per = collections.defaultdict(lambda: [0, 0])
    for src, text in _cols(sf_smoke, "documents", ["source", "text"]):
        ts = _toks(text)
        n, nd = len(ts), len(set(ts))
        bg = list(zip(ts, ts[1:]))
        keep = bool(ts) and (
            _MIN_TOKENS <= n <= _MAX_TOKENS
            and (n - nd) / n <= _MAX_DUP_TOKEN_RATIO
            and max(collections.Counter(ts).values()) / n <= _MAX_TOP_TOKEN_RATIO
            and ((len(bg) - len(set(bg))) / len(bg) if bg else 0.0)
            <= _MAX_DUP_BIGRAM_RATIO
        )
        per[src][0] += 1
        per[src][1] += keep
    got = {
        r["source"]: (r["n_docs"], r["n_kept"])
        for r in _rows(spark, sf_smoke, "docs_gopher_quality_filter")
    }
    assert {s: tuple(v) for s, v in per.items()} == got


def test_jaccard_pairs_match_bruteforce(spark, sf_smoke):
    """dedup_jaccard_pairs' inverted-index join vs brute-force all-pairs
    Jaccard over 3-word shingle sets recomputed in plain Python."""
    docs = _cols(sf_smoke, "documents", ["doc_id", "text"])

    def shingle_set(text: str) -> set:
        ts = _toks(text)
        if not ts:
            return set()
        if len(ts) < 3:
            return {" ".join(ts)}
        return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}

    sets = {did: shingle_set(text) for did, text in docs}
    ids = sorted(sets)
    ref = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= 0.5:
                ref[(a, b)] = round(inter / len(sa | sb), 6)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _rows(spark, sf_smoke, "dedup_jaccard_pairs")
    }
    assert got == pytest.approx(ref)
