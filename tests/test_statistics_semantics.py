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


# --------------------------------------------------------------------------
# Event-analytics money queries (round-3 verdict item #9): strict-funnel
# monotonicity, attribution credit conservation, PIT leakage — each
# recomputed from the raw parquet with an independent plain-Python pass.
# --------------------------------------------------------------------------


def _events(sf):
    """(user_id, event_id, event_type, sec, cents, raw) with sec = floor
    epoch seconds derived by integer division from the raw parquet ints
    (no datetime round-trip; the ts unit varies by testdata generation —
    ns or us — exactly like sources/catalog handles it) and cents =
    SQL-rounded value*100."""
    import pyarrow as pa

    t = pq.read_table(
        f"{sf}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts", "value"],
    )
    per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[
        t.schema.field("ts").type.unit
    ]
    raw = t["ts"].cast(pa.int64()).to_pylist()
    return list(
        zip(
            t["user_id"].to_pylist(),
            t["event_id"].to_pylist(),
            t["event_type"].to_pylist(),
            [v // per_sec for v in raw],
            [_r(v * 100) for v in t["value"].to_pylist()],
            raw,
        )
    )


def test_strict_funnel_matches_sequential_recompute(spark, sf_smoke):
    """ev_funnel_strict_steps vs a literal per-user sequential scan:
    t_k = min event time of step k STRICTLY after t_{k-1}. Also pins the
    structural invariant c1 >= c2 >= c3 >= c4 (a user cannot reach step k
    without step k-1)."""
    by_user = collections.defaultdict(list)
    for uid, _eid, etype, _sec, _c, ns in _events(sf_smoke):
        by_user[uid].append((ns, etype))
    counts = [0, 0, 0, 0]
    steps = ["signup", "view", "click", "purchase"]
    for evs in by_user.values():
        evs.sort()
        t_prev = None
        for k, step in enumerate(steps):
            cand = [
                ns
                for ns, et in evs
                if et == step and (t_prev is None or ns > t_prev)
            ]
            if not cand:
                break
            t_prev = min(cand)
            counts[k] += 1
    rows = _rows(spark, sf_smoke, "ev_funnel_strict_steps")
    got = {r["step_no"]: r["n_users"] for r in rows}
    assert got == {i + 1: c for i, c in enumerate(counts) if True}
    assert counts[0] >= counts[1] >= counts[2] >= counts[3]
    # conversion ratios are the single-division renderings of those counts
    for r in rows[1:]:
        prev = counts[r["step_no"] - 2]
        if prev:
            assert r["pct_of_prev"] == pytest.approx(
                counts[r["step_no"] - 1] / prev
            )


def test_attribution_credits_conserve_value(spark, sf_smoke):
    """ev_attribution_linear_7d vs an independent per-purchase recompute,
    plus the conservation law: view_credit + click_credit must equal the
    attributed purchase value (to per-purchase rounding of 1e-6)."""
    evs = _events(sf_smoke)
    by_user = collections.defaultdict(list)
    for uid, _eid, etype, sec, cents, _ns in evs:
        by_user[uid].append((sec, etype, cents))
    n_att, view_u, click_u, cents_sum = 0, 0, 0, 0
    for rows_ in by_user.values():
        for sec, etype, cents in rows_:
            if etype != "purchase":
                continue
            v7 = sum(
                1
                for s, t, _ in rows_
                if t == "view" and sec - 604800 <= s <= sec - 1
            )
            c7 = sum(
                1
                for s, t, _ in rows_
                if t == "click" and sec - 604800 <= s <= sec - 1
            )
            tot = v7 + c7
            if tot == 0:
                continue
            n_att += 1
            # same IEEE sequence as both engines: exact ints -> one divide
            view_u += _r(cents * 1000000.0 * v7 / tot)
            click_u += _r(cents * 1000000.0 * c7 / tot)
            cents_sum += cents
    got = _rows(spark, sf_smoke, "ev_attribution_linear_7d")[0]
    assert got["n_attributed"] == n_att
    assert got["view_credit"] == pytest.approx(view_u / 1e8, abs=1e-9)
    assert got["click_credit"] == pytest.approx(click_u / 1e8, abs=1e-9)
    assert got["attributed_value"] == pytest.approx(cents_sum / 100, abs=1e-9)
    # conservation: the two credit pools sum back to the attributed value
    # within one half micro-unit per purchase (two independent roundings)
    assert abs(
        got["view_credit"] + got["click_credit"] - got["attributed_value"]
    ) <= n_att * 1e-6


def test_pit_features_have_no_leakage(spark, sf_smoke):
    """ev_pit_features_at_purchase vs an independent recompute of the
    trailing-7-day window [t-604800s, t-1s]: counts must match exactly,
    and by construction of the reference window NO count includes events
    at or after the purchase second — the leakage the RANGE ... 1
    PRECEDING frame exists to prevent."""
    evs = _events(sf_smoke)
    by_user = collections.defaultdict(list)
    for uid, eid, etype, sec, _c, _ns in evs:
        by_user[uid].append((sec, etype, eid))
    ref = {}
    for uid, rows_ in by_user.items():
        for sec, etype, eid in rows_:
            if etype != "purchase":
                continue
            window = [
                (s, t) for s, t, _ in rows_ if sec - 604800 <= s <= sec - 1
            ]
            assert all(s < sec for s, _ in window)  # leakage-free frame
            ref[(uid, eid)] = (
                sum(1 for _, t in window if t == "view"),
                sum(1 for _, t in window if t == "click"),
                len(window),
            )
    got = {
        (r["user_id"], r["event_id"]): (
            r["views_7d"],
            r["clicks_7d"],
            r["events_7d"],
        )
        for r in _rows(spark, sf_smoke, "ev_pit_features_at_purchase")
    }
    assert got == ref


def test_bpe_train_and_apply_match_python_replicate(spark, sf_smoke):
    """docs_bpe_train_merges + docs_bpe_apply_stats vs a pure-Python
    replicate of all merge rounds (same weighted vocab, same argmax
    tie-break, same boundary-framed non-overlapping str.replace), plus
    the character-conservation law: merging never creates or destroys
    characters, so total_chars must equal the pre-merge character mass."""
    from bigdata_etl_elt_dashboard_spark.plans.corpus_spans import _BPE_MERGES

    wc: collections.Counter = collections.Counter()
    for (text,) in _cols(sf_smoke, "documents", ["text"]):
        wc.update(_toks(text))
    vocab = {" " + " ".join(w) + " ": c for w, c in wc.items()}
    merges = []
    for _ in range(_BPE_MERGES):
        pairs: collections.Counter = collections.Counter()
        for sw, c in vocab.items():
            syms = sw.split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, cnt))
        nxt: collections.Counter = collections.Counter()
        for sw, c in vocab.items():
            nxt[sw.replace(f" {l} {r} ", f" {l}{r} ")] += c
        vocab = nxt
    got = _rows(spark, sf_smoke, "docs_bpe_train_merges")
    assert [(r["left_sym"], r["right_sym"], r["cnt"]) for r in got] == merges
    # apply digest: words / vocab / weighted tokens / weighted chars
    n_words = len(vocab)  # Python dict may merge words that became equal
    syms_count: collections.Counter = collections.Counter()
    total_tokens = total_chars = 0
    for sw, c in vocab.items():
        syms = sw.split()
        total_tokens += len(syms) * c
        total_chars += sum(len(s) for s in syms) * c
        syms_count.update(syms)
    stats = _rows(spark, sf_smoke, "docs_bpe_apply_stats")[0]
    # conservation: char mass invariant under merging
    assert total_chars == sum(len(w) * c for w, c in wc.items())
    assert stats["total_chars"] == total_chars
    assert stats["total_tokens"] == total_tokens
    assert stats["vocab_size"] == len(syms_count)
    assert stats["n_words"] == len(wc)  # engine vocab stays one row per word


def test_scd2_intervals_well_formed(spark, sf_smoke):
    """scd2_customer_segments structural invariants: per key, versions are
    ordered, half-open intervals chain exactly (valid_to = next
    valid_from), and exactly ONE current row (valid_to IS NULL) exists."""
    per_key = collections.defaultdict(list)
    for r in _rows(spark, sf_smoke, "scd2_customer_segments"):
        per_key[r["c_custkey"]].append(
            (r["valid_from"], r["valid_to"], r["is_current"])
        )
    assert per_key
    for key, rows_ in per_key.items():
        rows_.sort(key=lambda t: t[0])
        currents = [t for t in rows_ if t[1] is None]
        assert len(currents) == 1 and currents[0] == rows_[-1], key
        assert all(t[2] == (t[1] is None) for t in rows_), key
        for (f1, t1, _), (f2, _, _) in zip(rows_, rows_[1:]):
            assert t1 == f2 and f1 < f2, key  # chained, strictly ordered


def test_markov_transitions_row_stochastic(spark, sf_smoke):
    """stat_markov_transitions: each source state's outgoing probabilities
    must sum to 1 and equal n/n_src recomputed from the counts."""
    rows_ = _rows(spark, sf_smoke, "stat_markov_transitions")
    by_src = collections.defaultdict(list)
    for r in rows_:
        by_src[r["src"]].append((r["n"], r["p"]))
    assert by_src
    for src, nps in by_src.items():
        n_src = sum(n for n, _ in nps)
        assert sum(p for _, p in nps) == pytest.approx(1.0, abs=1e-9), src
        for n, p in nps:
            assert p == pytest.approx(n / n_src, abs=1e-12), src


def test_sequence_packing_offsets_are_prefix_sums(spark, sf_smoke):
    """docs_sequence_packing: within each lang in doc_id order, tok_offset
    must be the exclusive prefix sum of n_tokens and pack_id its 2048-token
    window — the invariant that makes concat-then-chunk reproducible."""
    rows_ = _rows(spark, sf_smoke, "docs_sequence_packing")
    by_lang = collections.defaultdict(list)
    for r in rows_:
        by_lang[r["lang"]].append((r["doc_id"], r["n_tokens"], r["tok_offset"], r["pack_id"]))
    for lang, docs in by_lang.items():
        docs.sort()
        run = 0
        for _did, n, off, pack in docs:
            assert off == run, lang
            assert pack == off // 2048, lang
            run += n


def test_cohort_ltv_is_cumulative_and_normalized(spark, sf_smoke):
    """ev_cohort_ltv: per cohort, cum_cents must be nondecreasing in
    weeks_since and ltv_per_user its exact per-member normalization."""
    rows_ = _rows(spark, sf_smoke, "ev_cohort_ltv")
    by_cohort = collections.defaultdict(list)
    for r in rows_:
        by_cohort[r["cohort_week"]].append(
            (r["weeks_since"], r["cum_cents"], r["cohort_users"], r["ltv_per_user"])
        )
    assert by_cohort
    for cw, rows2 in by_cohort.items():
        rows2.sort()
        prev = 0
        for _wk, cum, users, ltv in rows2:
            assert cum >= prev, cw  # cumulative revenue never decreases
            prev = cum
            assert ltv == pytest.approx(cum / (100.0 * users), abs=1e-9), cw


def test_winnowing_matches_python_replicate(spark, sf_smoke):
    """docs_winnowing_pairs vs a literal Python winnowing pass (k-gram md5
    hashes, window-min selection, distinct, pair counts) — and the MOSS
    guarantee spot-check: documents sharing >= w+k-1 consecutive tokens
    must share at least one fingerprint."""
    import hashlib

    from bigdata_etl_elt_dashboard_spark.plans.corpus_spans import (
        _WIN_K,
        _WIN_MIN_SHARED,
        _WIN_W,
    )

    def fingerprints(text: str) -> set:
        ts = _toks(text)
        spans = [" ".join(ts[i : i + _WIN_K]) for i in range(len(ts) - _WIN_K + 1)]
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in spans
        ]
        return {
            min(hs[j : j + _WIN_W]) for j in range(len(hs) - _WIN_W + 1)
        }

    docs = _cols(sf_smoke, "documents", ["doc_id", "text"])
    fps = {did: fingerprints(t) for did, t in docs}
    ids = sorted(fps)
    ref = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            n = len(fps[a] & fps[b])
            if n >= _WIN_MIN_SHARED:
                ref[(a, b)] = n
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in _rows(spark, sf_smoke, "docs_winnowing_pairs")
    }
    assert got == ref
    # guarantee spot-check: any pair sharing a >= w+k-1 token run shares a fp
    toks = {did: _toks(t) for did, t in docs}
    run = _WIN_W + _WIN_K - 1
    for i, a in enumerate(ids[:40]):
        grams_a = {
            " ".join(toks[a][i2 : i2 + run])
            for i2 in range(len(toks[a]) - run + 1)
        }
        for b in ids[i + 1 : 40]:
            grams_b = {
                " ".join(toks[b][i2 : i2 + run])
                for i2 in range(len(toks[b]) - run + 1)
            }
            if grams_a & grams_b:
                assert fps[a] & fps[b], (a, b)


def test_pipeline_e2e_matches_python_composition(spark, sf_smoke):
    """docs_pipeline_e2e_digest vs the same three stages composed in plain
    Python (gopher rules -> md5-normalized exact dedup keep-lowest-id ->
    per-source cap by doc_id) — the composition audit: each stage is
    individually gated, this pins that the COMPOSED plan applies them in
    the right order to the right survivor sets."""
    import hashlib
    import re as _re

    from bigdata_etl_elt_dashboard_spark.plans.corpus_quality import (
        _E2E_CAP,
        _MAX_DUP_BIGRAM_RATIO,
        _MAX_DUP_TOKEN_RATIO,
        _MAX_TOP_TOKEN_RATIO,
        _MAX_TOKENS,
        _MIN_TOKENS,
    )

    rows_ = _cols(
        sf_smoke, "documents", ["doc_id", "text", "lang", "source", "n_chars"]
    )
    survivors = []
    for did, text, lang, source, n_chars in rows_:
        ts = _toks(text)
        n = len(ts)
        if not (_MIN_TOKENS <= n <= _MAX_TOKENS):
            continue
        if (n - len(set(ts))) / n > _MAX_DUP_TOKEN_RATIO:
            continue
        if max(collections.Counter(ts).values()) / n > _MAX_TOP_TOKEN_RATIO:
            continue
        bgs = [" ".join(ts[i : i + 2]) for i in range(n - 1)]
        if bgs and (len(bgs) - len(set(bgs))) / len(bgs) > _MAX_DUP_BIGRAM_RATIO:
            continue
        norm = _re.sub(r"\s+", " ", text.strip().lower())
        survivors.append(
            (did, lang, source, n_chars, hashlib.md5(norm.encode()).hexdigest(), n)
        )
    canon = {}
    for did, _l, _s, _c, fp, _n in survivors:
        canon[fp] = min(canon.get(fp, did), did)
    dd = [r for r in survivors if canon[r[4]] == r[0]]
    by_source = collections.defaultdict(list)
    for r in sorted(dd):
        by_source[r[2]].append(r)
    ref = collections.defaultdict(lambda: [0, 0, 0, 0])
    for src, rs in by_source.items():
        for did, lang, _s, n_chars, _fp, n_tok in rs[:_E2E_CAP]:
            agg = ref[(lang, src)]
            agg[0] += 1
            agg[1] += n_tok
            agg[2] += n_chars
            agg[3] += did
    got = {
        (r["lang"], r["source"]): (
            r["n_docs"],
            r["n_tokens"],
            r["n_chars"],
            r["id_sum"],
        )
        for r in _rows(spark, sf_smoke, "docs_pipeline_e2e_digest")
    }
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_centroid_sim_matches_numpy(spark, sf_smoke):
    """emb_label_centroid_sim vs numpy: quantize embeddings to micro-unit
    ints, average per label with SQL-round, and compare every pairwise
    centroid cosine at 6 dp."""
    t = pq.read_table(f"{sf_smoke}/embeddings.parquet", columns=["label", "embedding"])
    labels = t["label"].to_pylist()
    vecs = [[_r(x * 1_000_000) for x in v] for v in t["embedding"].to_pylist()]
    by_label = collections.defaultdict(list)
    for l, v in zip(labels, vecs):
        by_label[l].append(v)
    cents = {
        l: [_r(np.mean(col)) for col in zip(*vs)] for l, vs in by_label.items()
    }
    ref = {}
    ls = sorted(cents)
    for i, a in enumerate(ls):
        for b in ls[i + 1 :]:
            ca, cb = np.array(cents[a], float), np.array(cents[b], float)
            denom = math.sqrt(ca @ ca) * math.sqrt(cb @ cb)
            ref[(a, b)] = round(float(ca @ cb) / denom, 6) if denom else None
    got = {
        (r["label_a"], r["label_b"]): r["centroid_cosine"]
        for r in _rows(spark, sf_smoke, "emb_label_centroid_sim")
    }
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=2e-6), k


def test_churn_hazard_matches_python(spark, sf_smoke):
    """ev_churn_hazard_table vs a plain-Python lifetime/censoring pass,
    plus structural invariants: at-risk counts strictly decrease down the
    lifetime grid and sum of churned <= total users."""
    per_user = {}
    for uid, _eid, _et, sec, _c, _ns in _events(sf_smoke):
        f, l = per_user.get(uid, (sec, sec))
        per_user[uid] = (min(f, sec), max(l, sec))
    mx = max(l for _f, l in per_user.values())
    lifetimes = collections.defaultdict(lambda: [0, 0])
    for f, l in per_user.values():
        t_days = (l - f) // 86400
        lifetimes[t_days][0] += 1
        lifetimes[t_days][1] += int(mx - l >= 7 * 86400)
    grid = sorted(lifetimes)
    ref = {}
    at_risk = sum(n for n, _ in lifetimes.values())
    for t in grid:
        n_end, n_ch = lifetimes[t]
        ref[t] = (at_risk, n_ch)
        at_risk -= n_end
    rows_ = _rows(spark, sf_smoke, "ev_churn_hazard_table")
    got = {r["t_days"]: (r["n_at_risk"], r["n_churned"]) for r in rows_}
    assert got == ref
    risks = [r["n_at_risk"] for r in rows_]
    assert risks == sorted(risks, reverse=True)
    assert sum(r["n_churned"] for r in rows_) <= len(per_user)


def test_kcore_corpus_trajectory_matches_python(spark, sf_smoke):
    """graph_kcore_peel on the real co-purchase graph vs a plain-Python
    peel of the same edge list, round by round."""
    from bigdata_etl_elt_dashboard_spark.plans.iterative import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )

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
    ref = []
    es = set(edges)
    nodes = {n for e in es for n in e}
    ref.append((0, len(nodes), len(es)))
    for rnd in range(1, _KCORE_ROUNDS + 1):
        deg = collections.Counter()
        for x, y in es:
            deg[x] += 1
            deg[y] += 1
        keep = {n for n, d in deg.items() if d >= _KCORE_K}
        es = {(x, y) for x, y in es if x in keep and y in keep}
        nodes = {n for e in es for n in e}
        ref.append((rnd, len(nodes), len(es)))
    got = [
        (r["round"], r["n_nodes"], r["n_edges"])
        for r in _rows(spark, sf_smoke, "graph_kcore_peel")
    ]
    assert got == ref


def test_kmeans_trajectory_matches_python_lloyd(spark, sf_smoke):
    """sim_kmeans_trajectory vs a literal Python Lloyd loop in exact
    integer arithmetic: same quantization, same ROUND(AVG) centroid
    update, same (d2, label) argmin tie-break, empty clusters dropped."""
    from bigdata_etl_elt_dashboard_spark.plans.iterative import _K, _KM_ROUNDS

    t = pq.read_table(f"{sf_smoke}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        int(vid): [_r(x * 1_000_000) for x in v]
        for vid, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }

    def assign(cents):
        out = {}
        for vid, v in vecs.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)), lbl)
                for lbl, c in cents.items()
            )
            out[vid] = best  # (d2, label)
        return out

    cents = {vid: vecs[vid] for vid in range(_K)}
    a_prev = assign(cents)
    ref = []
    for rnd in range(1, _KM_ROUNDS + 1):
        members = collections.defaultdict(list)
        for vid, (_d2, lbl) in a_prev.items():
            members[lbl].append(vecs[vid])
        cents = {
            lbl: [_r(np.mean(col)) for col in zip(*vs)]
            for lbl, vs in members.items()
        }
        a_new = assign(cents)
        n_moved = sum(
            1 for vid in vecs if a_new[vid][1] != a_prev[vid][1]
        )
        inertia = sum(d2 for d2, _ in a_new.values())
        ref.append((rnd, n_moved, len({l for _, l in a_new.values()}), inertia))
        a_prev = a_new
    got = [
        (r["round"], r["n_moved"], r["n_clusters"], r["inertia"])
        for r in _rows(spark, sf_smoke, "sim_kmeans_trajectory")
    ]
    assert got == ref


def test_spearman_matches_textbook(spark, sf_smoke):
    """stat_spearman_chars_value vs the textbook definition: Pearson on
    average-tie ranks computed independently in numpy."""
    rows_ = _cols(sf_smoke, "documents", ["doc_id", "n_chars"])
    x = np.array([float(n) for _d, n in rows_])
    y = np.array([float(d % 97) for d, _n in rows_])

    def avg_ranks(v):
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    rx, ry = avg_ranks(x), avg_ranks(y)
    ref = np.corrcoef(rx, ry)[0, 1]
    got = _rows(spark, sf_smoke, "stat_spearman_chars_value")[0]
    assert got["n"] == len(rows_)
    assert got["spearman_rho"] == pytest.approx(ref, abs=1e-9)


def _ntile(order_keys, n=5):
    """NTILE(n) over rows pre-sorted by order_keys: first (len % n) buckets
    get ceil(len/n) rows — the SQL-standard assignment both engines use."""
    total = len(order_keys)
    base, extra = divmod(total, n)
    out, i = {}, 0
    for b in range(1, n + 1):
        size = base + (1 if b <= extra else 0)
        for key in order_keys[i : i + size]:
            out[key] = b
        i += size
    return out


def test_rfm_segments_match_python_ntile(spark, sf_smoke):
    """ev_rfm_segments vs a plain-Python replicate of the per-user rollup
    and the SQL-standard NTILE assignment over the (metric, user_id)
    total orders."""
    per = {}
    for uid, _eid, etype, sec, cents, _ns in _events(sf_smoke):
        if etype != "purchase":
            continue
        last, freq, tot = per.get(uid, (-1, 0, 0))
        per[uid] = (max(last, sec), freq + 1, tot + cents)
    m = max(last for last, _f, _c in per.values())
    users = list(per)
    r = _ntile(sorted(users, key=lambda u: (m - per[u][0], u)))
    f = _ntile(sorted(users, key=lambda u: (-per[u][1], u)))
    mo = _ntile(sorted(users, key=lambda u: (-per[u][2], u)))
    ref = collections.defaultdict(lambda: [0, 0])
    for u in users:
        cell = ref[(r[u], f[u], mo[u])]
        cell[0] += 1
        cell[1] += per[u][2]
    got = {
        (row["r_score"], row["f_score"], row["m_score"]): (
            row["n_users"],
            row["cents_sum"],
        )
        for row in _rows(spark, sf_smoke, "ev_rfm_segments")
    }
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_locf_fills_match_python(spark, sf_smoke):
    """trend_locf_daily_price vs a plain-Python carry-forward over the
    calendar grid: filled rows inherit the exact previous (sum, count)
    pair, and every unfilled row equals its own day's mean."""
    import datetime as dt

    daily = collections.defaultdict(lambda: [0, 0])
    for prio, d, x in _cols(
        sf_smoke, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"]
    ):
        day = d.date() if isinstance(d, dt.datetime) else d
        cell = daily[(prio, day)]
        cell[0] += _r(x * 100)
        cell[1] += 1
    days = [d for _p, d in daily]
    lo, hi = min(days), max(days)
    prios = sorted({p for p, _d in daily})
    ref = {}
    for p in prios:
        carry = None
        d = lo
        while d <= hi:
            if (p, d) in daily:
                carry = tuple(daily[(p, d)])
                filled = False
            else:
                filled = True
            if carry is not None:
                s, n = carry
                ref[(p, d.isoformat())] = (filled, s / n / 100.0)
            d += dt.timedelta(days=1)
    got = {
        (r["priority"], r["day"]): (r["was_filled"], r["mean_price"])
        for r in _rows(spark, sf_smoke, "trend_locf_daily_price")
    }
    assert set(got) == set(ref)
    for k, (filled, mean) in ref.items():
        assert got[k][0] == filled, k
        assert got[k][1] == pytest.approx(mean, abs=1e-9), k


def test_time_to_convert_matches_python(spark, sf_smoke):
    """ev_time_to_convert_hist vs a per-user replicate of the
    signup→strictly-later-purchase latency bucketing."""
    per = collections.defaultdict(lambda: {"s": [], "p": []})
    for uid, _eid, etype, sec, _c, _ns in _events(sf_smoke):
        if etype == "signup":
            per[uid]["s"].append(sec)
        elif etype == "purchase":
            per[uid]["p"].append(sec)
    ref = collections.Counter()
    for u, d in per.items():
        if not d["s"]:
            continue
        t0 = min(d["s"])
        later = [t for t in d["p"] if t > t0]
        if later:
            ref[min((min(later) - t0) // 3600, 168)] += 1
    got = {
        r["hours_bucket"]: r["n_users"]
        for r in _rows(spark, sf_smoke, "ev_time_to_convert_hist")
    }
    assert got == dict(ref)


def test_pagerank_matches_python_reference(spark, sf_smoke):
    """graph_pagerank_3iter vs a plain-Python integer PageRank over the
    same bipartite part<->supplier graph: the distributed joins/groupBys
    must land on bit-identical rank units, and the replicated full rank
    vector must conserve mass up to the documented integer-floor losses
    (each div drops < 1 unit per contribution, the base term < 1 per
    node) — the audit the DuckDB twin can't give (a shared formula bug
    would ship identical wrong numbers on both engines)."""
    UNITS = 1_000_000_000
    pairs = {
        (p, s)
        for p, s in _cols(sf_smoke, "lineitem", ["l_partkey", "l_suppkey"])
    }
    adj = collections.defaultdict(list)  # src -> [dst, ...] (both directions)
    for p, s in pairs:
        adj[f"P{p}"].append(f"S{s}")
        adj[f"S{s}"].append(f"P{p}")
    n = len(adj)
    base = (UNITS * 15) // (100 * n)
    ranks = {node: UNITS // n for node in adj}
    for _ in range(3):
        nxt = collections.defaultdict(int)
        for src, dsts in adj.items():
            c = (ranks[src] * 85) // (100 * len(dsts))
            for dst in dsts:
                nxt[dst] += c
        ranks = {node: base + m for node, m in nxt.items()}

    # 3-iter values: Spark's top-20 must equal the replicate's, exactly
    top = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["node"], r["rank_units"])
        for r in _rows(spark, sf_smoke, "graph_pagerank_3iter")
    ]
    assert got == top

    # mass conservation: total mass never exceeds UNITS and loses at most
    # the floor slack — n units to the base terms + one unit per directed
    # edge per iteration to the contribution divisions, compounded over 3
    # rounds (losses of round k shrink the mass rounds k+1.. redistribute)
    m_edges = sum(len(v) for v in adj.values())
    total = sum(ranks.values())
    assert total <= UNITS
    assert total >= UNITS - 3 * (n + m_edges)


def test_label_propagation_matches_python_reference(spark, sf_smoke):
    """graph_label_propagation vs a plain-Python synchronous LPA with the
    same min-label tie-break: community sizes and count must match
    exactly (the mode(lbl, deterministic) aggregate and the replicate's
    Counter must land on identical labels every round)."""
    li = {
        (o, p)
        for o, p in _cols(sf_smoke, "lineitem", ["l_orderkey", "l_partkey"])
    }
    baskets = collections.defaultdict(set)
    for o, p in li:
        baskets[o].add(p)
    adj = collections.defaultdict(set)
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                adj[ps[i]].add(ps[j])
                adj[ps[j]].add(ps[i])
    labels = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for node, nbrs in adj.items():
            freq = collections.Counter(labels[v] for v in nbrs)
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[node] = best[0]
        labels = nxt
    sizes = collections.Counter(labels.values())
    top = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = [
        (rank, lbl, size, len(sizes))
        for rank, (lbl, size) in enumerate(top, start=1)
    ]
    got = [
        (r["rank"], r["community_label"], r["size"], r["n_communities"])
        for r in _rows(spark, sf_smoke, "graph_label_propagation")
    ]
    assert got == expect


def test_hll_matches_python_reference(spark, sf_smoke):
    """stat_hll_distinct_custkeys vs a plain-Python HLL with the same md5
    hashing, register layout, and scaled-integer denominator — registers,
    zero count, and the one-division estimate must match exactly."""
    import hashlib

    keys = _col(sf_smoke, "orders", "o_custkey")
    M = [0] * 64
    for k in keys:
        hv = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        bucket, w = hv % 64, hv // 64
        rho = 55 if w == 0 else 55 - len(bin(w)[2:])
        M[bucket] = max(M[bucket], rho)
    sum_scaled = sum(1 << (55 - m) for m in M)
    n_zero = sum(1 for m in M if m == 0)
    alpha = 0.7213 / (1 + 1.079 / 64)
    C = alpha * 64 * 64 * float(1 << 55)
    est = C / float(sum_scaled)
    got = _rows(spark, sf_smoke, "stat_hll_distinct_custkeys")[0]
    assert got["sum_scaled"] == sum_scaled
    assert got["n_zero_buckets"] == n_zero
    assert got["true_distinct"] == len(set(keys))
    assert got["est_distinct"] == est  # bit-identical: same one division


def test_ab_ztest_matches_textbook(spark, sf_smoke):
    """ev_ab_test_conversion vs a from-scratch pooled two-proportion z:
    counts exact, z within float tolerance of the independently-ordered
    textbook computation (the query's fixed op sequence is what the
    oracle hash pins; this audit checks the FORMULA itself)."""
    import datetime as dt
    import hashlib

    rows = _cols(sf_smoke, "events", ["user_id", "event_type", "ts"])
    per_user = {}
    for uid, etype, ts in rows:
        d = per_user.setdefault(uid, {"view": None, "purchase": None})
        if etype in d and (d[etype] is None or ts < d[etype]):
            d[etype] = ts
    stats = {0: [0, 0], 1: [0, 0]}  # variant -> [n_exposed, n_converted]
    for uid, d in per_user.items():
        variant = ord(hashlib.md5(str(uid).encode()).hexdigest()[0]) % 2
        if d["view"] is None:
            continue
        stats[variant][0] += 1
        if (
            d["purchase"] is not None
            and d["view"] < d["purchase"] <= d["view"] + dt.timedelta(minutes=60)
        ):
            stats[variant][1] += 1
    got = _rows(spark, sf_smoke, "ev_ab_test_conversion")[0]
    assert (got["n_a"], got["conv_a"]) == tuple(stats[0])
    assert (got["n_b"], got["conv_b"]) == tuple(stats[1])
    n1, x1 = stats[0]
    n2, x2 = stats[1]
    p1, p2 = x1 / n1, x2 / n2
    p = (x1 + x2) / (n1 + n2)
    se = math.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    if se == 0:
        assert got["z_score"] is None
    else:
        assert abs(got["z_score"] - (p1 - p2) / se) < 1e-12


def test_jl_distortion_matches_numpy(spark, sf_smoke):
    """emb_jl_projection_distortion vs a numpy int64 replicate of the
    whole pipeline (same xorshift Rademacher matrix, same micro-unit
    quantization, same 128-bit bucket floor-division) — the histogram
    must match exactly."""
    import pyarrow.parquet as pq_mod

    from bigdata_etl_elt_dashboard_spark.plans.similarity_gate import (
        _JL_K,
        _JL_NQ,
        _JL_R,
    )

    t = pq_mod.read_table(f"{sf_smoke}/embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    embs = t["embedding"].to_pylist()
    X = {
        i: [int(_r(float(v) * 1_000_000)) for v in e] for i, e in zip(ids, embs)
    }
    Y = {
        i: [sum(r * x for r, x in zip(_JL_R[p], xs)) for p in range(_JL_K)]
        for i, xs in X.items()
    }
    hist = collections.Counter()
    for qid in [i for i in X if i < _JL_NQ]:
        for cid in X:
            if cid <= qid:
                continue
            d2o = sum((a - b) ** 2 for a, b in zip(X[cid], X[qid]))
            if d2o == 0:
                continue
            d2p = sum((a - b) ** 2 for a, b in zip(Y[cid], Y[qid]))
            hist[(d2p * 64 * 10) // (d2o * _JL_K)] += 1
    got = {
        r["ratio_decile"]: r["n_pairs"]
        for r in _rows(spark, sf_smoke, "emb_jl_projection_distortion")
    }
    assert got == dict(hist)


def test_ngram_containment_matches_python(spark, sf_smoke):
    """docs_ngram_containment (rewritten round 5: windowed DF cap, one
    pinned frame) vs a plain-Python shingle/containment replicate —
    pair set and exact counts must match."""
    from bigdata_etl_elt_dashboard_spark.plans.corpus_spans import (
        _CONT_DEN,
        _CONT_DF_CAP,
        _CONT_K,
        _CONT_NUM,
    )

    rows = _cols(sf_smoke, "documents", ["doc_id", "text"])
    sh = {}
    for doc_id, text in rows:
        toks = [t for t in text.strip().lower().split() if t != ""]
        if text.strip() == "":
            toks = []
        spans = {
            " ".join(toks[i : i + _CONT_K])
            for i in range(len(toks) - _CONT_K + 1)
        }
        sh[doc_id] = spans
    df_count = collections.Counter(s for spans in sh.values() for s in spans)
    kept = {d: {s for s in spans if df_count[s] <= _CONT_DF_CAP}
            for d, spans in sh.items()}
    n_sh = {d: len(s) for d, s in kept.items()}
    expect = []
    for a, sa in kept.items():
        for b, sb in kept.items():
            if a == b or n_sh[a] > n_sh[b] or n_sh[a] == 0:
                continue
            common = len(sa & sb)
            if common * _CONT_DEN >= n_sh[a] * _CONT_NUM and common > 0:
                expect.append((a, b, common, n_sh[a]))
    expect.sort()
    got = [
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_sh_a"])
        for r in _rows(spark, sf_smoke, "docs_ngram_containment")
    ]
    assert got == expect


def test_mann_kendall_matches_python(spark, sf_smoke):
    """stat_mann_kendall_daily_revenue vs a from-scratch O(n²) Python
    Mann–Kendall: S, the tie-corrected 18·Var, and the continuity-
    corrected z must match (z bit-identical — same op sequence)."""
    rows = _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"])
    daily = collections.defaultdict(int)
    for ts, price in rows:
        daily[ts.date()] += _r(float(price) * 100)
    days = sorted(daily)
    c = [daily[d] for d in days]
    n = len(c)
    s = sum(
        (1 if c[j] > c[i] else -1 if c[j] < c[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_term = sum(
        t * (t - 1) * (2 * t + 5)
        for t in collections.Counter(c).values()
        if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    sd = math.sqrt(var18 / 18.0)
    z = (s - 1) / sd if s > 0 else (s + 1) / sd if s < 0 else 0.0
    got = _rows(spark, sf_smoke, "stat_mann_kendall_daily_revenue")[0]
    assert got["n_days"] == n
    assert got["s_stat"] == s
    assert got["var18"] == var18
    assert got["z_score"] == z


def _copurchase_py(sf):
    """Brute-force co-purchase graph (edges, adjacency, degree) in Python."""
    li = {(o, p) for o, p in _cols(sf, "lineitem", ["l_orderkey", "l_partkey"])}
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
    return edges, adj


def test_clustering_coeff_hist_matches_bruteforce(spark, sf_smoke):
    """graph_clustering_coeff_hist's exploded compact-forward corner counts
    must reproduce the brute-force per-node triangle count and the exact
    integer micro-bucket for every node with degree >= 2."""
    _, adj = _copurchase_py(sf_smoke)
    hist = collections.Counter()
    tri_by_bucket = collections.Counter()
    for n, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        tri = sum(len(adj[m] & nb) for m in nb) // 2
        bucket = ((tri * 2 * 1_000_000) // (d * (d - 1))) // 100_000
        hist[bucket] += 1
        tri_by_bucket[bucket] += tri
    got = {
        r["cc_bucket"]: (r["n_nodes"], r["sum_corner_triangles"])
        for r in _rows(spark, sf_smoke, "graph_clustering_coeff_hist")
    }
    assert got == {b: (hist[b], tri_by_bucket[b]) for b in hist}


def test_assortativity_matches_python_and_star_graph(spark, sf_smoke, tmp_path):
    """Newman's r from exact moments vs a direct numpy Pearson over the
    both-direction endpoint-degree pairs; then r == -1 exactly on an
    engineered star graph (the textbook perfectly-disassortative case)."""
    edges, adj = _copurchase_py(sf_smoke)
    deg = {n: len(v) for n, v in adj.items()}
    pairs = [(deg[a], deg[b]) for a, b in edges]
    pairs += [(b, a) for a, b in pairs]
    xs = np.array([p[0] for p in pairs], float)
    ys = np.array([p[1] for p in pairs], float)
    ref = np.corrcoef(xs, ys)[0, 1]
    got = _rows(spark, sf_smoke, "graph_degree_assortativity")[0]
    assert got["n"] == len(pairs)
    assert abs(got["assortativity"] - ref) < 1e-9
    # star graph: one order carrying parts 0..5 would be a clique, so build
    # the star as 5 two-part orders sharing part 0
    star = [(i, 0) for i in range(1, 6)] + [(i, i) for i in range(1, 6)]
    spark.createDataFrame(
        star, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = REGISTRY["graph_degree_assortativity"].fn(spark, str(tmp_path)).collect()[0]
    assert r["assortativity"] == -1.0


def test_bfs_layers_path_graph_positive(spark, sf_smoke, tmp_path):
    """graph_bfs_layers is legitimately 0-rows-at-layer-3 on the dense
    co-purchase corpus — pin the positive path on an engineered 10-node
    path graph (order i links parts i, i+1): BFS from part 0 must put
    exactly node k at layer k."""
    path = [(i, i) for i in range(10)] + [(i, i + 1) for i in range(9)]
    spark.createDataFrame(
        path, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    rows = REGISTRY["graph_bfs_layers"].fn(spark, str(tmp_path)).collect()
    assert [(r["layer"], r["n_nodes"], r["min_node"], r["max_node"]) for r in rows] == [
        (0, 1, 0, 0),
        (1, 1, 1, 1),
        (2, 1, 2, 2),
        (3, 1, 3, 3),
    ]


def test_theilsen_matches_python(spark, sf_smoke):
    """stat_theilsen_monthly_revenue's pmod floor-div slope grid and
    lower-median selection vs a direct Python recomputation."""
    monthly = collections.defaultdict(int)
    for d, x in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        monthly[d.year * 12 + d.month] += _r(x * 100)
    ts = sorted(monthly)
    slopes = sorted(
        ((monthly[t2] - monthly[t1]) * 1_000_000) // (t2 - t1)
        for i, t1 in enumerate(ts)
        for t2 in ts[i + 1 :]
    )
    got = _rows(spark, sf_smoke, "stat_theilsen_monthly_revenue")[0]
    assert got["n_months"] == len(ts)
    assert got["n_pairs"] == len(slopes)
    assert got["median_slope_micro"] == slopes[(len(slopes) + 1) // 2 - 1]


def test_kendall_tau_matches_python(spark, sf_smoke):
    """stat_kendall_tau_revenue_orders' pair-grid counts and tau-b vs a
    direct O(n^2) Python recomputation over the daily rollup."""
    daily = {}
    for d, x in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        k = d
        rev, cnt = daily.get(k, (0, 0))
        daily[k] = (rev + _r(x * 100), cnt + 1)
    vals = [daily[k] for k in sorted(daily)]
    conc = disc = tx = ty = 0
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            dx = vals[j][0] - vals[i][0]
            dy = vals[j][1] - vals[i][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = len(vals) * (len(vals) - 1) // 2
    ref = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    got = _rows(spark, sf_smoke, "stat_kendall_tau_revenue_orders")[0]
    assert (got["concordant"], got["discordant"], got["tx_pairs"], got["ty_pairs"]) == (
        conc, disc, tx, ty
    )
    assert abs(got["tau_b"] - ref) < 1e-12


def test_anova_f_matches_textbook(spark, sf_smoke):
    """stat_anova_f_price_by_priority vs numpy group moments: SSB, SSW and
    F must match to float tolerance (the query's op order differs from
    numpy's internals, so exact-bit equality is not expected here — the
    DuckDB gate pins the bits; this pins the MATH)."""
    groups = collections.defaultdict(list)
    for pr, x in _cols(sf_smoke, "orders", ["o_orderpriority", "o_totalprice"]):
        groups[pr].append(_r(x))
    arrs = [np.array(v, float) for v in groups.values()]
    allv = np.concatenate(arrs)
    ssb = sum(len(a) * (a.mean() - allv.mean()) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    f_ref = (ssb / (len(arrs) - 1)) / (ssw / (len(allv) - len(arrs)))
    got = _rows(spark, sf_smoke, "stat_anova_f_price_by_priority")[0]
    assert got["n_total"] == len(allv)
    assert abs(got["ss_between"] - ssb) / ssb < 1e-9
    assert abs(got["ss_within"] - ssw) / ssw < 1e-9
    assert abs(got["f_stat"] - f_ref) / f_ref < 1e-9


def test_kruskal_wallis_matches_textbook(spark, sf_smoke):
    """stat_kruskal_wallis_price_by_priority vs scipy-free midranks: H with
    tie correction must match the textbook formulation."""
    data = [
        (pr, _r(x))
        for pr, x in _cols(sf_smoke, "orders", ["o_orderpriority", "o_totalprice"])
    ]
    vals = sorted(v for _, v in data)
    n = len(vals)
    # midrank per value
    rank = {}
    i = 0
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        rank[vals[i]] = (i + 1 + j) / 2.0
        i = j
    rsums = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    for pr, v in data:
        rsums[pr] += rank[v]
        counts[pr] += 1
    h = 12.0 / (n * (n + 1)) * sum(
        rsums[p] ** 2 / counts[p] for p in rsums
    ) - 3.0 * (n + 1)
    ties = collections.Counter(v for _, v in data)
    c = 1.0 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    got = _rows(spark, sf_smoke, "stat_kruskal_wallis_price_by_priority")[0]
    assert got["n_total"] == n
    assert abs(got["h_stat"] - h) < 1e-7
    assert abs(got["h_corrected"] - h / c) < 1e-7


def test_chow_break_matches_numpy_ols(spark, sf_smoke):
    """stat_chow_break_daily_revenue vs numpy lstsq residual sums: SSRs and
    the Chow F must match the two-regression formulation."""
    daily = collections.defaultdict(int)
    for d, x in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        daily[d.date()] += _r(x)
    import datetime

    t0 = datetime.date(1995, 1, 1)
    brk = datetime.date(1998, 7, 1)

    def ssr(pairs):
        t = np.array([(d - t0).days for d, _ in pairs], float)
        y = np.array([y for _, y in pairs], float)
        A = np.vstack([np.ones_like(t), t]).T
        res = y - A @ np.linalg.lstsq(A, y, rcond=None)[0]
        return float((res**2).sum())

    items = sorted(daily.items())
    pre = [(d, y) for d, y in items if d < brk]
    post = [(d, y) for d, y in items if d >= brk]
    ssr1, ssr2, ssrp = ssr(pre), ssr(post), ssr(items)
    f_ref = ((ssrp - ssr1 - ssr2) / 2.0) / ((ssr1 + ssr2) / (len(items) - 4))
    got = _rows(spark, sf_smoke, "stat_chow_break_daily_revenue")[0]
    assert got["n_pre"] == len(pre) and got["n_post"] == len(post)
    assert abs(got["ssr_split"] - (ssr1 + ssr2)) / (ssr1 + ssr2) < 1e-7
    assert abs(got["ssr_pool"] - ssrp) / ssrp < 1e-7
    assert abs(got["chow_f"] - f_ref) / abs(f_ref) < 1e-7


def test_brown_forsythe_matches_textbook(spark, sf_smoke):
    """stat_levene_brown_forsythe vs a direct median-deviation ANOVA. The
    query uses the LOWER median (first value whose doubled cumulative
    count reaches n) — the reference replicates that selection."""
    groups = collections.defaultdict(list)
    for st, x in _cols(sf_smoke, "orders", ["o_orderstatus", "o_totalprice"]):
        groups[st].append(_r(x))
    zs = []
    for st, v in groups.items():
        v = sorted(v)
        med = v[(len(v) - 1) // 2]  # lower median: cum*2 >= n selection
        zs.append(np.array([abs(x - med) for x in v], float))
    allz = np.concatenate(zs)
    ssb = sum(len(a) * (a.mean() - allz.mean()) ** 2 for a in zs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in zs)
    f_ref = (ssb / (len(zs) - 1)) / (ssw / (len(allz) - len(zs)))
    got = _rows(spark, sf_smoke, "stat_levene_brown_forsythe")[0]
    assert got["n_total"] == len(allz)
    assert abs(got["bf_stat"] - f_ref) / f_ref < 1e-9


def test_hodges_lehmann_matches_numpy(spark, sf_smoke):
    """stat_hodges_lehmann_yoy_shift vs the brute-force median of all
    pairwise 1997−1996 daily differences."""
    daily = collections.defaultdict(int)
    for d, x in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        daily[d.date()] += _r(x * 100)
    d96 = [v for d, v in daily.items() if d.year == 1996]
    d97 = [v for d, v in daily.items() if d.year == 1997]
    diffs = np.array(sorted(b - a for a in d96 for b in d97), dtype=np.int64)
    n = len(diffs)
    lo, hi = diffs[(n + 1) // 2 - 1], diffs[(n + 2) // 2 - 1]
    got = _rows(spark, sf_smoke, "stat_hodges_lehmann_yoy_shift")[0]
    assert got["n_pairs"] == n
    if n % 2 == 0:
        assert got["mid_sum_cents"] == int(lo) + int(hi)
        assert got["hl_shift"] == (int(lo) + int(hi)) / 2 / 100.0
    else:  # lo == hi: the two rank selections collapse to one row
        assert got["mid_sum_cents"] == int(lo)
        assert got["hl_shift"] == int(lo) / 1 / 100.0


def test_ewma_matches_python_loop(spark, sf_smoke):
    """trend_ewma32_daily_revenue vs a literal Python weight loop over the
    trailing 32 calendar days."""
    daily = collections.defaultdict(int)
    for d, x in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        daily[d.date()] += _r(x)
    import datetime

    got = {r["day"]: r for r in _rows(spark, sf_smoke, "trend_ewma32_daily_revenue")}
    assert len(got) == len(daily)
    for day in sorted(daily)[:50]:  # spot-check a prefix
        wsum = wtot = nd = 0
        for k in range(32):
            p = day - datetime.timedelta(days=k)
            if p in daily:
                w = 1 << (31 - k)
                wsum += daily[p] * w
                wtot += w
                nd += 1
        r = got[day]
        assert (r["wsum"], r["wtot"], r["n_days"]) == (wsum, wtot, nd)
        assert r["ewma"] == wsum / wtot


# ---------------------------------------------------------------------------
# Round-6 tail additions: turning points, sign test, MASE, Ljung-Box, MAD,
# block maxima, rich club, k-truss, Katz. Same discipline as above — a third,
# structurally different implementation (plain Python over the raw parquet)
# must agree with the Spark/DuckDB pair.


def _daily_revenue(sf, cents=True):
    """day -> exact integer daily revenue (cents or whole units)."""
    daily = collections.defaultdict(int)
    for ts, price in _cols(sf, "orders", ["o_orderdate", "o_totalprice"]):
        daily[ts.date()] += _r(float(price) * 100) if cents else _r(float(price))
    return dict(daily)


def test_turning_points_matches_python(spark, sf_smoke):
    daily = _daily_revenue(sf_smoke, cents=True)
    c = [daily[d] for d in sorted(daily)]
    n = len(c)
    t = sum(
        1
        for i in range(1, n - 1)
        if (c[i] > c[i - 1] and c[i] > c[i + 1])
        or (c[i] < c[i - 1] and c[i] < c[i + 1])
    )
    exp = 2 * (n - 2) / 3.0
    var = (16 * n - 29.0) / 90.0
    got = _rows(spark, sf_smoke, "stat_turning_points_test")[0]
    assert got["n_days"] == n
    assert got["turning_points"] == t
    assert abs(got["expected_tp"] - exp) < 1e-9
    assert abs(got["var_tp"] - var) < 1e-9
    assert abs(got["z_score"] - (t - exp) / math.sqrt(var)) < 1e-9


def test_sign_test_matches_python(spark, sf_smoke):
    import datetime

    daily = _daily_revenue(sf_smoke, cents=True)
    n_pos = n_eff = 0
    for d, y in daily.items():
        p = d - datetime.timedelta(days=28)
        if p in daily:
            if y > daily[p]:
                n_pos += 1
            if y != daily[p]:
                n_eff += 1
    cc = 1.0 if 2 * n_pos > n_eff else -1.0 if 2 * n_pos < n_eff else 0.0
    z = (2.0 * n_pos - n_eff - cc) / math.sqrt(n_eff)
    got = _rows(spark, sf_smoke, "stat_sign_test_paired_months")[0]
    assert (got["n_pos"], got["n_eff"]) == (n_pos, n_eff)
    assert abs(got["z_score"] - z) < 1e-12


def test_snaive_mase_matches_python(spark, sf_smoke):
    import datetime

    daily = _daily_revenue(sf_smoke, cents=False)
    sae = [0, 0]
    cnt = [0, 0]
    for i, lag in enumerate((7, 1)):
        for d, y in daily.items():
            p = d - datetime.timedelta(days=lag)
            if p in daily:
                sae[i] += abs(y - daily[p])
                cnt[i] += 1
    got = _rows(spark, sf_smoke, "trend_backtest_snaive_mase")[0]
    assert (got["n_forecasts"], got["sae_snaive"]) == (cnt[0], sae[0])
    assert (got["n_naive"], got["sae_naive1"]) == (cnt[1], sae[1])
    mase = (sae[0] / cnt[0]) / (sae[1] / cnt[1])
    assert abs(got["mase"] - mase) < 1e-12


def test_ljung_box_matches_python(spark, sf_smoke):
    import datetime

    daily = _daily_revenue(sf_smoke, cents=False)
    vals = list(daily.values())
    n, s, syy = len(vals), sum(vals), sum(v * v for v in vals)
    mean = s / n
    den = syy - s * s / n
    got = _rows(spark, sf_smoke, "stat_ljung_box_weekly")[0]
    assert got["n_days"] == n
    q = 0.0
    for k in range(1, 8):
        sxy = a = b = m = 0
        for d, y in daily.items():
            p = d - datetime.timedelta(days=k)
            if p in daily:
                sxy += y * daily[p]
                a += y
                b += daily[p]
                m += 1
        rho = (sxy - mean * (a + b) + m * mean * mean) / den
        assert math.isclose(got[f"rho{k}"], rho, rel_tol=1e-9, abs_tol=1e-12)
        q += rho * rho / (n - k)
    assert math.isclose(got["lb_q"], n * (n + 2.0) * q, rel_tol=1e-9, abs_tol=1e-9)


def _lower_median(vals):
    """Smallest v whose cumulative count c satisfies 2c >= n."""
    sv = sorted(vals)
    return sv[(len(sv) - 1) // 2]


def test_mad_outliers_match_python(spark, sf_smoke):
    daily = _daily_revenue(sf_smoke, cents=False)
    med = _lower_median(daily.values())
    dev = {d: abs(y - med) for d, y in daily.items()}
    mad = _lower_median(dev.values())
    top = sorted(daily, key=lambda d: (-dev[d], d))[:10]
    got = _rows(spark, sf_smoke, "stat_mad_robust_outlier_days")
    assert len(got) == 10
    for r, d in zip(got, top):
        assert r["day"] == d
        assert r["y"] == daily[d]
        assert r["abs_dev"] == dev[d]
        want = dev[d] * 1000000 // mad if mad else None
        assert r["robust_z_ppm"] == want


def test_weekly_block_maxima_matches_python(spark, sf_smoke):
    import datetime

    daily = _daily_revenue(sf_smoke, cents=False)
    wk = collections.defaultdict(int)
    for d, y in daily.items():
        monday = d - datetime.timedelta(days=d.weekday())
        wk[monday] = max(wk[monday], y)
    maxima = sorted(wk.values())
    n = len(maxima)

    def sel(pct):
        return maxima[(n * pct + 99) // 100 - 1]

    got = _rows(spark, sf_smoke, "stat_weekly_block_maxima")[0]
    assert got["n_weeks"] == n
    assert got["median_weekly_max"] == sel(50)
    assert got["p90_weekly_max"] == sel(90)
    assert got["p98_weekly_max"] == sel(98)
    assert got["record_weekly_max"] == maxima[-1]


def _capped_copurchase_edges(sf, cap=20000):
    """Top-`cap` weighted co-purchase edges by (weight DESC, x, y) — the
    shared subgraph of the rich-club / k-truss / link-prediction family."""
    li = {(o, p) for o, p in _cols(sf, "lineitem", ["l_orderkey", "l_partkey"])}
    baskets = collections.defaultdict(set)
    for o, p in li:
        baskets[o].add(p)
    w = collections.Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                w[(ps[i], ps[j])] += 1
    ranked = sorted(w, key=lambda e: (-w[e], e))
    return ranked[:cap]


def test_rich_club_matches_python(spark, sf_smoke):
    edges = _capped_copurchase_edges(sf_smoke)
    deg = collections.Counter()
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    rich = set(sorted(deg, key=lambda v: (-deg[v], v))[:50])
    m = sum(1 for x, y in edges if x in rich and y in rich)
    got = _rows(spark, sf_smoke, "graph_rich_club_coefficient")[0]
    assert got["n_rich"] == 50
    assert got["edges_among_rich"] == m
    assert got["possible"] == 1225
    assert got["rich_club_ppm"] == m * 1000000 // 1225


def test_ktruss_support_matches_bruteforce(spark, sf_smoke):
    """True k-truss edge support: |N(x) ∩ N(y)| over the capped subgraph.
    This brute-force audit is what caught the original apex-wedge
    formulation silently dropping triangles whose third vertex precedes
    the edge's lower endpoint (fixed to the 3-way projection union)."""
    edges = _capped_copurchase_edges(sf_smoke)
    adj = collections.defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    sup = {(x, y): len(adj[x] & adj[y]) for x, y in edges}
    ranked = sorted(
        ((x, y, s) for (x, y), s in sup.items() if s > 0),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:20]
    got = _rows(spark, sf_smoke, "graph_ktruss_edge_support")
    assert [(r["x"], r["y"], r["sup"], r["in_4truss"]) for r in got] == [
        (x, y, s, s >= 2) for x, y, s in ranked
    ]


def test_katz_3step_matches_python(spark, sf_smoke):
    li = {(o, p) for o, p in _cols(sf_smoke, "lineitem", ["l_orderkey", "l_partkey"])}
    baskets = collections.defaultdict(set)
    for o, p in li:
        baskets[o].add(p)
    adj = collections.defaultdict(set)
    for parts in baskets.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    p1 = {v: len(nb) for v, nb in adj.items()}
    p2 = {v: sum(p1[u] for u in nb) for v, nb in adj.items()}
    p3 = {v: sum(p2[u] for u in nb) for v, nb in adj.items()}
    ranked = sorted(
        ((v, p1[v], p2[v], p3[v], 64 * p1[v] + 8 * p2[v] + p3[v]) for v in adj),
        key=lambda r: (-r[4], r[0]),
    )[:25]
    got = _rows(spark, sf_smoke, "graph_katz_centrality_3step")
    assert [
        (r["part"], r["paths_1"], r["paths_2"], r["paths_3"], r["katz_scaled"])
        for r in got
    ] == ranked


def test_max_drawdown_matches_python(spark, sf_smoke):
    daily = _daily_revenue(sf_smoke, cents=False)
    days = sorted(daily)
    peak = dd_max = -1
    trough = None
    for d in days:
        peak = max(peak, daily[d])
        dd = peak - daily[d]
        if dd > dd_max:
            dd_max, trough = dd, d
    got = _rows(spark, sf_smoke, "trend_max_drawdown_daily")[0]
    assert got["max_drawdown"] == dd_max
    assert got["trough_day"] == trough
    assert got["peak_value"] == max(daily.values())
    assert got["n_days"] == len(days)


def test_vwap_matches_python(spark, sf_smoke):
    agg = collections.defaultdict(lambda: [0, 0])
    for pk, sd, px, qty in _cols(
        sf_smoke, "lineitem", ["l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"]
    ):
        if pk < 20:
            a = agg[(pk, sd.year * 12 + sd.month)]
            a[0] += _r(float(px) * 100)
            a[1] += _r(float(qty))
    got = _rows(spark, sf_smoke, "li_vwap_part_month")
    assert len(got) == len(agg)
    for r in got:
        vc, q = agg[(r["l_partkey"], r["mi"])]
        assert (r["value_cents"], r["qty"]) == (vc, q)
        assert r["vwap"] == vc / q / 100.0


def test_rolling28_anomaly_matches_python(spark, sf_smoke):
    import datetime

    daily = _daily_revenue(sf_smoke, cents=False)
    days = sorted(daily)
    scored = []
    for i in range(28, len(days)):
        win = [daily[d] for d in days[i - 28 : i]]
        s, q, x = sum(win), sum(v * v for v in win), daily[days[i]]
        dev = 28 * x - s
        score = dev * dev - 9 * (28 * q - s * s)
        scored.append((days[i], x, score, dev * dev > 9 * (28 * q - s * s)))
    top = sorted(scored, key=lambda r: (-r[2], r[0]))[:10]
    got = _rows(spark, sf_smoke, "trend_rolling28_anomaly_topdays")
    norm = [
        (
            r["day"].date() if isinstance(r["day"], datetime.datetime) else r["day"],
            r["x"],
            r["score"],
            r["is_anomaly"],
        )
        for r in got
    ]
    assert norm == top


def _events_ns(sf, cols):
    """Events with timestamps as int64 MICROSECONDS (the arrow-side view
    of the nanos parquet; Spark's cast-to-long seconds == us // 1e6)."""
    t = pq.read_table(f"{sf}/events.parquet", columns=cols)
    out = []
    for c in cols:
        col = t[c]
        if str(col.type).startswith("timestamp"):
            col = col.cast("timestamp[us]").cast("int64")
        out.append(col.to_pylist())
    return list(zip(*out))


def test_concurrent_sessions_peak_matches_python(spark, sf_smoke):
    import datetime

    byu = collections.defaultdict(list)
    for uid, ns in _events_ns(sf_smoke, ["user_id", "ts"]):
        byu[uid].append(ns)
    per_minute = collections.Counter()
    for tss in byu.values():
        tss.sort()
        start = prev = tss[0]
        spans = []
        for us in tss[1:]:
            if us - prev >= 600_000_000:
                spans.append((start, prev))
                start = us
            prev = us
        spans.append((start, prev))
        for s0, s1 in spans:
            m0 = (s0 // 1_000_000) // 60
            m1 = (s1 // 1_000_000) // 60
            for m in range(m0, m1 + 1):
                per_minute[m] += 1
    daily = collections.defaultdict(lambda: [0, 0])
    for m, c in per_minute.items():
        day = datetime.datetime.fromtimestamp(
            (m // 1440) * 86400, tz=datetime.timezone.utc
        ).date()
        daily[day][0] = max(daily[day][0], c)
        daily[day][1] += 1
    got = _rows(spark, sf_smoke, "ev_concurrent_sessions_peak")
    assert len(got) == len(daily)
    for r in got:
        peak, active = daily[r["day"]]
        assert (r["peak_concurrency"], r["active_minutes"]) == (peak, active)


def test_error_streak_matches_python(spark, sf_smoke):
    byu = collections.defaultdict(list)
    for uid, ns, eid, et in _events_ns(
        sf_smoke, ["user_id", "ts", "event_id", "event_type"]
    ):
        byu[uid].append((ns, eid, et))
    best = {}
    for uid, evs in byu.items():
        evs.sort()
        longest = cur = n_streaks = 0
        prev_err = False
        for _, _, et in evs:
            if et == "error":
                if not prev_err:
                    n_streaks += 1
                    cur = 0
                cur += 1
                longest = max(longest, cur)
                prev_err = True
            else:
                prev_err = False
        if n_streaks:
            best[uid] = (longest, n_streaks)
    top = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    got = _rows(spark, sf_smoke, "ev_longest_error_streak")
    assert [(r["user_id"], r["longest_streak"], r["n_streaks"]) for r in got] == [
        (u, ls, ns_) for u, (ls, ns_) in top
    ]


def test_jaccard_link_prediction_matches_python(spark, sf_smoke):
    edges = _capped_copurchase_edges(sf_smoke)
    eset = set(edges)
    adj = collections.defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    cand = {}
    for w, nb in adj.items():
        ns = sorted(nb)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                u, v = ns[i], ns[j]
                if (u, v) not in eset:
                    cand[(u, v)] = cand.get((u, v), 0) + 1
    rows = []
    for (u, v), common in cand.items():
        du, dv = len(adj[u]), len(adj[v])
        rows.append((u, v, common, du, dv, common * 1000000 // (du + dv - common)))
    top = sorted(rows, key=lambda r: (-r[5], r[0], r[1]))[:20]
    got = _rows(spark, sf_smoke, "graph_jaccard_link_prediction")
    assert [
        (r["u"], r["v"], r["common"], r["deg_u"], r["deg_v"], r["jaccard_ppm"])
        for r in got
    ] == top


def _fixed_embeddings(sf, mod=None):
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "label", "embedding"])
    out = {}
    labels = {}
    for vid, lab, emb in zip(
        t["vec_id"].to_pylist(), t["label"].to_pylist(), t["embedding"].to_pylist()
    ):
        if mod is None or vid % mod == 0:
            out[vid] = [_r(float(e) * 1000000) for e in emb]
            labels[vid] = lab
    return out, labels


def test_knn_reciprocity_matches_python(spark, sf_smoke):
    vecs, labels = _fixed_embeddings(sf_smoke, mod=10)
    ids = sorted(vecs)
    edges = set()
    for src in ids:
        d2 = sorted(
            (sum((a - b) * (a - b) for a, b in zip(vecs[src], vecs[dst])), dst)
            for dst in ids
            if dst != src
        )[:5]
        for _, dst in d2:
            edges.add((src, dst))
    stats = collections.defaultdict(lambda: [set(), 0, 0])
    for src, dst in edges:
        st = stats[labels[src]]
        st[0].add(src)
        st[1] += 1
        st[2] += (dst, src) in edges
    got = _rows(spark, sf_smoke, "emb_knn_graph_reciprocity")
    assert len(got) == len(stats)
    for r in got:
        nodes, ne, nm = stats[r["label"]]
        assert (r["n_nodes"], r["n_edges"], r["n_mutual"]) == (len(nodes), ne, nm)
        assert r["reciprocity"] == nm / ne


def test_trend_decomposition_matches_python(spark, sf_smoke):
    monthly = collections.defaultdict(int)
    for ts, price in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        monthly[ts.year * 12 + ts.month] += _r(float(price))
    mis = sorted(monthly)
    y = [monthly[m] for m in mis]
    rows = []
    for i in range(6, len(mis) - 6):
        t13 = sum(y[i - 6 : i + 7])
        rows.append((mis[i], mis[i] % 12 or 12, y[i], t13, 13 * y[i] - t13))
    seas = collections.defaultdict(lambda: [0, 0])
    for _, moy, _, _, dev in rows:
        seas[moy][0] += dev
        seas[moy][1] += 1
    got = _rows(spark, sf_smoke, "trend_decomposition_monthly")
    assert len(got) == len(rows)
    for r, (mi, moy, yy, t13, _) in zip(got, rows):
        assert (r["mi"], r["moy"], r["y"], r["t13"]) == (mi, moy, yy, t13)
        trend = t13 / 13.0
        seasonal = seas[moy][0] / (13.0 * seas[moy][1])
        assert r["trend"] == trend
        assert math.isclose(r["seasonal"], seasonal, rel_tol=1e-12, abs_tol=1e-12)
        assert math.isclose(
            r["residual"], yy - trend - seasonal, rel_tol=1e-9, abs_tol=1e-9
        )


def test_histogram_drift_matches_python(spark, sf_smoke):
    hist = collections.defaultdict(lambda: collections.Counter())
    for ts, price in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        b = min(_r(float(price)) // 40000, 15)
        hist[ts.year * 12 + ts.month][b] += 1
    tot = {mi: sum(c.values()) for mi, c in hist.items()}
    got = _rows(spark, sf_smoke, "dq_histogram_drift_l1")
    expect = []
    for mi in sorted(hist):
        if mi - 1 in hist:
            np_, nc = tot[mi - 1], tot[mi]
            l1 = sum(
                abs(hist[mi - 1][b] * nc - hist[mi][b] * np_) for b in range(16)
            )
            expect.append((mi, np_, nc, l1 * 1000000 // (np_ * nc)))
    assert [(r["mi"], r["n_prev"], r["n_cur"], r["l1_drift_ppm"]) for r in got] == expect


def test_ab_power_mde_matches_python(spark, sf_smoke):
    import hashlib

    per_user = collections.Counter()
    users = set()
    for uid, et in _events_ns(sf_smoke, ["user_id", "event_type"]):
        users.add(uid)
        if et == "purchase":
            per_user[uid] += 1
    n_a = n_b = c_all = 0
    for uid in users:
        v = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2
        if v == 0:
            n_a += 1
        else:
            n_b += 1
        c_all += per_user[uid] >= 14
    n_all = len(users)
    p = c_all / n_all
    mde = (1.959963984540054 + 0.8416212335729143) * math.sqrt(
        p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)
    )
    got = _rows(spark, sf_smoke, "ev_ab_power_mde")[0]
    assert (got["n_a"], got["n_b"], got["c_all"], got["n_all"]) == (
        n_a, n_b, c_all, n_all,
    )
    assert math.isclose(got["mde_abs"], mde, rel_tol=1e-12)


def test_sliding_window_peak_matches_python(spark, sf_smoke):
    import datetime

    per_win = collections.Counter()
    for (us,) in _events_ns(sf_smoke, ["ts"]):
        es = us // 1_000_000
        for j in range(4):
            per_win[(es // 900) * 900 - j * 900] += 1
    daily = collections.defaultdict(list)
    for w0, c in per_win.items():
        day = datetime.datetime.fromtimestamp(
            (w0 // 86400) * 86400, tz=datetime.timezone.utc
        ).date()
        daily[day].append((c, w0))
    got = _rows(spark, sf_smoke, "ev_sliding_1h15m_peak")
    assert len(got) == len(daily)
    for r in got:
        wins = daily[r["day"]]
        peak = max(c for c, _ in wins)
        assert r["peak_events"] == peak
        assert r["peak_window_epoch"] == min(w for c, w in wins if c == peak)


def test_funnel_anyorder_matches_python(spark, sf_smoke):
    firsts = collections.defaultdict(dict)
    for uid, us, et in _events_ns(sf_smoke, ["user_id", "ts", "event_type"]):
        if et in ("view", "click", "purchase"):
            es = us // 1_000_000
            if et not in firsts[uid] or es < firsts[uid][et]:
                firsts[uid][et] = es
    hist = collections.Counter()
    for t in firsts.values():
        if len(t) == 3:
            hist[(max(t.values()) - min(t.values())) // 86400] += 1
    got = _rows(spark, sf_smoke, "ev_funnel_anyorder")
    assert [(r["span_days"], r["n_users"]) for r in got] == sorted(hist.items())


def test_group_quantiles_match_python(spark, sf_smoke):
    groups = collections.defaultdict(list)
    for pr, x in _cols(sf_smoke, "orders", ["o_orderpriority", "o_totalprice"]):
        groups[pr].append(_r(float(x)))
    got = _rows(spark, sf_smoke, "stat_group_quantiles_by_priority")
    assert len(got) == len(groups)
    for r in got:
        vals = sorted(groups[r["pr"]])
        n = len(vals)
        assert r["n_orders"] == n
        for pct, col in ((25, "p25"), (50, "p50"), (75, "p75"), (99, "p99")):
            assert r[col] == vals[(n * pct + 99) // 100 - 1]
        assert r["vmax"] == vals[-1]


def test_pareto_share_matches_python(spark, sf_smoke):
    rev = collections.defaultdict(int)
    for pk, px in _cols(sf_smoke, "lineitem", ["l_partkey", "l_extendedprice"]):
        rev[pk] += _r(float(px) * 100)
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(rev.values())
    cum = k80 = k50 = 0
    for rk, (_, rv) in enumerate(ranked, 1):
        cum += rv
        if not k80 and cum * 5 >= total * 4:
            k80 = rk
        if not k50 and cum * 2 >= total:
            k50 = rk
    got = _rows(spark, sf_smoke, "li_pareto_cum_share")[0]
    assert got["n_parts"] == len(ranked)
    assert got["total_cents"] == total
    assert (got["k80"], got["k50"]) == (k80, k50)
    assert got["k80_share_ppm"] == k80 * 1000000 // len(ranked)


def test_hist2d_matches_python(spark, sf_smoke):
    cells = collections.defaultdict(lambda: [0, 0])
    for q, px, disc in _cols(
        sf_smoke, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"]
    ):
        cell = cells[(min(_r(float(q)) // 10, 4), min(_r(float(px)) // 20000, 4))]
        cell[0] += 1
        cell[1] += _r(float(disc) * 100)
    got = _rows(spark, sf_smoke, "agg_hist2d_qty_price")
    assert [(r["qty_bin"], r["price_bin"], r["n"], r["discount_pct_sum"]) for r in got] == [
        (qb, pb, n, d) for (qb, pb), (n, d) in sorted(cells.items())
    ]


def test_stopword_coverage_matches_python(spark, sf_smoke):
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for lang, text in _cols(sf_smoke, "documents", ["lang", "text"]):
        toks = text.split(" ")
        n_stop = sum(1 for t in toks if t in ("a", "the"))
        a = agg[lang]
        a[0] += len(toks)
        a[1] += n_stop
        a[2] += n_stop == 0
    got = _rows(spark, sf_smoke, "docs_stopword_coverage_by_lang")
    assert len(got) == len(agg)
    for r in got:
        nt, ns_, nz = agg[r["lang"]]
        assert (r["n_tokens"], r["n_stopwords"]) == (nt, ns_)
        assert r["stop_ppm"] == ns_ * 1000000 // nt
        assert r["n_docs_no_stopwords"] == nz


def test_ivf_cell_purity_matches_python(spark, sf_smoke):
    vecs, labels = _fixed_embeddings(sf_smoke)
    cents = {c: vecs[c] for c in range(8)}
    per_cell = collections.defaultdict(collections.Counter)
    for vid, x in vecs.items():
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(x, cents[c])), c) for c in cents
        )[1]
        per_cell[best][labels[vid]] += 1
    got = _rows(spark, sf_smoke, "emb_ivf_cell_purity")
    assert len(got) == len(per_cell)
    for r in got:
        cnt = per_cell[r["cell"]]
        n, top = sum(cnt.values()), max(cnt.values())
        assert (r["n_members"], r["top_label_count"]) == (n, top)
        assert r["purity_ppm"] == top * 1000000 // n


def test_simplified_silhouette_matches_python(spark, sf_smoke):
    vecs, labels = _fixed_embeddings(sf_smoke)
    dims = len(next(iter(vecs.values())))
    sums = collections.defaultdict(lambda: [0] * dims)
    counts = collections.Counter()
    for vid, x in vecs.items():
        counts[labels[vid]] += 1
        s = sums[labels[vid]]
        for i, v in enumerate(x):
            s[i] += v
    cents = {
        lab: [_r(s[i] / counts[lab]) for i in range(dims)] for lab, s in sums.items()
    }
    agg = collections.defaultdict(lambda: [0, 0])
    for vid, x in vecs.items():
        lab = labels[vid]
        d2 = {
            cl: sum((a - b) * (a - b) for a, b in zip(x, m))
            for cl, m in cents.items()
        }
        sa = math.sqrt(d2[lab])
        sb = math.sqrt(min(v for cl, v in d2.items() if cl != lab))
        agg[lab][0] += 1
        if max(sa, sb) != 0.0:
            agg[lab][1] += _r((sb - sa) / max(sa, sb) * 1000000)
    got = _rows(spark, sf_smoke, "emb_simplified_silhouette")
    assert len(got) == len(agg)
    for r in got:
        n, ssum = agg[r["label"]]
        assert (r["n"], r["s_micro_sum"]) == (n, ssum)
        assert r["mean_silhouette"] == ssum / (1000000.0 * n)


def test_prefix_dim_recall_matches_python(spark, sf_smoke):
    vecs, _ = _fixed_embeddings(sf_smoke)
    got = _rows(spark, sf_smoke, "emb_prefix_dim_recall")
    assert len(got) == 10
    for r in got:
        q = r["query_id"]
        full, prefix = [], []
        for vid, x in vecs.items():
            if vid == q:
                continue
            df_ = sum((a - b) * (a - b) for a, b in zip(x, vecs[q]))
            dp = sum((a - b) * (a - b) for a, b in zip(x[:16], vecs[q][:16]))
            full.append((df_, vid))
            prefix.append((dp, vid))
        top_full = {v for _, v in sorted(full)[:5]}
        top_prefix = {v for _, v in sorted(prefix)[:5]}
        hits = len(top_full & top_prefix)
        assert (r["prefix_hits"], r["k"]) == (hits, 5)
        assert r["prefix_recall"] == hits / 5


def test_user_lifecycle_matches_python(spark, sf_smoke):
    import datetime

    uw = collections.defaultdict(set)
    for uid, us in _events_ns(sf_smoke, ["user_id", "ts"]):
        day = datetime.datetime.fromtimestamp(
            us // 1_000_000, tz=datetime.timezone.utc
        ).date()
        uw[uid].add(day - datetime.timedelta(days=day.weekday()))
    weekly = collections.defaultdict(lambda: [0, 0, 0, 0])  # active/new/ret/res
    for wks in uw.values():
        prev = None
        for wk in sorted(wks):
            w = weekly[wk]
            w[0] += 1
            if prev is None:
                w[1] += 1
            elif (wk - prev).days == 7:
                w[2] += 1
            else:
                w[3] += 1
            prev = wk
    got = _rows(spark, sf_smoke, "ev_user_lifecycle_weekly")
    assert [r["wk"] for r in got] == sorted(weekly)
    prev_active = 0
    for r in got:
        act, new, ret, res = weekly[r["wk"]]
        assert (r["n_active"], r["n_new"], r["n_retained"], r["n_resurrected"]) == (
            act, new, ret, res,
        )
        assert r["n_churned_from_prev"] == prev_active - ret
        prev_active = act


def test_block_dedup_matches_python(spark, sf_smoke):
    blocks = []
    for src, text in _cols(sf_smoke, "documents", ["source", "text"]):
        tk = text.split(" ")
        for b in range(len(tk) // 8):
            blocks.append((src, " ".join(tk[b * 8 : b * 8 + 8])))
    freq = collections.Counter(blk for _, blk in blocks)
    agg = collections.defaultdict(lambda: [0, 0])
    for src, blk in blocks:
        a = agg[src]
        a[0] += 1
        a[1] += freq[blk] > 1
    got = _rows(spark, sf_smoke, "docs_block_dedup_by_source")
    assert len(got) == len(agg)
    for r in got:
        nb, nd = agg[r["source"]]
        assert (r["n_blocks"], r["n_dup_blocks"]) == (nb, nd)
        assert r["dup_ppm"] == nd * 1000000 // nb


def test_weekly_dft_power_matches_python(spark, sf_smoke):
    import datetime

    from bigdata_etl_elt_dashboard_spark.plans.wave6 import _DFT_COS, _DFT_SIN

    daily = _daily_revenue(sf_smoke, cents=False)
    epoch = datetime.date(1970, 1, 1)
    n = len(daily)
    s = c = si = wc = ws = 0
    for d, y in daily.items():
        k = (d - epoch).days % 7
        s += y
        c += y * _DFT_COS[k]
        si += y * _DFT_SIN[k]
        wc += _DFT_COS[k]
        ws += _DFT_SIN[k]
    mean = s / n
    cc = c / 1000000.0 - mean * (wc / 1000000.0)
    sc = si / 1000000.0 - mean * (ws / 1000000.0)
    got = _rows(spark, sf_smoke, "stat_weekly_dft_power")[0]
    assert (got["n_days"], got["c_micro"], got["s_micro"]) == (n, c, si)
    assert math.isclose(got["weekly_power"], cc * cc + sc * sc, rel_tol=1e-12)
    # sanity: the synthetic series should carry SOME weekly structure or
    # none — either way the power is finite and non-negative
    assert got["weekly_power"] >= 0.0


# ---------------------------------------------------------------------------
# Batch 5: the round-5 gate window's formula-heavy members (these hold this
# round's driver rows — a shared misconception here would gate green, so the
# third implementation matters most exactly here).


def test_bootstrap_ci_matches_python(spark, sf_smoke):
    import hashlib

    daily = _daily_revenue(sf_smoke, cents=True)
    c = [daily[d] for d in sorted(daily)]
    n = len(c)
    reps = []
    for r in range(100):
        s = 0
        for j in range(n):
            h = hashlib.md5(f"{r}_{j}".encode()).hexdigest()[:15]
            s += c[int(h, 16) % n]
        reps.append((s, r))
    ranked = sorted(reps)
    got = _rows(spark, sf_smoke, "stat_bootstrap_ci_daily_revenue")[0]
    assert (got["n_days"], got["n_reps"]) == (n, 100)
    assert got["obs_sum_cents"] == sum(c)
    assert got["lo_sum_cents"] == ranked[2][0]
    assert got["hi_sum_cents"] == ranked[97][0]
    assert got["lo_daily_mean"] == ranked[2][0] / n / 100.0
    assert got["hi_daily_mean"] == ranked[97][0] / n / 100.0


def test_markov_3step_matches_python(spark, sf_smoke):
    byu = collections.defaultdict(list)
    for uid, us, eid, et in _events_ns(
        sf_smoke, ["user_id", "ts", "event_id", "event_type"]
    ):
        byu[uid].append((us, eid, et))
    pairs = collections.Counter()
    for evs in byu.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    n_src = collections.Counter()
    for (a, _), cnt in pairs.items():
        n_src[a] += cnt
    m = {s: 1000000000 // len(n_src) for s in n_src}
    for _ in range(3):
        nxt = collections.defaultdict(int)
        for (a, b), cnt in pairs.items():
            if a in m:
                nxt[b] += (m[a] * cnt) // n_src[a]
        m = dict(nxt)
    got = _rows(spark, sf_smoke, "ev_markov_3step_mass")
    assert {(r["event_type"], r["mass_units"]) for r in got} == set(m.items())
    for r in got:
        assert r["mass_share"] == m[r["event_type"]] / 1000000000.0


def test_poisson_dispersion_matches_python(spark, sf_smoke):
    daily = collections.Counter()
    for (ts,) in _cols(sf_smoke, "orders", ["o_orderdate"]):
        daily[ts.date()] += 1
    k = list(daily.values())
    n, sk, skk = len(k), sum(k), sum(v * v for v in k)
    mean = sk / n
    var = (n * skk - sk * sk) / n / (n - 1)
    got = _rows(spark, sf_smoke, "stat_poisson_dispersion_daily_orders")[0]
    assert (got["n_days"], got["n_orders"]) == (n, sk)
    assert got["mean_per_day"] == mean
    assert got["var_per_day"] == var
    assert got["dispersion_index"] == var / mean


def _session_spans_us(sf):
    byu = collections.defaultdict(list)
    for uid, us in _events_ns(sf, ["user_id", "ts"]):
        byu[uid].append(us)
    spans = []
    for tss in byu.values():
        tss.sort()
        start = prev = tss[0]
        for us in tss[1:]:
            if us - prev >= 600_000_000:
                spans.append((start, prev))
                start = us
            prev = us
        spans.append((start, prev))
    return spans


def test_session_duration_percentiles_match_python(spark, sf_smoke):
    durs = sorted(
        s1 // 1_000_000 - s0 // 1_000_000 for s0, s1 in _session_spans_us(sf_smoke)
    )
    n = len(durs)
    got = _rows(spark, sf_smoke, "ev_session_duration_percentiles")[0]
    assert got["n_sessions"] == n
    for pct, col in ((50, "p50_s"), (90, "p90_s"), (99, "p99_s")):
        assert got[col] == durs[(n * pct + 99) // 100 - 1]
    assert got["max_s"] == durs[-1]


def test_stickiness_dau_mau_matches_python(spark, sf_smoke):
    import datetime

    dau = collections.defaultdict(set)
    mau = collections.defaultdict(set)
    for uid, us in _events_ns(sf_smoke, ["user_id", "ts"]):
        day = datetime.datetime.fromtimestamp(
            us // 1_000_000, tz=datetime.timezone.utc
        ).date()
        dau[day].add(uid)
        mau[(day.year, day.month)].add(uid)
    got = _rows(spark, sf_smoke, "ev_stickiness_dau_mau")
    assert len(got) == len(dau)
    for r in got:
        day = datetime.date.fromisoformat(r["day"])
        d, m = len(dau[day]), len(mau[(day.year, day.month)])
        assert (r["dau"], r["mau"]) == (d, m)
        assert r["stickiness"] == d / m


def test_seasonal_index_matches_python(spark, sf_smoke):
    monthly = collections.defaultdict(int)
    for ts, price in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        monthly[(ts.year, ts.month)] += _r(float(price) * 100)
    g = collections.defaultdict(lambda: [0, 0])
    for (_, moy), cents in monthly.items():
        g[moy][0] += 1
        g[moy][1] += cents
    tot_n = sum(v[0] for v in g.values())
    tot_s = sum(v[1] for v in g.values())
    got = _rows(spark, sf_smoke, "trend_seasonal_index_monthly")
    assert [r["moy"] for r in got] == sorted(g)
    for r in got:
        nm, sc = g[r["moy"]]
        assert (r["n_months"], r["sum_cents"]) == (nm, sc)
        assert r["mean_revenue"] == sc / nm / 100.0
        assert r["seasonal_ratio"] == (sc * float(tot_n)) / (float(tot_s) * nm)


def test_ma3_backtest_matches_python(spark, sf_smoke):
    monthly = collections.defaultdict(int)
    for ts, price in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        monthly[(ts.year, ts.month)] += _r(float(price) * 100)
    c = [monthly[m] for m in sorted(monthly)]
    n_sc = e3 = e1 = 0
    for i in range(3, len(c)):
        n_sc += 1
        e3 += abs(3 * c[i] - sum(c[i - 3 : i]))
        e1 += abs(c[i] - c[i - 1])
    got = _rows(spark, sf_smoke, "trend_backtest_ma3_mae")[0]
    assert (got["n_scored"], got["sum_abs_err3"], got["sum_abs_err_naive"]) == (
        n_sc, e3, e1,
    )
    assert got["mae_dollars"] == e3 / (3.0 * n_sc) / 100.0
    assert got["mase"] == e3 / (3.0 * e1)


def test_srm_check_matches_python(spark, sf_smoke):
    import hashlib

    users = {uid for uid, in _events_ns(sf_smoke, ["user_id"])}
    n_a = n_b = 0
    for uid in users:
        if ord(hashlib.md5(str(uid).encode()).hexdigest()[0]) % 2 == 0:
            n_a += 1
        else:
            n_b += 1
    chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
    got = _rows(spark, sf_smoke, "ev_ab_srm_check")[0]
    assert (got["n_a"], got["n_b"], got["n_users"]) == (n_a, n_b, n_a + n_b)
    assert got["chi2"] == chi2
    assert got["srm_flag"] == (chi2 > 3.841)


def test_cohens_d_matches_python(spark, sf_smoke):
    xs = {"O": [], "F": []}
    for st, x in _cols(sf_smoke, "orders", ["o_orderstatus", "o_totalprice"]):
        if st in xs:
            xs[st].append(_r(float(x)))
    n1, n2 = len(xs["O"]), len(xs["F"])
    sx1, sx2 = sum(xs["O"]), sum(xs["F"])
    sxx1 = sum(v * v for v in xs["O"])
    sxx2 = sum(v * v for v in xs["F"])
    mean_diff = sx1 / n1 - sx2 / n2
    pooled = math.sqrt(
        ((n1 * sxx1 - sx1 * sx1) / n1 + (n2 * sxx2 - sx2 * sx2) / n2)
        / (n1 + n2 - 2)
    )
    d = mean_diff / pooled
    g = d * (1.0 - 3.0 / (4.0 * (n1 + n2 - 2) - 1.0))
    got = _rows(spark, sf_smoke, "stat_cohens_d_price_by_status")[0]
    assert (got["n_open"], got["n_filled"]) == (n1, n2)
    assert math.isclose(got["cohens_d"], d, rel_tol=1e-12)
    assert math.isclose(got["hedges_g"], g, rel_tol=1e-12)


def test_inter_event_gap_hist_matches_python(spark, sf_smoke):
    byu = collections.defaultdict(list)
    for uid, us, eid in _events_ns(sf_smoke, ["user_id", "ts", "event_id"]):
        byu[uid].append((us // 1_000_000, eid))
    hist = collections.Counter()
    for evs in byu.values():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            gap = b - a
            hist[0 if gap == 0 else gap.bit_length()] += 1
    total = sum(hist.values())
    got = _rows(spark, sf_smoke, "ev_inter_event_gap_hist")
    assert [(r["log2_bucket"], r["n_gaps"]) for r in got] == sorted(hist.items())
    for r in got:
        assert r["share"] == hist[r["log2_bucket"]] / total


def test_bot_rate_matches_python(spark, sf_smoke):
    byu = collections.defaultdict(list)
    for uid, us in _events_ns(sf_smoke, ["user_id", "ts"]):
        byu[uid].append(us // 1_000_000)
    n_users = len(byu)
    n_flagged = flagged_events = total_events = 0
    for tss in byu.values():
        n, span = len(tss), max(tss) - min(tss)
        total_events += n
        if n >= 50 and n * 10 > span:
            n_flagged += 1
            flagged_events += n
    got = _rows(spark, sf_smoke, "ev_bot_rate_heuristic")[0]
    assert (got["n_users"], got["n_flagged"], got["flagged_events"]) == (
        n_users, n_flagged, flagged_events,
    )
    assert got["flagged_event_share"] == flagged_events / total_events


def test_readability_matches_python(spark, sf_smoke):
    import re

    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for lang, text in _cols(sf_smoke, "documents", ["lang", "text"]):
        w = 0 if text.strip() == "" else len(re.split(r"\s+", text.strip().lower()))
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        a = agg[lang]
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
    got = _rows(spark, sf_smoke, "text_readability_by_lang")
    assert len(got) == len(agg)
    for r in got:
        nd, w, s, y = agg[r["lang"]]
        assert (r["n_docs"], r["words"], r["sentences"], r["syllables"]) == (
            nd, w, s, y,
        )
        assert r["flesch_ease"] == 206.835 - 1.015 * (w / s) - 84.6 * (y / w)


def test_bounce_rate_matches_python(spark, sf_smoke):
    import datetime

    daily = collections.defaultdict(lambda: [0, 0])
    byu = collections.defaultdict(list)
    for uid, us in _events_ns(sf_smoke, ["user_id", "ts"]):
        byu[uid].append(us)
    for tss in byu.values():
        tss.sort()
        start, cnt, prev = tss[0], 1, tss[0]
        sessions = []
        for us in tss[1:]:
            if us - prev >= 600_000_000:
                sessions.append((start, cnt))
                start, cnt = us, 0
            cnt += 1
            prev = us
        sessions.append((start, cnt))
        for s0, n in sessions:
            day = datetime.datetime.fromtimestamp(
                s0 // 1_000_000, tz=datetime.timezone.utc
            ).strftime("%Y-%m-%d")
            daily[day][0] += 1
            daily[day][1] += n == 1
    got = _rows(spark, sf_smoke, "ev_bounce_rate_daily")
    assert [r["day"] for r in got] == sorted(daily)
    for r in got:
        ns_, nb = daily[r["day"]]
        assert (r["n_sessions"], r["n_bounces"]) == (ns_, nb)
        assert r["bounce_rate"] == nb / ns_


def test_heatmap_hour_dow_matches_python(spark, sf_smoke):
    import datetime

    cells = collections.defaultdict(lambda: [0, set()])
    for uid, us in _events_ns(sf_smoke, ["user_id", "ts"]):
        dt = datetime.datetime.fromtimestamp(
            us // 1_000_000, tz=datetime.timezone.utc
        )
        c = cells[(dt.weekday() + 1, dt.hour)]
        c[0] += 1
        c[1].add(uid)
    got = _rows(spark, sf_smoke, "ev_heatmap_hour_dow")
    assert [(r["iso_dow"], r["hour"]) for r in got] == sorted(cells)
    for r in got:
        n, users = cells[(r["iso_dow"], r["hour"])]
        assert (r["n_events"], r["n_users"]) == (n, len(users))


def test_ttr_matches_python(spark, sf_smoke):
    import re

    tt = collections.defaultdict(collections.Counter)
    for src, text in _cols(sf_smoke, "documents", ["source", "text"]):
        if text.strip() == "":
            continue
        for tok in re.split(r"\s+", text.strip().lower()):
            if tok:
                tt[src][tok] += 1
    got = _rows(spark, sf_smoke, "docs_ttr_by_source")
    assert len(got) == len(tt)
    for r in got:
        cnt = tt[r["source"]]
        n_tok, n_typ = sum(cnt.values()), len(cnt)
        n_hapax = sum(1 for v in cnt.values() if v == 1)
        assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (n_tok, n_typ, n_hapax)
        assert r["ttr"] == n_typ / n_tok
        assert r["hapax_share"] == n_hapax / n_typ


def test_freshness_lag_matches_python(spark, sf_smoke):
    import datetime

    mx = {}
    mx["orders"] = max(ts.date() for ts, in _cols(sf_smoke, "orders", ["o_orderdate"]))
    mx["lineitem"] = max(
        ts.date() for ts, in _cols(sf_smoke, "lineitem", ["l_shipdate"])
    )
    mx["events"] = max(
        datetime.datetime.fromtimestamp(
            us // 1_000_000, tz=datetime.timezone.utc
        ).date()
        for (us,) in _events_ns(sf_smoke, ["ts"])
    )
    freshest = max(mx.values())
    got = _rows(spark, sf_smoke, "dq_freshness_lag")
    assert [(r["table_name"], r["max_day"], r["lag_days"]) for r in got] == [
        (t, mx[t].isoformat(), (freshest - mx[t]).days) for t in sorted(mx)
    ]


def test_degree_distribution_matches_python(spark, sf_smoke):
    edges, adj = _copurchase_py(sf_smoke)
    buckets = collections.defaultdict(lambda: [0, 10**18, 0])
    for node, nb in adj.items():
        d = len(nb)
        b = buckets[d.bit_length()]
        b[0] += 1
        b[1] = min(b[1], d)
        b[2] = max(b[2], d)
    got = _rows(spark, sf_smoke, "graph_degree_distribution")
    assert [(r["log2_bucket"], r["n_nodes"], r["min_degree"], r["max_degree"]) for r in got] == [
        (k, v[0], v[1], v[2]) for k, v in sorted(buckets.items())
    ]


def test_exact_dup_sizes_matches_python(spark, sf_smoke):
    vecs, _ = _fixed_embeddings(sf_smoke)
    groups = collections.defaultdict(list)
    for vid, x in vecs.items():
        groups[tuple(x)].append(vid)
    sizes = collections.defaultdict(lambda: [0, 0])
    for ids in groups.values():
        s = sizes[len(ids)]
        s[0] += 1
        s[1] += min(ids)
    got = _rows(spark, sf_smoke, "emb_exact_dup_sizes")
    assert [(r["group_size"], r["n_groups"], r["keeper_id_sum"]) for r in got] == [
        (k, v[0], v[1]) for k, v in sorted(sizes.items())
    ]


def test_trigram_entropy_matches_python(spark, sf_smoke):
    c = collections.defaultdict(collections.Counter)
    for lang, text in _cols(sf_smoke, "documents", ["lang", "text"]):
        if len(text) >= 3:
            low = text.lower()
            for i in range(len(low) - 2):
                c[lang][low[i : i + 3]] += 1
    got = _rows(spark, sf_smoke, "text_char_trigram_entropy_by_lang")
    assert len(got) == len(c)
    for r in got:
        cnt = c[r["lang"]]
        n = sum(cnt.values())
        sum_clogc = sum(v * _r(math.log2(v) * 1000000) for v in cnt.values())
        assert (r["n_trigrams"], r["n_distinct"]) == (n, len(cnt))
        want = (n * _r(math.log2(n) * 1000000) - sum_clogc) / (n * 1000000)
        assert r["entropy_bits"] == want


def test_token_fertility_matches_python(spark, sf_smoke):
    import re

    pat = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for lang, text in _cols(sf_smoke, "documents", ["lang", "text"]):
        a = agg[lang]
        a[0] += 1
        a[1] += 0 if text.strip() == "" else len(
            re.split(r"\s+", text.strip().lower())
        )
        a[2] += len(pat.findall(text))
    got = _rows(spark, sf_smoke, "text_token_fertility_by_lang")
    assert len(got) == len(agg)
    for r in got:
        nd, nw, nb = agg[r["lang"]]
        assert (r["n_docs"], r["n_words"], r["n_bpe_tokens"]) == (nd, nw, nb)
        assert r["fertility"] == (nb / nw if nw else None)


def _shingles3(text):
    import re

    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}


def test_contamination_by_split_matches_python(spark, sf_smoke):
    import hashlib

    docs = dict(_cols(sf_smoke, "documents", ["doc_id", "text"]))
    bench_sh = set()
    for did, text in docs.items():
        if did % 97 == 0:
            bench_sh |= _shingles3(text)
    agg = collections.defaultdict(lambda: [0, 0])
    for did, text in docs.items():
        if did % 97 == 0:
            continue
        p = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16) % 100
        split = "val" if p < 5 else "test" if p < 10 else "train"
        a = agg[split]
        a[0] += 1
        a[1] += bool(_shingles3(text) & bench_sh)
    got = _rows(spark, sf_smoke, "docs_contamination_by_split")
    assert len(got) == len(agg)
    for r in got:
        nd, nc = agg[r["split"]]
        assert (r["n_docs"], r["n_contaminated"]) == (nd, nc)
        assert r["contamination_rate"] == nc / nd


def test_packing_fill_stats_matches_python(spark, sf_smoke):
    import re

    rows = sorted(
        _cols(sf_smoke, "documents", ["doc_id", "lang", "text"]),
        key=lambda r: r[0],
    )
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])  # docs, toks, straddle, off
    for did, lang, text in rows:
        nt = 0 if text.strip() == "" else len(re.split(r"\s+", text.strip().lower()))
        a = agg[lang]
        off = a[3]
        a[0] += 1
        a[1] += nt
        if nt > 0 and off // 2048 != (off + nt - 1) // 2048:
            a[2] += 1
        a[3] += nt
    got = _rows(spark, sf_smoke, "docs_packing_fill_stats")
    assert len(got) == len(agg)
    for r in got:
        nd, tt, st, _ = agg[r["lang"]]
        packs = (tt + 2047) // 2048
        assert (r["n_docs"], r["total_tokens"], r["n_packs"], r["n_straddling"]) == (
            nd, tt, packs, st,
        )
        assert r["utilization"] == tt / (2048.0 * packs)


def test_wilson_lower_matches_python(spark, sf_smoke):
    parts = dict(_cols(sf_smoke, "part", ["p_partkey", "p_brand"]))
    agg = collections.defaultdict(lambda: [0, 0])
    for pk, rf in _cols(sf_smoke, "lineitem", ["l_partkey", "l_returnflag"]):
        a = agg[parts[pk]]
        a[0] += 1
        a[1] += rf == "R"
    got = _rows(spark, sf_smoke, "li_return_rate_wilson")
    assert [r["p_brand"] for r in got] == sorted(agg)
    z2 = 1.96 * 1.96
    for row in got:
        n, r = agg[row["p_brand"]]
        p = r / n
        wilson = (p + z2 / (2.0 * n) - 1.96 * math.sqrt(
            (p * (1.0 - p)) / n + z2 / (4.0 * n * n)
        )) / (1.0 + z2 / n)
        assert (row["n"], row["r"]) == (n, r)
        assert row["rate"] == p
        assert math.isclose(row["wilson_lower"], wilson, rel_tol=1e-12)


def test_herfindahl_matches_python(spark, sf_smoke):
    sup_nat = dict(_cols(sf_smoke, "supplier", ["s_suppkey", "s_nationkey"]))
    nat = dict(_cols(sf_smoke, "nation", ["n_nationkey", "n_name"]))
    per = collections.defaultdict(int)
    for sk, px, disc in _cols(
        sf_smoke, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"]
    ):
        per[(nat[sup_nat[sk]], sk)] += _r(float(px) * (1 - float(disc)))
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for (nation, _), u in per.items():
        a = agg[nation]
        a[0] += 1
        a[1] += u
        a[2] += u * u
    got = _rows(spark, sf_smoke, "supplier_nation_herfindahl")
    assert [r["nation"] for r in got] == sorted(agg)
    for r in got:
        ns, tu, sq = agg[r["nation"]]
        assert (r["n_suppliers"], r["total_units"], r["sum_sq_units"]) == (ns, tu, sq)
        assert r["hhi"] == sq / (float(tu) * float(tu))


def test_daily_zscore_anomaly_matches_python(spark, sf_smoke):
    import datetime

    d = collections.Counter()
    for us, et in _events_ns(sf_smoke, ["ts", "event_type"]):
        day = datetime.datetime.fromtimestamp(
            us // 1_000_000, tz=datetime.timezone.utc
        ).date()
        d[(et, day)] += 1
    m = collections.defaultdict(lambda: [0, 0, 0])
    for (et, _), n in d.items():
        mm = m[et]
        mm[0] += 1
        mm[1] += n
        mm[2] += n * n
    got = _rows(spark, sf_smoke, "stat_daily_zscore_anomaly")
    assert len(got) == len(d)
    for r in got:
        day = datetime.date.fromisoformat(r["day"])
        n = d[(r["event_type"], day)]
        nd, s, q = m[r["event_type"]]
        num, den2 = n * nd - s, nd * q - s * s
        assert r["n"] == n
        if den2 > 0:
            assert r["z"] == num / math.sqrt(den2)
        else:
            assert r["z"] is None
        assert r["is_anomaly"] == (num * num > 4 * den2)


def test_chi2_cells_match_python(spark, sf_smoke):
    obs = collections.Counter()
    for pr, st in _cols(sf_smoke, "orders", ["o_orderpriority", "o_orderstatus"]):
        obs[(pr, st)] += 1
    row_tot = collections.Counter()
    col_tot = collections.Counter()
    for (pr, st), n in obs.items():
        row_tot[pr] += n
        col_tot[st] += n
    n_all = sum(obs.values())
    got = _rows(spark, sf_smoke, "stat_chi2_priority_status")
    assert len(got) == len(obs)
    for r in got:
        o = obs[(r["priority"], r["status"])]
        rt, ct = row_tot[r["priority"]], col_tot[r["status"]]
        num = float(n_all * o - rt * ct)
        assert r["observed"] == o
        assert r["expected"] == (rt * ct) / n_all
        assert math.isclose(
            r["chi2_term"], num * num / n_all / rt / ct, rel_tol=1e-12
        )


def test_k_anonymity_matches_python(spark, sf_smoke):
    classes = collections.Counter()
    for nk, seg, bal in _cols(
        sf_smoke, "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"]
    ):
        classes[(nk, seg, math.floor(float(bal) / 1000.0))] += 1
    hist = collections.defaultdict(lambda: [0, 0])
    for size in classes.values():
        h = hist[size]
        h[0] += 1
        h[1] += size
    got = _rows(spark, sf_smoke, "dq_k_anonymity_customer")
    assert [(r["class_size"], r["n_classes"], r["n_rows"], r["at_risk"]) for r in got] == [
        (k, v[0], v[1], int(k < 5)) for k, v in sorted(hist.items())
    ]


def test_dau_wau_stickiness_matches_python(spark, sf_smoke):
    import datetime

    ud = set()
    for uid, us in _events_ns(sf_smoke, ["user_id", "ts"]):
        ud.add(
            (
                uid,
                datetime.datetime.fromtimestamp(
                    us // 1_000_000, tz=datetime.timezone.utc
                ).date(),
            )
        )
    dau = collections.defaultdict(set)
    wau = collections.defaultdict(set)
    for uid, d in ud:
        dau[d].add(uid)
        for o in range(7):
            wau[d + datetime.timedelta(days=o)].add(uid)
    got = _rows(spark, sf_smoke, "ev_dau_wau_stickiness")
    assert [r["d"] for r in got] == sorted(dau)
    for r in got:
        dn, wn = len(dau[r["d"]]), len(wau[r["d"]])
        assert (r["dau"], r["wau"]) == (dn, wn)
        assert r["stickiness"] == dn / wn


def _loglog_fit(pts):
    """Mirror the engine's op order: each exact-int moment converts to
    double BEFORE the closed-form products (sxyd*nd - sxd*syd)."""
    n = float(len(pts))
    sx = float(sum(x for x, _ in pts))
    sy = float(sum(y for _, y in pts))
    sxx = float(sum(x * x for x, _ in pts))
    sxy = float(sum(x * y for x, y in pts))
    slope = (sxy * n - sx * sy) / (sxx * n - sx * sx)
    return len(pts), slope, (sy - slope * sx) / n / 1000000.0


def test_zipf_fit_matches_python(spark, sf_smoke):
    import re

    freq = collections.Counter()
    for (text,) in _cols(sf_smoke, "documents", ["text"]):
        for tok in re.split(r"\s+", text.strip().lower()):
            freq[tok] += 1
    head = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    pts = [
        (_r(math.log2(rk) * 1000000), _r(math.log2(c) * 1000000))
        for rk, (_, c) in enumerate(head, 1)
    ]
    n, slope, intercept = _loglog_fit(pts)
    got = _rows(spark, sf_smoke, "docs_zipf_fit")[0]
    assert got["n_points"] == n
    assert got["zipf_slope"] == slope
    assert math.isclose(got["log2_c_at_rank1"], intercept, rel_tol=1e-12)


def test_heaps_fit_matches_python(spark, sf_smoke):
    import re

    pts = []
    for (text,) in _cols(sf_smoke, "documents", ["text"]):
        if text.strip() == "":
            continue
        toks = re.split(r"\s+", text.strip().lower())
        nt, ny = len(toks), len(set(toks))
        if nt > 0 and ny > 0:
            pts.append(
                (_r(math.log2(nt) * 1000000), _r(math.log2(ny) * 1000000))
            )
    n, beta, log2k = _loglog_fit(pts)
    got = _rows(spark, sf_smoke, "docs_heaps_law_fit")[0]
    assert got["n_docs"] == n
    assert got["heaps_beta"] == beta
    assert math.isclose(got["log2_k"], log2k, rel_tol=1e-12)


def _pctl(sorted_vals, p):
    """Spark `percentile` continuous interpolation."""
    idx = p * (len(sorted_vals) - 1)
    lo = int(math.floor(idx))
    hi = int(math.ceil(idx))
    if lo == hi:
        return float(sorted_vals[lo])
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * (idx - lo)


def test_ma3_revenue_matches_python(spark, sf_smoke):
    monthly = collections.defaultdict(int)
    for ts, price in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        monthly[(ts.year, ts.month)] += _r(float(price) * 100)
    months = sorted(monthly)
    c = [monthly[m] for m in months]
    got = _rows(spark, sf_smoke, "trend_ma3_revenue")
    assert len(got) == len(months)
    for i, r in enumerate(got):
        assert (r["month"].year, r["month"].month) == months[i]
        assert r["revenue"] == c[i] / 100.0
        win = c[max(i - 2, 0) : i + 1]
        assert r["ma3_revenue"] == sum(win) / 100.0 / len(win)


def test_ema12_revenue_matches_python(spark, sf_smoke):
    monthly = collections.defaultdict(int)
    for ts, price in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        monthly[(ts.year, ts.month)] += _r(float(price) * 100)
    months = sorted(monthly)
    c = [monthly[m] for m in months]
    got = _rows(spark, sf_smoke, "trend_ema12_revenue")
    assert len(got) == max(len(months) - 11, 0)
    for k, r in enumerate(got):
        i = k + 11  # 0-based index of the month (idx >= 12, 1-based)
        u = sum(
            c[i - off] * (1 if off == 11 else 1 << (10 - off)) for off in range(12)
        )
        assert (r["month"].year, r["month"].month) == months[i]
        assert r["revenue"] == c[i] / 100.0
        assert r["ema12_revenue"] == u / 2048.0 / 100.0


def test_weighted_avg_unit_price_matches_python(spark, sf_smoke):
    ptype = dict(_cols(sf_smoke, "part", ["p_partkey", "p_type"]))
    agg = collections.defaultdict(lambda: [0, 0])
    for pk, px, q in _cols(
        sf_smoke, "lineitem", ["l_partkey", "l_extendedprice", "l_quantity"]
    ):
        a = agg[ptype[pk]]
        a[0] += _r(float(px) * 100)
        a[1] += int(float(q))
    got = _rows(spark, sf_smoke, "agg_weighted_avg_unit_price")
    assert [r["p_type"] for r in got] == sorted(agg)
    for r in got:
        cents, units = agg[r["p_type"]]
        assert r["total_units"] == units
        assert r["weighted_avg_unit_price"] == cents / 100.0 / units


def test_median_price_per_status_matches_python(spark, sf_smoke):
    groups = collections.defaultdict(list)
    for st, x in _cols(sf_smoke, "orders", ["o_orderstatus", "o_totalprice"]):
        groups[st].append(_r(float(x) * 100))
    got = _rows(spark, sf_smoke, "agg_median_price_per_status")
    assert [r["o_orderstatus"] for r in got] == sorted(groups)
    for r in got:
        sv = sorted(groups[r["o_orderstatus"]])
        assert math.isclose(r["median_price"], _pctl(sv, 0.5) / 100.0, rel_tol=1e-12)
        assert math.isclose(r["p90_price"], _pctl(sv, 0.9) / 100.0, rel_tol=1e-12)


def test_purchase_intervals_match_python(spark, sf_smoke):
    byu = collections.defaultdict(list)
    for uid, us, eid, et in _events_ns(
        sf_smoke, ["user_id", "ts", "event_id", "event_type"]
    ):
        if et == "purchase":
            byu[uid].append((us, eid))
    gaps = []
    for evs in byu.values():
        evs.sort()
        gaps.extend(b - a for (a, _), (b, _) in zip(evs, evs[1:]))
    sv = sorted(gaps)
    got = _rows(spark, sf_smoke, "ev_purchase_intervals")[0]
    assert got["n_gaps"] == len(gaps)
    assert math.isclose(got["median_gap_s"], _pctl(sv, 0.5) / 1e6, rel_tol=1e-12)
    assert math.isclose(got["p90_gap_s"], _pctl(sv, 0.9) / 1e6, rel_tol=1e-12)
    assert got["min_gap_s"] == sv[0] / 1e6
    assert got["max_gap_s"] == sv[-1] / 1e6


def test_new_vs_returning_matches_python(spark, sf_smoke):
    import datetime

    ud = collections.defaultdict(set)
    for uid, us in _events_ns(sf_smoke, ["user_id", "ts"]):
        day = datetime.datetime.fromtimestamp(
            us // 1_000_000, tz=datetime.timezone.utc
        ).date()
        ud[uid].add(day)
    daily = collections.defaultdict(lambda: [0, 0, 0])
    for uid, days in ud.items():
        first = min(days)
        for d in days:
            a = daily[d]
            a[0] += 1
            a[1] += d == first
            a[2] += d > first
    got = _rows(spark, sf_smoke, "ev_new_vs_returning_daily")
    assert [r["d"] for r in got] == sorted(daily)
    for r in got:
        act, new, ret = daily[r["d"]]
        assert (r["active_users"], r["new_users"], r["returning_users"]) == (
            act, new, ret,
        )


def test_daily_volume_anomaly_matches_python(spark, sf_smoke):
    import datetime

    daily = collections.Counter()
    for us, et in _events_ns(sf_smoke, ["ts", "event_type"]):
        day = datetime.datetime.fromtimestamp(
            us // 1_000_000, tz=datetime.timezone.utc
        ).date()
        daily[(et, day)] += 1
    typ = collections.defaultdict(lambda: [0, 0])
    for (et, _), n in daily.items():
        typ[et][0] += n
        typ[et][1] += 1
    got = _rows(spark, sf_smoke, "ev_daily_volume_anomaly")
    assert len(got) == len(daily)
    for r in got:
        n = daily[(r["event_type"], r["day"])]
        total, n_days = typ[r["event_type"]]
        assert r["n"] == n
        assert r["is_spike"] == (n * n_days > 2 * total)


def test_l2_norm_stats_match_python(spark, sf_smoke):
    t = pq.read_table(
        f"{sf_smoke}/embeddings.parquet", columns=["label", "embedding"]
    )
    agg = collections.defaultdict(list)
    for lab, emb in zip(t["label"].to_pylist(), t["embedding"].to_pylist()):
        sq = sum(_r(float(x) * float(x) * 1e9) for x in emb)
        agg[lab].append(_r(math.sqrt(sq / 1e9) * 1e6))
    got = _rows(spark, sf_smoke, "emb_l2_norm_stats")
    assert [r["label"] for r in got] == sorted(agg)
    for r in got:
        nus = agg[r["label"]]
        assert r["n_vecs"] == len(nus)
        assert r["min_norm"] == min(nus) / 1e6
        assert r["max_norm"] == max(nus) / 1e6
        assert r["mean_norm"] == sum(nus) / (len(nus) * 1e6)


def test_quantize_error_matches_python(spark, sf_smoke):
    t = pq.read_table(
        f"{sf_smoke}/embeddings.parquet", columns=["label", "embedding"]
    )
    rows = list(zip(t["label"].to_pylist(), t["embedding"].to_pylist()))
    dims = len(rows[0][1])
    mn = [min(float(e[i]) for _, e in rows) for i in range(dims)]
    mx = [max(float(e[i]) for _, e in rows) for i in range(dims)]
    agg = collections.defaultdict(lambda: [0, 0.0, 0])
    for lab, emb in rows:
        for i in range(dims):
            x = float(emb[i])
            if mx[i] > mn[i]:
                qv = min(
                    max(math.floor((x - mn[i]) * 255.0 / (mx[i] - mn[i]) + 0.5), 0),
                    255,
                )
            else:
                qv = 0
            err = abs(x - (mn[i] + qv * (mx[i] - mn[i]) / 255.0))
            a = agg[lab]
            a[0] += 1
            a[1] = max(a[1], err)
            a[2] += math.floor(err * 1e9)
    got = _rows(spark, sf_smoke, "emb_quantize_error")
    assert [r["label"] for r in got] == sorted(agg)
    for r in got:
        n, mxe, sq = agg[r["label"]]
        assert r["n_vals"] == n
        assert math.isclose(r["max_err"], mxe, rel_tol=1e-9, abs_tol=1e-15)
        assert math.isclose(r["mean_err_q"], sq / (1e9 * n), rel_tol=1e-9)


def test_supplier_pareto_cumshare_matches_python(spark, sf_smoke):
    names = dict(_cols(sf_smoke, "supplier", ["s_suppkey", "s_name"]))
    per = collections.defaultdict(int)
    for sk, px, disc in _cols(
        sf_smoke, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"]
    ):
        per[sk] += _r(float(px) * (1.0 - float(disc)) * 10000)
    ranked = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(per.values())
    cum = 0
    expect = []
    for sk, u in ranked:
        cum += u
        expect.append(
            (sk, names[sk], u / 10000.0, cum / total, cum * 5 <= total * 4)
        )
    got = _rows(spark, sf_smoke, "supplier_pareto_cumshare")
    assert [
        (r["s_suppkey"], r["s_name"], r["revenue"], r["cum_share"], r["in_top80"])
        for r in got
    ] == expect


def test_len_percentiles_match_python(spark, sf_smoke):
    groups = collections.defaultdict(list)
    for lang, nc in _cols(sf_smoke, "documents", ["lang", "n_chars"]):
        groups[lang].append(nc)
    got = _rows(spark, sf_smoke, "text_len_percentiles_by_lang")
    assert [r["lang"] for r in got] == sorted(groups)
    for r in got:
        sv = sorted(groups[r["lang"]])
        assert r["n_docs"] == len(sv)
        for p, col in ((0.25, "p25_chars"), (0.5, "p50_chars"), (0.95, "p95_chars")):
            assert math.isclose(r[col], _pctl(sv, p), rel_tol=1e-12)
        assert r["max_chars"] == sv[-1]


def test_quality_by_lang_source_matches_python(spark, sf_smoke):
    import re

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for lang, src, text, nc in _cols(
        sf_smoke, "documents", ["lang", "source", "text", "n_chars"]
    ):
        a = agg[(lang, src)]
        a[0] += 1
        a[1] += nc >= 100
        a[2] += text.strip() != "" and len(
            re.split(r"\s+", text.strip().lower())
        ) >= 5
    got = _rows(spark, sf_smoke, "docs_quality_by_lang_source")
    assert [(r["lang"], r["source"]) for r in got] == sorted(agg)
    for r in got:
        nd, le, tr = agg[(r["lang"], r["source"])]
        assert (r["n_docs"], r["long_enough"], r["token_rich"]) == (nd, le, tr)


def test_kmv_matches_python(spark, sf_smoke):
    import hashlib

    keys = {k for k, in _cols(sf_smoke, "orders", ["o_custkey"])}
    hs = sorted(
        int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) for k in keys
    )
    k_used = min(256, len(hs))
    kth = hs[k_used - 1]
    est = (k_used - 1) * 4294967296.0 / kth
    got = _rows(spark, sf_smoke, "stat_kmv_distinct_custkeys")[0]
    assert (got["k_used"], got["kth_min_hash"], got["true_distinct"]) == (
        k_used, kth, len(keys),
    )
    assert math.isclose(got["est_distinct"], est, rel_tol=1e-12)
    assert math.isclose(got["rel_err"], est / len(keys) - 1.0, rel_tol=1e-9)


def test_countmin_matches_python(spark, sf_smoke):
    import hashlib

    counts = collections.Counter(
        k for k, in _cols(sf_smoke, "orders", ["o_custkey"])
    )
    counters = collections.Counter()
    bucket = {}
    for k, n in counts.items():
        for r in range(3):
            b = int(hashlib.md5(f"{r}:{k}".encode()).hexdigest()[:8], 16) % 256
            bucket[(r, k)] = b
            counters[(r, b)] += n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = []
    for k, n in top:
        est = min(counters[(r, bucket[(r, k)])] for r in range(3))
        expect.append((k, n, est, est - n))
    got = _rows(spark, sf_smoke, "stat_countmin_heavy_hitters")
    assert [
        (r["o_custkey"], r["true_n"], r["cm_estimate"], r["overestimate"])
        for r in got
    ] == expect


def test_oov_rate_matches_python(spark, sf_smoke):
    import re

    toks = []
    for src, text in _cols(sf_smoke, "documents", ["source", "text"]):
        for tok in re.split(r"\s+", text.strip().lower()):
            toks.append((src, tok))
    freq = collections.Counter(t for _, t in toks)
    vocab = {
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    }
    agg = collections.defaultdict(lambda: [0, 0])
    for src, t in toks:
        a = agg[src]
        a[0] += 1
        a[1] += t not in vocab
    got = _rows(spark, sf_smoke, "docs_oov_rate")
    assert [r["source"] for r in got] == sorted(agg)
    for r in got:
        nt, no = agg[r["source"]]
        assert (r["n_tokens"], r["n_oov"]) == (nt, no)
        assert r["oov_rate"] == no / nt


def test_out_of_order_profile_matches_python(spark, sf_smoke):
    byu = collections.defaultdict(list)
    for uid, us, eid, et in _events_ns(
        sf_smoke, ["user_id", "ts", "event_id", "event_type"]
    ):
        byu[uid].append((eid, us, et))
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for evs in byu.values():
        evs.sort()
        hwm = None
        for _, us, et in evs:
            a = agg[et]
            a[0] += 1
            if hwm is not None:
                if us < hwm:
                    a[1] += 1
                    a[3] = max(a[3], hwm - us)
                if hwm - us > 1800 * 1000000:
                    a[2] += 1
            hwm = us if hwm is None else max(hwm, us)
    got = _rows(spark, sf_smoke, "ev_out_of_order_profile")
    assert [r["event_type"] for r in got] == sorted(agg)
    for r in got:
        n, ooo, late30, mx = agg[r["event_type"]]
        assert (
            r["n_events"], r["n_out_of_order"], r["n_late_30m"], r["max_lateness_us"]
        ) == (n, ooo, late30, mx)


def test_markov_transitions_match_python(spark, sf_smoke):
    byu = collections.defaultdict(list)
    for uid, us, eid, et in _events_ns(
        sf_smoke, ["user_id", "ts", "event_id", "event_type"]
    ):
        byu[uid].append((us, eid, et))
    pairs = collections.Counter()
    for evs in byu.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    n_src = collections.Counter()
    for (a, _), n in pairs.items():
        n_src[a] += n
    got = _rows(spark, sf_smoke, "stat_markov_transitions")
    assert [(r["src"], r["dst"]) for r in got] == sorted(pairs)
    for r in got:
        n = pairs[(r["src"], r["dst"])]
        assert r["n"] == n
        assert r["p"] == n / n_src[r["src"]]


def _spread16_py(v):
    v &= 65535
    v = (v | (v << 8)) & 16711935
    v = (v | (v << 4)) & 252645135
    v = (v | (v << 2)) & 858993459
    v = (v | (v << 1)) & 1431655765
    return v


def test_zorder_file_skipping_matches_python(spark, sf_smoke):
    import datetime

    epoch = datetime.date(1970, 1, 1)
    rows = []
    for ok, ck, ts in _cols(
        sf_smoke, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ):
        c = ck & 65535
        d = (ts.date() - epoch).days & 65535
        rows.append((ok, c, d, _spread16_py(c) | (_spread16_py(d) << 1)))
    # sanity: interleave is invertible on the sample
    assert len({z for *_, z in rows}) == len({(c, d) for _, c, d, _ in rows})

    def widths(order_key):
        ranked = sorted(rows, key=order_key)
        n = len(ranked)
        sums = [0, 0]
        # NTILE: first n % k buckets get ceil(n/k), rest floor(n/k)
        k = 32
        big, small = divmod(n, k)
        pos = 0
        for f in range(k):
            size = big + (1 if f < small else 0)
            chunk = ranked[pos : pos + size]
            pos += size
            cks = [c for _, c, _, _ in chunk]
            dis = [d for _, _, d, _ in chunk]
            sums[0] += max(cks) - min(cks) + 1
            sums[1] += max(dis) - min(dis) + 1
        return sums

    zw = widths(lambda r: (r[3], r[0]))
    dw = widths(lambda r: (r[2], r[0]))
    got = {r["layout"]: r for r in _rows(spark, sf_smoke, "scale_zorder_file_skipping")}
    assert got["zorder"]["sum_ck_width"] == zw[0]
    assert got["zorder"]["sum_di_width"] == zw[1]
    assert got["date_sorted"]["sum_ck_width"] == dw[0]
    assert got["date_sorted"]["sum_di_width"] == dw[1]
    for name, w in (("zorder", zw), ("date_sorted", dw)):
        assert got[name]["n_files"] == 32
        assert got[name]["avg_ck_width"] == w[0] / 32.0
        assert got[name]["avg_di_width"] == w[1] / 32.0
    # the layout claim itself: z-order narrows the customer dimension vs
    # date-sorted while keeping date ranges bounded (not full-width)
    assert got["zorder"]["sum_ck_width"] < got["date_sorted"]["sum_ck_width"]


def test_unigram_logprob_matches_python(spark, sf_smoke):
    import re

    tok = []
    for did, text in _cols(sf_smoke, "documents", ["doc_id", "text"]):
        for t in re.split(r"\s+", text.strip().lower()):
            tok.append((did, t))
    freq = collections.Counter(t for _, t in tok)
    n_total = sum(freq.values())
    q = {
        t: _r((math.log2(n_total) - math.log2(c)) * 1000000)
        for t, c in freq.items()
    }
    agg = collections.defaultdict(lambda: [0, 0])
    for did, t in tok:
        a = agg[did]
        a[0] += 1
        a[1] += q[t]
    got = _rows(spark, sf_smoke, "text_unigram_logprob")
    assert [r["doc_id"] for r in got] == sorted(agg)
    for r in got:
        n, sq = agg[r["doc_id"]]
        assert r["n_tokens"] == n
        assert r["mean_bits"] == sq / (n * 1000000)


def test_token_rarity_matches_python(spark, sf_smoke):
    import re

    tok = []
    for src, text in _cols(sf_smoke, "documents", ["source", "text"]):
        for t in re.split(r"\s+", text.strip().lower()):
            tok.append((src, t))
    freq = collections.Counter(t for _, t in tok)
    agg = collections.defaultdict(lambda: [0, 0, 10**18, 0])
    for src, t in tok:
        a = agg[src]
        c = freq[t]
        a[0] += 1
        a[1] += c
        a[2] = min(a[2], c)
        a[3] += c <= 2
    got = _rows(spark, sf_smoke, "docs_token_rarity")
    assert [r["source"] for r in got] == sorted(agg)
    for r in got:
        n, sf_, mn, nr = agg[r["source"]]
        assert (r["n_tokens"], r["sum_freq"], r["min_freq"], r["n_rare"]) == (
            n, sf_, mn, nr,
        )
        assert r["mean_token_freq"] == sf_ / n
        assert r["rare_ratio"] == nr / n


def test_price_percentile_bands_match_python(spark, sf_smoke):
    groups = collections.defaultdict(list)
    for ts, price in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        groups[f"{ts.year:04d}-{ts.month:02d}"].append(_r(float(price) * 100))
    got = _rows(spark, sf_smoke, "trend_price_percentile_bands")
    assert [r["month"] for r in got] == sorted(groups)
    for r in got:
        sv = sorted(groups[r["month"]])
        assert r["n_orders"] == len(sv)
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")):
            assert math.isclose(r[col], _pctl(sv, p) / 100.0, rel_tol=1e-12)


def test_wow_growth_matches_python(spark, sf_smoke):
    import datetime

    weekly = collections.defaultdict(lambda: [0, 0])
    for ts, price in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        d = ts.date()
        wk = (d - datetime.timedelta(days=d.weekday())).isoformat()
        weekly[wk][0] += _r(float(price) * 100)
        weekly[wk][1] += 1
    got = _rows(spark, sf_smoke, "trend_wow_revenue_growth")
    assert [r["week_start"] for r in got] == sorted(weekly)
    prev = None
    for r in got:
        cents, n = weekly[r["week_start"]]
        assert (r["cents"], r["n_orders"]) == (cents, n)
        assert r["prev_cents"] == prev
        if prev:
            assert r["wow_growth"] == (cents - prev) / prev
        else:
            assert r["wow_growth"] is None
        prev = cents


def test_top_session_paths_match_python(spark, sf_smoke):
    byu = collections.defaultdict(list)
    for uid, us, eid, et in _events_ns(
        sf_smoke, ["user_id", "ts", "event_id", "event_type"]
    ):
        byu[uid].append((us, eid, et))
    paths = collections.Counter()
    for evs in byu.values():
        evs.sort()
        cur = [evs[0]]
        prev = evs[0][0]
        sessions = []
        for e in evs[1:]:
            if e[0] - prev >= 600_000_000:
                sessions.append(cur)
                cur = []
            cur.append(e)
            prev = e[0]
        sessions.append(cur)
        for s in sessions:
            paths[">".join(et for _, _, et in s[:3])] += 1
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _rows(spark, sf_smoke, "ev_top_session_paths")
    assert [(r["path"], r["n_sessions"], r["rank"]) for r in got] == [
        (p, n, i) for i, (p, n) in enumerate(top, 1)
    ]


def _minhash_py(shingle_set, coeffs):
    import hashlib

    P = (1 << 31) - 1
    sig = []
    hs = [
        int(hashlib.md5(sh.encode()).hexdigest()[:15], 16) % P
        for sh in shingle_set
    ]
    for a, b in coeffs:
        sig.append(min((a * h + b) % P for h in hs))
    return sig


def test_minhash_lsh_pipeline_matches_python(spark, sf_smoke):
    """Flagship dedup audit: the FULL MinHash->banding->candidate pipeline
    replicated from scratch (shingles, md5 base hash, LCG-derived
    universal-hash family, band signatures, bucket self-join) — the
    third implementation of the repo's headline near-dup machinery."""
    import hashlib

    from bigdata_etl_elt_dashboard_spark.operators.dedup import minhash_coeffs

    coeffs = minhash_coeffs(8)
    sigs = {}
    for did, text in _cols(sf_smoke, "documents", ["doc_id", "text"]):
        sigs[did] = _minhash_py(_shingles3(text), coeffs)
    got_sigs = _rows(spark, sf_smoke, "dedup_minhash_signatures")
    assert len(got_sigs) == len(sigs)
    for r in got_sigs:
        assert [r[f"h{i}"] for i in range(8)] == sigs[r["doc_id"]]

    buckets = collections.defaultdict(set)
    for did, sig in sigs.items():
        for b in range(4):
            band_sig = hashlib.md5(
                "|".join(str(v) for v in sig[b * 2 : b * 2 + 2]).encode()
            ).hexdigest()
            buckets[(b, band_sig)].add(did)
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    got = _rows(spark, sf_smoke, "dedup_lsh_candidates")
    assert {(r["doc_a"], r["doc_b"]) for r in got} == pairs


# --- round-7 TPC-H completions (plans/wave7.py) --------------------------


def _li_money(sf):
    """(cents, disc_pct, tax_pct, qty, flag, status, shipdate) per line."""
    cols = [
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_quantity",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
        "l_orderkey",
        "l_suppkey",
    ]
    for ep, d, t, q, fl, st, sd, ok, sk in _cols(sf, "lineitem", cols):
        yield _r(ep * 100), _r(d * 100), _r(t * 100), _r(q), fl, st, sd, ok, sk


def test_pricing_summary_q1_matches_python(spark, sf_smoke):
    import datetime

    cutoff = datetime.date(1998, 9, 2)
    acc = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for cents, d, t, q, fl, st, sd, _ok, _sk in _li_money(sf_smoke):
        if sd.date() > cutoff:
            continue
        a = acc[(fl, st)]
        a[0] += q
        a[1] += cents
        a[2] += cents * (100 - d)
        a[3] += cents * (100 - d) * (100 + t)
        a[4] += d
        a[5] += 1
    got = _rows(spark, sf_smoke, "pricing_summary_q1")
    assert len(got) == len(acc)
    for r in got:
        a = acc[(r["l_returnflag"], r["l_linestatus"])]
        assert (
            r["sum_qty"],
            r["sum_base_cents"],
            r["sum_disc_price_micropct"],
            r["sum_charge_micro"],
            r["count_order"],
        ) == (a[0], a[1], a[2], a[3], a[5])
        assert abs(r["avg_qty"] - a[0] / a[5]) < 1e-9
        assert abs(r["avg_price"] - a[1] / (a[5] * 100)) < 1e-9
        assert abs(r["avg_disc"] - a[4] / (a[5] * 100)) < 1e-9


def test_unshipped_topk_q3_matches_python(spark, sf_smoke):
    import datetime

    cut = datetime.date(1998, 3, 15)
    bld = {
        c
        for c, seg in _cols(sf_smoke, "customer", ["c_custkey", "c_mktsegment"])
        if seg == "BUILDING"
    }
    omap = {
        ok: (od.date(), op)
        for ok, oc, od, op in _cols(
            sf_smoke, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
        )
        if oc in bld and od.date() < cut
    }
    rev = collections.defaultdict(int)
    for cents, d, _t, _q, _fl, _st, sd, ok, _sk in _li_money(sf_smoke):
        if ok in omap and sd.date() > cut:
            rev[ok] += cents * (100 - d)
    ranked = sorted(
        ((ok, r, *omap[ok]) for ok, r in rev.items()),
        key=lambda x: (-x[1], x[2], x[0]),
    )[:10]
    got = _rows(spark, sf_smoke, "unshipped_topk_q3")
    assert [
        (r["l_orderkey"], r["revenue_micropct"], r["o_orderdate"], r["o_orderpriority"])
        for r in got
    ] == ranked


def test_local_supplier_volume_q5_matches_python(spark, sf_smoke):
    import datetime

    reg = {r: k for k, r in _cols(sf_smoke, "region", ["r_regionkey", "r_name"])}
    asia = {
        nk: nm
        for nk, nm, rk in _cols(
            sf_smoke, "nation", ["n_nationkey", "n_name", "n_regionkey"]
        )
        if rk == reg["ASIA"]
    }
    cnat = dict(_cols(sf_smoke, "customer", ["c_custkey", "c_nationkey"]))
    snat = dict(_cols(sf_smoke, "supplier", ["s_suppkey", "s_nationkey"]))
    lo, hi = datetime.date(1996, 1, 1), datetime.date(1997, 1, 1)
    omap = {
        ok: cnat[oc]
        for ok, oc, od in _cols(
            sf_smoke, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
        )
        if lo <= od.date() < hi and cnat[oc] in asia
    }
    rev = collections.defaultdict(int)
    for cents, d, _t, _q, _fl, _st, _sd, ok, sk in _li_money(sf_smoke):
        nk = omap.get(ok)
        if nk is not None and snat[sk] == nk:
            rev[asia[nk]] += cents * (100 - d)
    got = _rows(spark, sf_smoke, "local_supplier_volume_q5")
    assert sorted(((r["n_name"], r["revenue_micropct"]) for r in got)) == sorted(
        rev.items()
    )
    assert [r["n_name"] for r in got] == [
        n for n, _v in sorted(rev.items(), key=lambda x: (-x[1], x[0]))
    ]


def test_forecast_revenue_change_q6_matches_python(spark, sf_smoke):
    import datetime

    lo, hi = datetime.date(1996, 1, 1), datetime.date(1997, 1, 1)
    tot = n = 0
    for cents, d, _t, q, _fl, _st, sd, _ok, _sk in _li_money(sf_smoke):
        if lo <= sd.date() < hi and 5 <= d <= 7 and q < 24:
            tot += cents * d
            n += 1
    got = _rows(spark, sf_smoke, "forecast_revenue_change_q6")[0]
    assert (got["revenue_cents_pct"], got["n_lines"]) == (tot, n)


def test_dedup_verified_keepers_matches_python(spark, sf_smoke):
    """Composed-pipeline audit: candidates -> exact-Jaccard verify ->
    union-find CC -> keeper sizes, all replicated from scratch in plain
    Python (third implementation; the per-stage audits cover candidates)."""
    import hashlib

    from bigdata_etl_elt_dashboard_spark.operators.dedup import minhash_coeffs

    coeffs = minhash_coeffs(8)
    shingle_sets = {}
    for did, text in _cols(sf_smoke, "documents", ["doc_id", "text"]):
        shingle_sets[did] = _shingles3(text)

    buckets = collections.defaultdict(set)
    for did, sset in shingle_sets.items():
        sig = _minhash_py(sset, coeffs)
        for b in range(4):
            band_sig = hashlib.md5(
                "|".join(str(v) for v in sig[b * 2 : b * 2 + 2]).encode()
            ).hexdigest()
            buckets[(b, band_sig)].add(did)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    # exact-Jaccard verify on the candidate pairs only
    verified = []
    for a, b in cand:
        sa, sb = shingle_sets[a], shingle_sets[b]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union and inter / union >= 0.5:
            verified.append((a, b))

    # union-find connected components over verified edges
    parent = {d: d for d in shingle_sets}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = collections.Counter(find(d) for d in shingle_sets)

    got = _rows(spark, sf_smoke, "dedup_verified_keepers")
    assert {(r["keeper_doc_id"], r["n_members"]) for r in got} == set(
        sizes.items()
    )
    assert [r["keeper_doc_id"] for r in got] == sorted(sizes)


# --- round-7 sketch-family audits (the four formula-heavy r07-window
# queries that had no plain-Python replicate) -----------------------------


def _md5_15(x) -> int:
    import hashlib

    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def test_approx_percentile_contract_exact_side_matches_python(spark, sf_smoke):
    vals = sorted(_r(x) for x in _col(sf_smoke, "orders", "o_totalprice"))
    n = len(vals)
    got = _rows(spark, sf_smoke, "stat_approx_percentile_contract")[0]
    assert got["n_rows"] == n
    for pct, col in ((50, "exact_p50"), (90, "exact_p90"), (99, "exact_p99")):
        target = (n * pct + 99) // 100
        assert got[col] == vals[target - 1], (pct, target)
        assert got[f"p{pct}_within_bound"] is True


def test_hll_monthly_merge_matches_python(spark, sf_smoke):
    regs_by_month = collections.defaultdict(lambda: [0] * 64)
    regs_global = [0] * 64
    months = set()
    for ck, od in _cols(sf_smoke, "orders", ["o_custkey", "o_orderdate"]):
        hv = _md5_15(ck)
        bucket, q = hv % 64, hv // 64
        r = 55 if q == 0 else 55 - q.bit_length()
        mi = od.year * 12 + od.month
        months.add(mi)
        regs_by_month[mi][bucket] = max(regs_by_month[mi][bucket], r)
        regs_global[bucket] = max(regs_global[bucket], r)
    merged = [max(m[b] for m in regs_by_month.values()) for b in range(64)]
    sum_merged = sum(1 << (55 - m) for m in merged)
    sum_single = sum(1 << (55 - m) for m in regs_global)
    got = _rows(spark, sf_smoke, "stat_hll_monthly_merge")[0]
    assert got["sum_scaled_merged"] == sum_merged
    assert got["sum_scaled_single"] == sum_single
    assert got["merge_lossless"] is True
    assert got["n_sketches"] == len(months)


def test_cms_heavyhitters_matches_python(spark, sf_smoke):
    D, W = 4, 64
    counters = collections.Counter()
    truth = collections.Counter()
    for (pk,) in _cols(sf_smoke, "lineitem", ["l_partkey"]):
        truth[pk] += 1
        for r in range(D):
            counters[(r, _md5_15(f"{pk}|{r}") % W)] += 1
    top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = []
    for pk, cnt in top:
        est = min(counters[(r, _md5_15(f"{pk}|{r}") % W)] for r in range(D))
        expect.append((pk, cnt, est, est - cnt, est >= cnt))
    got = _rows(spark, sf_smoke, "stat_cms_part_heavyhitters")
    assert [
        (
            r["l_partkey"],
            r["true_cnt"],
            r["est_cnt"],
            r["overestimate"],
            r["never_underestimates"],
        )
        for r in got
    ] == expect


def test_kmv_intersection_matches_python(spark, sf_smoke):
    flags = {}
    for ck, od in _cols(sf_smoke, "orders", ["o_custkey", "o_orderdate"]):
        if od.year in (1996, 1997):
            a, b = flags.get(ck, (0, 0))
            flags[ck] = (a or od.year == 1996, b or od.year == 1997)
    hashed = sorted((_md5_15(ck), int(a), int(b)) for ck, (a, b) in flags.items())
    sketch = hashed[:256]
    k_used = len(sketch)
    kth_min = max(h for h, _a, _b in sketch)
    n_both = sum(a * b for _h, a, b in sketch)
    true_inter = sum(a * b for a, b in (map(int, v) for v in flags.values()))
    true_union = len(flags)
    got = _rows(spark, sf_smoke, "stat_kmv_intersection_years")[0]
    assert (
        got["k_used"],
        got["kth_min"],
        got["n_both"],
        got["sketch_jaccard_ppm"],
        got["true_inter"],
        got["true_union"],
        got["true_jaccard_ppm"],
    ) == (
        k_used,
        kth_min,
        n_both,
        n_both * 1000000 // k_used,
        true_inter,
        true_union,
        true_inter * 1000000 // true_union,
    )


# --- round-7 widening audits (sampling / ordering / staging / retention /
# allocation, plans/wave7.py) ----------------------------------------------


def test_hash_sample_and_shuffle_order_match_python(spark, sf_smoke):
    docs = _cols(sf_smoke, "documents", ["doc_id", "lang", "source"])
    hv = {d: _md5_15(d) for d, _l, _s in docs}
    by_hash = sorted(docs, key=lambda r: (hv[r[0]], r[0]))
    got = _rows(spark, sf_smoke, "docs_hash_sample_smallest_k")
    assert [(r["doc_id"], r["lang"], r["source"], r["hv"]) for r in got] == [
        (d, lg, s, hv[d]) for d, lg, s in by_hash[:64]
    ]

    n = len(by_hash)
    digest = sum((i + 1) * (d % 997) for i, (d, _l, _s) in enumerate(by_hash))
    row = _rows(spark, sf_smoke, "docs_shuffle_order_digest")[0]
    assert (
        row["n_docs"],
        row["order_digest"],
        row["first_doc"],
        row["last_doc"],
    ) == (n, digest, by_hash[0][0], by_hash[-1][0])


def test_rrf_rank_fusion_matches_python(spark, sf_smoke):
    docs = _cols(sf_smoke, "documents", ["doc_id", "lang", "n_chars"])
    r1 = {
        d: i + 1
        for i, (d, _l, _c) in enumerate(
            sorted(docs, key=lambda r: (-r[2], r[0]))
        )
    }
    r2 = {
        d: i + 1
        for i, (d, _l, _c) in enumerate(
            sorted(docs, key=lambda r: (_md5_15(r[0]), r[0]))
        )
    }
    scored = sorted(
        ((d, lg, r1[d], r2[d], 1.0 / (60 + r1[d]) + 1.0 / (60 + r2[d])) for d, lg, _c in docs),
        key=lambda t: (-t[4], t[0]),
    )[:20]
    got = _rows(spark, sf_smoke, "docs_rrf_rank_fusion")
    assert [
        (r["doc_id"], r["lang"], r["r1"], r["r2"], r["rrf_score"]) for r in got
    ] == scored


def test_curriculum_stages_matches_python(spark, sf_smoke):
    docs = sorted(
        _cols(sf_smoke, "documents", ["doc_id", "n_chars"]),
        key=lambda r: (r[1], r[0]),
    )
    n = len(docs)
    stages = collections.defaultdict(list)
    for i, (_d, c) in enumerate(docs):
        stages[i * 4 // n + 1].append(c)
    got = _rows(spark, sf_smoke, "docs_curriculum_stages")
    assert [
        (r["stage"], r["n_docs"], r["min_chars"], r["max_chars"], r["sum_chars"])
        for r in got
    ] == [
        (s, len(cs), min(cs), max(cs), sum(cs)) for s, cs in sorted(stages.items())
    ]
    # equal-count property: populations differ by at most 1
    sizes = [len(cs) for cs in stages.values()]
    assert max(sizes) - min(sizes) <= 1


def test_retention_triangle_matches_python(spark, sf_smoke):
    import datetime

    uw = set()
    for uid, ts in _cols(sf_smoke, "events", ["user_id", "ts"]):
        day = ts.date() if hasattr(ts, "date") else ts
        wk = day - datetime.timedelta(days=day.weekday())  # ISO Monday
        uw.add((uid, wk))
    cohort = {}
    for uid, wk in uw:
        cohort[uid] = min(cohort.get(uid, wk), wk)
    tri = collections.Counter()
    for uid, wk in uw:
        k = (wk - cohort[uid]).days // 7
        if k <= 5:
            tri[(cohort[uid], k)] += 1
    got = _rows(spark, sf_smoke, "ev_retention_triangle")
    assert [(r["cohort_wk"], r["k"], r["n_active"]) for r in got] == [
        (cw, k, n) for (cw, k), n in sorted(tri.items())
    ]


def test_proportional_allocation_matches_python(spark, sf_smoke):
    strata = collections.Counter(
        (rf, ls)
        for rf, ls in _cols(sf_smoke, "lineitem", ["l_returnflag", "l_linestatus"])
    )
    n = sum(strata.values())
    B = 1000
    rows = []
    for (rf, ls), n_h in strata.items():
        rows.append([rf, ls, n_h, n_h * B // n, (n_h * B) % n])
    base_sum = sum(r[3] for r in rows)
    leftover = B - base_sum
    for i, r in enumerate(sorted(rows, key=lambda r: (-r[4], r[0], r[1]))):
        if i < leftover:
            r[3] += 1
    expect = sorted(((rf, ls, n_h, a) for rf, ls, n_h, a, _rem in rows))
    got = _rows(spark, sf_smoke, "li_proportional_allocation")
    assert [
        (r["l_returnflag"], r["l_linestatus"], r["n_h"], r["alloc"]) for r in got
    ] == expect
    assert sum(r["alloc"] for r in got) == B


def test_rank_migration_matches_python(spark, sf_smoke):
    rev = collections.defaultdict(int)
    omap = {}
    cnat = dict(_cols(sf_smoke, "customer", ["c_custkey", "c_nationkey"]))
    nname = dict(_cols(sf_smoke, "nation", ["n_nationkey", "n_name"]))
    for ok, oc, od in _cols(sf_smoke, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]):
        if od.year in (1996, 1997):
            omap[ok] = (nname[cnat[oc]], od.year)
    for ok, ep in _cols(sf_smoke, "lineitem", ["l_orderkey", "l_extendedprice"]):
        if ok in omap:
            rev[omap[ok]] += _r(ep * 100)
    ranks = {}
    for yr in (1996, 1997):
        ordered = sorted(
            ((n, v) for (n, y), v in rev.items() if y == yr),
            key=lambda t: (-t[1], t[0]),
        )
        for i, (n, v) in enumerate(ordered):
            ranks[(n, yr)] = (i + 1, v)
    expect = sorted(
        (
            (
                n,
                ranks[(n, 1996)][1],
                ranks[(n, 1997)][1],
                ranks[(n, 1996)][0],
                ranks[(n, 1997)][0],
                ranks[(n, 1996)][0] - ranks[(n, 1997)][0],
            )
            for (n, y) in ranks
            if y == 1996 and (n, 1997) in ranks
        ),
        key=lambda t: (-t[5], t[0]),
    )
    got = _rows(spark, sf_smoke, "nation_revenue_rank_migration")
    assert [
        (
            r["n_name"],
            r["rev_1996"],
            r["rev_1997"],
            r["rank_1996"],
            r["rank_1997"],
            r["rank_gain"],
        )
        for r in got
    ] == expect


def test_column_profile_wide_matches_python(spark, sf_smoke):
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    data = _cols(sf_smoke, "orders", cols)
    expect = []
    for i, cname in enumerate(cols):
        vals = [row[i] for row in data]
        nonnull = [v for v in vals if v is not None]
        lens = [len(str(v)) for v in nonnull]
        expect.append(
            (
                cname,
                len(set(nonnull)),
                sum(1 for v in vals if v is None),
                min(lens),
                max(lens),
            )
        )
    got = _rows(spark, sf_smoke, "dq_column_profile_wide")
    assert [
        (r["col_name"], r["n_distinct"], r["n_null"], r["min_len"], r["max_len"])
        for r in got
    ] == sorted(expect)


def test_cross_correlation_lags_matches_python(spark, sf_smoke):
    import math

    daily = collections.defaultdict(lambda: [0, 0])
    for od, tp in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        d = daily[od.date()]
        d[0] += 1
        d[1] += _r(tp * 100)
    got = _rows(spark, sf_smoke, "stat_cross_correlation_lags")
    import datetime

    for row in got:
        k = row["lag"]
        xs, ys = [], []
        for day, (x, _y) in daily.items():
            nxt = daily.get(day + datetime.timedelta(days=k))
            if nxt is not None:
                xs.append(x)
                ys.append(nxt[1])
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        ref = (n * sxy - sx * sy) / math.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy)
        )
        assert row["n_days"] == n
        assert abs(row["ccf"] - ref) < 1e-9, k


def test_haar_wavelet_energy_matches_python(spark, sf_smoke):
    daily = collections.defaultdict(int)
    for od, tp in _cols(sf_smoke, "orders", ["o_orderdate", "o_totalprice"]):
        daily[od.date()] += _r(tp * 100)
    series = [daily[d] for d in sorted(daily)][:64]
    assert len(series) == 64
    got = _rows(spark, sf_smoke, "trend_haar_wavelet_energy")
    cur = series
    for lvl in range(1, 7):
        nxt = [cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)]
        det = [cur[2 * i] - cur[2 * i + 1] for i in range(len(cur) // 2)]
        row = got[lvl - 1]
        assert row["level"] == lvl
        assert row["n_coeffs"] == len(det) == 64 >> lvl
        assert row["detail_energy"] == float(sum(d * d for d in det))
        cur = nxt


def test_weighted_quartiles_matches_python(spark, sf_smoke):
    w = collections.Counter()
    for ep, q in _cols(sf_smoke, "lineitem", ["l_extendedprice", "l_quantity"]):
        w[_r(ep * 100 / q)] += _r(q)
    tot = sum(w.values())
    qs = {}
    c = 0
    for v in sorted(w):
        c += w[v]
        if "q25" not in qs and c * 4 >= tot:
            qs["q25"] = v
        if "q50" not in qs and c * 2 >= tot:
            qs["q50"] = v
        if "q75" not in qs and c * 4 >= tot * 3:
            qs["q75"] = v
    got = _rows(spark, sf_smoke, "stat_weighted_quartiles_unit_price")[0]
    assert (
        got["total_weight"],
        got["wq25_cents"],
        got["wmedian_cents"],
        got["wq75_cents"],
    ) == (tot, qs["q25"], qs["q50"], qs["q75"])


# --- round-8 additions (plans/wave8.py) ----------------------------------


def test_timer_session_twin_matches_python(spark, sf_smoke):
    """ev_timer_session_close_twin vs a from-scratch sessionizer: walk each
    user's (ms, event_id)-ordered events, open a new session on diff >=
    gap. TRUE timer closure: only the user's LAST session (every earlier
    one closes inline when its successor event is processed), and only if
    the terminal watermark (global max ms) reaches its expiry."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(
        f"{sf_smoke}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    # the testdata's ts encoding varies by SF (ns at the large SFs, us at
    # the small) — scale whatever arrow reports down to milliseconds
    unit = t["ts"].type.unit
    div = {"s": 1, "ms": 1, "us": 1_000, "ns": 1_000_000}[unit]
    raw = t["ts"].cast("int64").to_pylist()
    uid = t["user_id"].to_pylist()
    eid = t["event_id"].to_pylist()
    gap = 600_000
    per_user = collections.defaultdict(list)
    for u, e, v in zip(uid, eid, raw):
        per_user[u].append((v // div, e))
    max_ms = max(v // div for v in raw)
    ref = []
    for u in sorted(per_user):
        evs = sorted(per_user[u])
        start = last = evs[0][0]
        n = 1
        for ms, _e in evs[1:]:
            if ms - last >= gap:
                ref.append((u, start, last, n, False))  # closed by successor
                start, last, n = ms, ms, 1
            else:
                last = ms
                n += 1
        ref.append((u, start, last, n, last + gap <= max_ms))  # trailing
    got = [
        (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"], r["timer_closed"])
        for r in _rows(spark, sf_smoke, "ev_timer_session_close_twin")
    ]
    assert got == sorted(ref)


def test_corpus_pipeline_v2_matches_python_composition(spark, sf_smoke):
    """corpus_pipeline_v2_digest vs the same SIX stages composed from
    scratch in plain Python (gopher filter -> minhash/LSH/verified-Jaccard
    dedup with union-find CC -> largest-remainder lang allocation ->
    hash-ordered sampling -> curriculum ranks -> char packing) — the
    composition audit for the round-8 capstone: every stage is separately
    gated; this pins the stage WIRING (which survivor set feeds which
    stage, in which order)."""
    import hashlib

    from bigdata_etl_elt_dashboard_spark.operators.dedup import minhash_coeffs
    from bigdata_etl_elt_dashboard_spark.plans.corpus_quality import (
        _MAX_DUP_BIGRAM_RATIO,
        _MAX_DUP_TOKEN_RATIO,
        _MAX_TOP_TOKEN_RATIO,
        _MAX_TOKENS,
        _MIN_TOKENS,
    )
    from bigdata_etl_elt_dashboard_spark.plans.wave8 import (
        _V2_BUDGET,
        _V2_CHAR_CAP,
        _V2_STAGES,
    )

    rows_ = _cols(sf_smoke, "documents", ["doc_id", "text", "lang", "n_chars"])

    # stage 1: gopher quality filter
    surv = []
    for did, text, lang, n_chars in rows_:
        ts = _toks(text)
        n = len(ts)
        if not ts or not (_MIN_TOKENS <= n <= _MAX_TOKENS):
            continue
        if (n - len(set(ts))) / n > _MAX_DUP_TOKEN_RATIO:
            continue
        if max(collections.Counter(ts).values()) / n > _MAX_TOP_TOKEN_RATIO:
            continue
        bgs = list(zip(ts, ts[1:]))
        if bgs and (len(bgs) - len(set(bgs))) / len(bgs) > _MAX_DUP_BIGRAM_RATIO:
            continue
        surv.append((did, text, lang, n_chars))

    # stage 2: minhash -> LSH bands -> candidates -> exact-Jaccard verify
    # -> union-find CC -> min-id keepers
    coeffs = minhash_coeffs(8)
    shs = {did: _shingles3(text) for did, text, _l, _c in surv}
    sigs = {did: _minhash_py(s, coeffs) for did, s in shs.items()}
    buckets = collections.defaultdict(set)
    for did, sig in sigs.items():
        for b in range(4):
            bsig = hashlib.md5(
                "|".join(str(v) for v in sig[b * 2 : b * 2 + 2]).encode()
            ).hexdigest()
            buckets[(b, bsig)].add(did)
    parent = {did: did for did in shs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                inter = len(shs[a] & shs[b])
                if inter and inter / len(shs[a] | shs[b]) >= 0.5:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    keepers = {did for did in shs if find(did) == did}
    dd = [
        (did, lang, n_chars, int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16))
        for did, _t, lang, n_chars in surv
        if did in keepers
    ]

    # stage 3: largest-remainder allocation of the budget across langs
    n_h = collections.Counter(lang for _d, lang, _c, _h in dd)
    tot = sum(n_h.values())
    base = {lg: c * _V2_BUDGET // tot for lg, c in n_h.items()}
    rem = {lg: (c * _V2_BUDGET) % tot for lg, c in n_h.items()}
    spare = _V2_BUDGET - sum(base.values())
    alloc = dict(base)
    for lg in sorted(n_h, key=lambda lg: (-rem[lg], lg))[:spare]:
        alloc[lg] += 1

    # stage 4: hash-ordered per-lang sample up to the allocation
    by_lang = collections.defaultdict(list)
    for did, lang, n_chars, hv in dd:
        by_lang[lang].append((hv, did, n_chars))
    sampled = []
    for lg, lst in by_lang.items():
        for hv, did, n_chars in sorted(lst)[: alloc[lg]]:
            sampled.append((did, lg, n_chars, hv))

    # stage 5: curriculum stage from the global (n_chars, doc_id) rank
    order = sorted(sampled, key=lambda r: (r[2], r[0]))
    n_s = len(order)
    stage_of = {
        did: (rk * _V2_STAGES) // n_s + 1
        for rk, (did, _lg, _c, _h) in enumerate(order)
    }

    # stage 6: sequential-fill packing in curriculum order within lang
    ref = collections.defaultdict(lambda: [0, 0, 0, set()])
    for lg in sorted(by_lang):
        rows_l = sorted(
            (r for r in sampled if r[1] == lg),
            key=lambda r: (stage_of[r[0]], r[3], r[0]),
        )
        off = 0
        for did, _lg, n_chars, _hv in rows_l:
            st = stage_of[did]
            acc = ref[(lg, st)]
            acc[0] += 1
            acc[1] += n_chars
            acc[2] += did
            acc[3].add(off // _V2_CHAR_CAP)
            off += n_chars
    got = {
        (r["lang"], r["stage"]): (r["n_docs"], r["sum_chars"], r["id_sum"], r["n_packs"])
        for r in _rows(spark, sf_smoke, "corpus_pipeline_v2_digest")
    }
    assert got == {
        k: (a, b, c, len(p)) for k, (a, b, c, p) in ref.items()
    }


# --- round-9 additions (plans/wave9.py) ----------------------------------


def test_stream_pipeline_gold_twin_matches_python(spark, sf_smoke):
    """ev_stream_pipeline_gold_twin vs the composed stages from scratch in
    plain Python: replay every 7th event (at-least-once delivery), dedup
    to one row per event_id, gap-sessionize, keep only the sessions a
    drained stream CLOSES ('gap' when a successor exists, 'timer' for the
    user's last session iff max_ms reaches its expiry, open otherwise),
    then roll the gold table up per calendar day."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(
        f"{sf_smoke}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    unit = t["ts"].type.unit
    div = {"s": 1, "ms": 1, "us": 1_000, "ns": 1_000_000}[unit]
    raw = t["ts"].cast("int64").to_pylist()
    uid = t["user_id"].to_pylist()
    eid = t["event_id"].to_pylist()
    gap, day_ms = 600_000, 86_400_000

    # replay + dedup: replicas are byte-identical, so a set of
    # (user, ms, event_id) triples models "one row per delivered event"
    delivered = set()
    for u, e, v in zip(uid, eid, raw):
        delivered.add((u, v // div, e))
        if e % 7 == 0:
            delivered.add((u, v // div, e))  # replay collapses in the set
    per_user = collections.defaultdict(list)
    for u, ms, e in delivered:
        per_user[u].append((ms, e))
    max_ms = max(ms for _u, ms, _e in delivered)

    closed = []  # (user, start, end, n, closed_by)
    for u in sorted(per_user):
        evs = sorted(per_user[u])
        start = last = evs[0][0]
        n = 1
        for ms, _e in evs[1:]:
            if ms - last >= gap:
                closed.append((u, start, last, n, "gap"))
                start, last, n = ms, ms, 1
            else:
                last = ms
                n += 1
        if last + gap <= max_ms:
            closed.append((u, start, last, n, "timer"))
        # else: still open at drain — never reaches gold

    ref = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for u, start, end, n, how in closed:
        d = ref[start // day_ms]
        d[0] += 1
        d[1] += n
        d[2] += how == "gap"
        d[3] += how == "timer"
        d[4] += end - start
        d[5] += u
    got = {
        r["day"]: [
            r["n_sessions"], r["n_events"], r["n_gap"],
            r["n_timer"], r["sum_dur_ms"], r["uid_sum"],
        ]
        for r in _rows(spark, sf_smoke, "ev_stream_pipeline_gold_twin")
    }
    assert got == dict(ref)
