"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures — the §5.2 complement to the DuckDB
differential gate. Examples are kept small and few (each one runs Spark
jobs); the properties, not the volume, carry the value."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_etl_elt_dashboard_spark.functions.exact_agg import CENTS, xsum
from bigdata_etl_elt_dashboard_spark.functions.features import clip_to_bounds, min_max_norm
from bigdata_etl_elt_dashboard_spark.operators.transforms import dedup_keep_first

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# money-like values: 2dp, bounded — the granularity xsum is specified for
money = st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0)


@given(vals=st.lists(money, min_size=1, max_size=60), parts=st.integers(1, 7))
@settings(**_SETTINGS)
def test_xsum_is_partitioning_independent(spark, vals, parts):
    """xsum must equal the exact cent-sum no matter how rows are split
    across partitions — the property plain SUM(double) lacks."""
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(parts)
    got = df.agg(xsum(F.col("x"), CENTS).alias("s")).first()["s"]
    exact_cents = sum(round(v * 100) for v in vals)
    assert got == exact_cents / 100.0


@given(
    vals=st.lists(money, min_size=1, max_size=40),
    lo=money,
    hi=money,
)
@settings(**_SETTINGS)
def test_clip_bounds_and_idempotence(spark, vals, lo, hi):
    lo, hi = min(lo, hi), max(lo, hi)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    once = df.select(clip_to_bounds(F.col("x"), lo, hi).alias("c"))
    rows = [r["c"] for r in once.collect()]
    assert all(lo <= c <= hi for c in rows)
    twice = once.select(clip_to_bounds(F.col("c"), lo, hi).alias("c"))
    assert [r["c"] for r in twice.collect()] == rows  # idempotent
    # in-range values pass through untouched
    for v, c in zip(vals, rows):
        if lo <= v <= hi:
            assert c == v


@given(vals=st.lists(money, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_minmax_norm_range_and_extremes(spark, vals):
    mn, mx = min(vals), max(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = [r["n"] for r in df.select(min_max_norm(F.col("x"), mn, mx).alias("n")).collect()]
    assert all(0.0 <= n <= 1.0 for n in out)
    if mx == mn:
        assert set(out) == {0.0}  # the reference's max==min guard
    else:
        assert 0.0 in out and 1.0 in out  # extremes map to the endpoints


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1), st.integers(0, 100)),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_dedup_keep_first_deterministic_winner(spark, rows):
    """Exactly one survivor per key, and it is the (source_rank, payload)-
    minimal row — independent of input order and partitioning."""
    df = spark.createDataFrame(
        [(k, sr, p) for k, sr, p in rows], "order_id long, source_rank int, payload long"
    ).repartition(4)
    out = dedup_keep_first(df, "order_id", ("source_rank", "payload")).collect()
    got = {r["order_id"]: (r["source_rank"], r["payload"]) for r in out}
    assert len(out) == len(got) == len({k for k, _, _ in rows})
    expected = {}
    for k, sr, p in rows:
        if k not in expected or (sr, p) < expected[k]:
            expected[k] = (sr, p)
    assert got == expected


@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=25),
    rights=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 99)), min_size=0, max_size=25),
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join == per-row brute force: for every left row, the right row
    with the greatest ts <= left ts on the same key (rights deduped per
    (key, ts) keeping max payload, as the operator requires)."""
    import datetime as dtm

    from bigdata_etl_elt_dashboard_spark.operators.temporal import asof_join

    base = dtm.datetime(2024, 1, 1)
    t = lambda m: base + dtm.timedelta(minutes=m)
    dedup_r = {}
    for k, m, v in rights:
        dedup_r[(k, m)] = max(v, dedup_r.get((k, m), -1))
    left = spark.createDataFrame(
        [(i, k, t(m)) for i, (k, m) in enumerate(lefts)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, t(m), float(v)) for (k, m), v in dedup_r.items()],
        "user_id long, ts timestamp, v double",
    ) if dedup_r else spark.createDataFrame([], "user_id long, ts timestamp, v double")

    got = {
        r["event_id"]: r["asof_v"]
        for r in asof_join(left, right, "user_id", "ts", ["v"]).collect()
    }
    for i, (k, m) in enumerate(lefts):
        candidates = [(rm, v) for (rk, rm), v in dedup_r.items() if rk == k and rm <= m]
        expected = float(max(candidates)[1]) if candidates else None
        assert got[i] == expected, f"left {i} (key={k}, t={m}): {got[i]} != {expected}"


@given(
    lefts=st.lists(st.tuples(st.integers(0, 80), st.integers(0, 90)), min_size=1, max_size=12),
    rights=st.lists(st.tuples(st.integers(0, 80), st.integers(0, 90)), min_size=1, max_size=12),
)
@settings(**_SETTINGS)
def test_interval_overlap_join_matches_bruteforce(spark, lefts, rights):
    """interval_overlap_join == the naive quadratic overlap predicate:
    every (left, right) pair with [s,e] intersection appears EXACTLY once
    (the later-start bucket filter dedups without a distinct), regardless
    of how many buckets each interval spans."""
    import datetime as dtm

    from bigdata_etl_elt_dashboard_spark.operators.temporal import interval_overlap_join

    base = dtm.datetime(2024, 1, 1)
    t = lambda m: base + dtm.timedelta(minutes=m)
    mk = lambda iv: [(i, t(min(a, b)), t(max(a, b))) for i, (a, b) in enumerate(iv)]
    left = spark.createDataFrame(mk(lefts), "lid long, s timestamp, e timestamp")
    right = spark.createDataFrame(mk(rights), "rid long, s timestamp, e timestamp")

    # 7-minute buckets: intervals span 0..13+ buckets, exercising multi-bucket dedup
    got = sorted(
        (r["lid"], r["rid_r"])
        for r in interval_overlap_join(left, right, "s", "e", bucket_seconds=420).collect()
    )
    expected = sorted(
        (i, j)
        for i, (a, b) in enumerate(lefts)
        for j, (c, d) in enumerate(rights)
        if min(a, b) <= max(c, d) and min(c, d) <= max(a, b)
    )
    assert got == expected


@given(
    seeds=st.lists(
        st.tuples(
            st.lists(st.integers(-2, 2), min_size=4, max_size=4),
            st.booleans(),  # True → zero out the vector entirely
        ),
        min_size=2,
        max_size=8,
    )
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_blocked_all_pairs_enumeration_is_complete(spark, seeds):
    """The blocked equi-join must enumerate EVERY unordered pair exactly
    once — the invariant the (own_block, j≥blk)/(i≤blk, own_block) key
    replication exists to guarantee — and zero-norm vectors must drop via
    the nullif guard, for ANY corpus (sizes, duplicates, zero vectors)."""
    from bigdata_etl_elt_dashboard_spark.operators.similarity import (
        EMBEDDING_DIM,
        near_dup_pairs,
    )

    vecs = [
        [0.0] * EMBEDDING_DIM if zero else [float(s[i % 4]) for i in range(EMBEDDING_DIM)]
        for s, zero in seeds
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in near_dup_pairs(df, min_sim=-1.0).collect()
    }
    nonzero = {i for i, v in enumerate(vecs) if any(x != 0.0 for x in v)}
    want = {
        (a, b)
        for a in nonzero
        for b in nonzero
        if a < b
    }
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=0,
        max_size=20,
    ),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_star_cc_matches_union_find(spark, edges):
    """Large-star/small-star CC must agree with a driver-side union-find
    (and therefore with min-label propagation) on ANY graph: every node
    labeled with its component's min id, isolated nodes labeling
    themselves. Chain/star/self-loop/parallel-edge shapes all arise from
    the random edge lists."""
    from bigdata_etl_elt_dashboard_spark.operators.dedup import (
        connected_components_star,
    )

    n_nodes = 15
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for v in range(n_nodes):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[find(v)] for v in range(n_nodes)}

    nodes_df = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    if edges:
        edges_df = spark.createDataFrame(edges, "src long, dst long")
    else:
        edges_df = spark.createDataFrame([], "src long, dst long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_star(edges_df, nodes_df).collect()
    }
    assert got == expected


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_zorder_value_is_invertible_and_monotone_per_dim(spark, pts):
    """The Morton value must be a bijection of the bucket pair (bits can be
    de-interleaved back), and fixing one coordinate makes it strictly
    monotone in the other — the locality property file-skipping relies on."""
    from bigdata_etl_elt_dashboard_spark.sources.sinks import zorder_value

    df = spark.createDataFrame(pts, "x int, y int").distinct()
    rows = df.select(
        "x", "y", zorder_value([F.col("x"), F.col("y")], bits=8).alias("z")
    ).collect()
    for r in rows:
        x_back = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(8))
        y_back = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x_back, y_back) == (r["x"], r["y"])
    by_y = {}
    for r in rows:
        by_y.setdefault(r["y"], []).append((r["x"], r["z"]))
    for pairs in by_y.values():
        pairs.sort()
        zs = [z for _, z in pairs]
        assert zs == sorted(zs)


@given(keys=st.lists(st.integers(0, 10_000_000), min_size=1, max_size=60, unique=True))
@settings(**_SETTINGS)
def test_train_val_test_split_is_subset_invariant(spark, keys):
    """A doc's split assignment must not depend on which other docs are in
    the batch: splitting any subset agrees with splitting the full set —
    the property that makes incremental ingests land consistently."""
    from bigdata_etl_elt_dashboard_spark.operators.corpus import train_val_test_split

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    full = {
        r["doc_id"]: r["split"] for r in train_val_test_split(df).collect()
    }
    half_keys = keys[: max(1, len(keys) // 2)]
    half = spark.createDataFrame([(k,) for k in half_keys], "doc_id long")
    sub = {r["doc_id"]: r["split"] for r in train_val_test_split(half).collect()}
    assert all(full[k] == v for k, v in sub.items())


@given(
    old_rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5)), min_size=1, max_size=30
    ),
    new_rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5)), min_size=1, max_size=30
    ),
)
@settings(**_SETTINGS)
def test_snapshot_delta_matches_dict_diff(spark, old_rows, new_rows):
    """snapshot_delta must agree with the obvious dict-based diff for any
    pair of snapshots (last-write-wins on duplicate keys in the input)."""
    from bigdata_etl_elt_dashboard_spark.operators.warehouse import snapshot_delta

    old_d = {k: v for k, v in old_rows}
    new_d = {k: v for k, v in new_rows}
    old = spark.createDataFrame(list(old_d.items()), "k long, v long")
    new = spark.createDataFrame(list(new_d.items()), "k long, v long")
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_delta(old, new, ["k"], ["v"]).collect()
    }
    for k in set(old_d) | set(new_d):
        if k not in old_d:
            assert got[k] == "insert"
        elif k not in new_d:
            assert got[k] == "delete"
        elif old_d[k] != new_d[k]:
            assert got[k] == "update"
        else:
            assert got[k] == "unchanged"


@given(
    w=st.integers(1, 6),
    h=st.integers(1, 5),
    seed=st.integers(0, 2**32 - 1),
)
@settings(**_SETTINGS)
def test_bmp_roundtrip_any_dims(w, h, seed):
    """BMP encode→decode is the identity for ANY image dimensions —
    row-stride padding (width % 4 ≠ 0) and single-pixel edges included.
    Pixels derive deterministically from the seed (no RNG in the test
    body), exercising all byte values."""
    from bigdata_etl_elt_dashboard_spark.operators import multimodal as M

    px = bytes((seed * 31 + i * 7) % 256 for i in range(w * h * 3))
    img = M.DecodedImage(w, h, px)
    back = M.decode_bmp(M.encode_bmp(img))
    assert (back.width, back.height, back.pixels) == (w, h, px)


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=80),
    parts=st.integers(1, 6),
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_global_rank_matches_single_window(spark, vals, parts):
    """operators.scale.global_rank (range-partition + per-partition rank +
    offset merge) must equal the single-window ROW_NUMBER for ANY data and
    ANY partition count — including empty range partitions, all-equal keys
    (tiebreaker id makes order unique), and partitions=1."""
    from pyspark.sql import Window

    from bigdata_etl_elt_dashboard_spark.operators.scale import global_rank

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        (r["id"], r["global_rank"])
        for r in global_rank(df, ["v", "id"], num_partitions=parts).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        (r["id"], r["rn"])
        for r in df.withColumn(
            "rn", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=0,
        max_size=40,
    ),
    k=st.integers(2, 4),
)
@pytest.mark.slow
@settings(max_examples=12, deadline=None)
def test_kcore_peel_matches_python_reference(spark, edges, k):
    """operators.graph.kcore_peel vs a plain-Python peel run to fixpoint:
    with enough rounds the distributed trajectory's tail must equal the
    true k-core (node and edge counts), and counts must be monotone
    non-increasing round over round."""
    import collections as C

    canon = {(min(a, b), max(a, b)) for a, b in edges}
    # python reference: peel to fixpoint
    es = set(canon)
    while True:
        deg = C.Counter()
        for x, y in es:
            deg[x] += 1
            deg[y] += 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(x, y) for x, y in es if x in keep and y in keep}
        if nxt == es:
            break
        es = nxt
    ref_nodes = len({n for e in es for n in e})
    ref_edges = len(es)

    from bigdata_etl_elt_dashboard_spark.operators.graph import kcore_peel

    rounds = 15  # >= graph diameter for 15 nodes -> fixpoint guaranteed
    df = spark.createDataFrame(
        sorted(canon) or [(0, 1)][:0], "x long, y long"
    )
    if not canon:
        return  # empty edge frame: nothing to peel
    traj = kcore_peel(df, k=k, rounds=rounds)
    ns = [n for _, n, _ in traj]
    ms = [m for _, _, m in traj]
    assert ns == sorted(ns, reverse=True) and ms == sorted(ms, reverse=True)
    assert (ns[-1], ms[-1]) == (ref_nodes, ref_edges)


@given(
    target=st.dictionaries(st.integers(0, 9), st.integers(0, 100), max_size=10),
    updates=st.dictionaries(
        st.integers(0, 12),
        st.tuples(st.integers(0, 100), st.booleans()),  # (value, is_delete)
        max_size=10,
    ),
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_merge_upsert_matches_dict_and_is_idempotent(spark, target, updates):
    """merge_upsert == plain dict semantics (update wins, insert on miss,
    delete removes), and re-applying the same batch is a no-op — the
    replayability contract the operator's docstring promises."""
    from bigdata_etl_elt_dashboard_spark.operators.warehouse import merge_upsert

    tdf = spark.createDataFrame(
        [(k, v) for k, v in target.items()] or [(0, 0)][:0], "k long, v long"
    )
    udf_ = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in updates.items()] or [(0, 0, False)][:0],
        "k long, v long, is_del boolean",
    )
    if not target and not updates:
        return
    expected = dict(target)
    for k, (v, d) in updates.items():
        if d:
            expected.pop(k, None)
        else:
            expected[k] = v
    once = merge_upsert(tdf, udf_, keys=["k"], delete_col="is_del")
    got = {r["k"]: r["v"] for r in once.collect()}
    assert got == expected
    # replay: applying the same batch onto the merged result changes nothing
    twice = merge_upsert(once, udf_, keys=["k"], delete_col="is_del")
    assert {r["k"]: r["v"] for r in twice.collect()} == expected
