"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures — the §5.2 complement to the DuckDB
differential gate. Examples are kept small and few (each one runs Spark
jobs); the properties, not the volume, carry the value."""

from __future__ import annotations

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
