"""Dashboard-analog service: filters prepend as pushed-down predicates and
every aggregation equals its manually-filtered twin."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_etl_elt_dashboard_spark import analytics_service as A
from bigdata_etl_elt_dashboard_spark.sources.catalog import table


def _orders(spark, sf_oracle):
    return table(spark, sf_oracle, "orders")


def _filters():
    return A.Filters(
        date_range=(dt.date(1995, 1, 1), dt.date(1996, 12, 31)),
        memberships={"o_orderpriority": ["1-URGENT", "2-HIGH"]},
    )


def _manual(df):
    return df.filter(
        F.col("o_orderdate").cast("date").between("1995-01-01", "1996-12-31")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )


def test_kpis_match_manual_filter(spark, sf_oracle):
    df = _orders(spark, sf_oracle)
    got = A.kpis(df, "o_totalprice", _filters()).first()
    man = _manual(df)
    n = man.count()
    assert got["n_rows"] == n and n > 0
    assert got["total"] == man.agg(
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0)
    ).first()[0]


def test_trend_and_bars_match(spark, sf_oracle):
    df = _orders(spark, sf_oracle)
    trend = A.monthly_trend(df, "o_totalprice", "o_orderdate", _filters()).collect()
    months = [r["month"] for r in trend]
    assert months == sorted(months) and months[0].startswith("1995-")
    assert all(m <= "1996-12" for m in months)

    bars = A.by_dimension(df, "o_orderstatus", "o_totalprice", _filters()).collect()
    totals = [r["total"] for r in bars]
    assert totals == sorted(totals, reverse=True)
    # grand totals reconcile between views
    assert round(sum(totals), 2) == round(sum(r["total"] for r in trend), 2)


def test_histogram_covers_all_rows(spark, sf_oracle):
    df = _orders(spark, sf_oracle)
    f = _filters()
    hist = A.histogram(df, "o_totalprice", bins=30, filters=f).collect()
    assert len(hist) <= 30
    assert all(0 <= r["bin"] < 30 for r in hist)
    assert sum(r["n"] for r in hist) == _manual(df).count()  # max value lands in last bin


def test_filter_pushdown_reaches_scan(spark, sf_oracle):
    df = _orders(spark, sf_oracle)
    plan_df = A.kpis(df, "o_totalprice", _filters())
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderpriority" in plan.split("PushedFilters")[1][:400]


def test_no_filters_is_whole_table(spark, sf_oracle):
    df = _orders(spark, sf_oracle)
    assert A.kpis(df, "o_totalprice").first()["n_rows"] == df.count()
