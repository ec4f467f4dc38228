"""DQ-report test on the planted-defect fixture (exact expected counts,
SURVEY §5.2) + end-to-end pipeline invariants (fact count == deduped count,
FK anti-joins empty) + partitioned warehouse write."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_etl_elt_dashboard_spark.operators.quality import run_data_quality_checks
from bigdata_etl_elt_dashboard_spark.operators.transforms import NUMERIC_COLS, union_sources
from bigdata_etl_elt_dashboard_spark.functions.cleaning import normalize_names
from bigdata_etl_elt_dashboard_spark.pipeline import run_pipeline

from .fixtures import sales_sources


def test_dq_report_planted_defects(spark):
    local, api = sales_sources(spark)
    raw = union_sources(normalize_names(local), normalize_names(api))
    report = run_data_quality_checks(raw, "order_id", NUMERIC_COLS)

    assert report.n_rows == 14
    # planted: id 5 appears 3× (2 local + 1 api) → 2 duplicates;
    # null PK contributes no duplicate (countDistinct ignores nulls but the
    # null row is also not counted as distinct → 14 - 12 distinct - ... )
    assert report.pk_nulls == 1
    assert report.pk_duplicates == 3  # count(*)=14, countDistinct(pk)=11 → 3
    assert report.null_counts["units_sold"] == 1
    assert report.null_counts["total_profit"] == 1
    assert report.null_counts["region"] == 1
    assert report.negative_counts["total_cost"] == 1
    assert not report.passed
    assert report.dtypes["unit_price"] == "double"
    assert report.numeric_summary["total_cost"]["min"] == -10.0


def test_pipeline_end_to_end(spark, tmp_path):
    local, api = sales_sources(spark)
    wh, report, metrics = run_pipeline(
        spark, local, api, warehouse_path=str(tmp_path / "wh")
    )

    fact = wh["fact_sales"]
    n_fact = fact.count()
    # invariants: one fact row per deduped, date-valid input row —
    # 14 raw rows, id5 collapses 3→1 (−2), bad-date id7 dropped (−1) → 11
    # (the null-PK row forms its own dedup group and is kept)
    assert n_fact == 11

    # every FK resolved (anti-join empty)
    for c in ("date_id", "country_id", "item_id", "channel_id"):
        assert fact.filter(F.col(c).isNull()).count() == 0, c

    # dims are distinct natural keys with dense ids from 1
    dim_item = wh["dim_item"].collect()
    ids = sorted(r["item_id"] for r in dim_item)
    assert ids == list(range(1, len(dim_item) + 1))

    # metrics recorded per stage
    assert set(metrics.stages) == {"transform", "quality", "warehouse", "write"}

    # partitioned write: order_year directories exist
    years = [p.name for p in (tmp_path / "wh" / "fact_sales").iterdir() if p.is_dir()]
    assert any(y.startswith("order_year=") for y in years)

    # written warehouse reads back with same row count
    assert spark.read.parquet(str(tmp_path / "wh" / "fact_sales")).count() == n_fact

    # S10: run metadata persisted as a queryable table beside the warehouse
    mrows = {
        r["stage"]: r for r in spark.read.parquet(str(tmp_path / "wh" / "_run_metrics")).collect()
    }
    assert set(mrows) == {"transform", "quality", "warehouse", "write"}
    assert mrows["transform"]["rows"] == 11 and mrows["transform"]["seconds"] > 0


def test_observe_metrics_ride_the_main_pass(spark, sf_smoke):
    """df.observe() data-quality counters (SURVEY §2.9 at scale): the DQ
    rollup must be collectible from the SAME pass that computes the
    business aggregate — no second scan of the fact table. The observation
    reports rows seen, null keys, and negative totals while the query
    itself computes revenue per priority."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    obs = Observation("dq")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_keys"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("neg_totals"),
    )
    result = (
        observed.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    m = obs.get
    assert m["rows_seen"] == sum(r["n"] for r in result)
    assert m["null_keys"] == 0 and m["neg_totals"] == 0
