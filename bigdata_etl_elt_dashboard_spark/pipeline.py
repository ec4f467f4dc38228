"""End-to-end pipeline orchestration (SURVEY §2.10, §3.1) + run metrics (S10).

The reference's ``__main__`` driver (etl_pipeline/load.py:391-400):
extract → transform → load star schema → run verification queries, with
per-stage wall-clock/row metrics logged to rotating files
(extract.py:16-28, load.py:341-349). Here the same orchestration is lazy
end-to-end: stages compose one DAG, and metrics come from cheap counts on
the materialized outputs.

The warehouse build replaces the reference's MySQL read-back round-trip
(load.py:178-199) with in-plan broadcast joins, and the full-refresh
TRUNCATE dance with ``mode("overwrite")`` parquet writes partitioned by
``order_year`` — so the dashboard's date filter becomes partition pruning.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.quality import QualityReport, fk_unresolved_counts, run_data_quality_checks
from .operators.transforms import NUMERIC_COLS, transform_sales
from .operators.warehouse import build_dim, resolve_fk
from .sources.sinks import write_parquet

log = logging.getLogger("bigdata_etl_elt_dashboard_spark.pipeline")


@dataclass
class RunMetrics:
    """S10: per-stage rows/seconds, the reference's log-line payload."""

    stages: dict[str, dict] = field(default_factory=dict)

    def record(self, stage: str, seconds: float, rows: int | None = None, **extra) -> None:
        self.stages[stage] = {"seconds": round(seconds, 3), "rows": rows, **extra}
        log.info("stage=%s seconds=%.3f rows=%s %s", stage, seconds, rows, extra)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Structured run-metadata table (the reference's rotating-log lines
        as rows — SURVEY §1.1 'logs as metadata store', made queryable)."""
        rows = [
            (stage, float(m["seconds"]), m.get("rows"))
            for stage, m in self.stages.items()
        ]
        return spark.createDataFrame(rows, "stage string, seconds double, rows long")


def build_sales_warehouse(sales: DataFrame) -> dict[str, DataFrame]:
    """§2.10 `load_dimensions` + `load_fact_sales`: star schema from the
    standardized sales table (load.py:161-276), all in-plan."""
    dim_date = build_dim(
        sales.select(F.col("order_date")),
        ["order_date"],
        "date_id",
        extra_cols=[
            F.year("order_date").alias("order_year"),
            F.month("order_date").alias("order_month"),
        ],
    )
    dim_country = build_dim(sales, ["region", "country"], "country_id")
    dim_item = build_dim(sales, ["item_type"], "item_id")
    dim_channel = build_dim(sales, ["sales_channel"], "channel_id")

    fact = sales
    fact = resolve_fk(fact, dim_date.select("date_id", "order_date"), ["order_date"], "date_id")
    fact = resolve_fk(fact, dim_country, ["region", "country"], "country_id")
    fact = resolve_fk(fact, dim_item, ["item_type"], "item_id")
    fact = resolve_fk(fact, dim_channel, ["sales_channel"], "channel_id")
    fact = fact.select(
        F.col("order_id").alias("sales_id"),
        "order_id",
        "date_id",
        "country_id",
        "item_id",
        "channel_id",
        "units_sold",
        "unit_price",
        "unit_cost",
        "total_revenue",
        "total_cost",
        "total_profit",
        "profit_per_unit",
        "revenue_per_unit",
        "profit_margin_ratio",
        "shipping_days",
        F.col("order_year"),  # partition column for the writer
    )
    return {
        "dim_date": dim_date,
        "dim_country": dim_country,
        "dim_item": dim_item,
        "dim_channel": dim_channel,
        "fact_sales": fact,
    }


def run_pipeline(
    spark: SparkSession,
    df_local: DataFrame,
    df_api: DataFrame,
    warehouse_path: str | None = None,
) -> tuple[dict[str, DataFrame], QualityReport, RunMetrics]:
    """extract(given) → transform → quality gate → star build [→ write].

    Returns (warehouse tables, DQ report, metrics). The transform + build
    stay one lazy DAG; materialization happens at the writes (or at the
    caller's first action)."""
    metrics = RunMetrics()

    t0 = time.perf_counter()
    sales = transform_sales(df_local, df_api)
    sales = sales.cache()  # consumed by DQ + 5 warehouse branches
    n_sales = sales.count()
    metrics.record("transform", time.perf_counter() - t0, rows=n_sales)

    t0 = time.perf_counter()
    report = run_data_quality_checks(sales, "order_id", NUMERIC_COLS)
    metrics.record("quality", time.perf_counter() - t0, rows=report.n_rows, passed=report.passed)

    t0 = time.perf_counter()
    wh = build_sales_warehouse(sales)
    fact_fks = fk_unresolved_counts(
        wh["fact_sales"], ["date_id", "country_id", "item_id", "channel_id"]
    )
    if any(fact_fks.values()):
        raise ValueError(f"fact FK resolution failed: {fact_fks}")
    n_fact = wh["fact_sales"].count()
    if n_fact != n_sales:
        raise ValueError(f"fact rows {n_fact} != transformed rows {n_sales}")
    metrics.record("warehouse", time.perf_counter() - t0, rows=n_fact, fk_unresolved=fact_fks)

    if warehouse_path:
        t0 = time.perf_counter()
        for name, df in wh.items():
            write_parquet(
                df,
                f"{warehouse_path}/{name}",
                partition_by=["order_year"] if name == "fact_sales" else None,
            )
        metrics.record("write", time.perf_counter() - t0)
        # S10: persist the run metadata beside the warehouse as a table
        write_parquet(metrics.to_df(spark), f"{warehouse_path}/_run_metrics")

    return wh, report, metrics
