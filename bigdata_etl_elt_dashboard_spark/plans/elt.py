"""ELT SQL-mode surface (SURVEY §3.2).

The reference's ELT pipeline pushes all transformation into MySQL as SQL
text (elt/transforms.ipynb run_sql chain). Parity here means the same
results are reachable through ``spark.sql`` over registered views — proving
the engine's SQL surface, not just the DataFrame API. Each query below is
the Spark-dialect twin of logic that also exists as a DataFrame plan; the
two are interchangeable because both compile to the same Catalyst plans.

The UPDATE/ALTER chain of the reference collapses: in-place feature UPDATEs
(transforms.ipynb:cell9-13) become SELECT expressions, the ALTER+UPDATE
schema evolution becomes projection — order preserved so later features can
reference earlier ones (SURVEY §7.4.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_tables
from .registry import register


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], query: str) -> DataFrame:
    load_tables(spark, sf_dir, names=tables, register_views=True)
    return spark.sql(query)


@register(
    "elt_sales_clean",
    oracle="""
        SELECT o_orderkey,
               UPPER(TRIM(o_orderstatus)) AS status,
               COALESCE(o_orderpriority, 'unknown') AS priority,
               CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS totalprice_dec
        FROM orders ORDER BY o_orderkey
    """,
    doc="SQL-mode CTAS shape: the sales_raw→sales_clean cleanup "
    "(hold.ipynb:cell7 — UPPER(TRIM(...)), COALESCE, CAST AS DECIMAL) "
    "run through spark.sql over a registered view (F1/F2/F10/F18). The "
    "DECIMAL(15,2) cast proves F18; the output column is re-cast to DOUBLE "
    "because Spark DECIMAL vs DuckDB DECIMAL surface differently to the "
    "driver's value-hash (round-1 type-drift fail, values identical).",
)
def elt_sales_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ("orders",),
        """
        SELECT o_orderkey,
               UPPER(TRIM(o_orderstatus)) AS status,
               COALESCE(o_orderpriority, 'unknown') AS priority,
               CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS totalprice_dec
        FROM orders ORDER BY o_orderkey
        """,
    )


@register(
    "elt_feature_chain",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice / NULLIF(l_quantity, 0) AS cost_per_unit,
               l_discount AS net_profit_ratio,
               CASE WHEN l_discount < 0.02 THEN 'low'
                    WHEN l_discount <= 0.06 THEN 'medium'
                    ELSE 'high' END AS margin_category
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="SQL-mode feature-engineering chain (transforms.ipynb:cell8-13: "
    "ALTER + 5 UPDATEs) as ONE SELECT — F11 guarded division, F14 "
    "asymmetric CASE buckets (<low / <=medium / else).",
)
def elt_feature_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ("lineitem",),
        """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice / NULLIF(l_quantity, 0) AS cost_per_unit,
               l_discount AS net_profit_ratio,
               CASE WHEN l_discount < 0.02 THEN 'low'
                    WHEN l_discount <= 0.06 THEN 'medium'
                    ELSE 'high' END AS margin_category
        FROM lineitem ORDER BY l_orderkey, l_linenumber
        """,
    )


@register(
    "elt_dedup_sql",
    oracle="""
        SELECT o_custkey, o_orderkey
        FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate NULLS LAST,
                                               o_orderkey) AS rn
            FROM orders
        ) WHERE rn = 1 ORDER BY o_custkey
    """,
    doc="SQL-mode dedup (the reference's self-join DELETE, "
    "transforms.ipynb:cell5, as a window QUALIFY — J10/W1). Keep-"
    "earliest prefers DATED orders: NULLS LAST is explicit because the "
    "same SQL text runs on BOTH engines and their defaults differ "
    "(Spark ASC = nulls first, DuckDB = nulls last — r12 variant sweep "
    "caught the unpinned text diverging on null-bearing data).",
)
def elt_dedup_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ("orders",),
        """
        SELECT o_custkey, o_orderkey
        FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate NULLS LAST,
                                               o_orderkey) AS rn
            FROM orders
        ) WHERE rn = 1 ORDER BY o_custkey
        """,
    )


@register(
    "elt_region_rollup_sql",
    oracle="""
        SELECT r_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
               CAST(ROUND(CAST(SUM(CAST(ROUND((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / COUNT(o_totalprice)) AS DOUBLE) / CAST(100 AS DOUBLE) AS avg_order_value
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    doc="SQL-mode analytic rollup (hold.ipynb:cell14 region report) — "
    "COUNT + SUM + ROUND(AVG) via spark.sql (A4/A5/F19).",
)
def elt_region_rollup_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ("orders", "customer", "nation", "region"),
        """
        SELECT r_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
               CAST(ROUND(CAST(SUM(CAST(ROUND((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / COUNT(o_totalprice)) AS DOUBLE) / CAST(100 AS DOUBLE) AS avg_order_value
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """,
    )


_GROUPING_SETS_SQL = """
    SELECT r_name, o_orderpriority, COUNT(*) AS n_orders,
           (CAST(SUM(CAST(ROUND((o_totalprice) * 100) AS BIGINT)) AS DOUBLE)
               / CAST(100 AS DOUBLE)) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (o_orderpriority), ())
    ORDER BY r_name NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register(
    "elt_grouping_sets_sql",
    oracle=_GROUPING_SETS_SQL,
    doc="SQL-mode GROUPING SETS (completes the rollup/cube/grouping-sets "
    "trio): per-region totals, per-priority totals, and the grand total "
    "in one Expand+agg pass — identical SQL text runs on Spark and the "
    "DuckDB oracle.",
)
def elt_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ("orders", "customer", "nation", "region"),
        _GROUPING_SETS_SQL,
    )
