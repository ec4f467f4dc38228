"""Round-10 registry additions.

``li_value_share_topn`` — the ROWS-BEARING driver gate for the TPC-H Q11
share arithmetic. The Q11-faithful ``li_value_share_parts`` keeps its 0.1%
threshold, which no part reaches under TPC-H's uniform part spread at any
local scale (~2k–20k parts → max share ≈ 0.05%), so its green driver row
pins the EMPTY set; this variant ranks the same per-part fixed-point
revenue CTE by share and returns the top 25, so the cross-engine DuckDB
agreement on the share math (double division of exact BIGINTs, integer
ppm floor-division) is driver-verified on a non-trivial result at every
scale factor. Both queries ride ``operators/scale.global_total`` — the
hierarchical two-stage grand total (partial per-partition sums → 1-row
reduce → broadcast join) that replaces the single-task unpartitioned
window, per the r09 verdict tasks 2 and 6.

Determinism: the top-N set is selected under the total order
(c DESC, l_partkey); every share value derives from exact BIGINTs with
one IEEE division (or integer floor division) at output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scale import global_total
from ..sources.catalog import table
from .registry import register

_TOPN = 25


@register(
    "li_value_share_topn",
    oracle=f"""
        WITH pc AS MATERIALIZED (
            SELECT l_partkey,
                   SUM(CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 10000)
                            AS BIGINT)) AS c
            FROM lineitem GROUP BY l_partkey
        ),
        t AS (SELECT l_partkey, c, (SELECT SUM(c) FROM pc) AS tot FROM pc)
        SELECT l_partkey,
               CAST(c AS DOUBLE) / 10000 AS part_value,
               CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS value_share,
               CAST(c * 1000000 // tot AS BIGINT) AS share_ppm
        FROM t
        ORDER BY c DESC, l_partkey
        LIMIT {_TOPN}
    """,
    doc="TPC-H Q11 skeleton, rows-bearing variant: top-25 parts by global "
    "revenue share with the exact share readouts (IEEE share from two "
    "exact BIGINTs; ppm via BIGINT floor division — overflow headroom to "
    "~sf100 per-part, exact_agg.py note). Shape: ONE partial-aggregated "
    "fact shuffle to per-part fixed-point cents; the grand total rides "
    "operators/scale.global_total (no single-task pass at any part "
    "cardinality); the top-N select is an orderBy+limit — Catalyst's "
    "TakeOrderedAndProject, a per-partition top-k then a k-row driver "
    "merge, never a full sort.",
)
def li_value_share_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pc = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                * F.lit(10000)
            ).cast("long")
        ).alias("c")
    )
    return (
        global_total(pc, [F.sum("c").alias("tot")])
        .orderBy(F.desc("c"), "l_partkey")
        .limit(_TOPN)
        .select(
            "l_partkey",
            (F.col("c") / F.lit(10000.0)).alias("part_value"),
            (F.col("c") / F.col("tot")).alias("value_share"),
            # DECIMAL(25,0) widening: c (per-part fixed-point cents×100)
            # reaches ~9.2e12 at sf100, so a BIGINT c*1e6 would wrap
            # SILENTLY under non-ANSI Spark (ANSI errors); the decimal
            # product is exact to 1e33 and IntegralDivide returns BIGINT.
            # Matches DuckDB exactly: the oracle's c is HUGEINT (SUM of
            # BIGINT), so its product never wraps either, and both
            # divisions floor non-negative operands (tot = SUM of
            # non-negative per-part revenue — truncate ≡ floor).
            F.expr(
                "CAST(CAST(c AS DECIMAL(25,0)) * 1000000 div tot AS BIGINT)"
            ).alias("share_ppm"),
        )
    )
