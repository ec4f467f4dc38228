"""Order-independent (exact) floating-point aggregation helpers.

Naive SUM(double) depends on accumulation order, which depends on
partitioning — so the same query can return different last-ulp values run
to run, and Spark vs DuckDB can disagree. For measures with fixed decimal
granularity (money = 2dp, rates = 2dp, derived products ≤ 4dp) we sum
exact fixed-point integers instead:

    SUM(CAST(ROUND(x * scale) AS BIGINT)) / scale

The integer sum is exact and order-independent; the final division is one
IEEE op, identical across engines. Spark's ROUND and DuckDB's ROUND both
round half away from zero, and both see the same IEEE product, so the
quantization is identical.

Overflow headroom: bigint holds 9.2e18; cents of a 1e5 measure over 1e12
rows ≈ 1e19 would overflow — at that scale switch the engine side to
``sum(cast(x as decimal(38,4)))`` (Spark decimal sums are exact too); the
fixed-point form is chosen here because DuckDB and Spark agree on it
bit-for-bit, which the oracle gate needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scale for 2-decimal money/rate columns
CENTS = 100
#: scale for products of two 2dp columns (≤4dp)
TENTHS_OF_MILLI = 10_000
#: scale for arbitrary-precision doubles (events.value)
MICROS = 1_000_000


def xsum(col: Column, scale: int = CENTS) -> Column:
    """Exact, order-independent sum of a fixed-granularity double."""
    return F.sum(F.round(col * F.lit(scale)).cast("long")) / F.lit(float(scale))


def xavg(col: Column, scale: int = CENTS) -> Column:
    """Exact-numerator average: (Σ fixed-point) / scale / count."""
    return (F.sum(F.round(col * F.lit(scale)).cast("long")) / F.lit(float(scale))) / F.count(col)


def xsum_sql(expr: str, scale: int = CENTS) -> str:
    return f"(CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS BIGINT) / {float(scale)})"


def xavg_sql(expr: str, scale: int = CENTS) -> str:
    return f"({xsum_sql(expr, scale)} / COUNT({expr}))"
