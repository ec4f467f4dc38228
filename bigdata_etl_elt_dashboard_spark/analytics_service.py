"""Dashboard-analog query service (SURVEY §3.3).

The reference dashboard composes: memoized loads → a conjunctive filter
mask from widget state (apply_filters, dashboard/app.py:256-289) → KPI /
trend / histogram / bar aggregations (render_content, app.py:303-432).
This module is that surface as a library: every function takes an already
loaded (and ideally cached) DataFrame plus optional filters, prepends the
filters as plain Column predicates — so Catalyst pushes them into the
scan — and returns a SMALL aggregated DataFrame for the caller to collect.

Filter semantics mirror the reference exactly:
- date_range: inclusive [start, end] on the order date (end-of-day
  semantics via date-level comparison, F9/P7),
- set-memberships (P8) for region-ish / priority-ish columns,
- all conditions ANDed (P9).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.exact_agg import xsum


@dataclass
class Filters:
    """Widget state → predicate set (all optional, ANDed)."""

    date_col: str = "o_orderdate"
    date_range: tuple[dt.date, dt.date] | None = None
    memberships: dict[str, list[str]] = field(default_factory=dict)

    def predicate(self) -> Column | None:
        conds = []
        if self.date_range is not None:
            start, end = self.date_range
            conds.append(
                F.col(self.date_col).cast("date").between(F.lit(start), F.lit(end))
            )
        for col, values in self.memberships.items():
            if values:
                conds.append(F.col(col).isin(values))
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out


def _apply(df: DataFrame, filters: Filters | None) -> DataFrame:
    pred = filters.predicate() if filters else None
    return df.filter(pred) if pred is not None else df


def kpis(df: DataFrame, measure: str, filters: Filters | None = None) -> DataFrame:
    """A1: (n_rows, total, avg) of a money measure under the filters."""
    d = _apply(df, filters)
    return d.agg(
        F.count("*").alias("n_rows"),
        xsum(F.col(measure)).alias("total"),
        F.round(xsum(F.col(measure)) / F.count("*"), 2).alias("avg_per_row"),
    )


def monthly_trend(
    df: DataFrame, measure: str, date_col: str, filters: Filters | None = None
) -> DataFrame:
    """A7: per-month measure sum, sorted by month."""
    d = _apply(df, filters)
    month = F.date_format(F.col(date_col).cast("date"), "yyyy-MM").alias("month")
    return d.groupBy(month).agg(xsum(F.col(measure)).alias("total")).orderBy("month")


def histogram(
    df: DataFrame, col: str, bins: int = 30, filters: Filters | None = None
) -> DataFrame:
    """A17: fixed-width binning with driver-side bounds (A15), like the
    reference's maxbins=30 Altair histogram."""
    d = _apply(df, filters)
    lo, hi = d.agg(F.min(col), F.max(col)).first()
    if lo is None or hi == lo:
        return d.agg(F.count("*").alias("n")).select(
            F.lit(0).alias("bin"), F.lit(lo).cast("double").alias("bin_start"), "n"
        )
    width = (hi - lo) / bins
    bin_idx = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
    ).cast("int")
    return (
        d.groupBy(bin_idx.alias("bin"))
        .agg(F.count("*").alias("n"))
        .withColumn("bin_start", F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6))
        .select("bin", "bin_start", "n")
        .orderBy("bin")
    )


def by_dimension(
    df: DataFrame, dim: str, measure: str, filters: Filters | None = None
) -> DataFrame:
    """A8: measure sum per dimension value, sorted desc (bar chart feed)."""
    d = _apply(df, filters)
    return (
        d.groupBy(dim)
        .agg(xsum(F.col(measure)).alias("total"))
        .orderBy(F.desc("total"), dim)
    )
