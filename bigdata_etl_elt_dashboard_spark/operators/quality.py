"""Data-quality checks (SURVEY §2.9) — first-class feature of the reference.

``run_data_quality_checks(df, pk_col, numeric_cols)`` reproduces the
6-rule report of etl_pipeline/transform.py:84-127:

1. PK uniqueness (duplicate count)          — A11
2. Null counts per column                   — A12
3. Range check (negative numerics)          — per-col conditional count
4. Dtype consistency report                 — df.dtypes (no scan)
5. Referential integrity (PK not null)      — conditional count
6. Numeric distribution summary             — min/mean/max per numeric col

Rules 1/2/3/5/6 are fused into ONE aggregation pass (the reference runs
six separate full-table scans) — a single partial+final HashAggregate with
no group keys, so it scales to 100 TB as one scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class QualityReport:
    n_rows: int
    pk_duplicates: int
    pk_nulls: int
    null_counts: dict[str, int]
    negative_counts: dict[str, int]
    dtypes: dict[str, str]
    numeric_summary: dict[str, dict[str, float]] = field(default_factory=dict)

    @property
    def passed(self) -> bool:
        """The reference prints the report; we also give a binary gate:
        clean means no duplicate PKs, no null PKs, no negatives."""
        return (
            self.pk_duplicates == 0
            and self.pk_nulls == 0
            and all(v == 0 for v in self.negative_counts.values())
        )


def run_data_quality_checks(
    df: DataFrame,
    pk_col: str,
    numeric_cols: tuple[str, ...],
) -> QualityReport:
    """Single-pass 6-rule DQ report (see module docstring)."""
    numeric_present = [c for c in numeric_cols if c in df.columns]
    aggs = [
        F.count("*").alias("__n"),
        (F.count("*") - F.countDistinct(pk_col)).alias("__dups"),
        F.count(F.when(F.col(pk_col).isNull(), 1)).alias("__pk_nulls"),
    ]
    for c in df.columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
    for c in numeric_present:
        aggs.append(F.count(F.when(F.col(c) < 0, 1)).alias(f"__neg_{c}"))
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.avg(c).alias(f"__avg_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    row = df.agg(*aggs).first()

    return QualityReport(
        n_rows=row["__n"],
        pk_duplicates=row["__dups"],
        pk_nulls=row["__pk_nulls"],
        null_counts={c: row[f"__null_{c}"] for c in df.columns},
        negative_counts={c: row[f"__neg_{c}"] for c in numeric_present},
        dtypes=dict(df.dtypes),
        numeric_summary={
            c: {"min": row[f"__min_{c}"], "mean": row[f"__avg_{c}"], "max": row[f"__max_{c}"]}
            for c in numeric_present
        },
    )


def fk_unresolved_counts(fact: DataFrame, fk_cols: list[str]) -> dict[str, int]:
    """§5.2 invariant helper: unresolved-FK counts after dimension joins
    (anti-join-empty check, transform.py:118-121)."""
    row = fact.agg(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in fk_cols]
    ).first()
    return {c: row[c] for c in fk_cols}
