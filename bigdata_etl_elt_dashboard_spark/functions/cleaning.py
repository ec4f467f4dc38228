"""Cleaning expressions (SURVEY §2.8 F1–F5, F10–F12, F18; §2.2 P2–P3).

Reference behaviors being re-expressed:
- trim/upper of categoricals (etl_pipeline/transform.py:147-149,
  elt/hold.ipynb:cell7 ``UPPER(TRIM(...))``)
- ``%m/%d/%Y`` date parsing with coerce-to-null
  (etl_pipeline/transform.py:171 ``pd.to_datetime(errors="coerce")``,
  elt SQL ``STR_TO_DATE(col,'%m/%d/%Y')``)
- COALESCE fills (elt/transforms.ipynb:cell4,cell6)
- NULLIF-guarded division (elt/transforms.ipynb:cell9,cell11) — also keeps
  every expression ANSI-mode safe (Spark 4 default)
- snake_case column standardization (etl_pipeline/transform.py:77-80) and
  the dashboard's fuzzy case/space-insensitive column resolver
  (dashboard/app.py:17-26)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Reference date format is %m/%d/%Y; Spark tokens accept 1-2 digit M/d.
SALES_DATE_FORMAT = "M/d/yyyy"


def clean_category(col: Column | str, upper: bool = False) -> Column:
    """F1/F2: TRIM (optionally UPPER) a categorical value."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.upper(c) if upper else c


def parse_date(col: Column | str, fmt: str = SALES_DATE_FORMAT) -> Column:
    """F5: parse a date string, coercing failures to null.

    ``try_to_timestamp`` keeps coerce-to-null semantics even under ANSI mode
    (plain ``to_date`` raises on malformed input when ANSI is on)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)).cast("date")


def to_number(col: Column | str, dtype: str = "double") -> Column:
    """F18: numeric coercion with errors→null (``pd.to_numeric(errors="coerce")``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_cast(c, dtype)


def coalesce_fill(col: Column | str, *fallbacks: Column) -> Column:
    """F10: COALESCE chain (2- and 3-arg forms in the reference)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, *fallbacks)


def safe_div(num: Column, den: Column) -> Column:
    """F11: ``num / NULLIF(den, 0)`` — null (never Inf, never ANSI error) on /0."""
    return num / F.nullif(den, F.lit(0))


def normalize_name(name: str) -> str:
    """P2: ``strip().lower()`` + spaces→underscores on a column NAME."""
    return re.sub(r"\s+", "_", name.strip().lower())


def normalize_names(df: DataFrame) -> DataFrame:
    """P2 applied to a whole DataFrame (driver-side rename, zero-cost in plan)."""
    return df.toDF(*[normalize_name(c) for c in df.columns])


def resolve_column(df: DataFrame, wanted: str) -> str | None:
    """P3: fuzzy column lookup — case-insensitive, ignoring spaces/underscores
    (reference dashboard/app.py:17-26 ``get_col``)."""
    key = re.sub(r"[\s_]+", "", wanted).lower()
    for c in df.columns:
        if re.sub(r"[\s_]+", "", c).lower() == key:
            return c
    return None
