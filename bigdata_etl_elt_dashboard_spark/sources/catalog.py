"""Table catalog over the parquet data lake.

Replaces the reference's MySQL databases (``dw_sales``/``elt_sales_db``) and
CSV datalake layers (SURVEY §1.1) with a parquet lake: columnar storage,
min/max statistics for predicate pushdown, and partition pruning come free.

One quirk is isolated here: ``events.parquet`` timestamp encoding varies by
testdata generation. Two cases are normalized to a session-timezone
TimestampType ``ts`` column so every downstream operator (``unix_micros``,
``session_window``, watermarks) sees one type:

- TIMESTAMP(NANOS): Spark's parquet reader rejects it by default, so we flip
  ``spark.sql.legacy.parquet.nanosAsLong`` for the read (runtime-settable,
  restored afterwards) and rebuild microseconds with integer division —
  ``ts div 1000`` — because nanosecond longs (~1.7e18) exceed double's 2^53
  exact-integer range. Truncation toward negative infinity matches DuckDB's
  ns→us read path.
- TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ, which
  ``unix_micros`` & co. reject. The session timezone is pinned UTC
  (``session.py``), so a plain cast to TimestampType reinterprets the naive
  value as UTC — epoch-identical to DuckDB's ``epoch_us`` on the same file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the nanosecond-timestamp events table; see module docstring."""
    try:
        prev = spark.conf.get(_NANOS_CONF)
    except Exception:
        prev = None
    spark.conf.set(_NANOS_CONF, "true")
    try:
        raw = spark.read.parquet(path)
    finally:
        if prev is not None:
            spark.conf.set(_NANOS_CONF, prev)
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


#: memoized lazy scans: a DataFrame is an immutable logical plan, so reusing
#: one per (session, path) skips repeated file listing + footer schema reads
#: when many registry queries touch the same tables (bench/correctness runs).
#: Keyed on applicationId, not id(spark): CPython can reuse the id() of a
#: stopped, garbage-collected session, which would hand back DataFrames bound
#: to a dead SparkContext; applicationId is unique per started context.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = _read_events(spark, path) if name == "events" else spark.read.parquet(path)
    _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    names: tuple[str, ...] = TABLE_NAMES,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Load the testdata tables; optionally register them as temp views so
    the SQL surface (`plans.elt`) can run ``spark.sql`` against them."""
    out = {}
    for name in names:
        df = table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
