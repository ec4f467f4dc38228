"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``bigdata_etl_elt_dashboard_spark``; this module is
a thin adapter over its query registry (plans.registry.REGISTRY).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importable regardless of the harness's working directory.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from bigdata_etl_elt_dashboard_spark.plans import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: top-5 nations by revenue —
    scan → broadcast joins → hash agg → top-k (SURVEY §7.2 step 2)."""
    return REGISTRY["q3_top5_nations_by_revenue"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §7.5
    extensions). Each callable takes (spark, sf_dir) → DataFrame."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
