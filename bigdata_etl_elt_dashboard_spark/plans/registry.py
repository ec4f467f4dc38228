"""Query registry.

Each implemented operator from SURVEY §2 registers here with:
- a PySpark implementation ``fn(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL oracle string (DuckDB dialect) — or None for
  genuinely non-SQL-expressible ops (the driver then records a weaker
  rows-only check; SURVEY §5.2).

Contract (driver): column names must match between the Spark result and the
oracle result — the comparator sorts columns by name before hashing — so
every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
