"""Column-expression library (SURVEY §2.8).

Every scalar operation the reference performs — in pandas or in MySQL SQL —
re-expressed as built-in Spark Column expressions. Nothing here is a Python
UDF: all of it stays inside whole-stage codegen (SURVEY §2.11 confirms the
reference surface needs zero UDFs).
"""

from .cleaning import (
    clean_category,
    coalesce_fill,
    normalize_name,
    normalize_names,
    parse_date,
    resolve_column,
    safe_div,
    to_number,
)
from .features import (
    bucketize,
    clip_to_bounds,
    margin_category,
    min_max_norm,
    one_hot_exprs,
    order_size_category,
    shipping_days,
    shipping_speed_category,
)

__all__ = [
    "bucketize",
    "clean_category",
    "clip_to_bounds",
    "coalesce_fill",
    "margin_category",
    "min_max_norm",
    "normalize_name",
    "normalize_names",
    "one_hot_exprs",
    "order_size_category",
    "parse_date",
    "resolve_column",
    "safe_div",
    "shipping_days",
    "shipping_speed_category",
    "to_number",
]
