"""Feature-engineering expressions (SURVEY §2.8 F6–F9, F13–F17, F19–F20).

The reference computes these as five sequential full-table MySQL UPDATEs
(elt/transforms.ipynb:cell9-13) or chained eager pandas passes
(etl_pipeline/transform.py:190-235). Here each is a Column expression;
composing them in one ``select`` lets Catalyst's CollapseProject fuse the
whole chain into a single projection — one pass over the data instead of
the reference's five.

Bucket boundary semantics are preserved exactly (they are asymmetric in the
reference — SURVEY §5.2): margin ``<0.10`` low / ``<=0.30`` medium;
shipping days ``<=3`` fast / ``<=7`` normal; order size ``<50`` small /
``<=200`` medium (elt/transforms.ipynb:cell10,cell12,cell13).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shipping_days(order_date: Column, ship_date: Column) -> Column:
    """F6: day difference (``DATEDIFF(ship, order)``)."""
    return F.datediff(ship_date.cast("date"), order_date.cast("date"))


def bucketize(col: Column, cuts: list[tuple], otherwise) -> Column:
    """F14 generalized: ordered (predicate_value, label) CASE chain.

    ``cuts`` is a list of (upper_bound, label, inclusive) evaluated in order,
    mirroring the reference's CASE WHEN chains."""
    expr = None
    for bound, label, inclusive in cuts:
        pred = col <= F.lit(bound) if inclusive else col < F.lit(bound)
        expr = F.when(pred, label) if expr is None else expr.when(pred, label)
    return expr.otherwise(otherwise)


def margin_category(margin: Column) -> Column:
    """F14: margin ``<0.10`` low / ``<=0.30`` medium / high
    (elt/transforms.ipynb:cell10)."""
    return bucketize(margin, [(0.10, "low", False), (0.30, "medium", True)], "high")


def shipping_speed_category(days: Column) -> Column:
    """F14: days ``<=3`` fast / ``<=7`` normal / slow
    (elt/transforms.ipynb:cell12)."""
    return bucketize(days, [(3, "fast", True), (7, "normal", True)], "slow")


def order_size_category(units: Column) -> Column:
    """F14: units ``<50`` small / ``<=200`` medium / large
    (elt/transforms.ipynb:cell13)."""
    return bucketize(units, [(50, "small", False), (200, "medium", True)], "large")


def clip_to_bounds(col: Column, lo: float, hi: float) -> Column:
    """F15: winsorize to driver-computed bounds (IQR clip,
    etl_pipeline/transform.py:37-58). Bounds are scalar literals — the clip
    itself stays a narrow, codegen'd expression."""
    return F.greatest(F.least(col, F.lit(hi)), F.lit(lo))


def min_max_norm(col: Column, cmin: float, cmax: float) -> Column:
    """F16: (x-min)/(max-min), constant 0.0 when max==min
    (etl_pipeline/transform.py:62-73)."""
    if cmax == cmin:
        return F.lit(0.0)
    return (col - F.lit(float(cmin))) / F.lit(float(cmax) - float(cmin))


def one_hot_exprs(col: Column, categories: list[str], prefix: str) -> list[Column]:
    """F17: one-hot with drop_first=True over a SORTED category list —
    reproduces ``pd.get_dummies(drop_first=True)``'s deterministic
    drop-first-alphabetical schema (etl_pipeline/transform.py:197-204).

    The category list comes from a driver-side ``distinct().collect()`` (tiny:
    these are low-cardinality categoricals); the generated columns are plain
    when/otherwise expressions — no StringIndexer model state to manage."""
    cats = sorted(categories)[1:]  # drop first alphabetical
    return [
        F.when(col == F.lit(c), F.lit(1)).otherwise(F.lit(0)).alias(f"{prefix}_{c}")
        for c in cats
    ]


def target_encode_loo(
    df, category_col: str, target_cents: "Column", out_col: str = "te_loo"
):
    """Leave-one-out target encoding: each row gets the mean of the target
    over the OTHER rows of its category — the leakage-safe categorical
    encoding for ML feature prep. Singleton categories encode as null.

    ``target_cents`` must be an exact integer expression (e.g. price in
    cents): the per-category sum/count come from one unordered window
    (a full-partition aggregate, partial-combinable, one shuffle on the
    category), and the single final division is IEEE-exact on any engine.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(category_col)
    s = F.sum(target_cents).over(w)
    n = F.count(target_cents).over(w)
    loo = F.when(
        n > 1, (s - target_cents).cast("double") / (n - 1) / F.lit(100.0)
    )
    return df.withColumn(out_col, loo)
