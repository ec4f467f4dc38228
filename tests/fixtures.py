"""Literal test fixtures (FIXTURES.md §1/§5): two sales sources with planted
defects — duplicates (within and across sources), NULL PKs, NULL numerics,
negative costs, malformed dates, boundary bucket values — with exact
expected counts for the DQ tests."""

from __future__ import annotations

from pyspark.sql import SparkSession

from bigdata_etl_elt_dashboard_spark.schemas import SALES_RAW

# (region, country, item_type, sales_channel, order_priority, order_date,
#  order_id, ship_date, units_sold, unit_price, unit_cost, total_revenue,
#  total_cost, total_profit)

LOCAL_ROWS = [
    # clean rows; margin ratios sit exactly ON bucket boundaries 0.10/0.30,
    # shipping 3/7 days, sizes 50/200 units (asymmetric-bound tests)
    ("Europe", "France", "Fruit", "Online", "H", "1/5/2020", 1, "1/8/2020", 49, 2.0, 1.0, 98.0, 49.0, 9.8),     # 3 ship days (fast, <=3); 49 units (small, <50); margin exactly 0.10 → medium
    ("Europe", "Germany", "Meat", "Offline", "L", "1/5/2020", 2, "1/12/2020", 50, 4.0, 2.0, 200.0, 100.0, 60.0),  # 7 days (normal, <=7); 50 units (medium boundary); margin 0.30 → medium
    ("Asia", "Japan", "Fruit", "Online", "M", "2/1/2020", 3, "2/9/2020", 200, 1.0, 0.5, 200.0, 100.0, 100.0),  # 8 days (slow); 200 units (medium, <=200); margin 0.5 high
    ("Asia", "China", "Cereal", "Offline", "C", "2/2/2020", 4, "2/3/2020", 201, 1.0, 0.5, 201.0, 100.5, 20.1),  # 201 units (large); margin exactly 0.10 → medium
    # duplicate order_id within local (id 5 twice) → dedup keeps first by source_rank then pk order
    ("Europe", "Spain", "Fruit", "Online", "H", "3/1/2020", 5, "3/4/2020", 10, 2.0, 1.0, 20.0, 10.0, 2.0),
    ("Europe", "Spain", "Fruit", "Online", "H", "3/2/2020", 5, "3/5/2020", 11, 2.0, 1.0, 22.0, 11.0, 2.2),
    # NULL region (smart-fill target), NULL units_sold (median impute)
    (None, "France", "Meat", "Online", "L", "3/3/2020", 6, "3/6/2020", None, 3.0, 1.5, None, None, None),
    # malformed date → coerced to null → dropped by P5
    ("Africa", "Egypt", "Fruit", "Offline", "M", "13/45/2020", 7, "1/1/2020", 5, 1.0, 0.5, 5.0, 2.5, 0.5),
    # negative total_cost (range-check planted defect)
    ("Africa", "Kenya", "Cereal", "Online", "H", "4/1/2020", 8, "4/2/2020", 20, 1.0, 0.5, 20.0, -10.0, 30.0),
    # extreme profit outlier (IQR clip target)
    ("Asia", "India", "Meat", "Offline", "L", "4/2/2020", 9, "4/9/2020", 30, 10.0, 5.0, 300.0, 150.0, 100000.0),
]

API_ROWS = [
    # overlaps local id 5 → cross-source dedup (local wins via source_rank)
    ("Europe", "Spain", "Fruit", "ONLINE ", "H", "3/1/2020", 5, "3/4/2020", 10, 2.0, 1.0, 20.0, 10.0, 2.0),
    # unique api rows
    ("America", "Brazil", "Fruit", "Online", "M", "5/1/2020", 10, "5/3/2020", 60, 2.0, 1.0, 120.0, 60.0, 12.0),
    ("America", "Mexico", "Cereal", "Offline", "C", "5/2/2020", 11, "5/4/2020", 70, 2.0, 1.0, 140.0, 70.0, 14.0),
    # NULL PK (referential-integrity planted defect — survives as a row but
    # counted by rule 5; dedup window keeps it in its own null-key group)
    ("America", "Peru", "Meat", "Online", "H", "5/3/2020", None, "5/5/2020", 10, 1.0, 0.5, 10.0, 5.0, 1.0),
]


def sales_sources(spark: SparkSession):
    """Return (df_local, df_api) fixture DataFrames."""
    return (
        spark.createDataFrame(LOCAL_ROWS, SALES_RAW),
        spark.createDataFrame(API_ROWS, SALES_RAW),
    )
