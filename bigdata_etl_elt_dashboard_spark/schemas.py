"""Explicit schemas (SURVEY §1).

The reference infers schemas on ingest (``pd.read_csv`` with no dtypes,
etl_pipeline/extract.py:44) and fixes them only at the MySQL DDL boundary
(etl_pipeline/load.py:57-139). Our engine is explicit end-to-end: every
source has a StructType, every write casts to the declared schema. At 100 TB
schema inference is both a correctness hazard and an extra full scan, so it
is never used outside ad-hoc exploration.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Sales model (the reference's logical base table; SURVEY §1.4)
# --------------------------------------------------------------------------

#: 14-column raw sales schema — mirrors the Kaggle "100000 Sales Records"
#: layout enumerated by TransformConfig (reference etl_pipeline/transform.py:12-30).
#: Dates arrive as M/d/yyyy strings and are parsed by transforms (F5).
SALES_RAW = T.StructType(
    [
        T.StructField("region", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("item_type", T.StringType()),
        T.StructField("sales_channel", T.StringType()),
        T.StructField("order_priority", T.StringType()),
        T.StructField("order_date", T.StringType()),
        T.StructField("order_id", T.LongType()),
        T.StructField("ship_date", T.StringType()),
        T.StructField("units_sold", T.IntegerType()),
        T.StructField("unit_price", T.DoubleType()),
        T.StructField("unit_cost", T.DoubleType()),
        T.StructField("total_revenue", T.DoubleType()),
        T.StructField("total_cost", T.DoubleType()),
        T.StructField("total_profit", T.DoubleType()),
    ]
)

#: Post-transform standardized schema (19 cols) — contract of the transform
#: stage; header of the reference's datalake/elt_sales_standardized.csv:1.
SALES_PROCESSED = T.StructType(
    list(SALES_RAW)
    + [
        T.StructField("cost_per_unit", T.DoubleType()),
        T.StructField("net_profit_ratio", T.DoubleType()),
        T.StructField("shipping_speed_category", T.StringType()),
        T.StructField("order_size_category", T.StringType()),
        T.StructField("margin_category", T.StringType()),
    ]
)

# Star-schema contracts (reference etl_pipeline/load.py:51-139).
DIM_DATE = T.StructType(
    [
        T.StructField("date_id", T.IntegerType(), False),
        T.StructField("order_date", T.DateType()),
        T.StructField("order_year", T.IntegerType()),
        T.StructField("order_month", T.IntegerType()),
    ]
)
DIM_COUNTRY = T.StructType(
    [
        T.StructField("country_id", T.IntegerType(), False),
        T.StructField("region", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)
DIM_ITEM = T.StructType(
    [
        T.StructField("item_id", T.IntegerType(), False),
        T.StructField("item_type", T.StringType()),
    ]
)
DIM_CHANNEL = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType(), False),
        T.StructField("sales_channel", T.StringType()),
    ]
)

# --------------------------------------------------------------------------
# Driver testdata (TPC-H-ish; FIXTURES.md §4) — used by queries()/bench
# --------------------------------------------------------------------------

TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TESTDATA)
