"""bigdata_etl_elt_dashboard_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference project ``afebrioo/bigdata-etl-elt-dashboard``
(a pandas-ETL + MySQL-ELT + Streamlit-dashboard pipeline; see SURVEY.md):

- ``session``    — SparkSession factory (AQE on, UTC, deterministic configs)
- ``schemas``    — explicit StructTypes for the sales model + testdata tables
- ``sources``    — readers (csv/parquet/jdbc), the table catalog, sinks
- ``functions``  — scalar/cleaning/feature column expressions (SURVEY §2.8)
- ``operators``  — transforms, data-quality, star-schema warehouse, dedup,
                   similarity search, text analysis, multimodal plumbing
- ``plans``      — the query registry: reference-parity analytics (q1–q8,
                   notebook aggregations, dashboard aggregations) + extensions
- ``streaming``  — Structured Streaming over the ``events`` table with
                   batch-equivalent (oracle-checkable) versions

Design stance (SURVEY §4, §7): everything is declared with the DataFrame /
Spark SQL API so Catalyst supplies pushdown, pruning, join selection, and
whole-stage codegen; there are no custom Catalyst rules, no RDDs, and no
row-at-a-time Python UDFs on the hot path.
"""

__version__ = "0.1.0"
