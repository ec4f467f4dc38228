"""Driver-gateable source/sink roundtrip queries (SURVEY §2.1 S1/S6/S7/S8).

Round-2 verdict: the whole S-family was pytest-verified but never held a
driver CORRECTNESS row, because scan/sink behavior is not a pure function of
the parquet inputs. These queries close that gap with the ROUNDTRIP-DIGEST
idiom: materialize a table through the layer under test (CSV write→scan, or
managed-table saveAsTable→spark.table), then reduce the read-back result to
an order-independent digest whose oracle is plain SQL over the ORIGINAL
parquet view. A green row proves the full write+read path preserved every
row, key, string, timestamp, and double bit-for-bit — if the layer mangled
quoting, date formats, or float text rendering, the digest diverges.

Reference anchors: CSV extract `etl_pipeline/extract.py:44`, full-refresh
load `etl_pipeline/load.py:143-157` (TRUNCATE+INSERT → mode("overwrite")).

Scale posture: the digests are single-pass partial-aggregatable reductions
(map-side combined, one 1-row reduce) — the natural cross-replica
validation shape for a 100 TB migration sign-off, same machinery as
`wh_orders_checksum`. The roundtrip target at test scale is a temp dir /
managed table; at production scale the same digest pair validates any
source→sink copy without colocating the replicas.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import readers, sinks
from .registry import register


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _gate_dir(sf_dir: str, leaf: str) -> str:
    """Deterministic per-SF temp location; overwrite-mode writes make the
    queries idempotent across repeated driver runs (no tempdir leak)."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), f"spark_graft_src_gate_{sf}", leaf)


_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"  # full microseconds: lossless roundtrip

_ORDERS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def _md5_prefix_sum(col: str):
    """Order-independent string-fidelity checksum: 40-bit md5 prefix summed
    in BIGINT (the wh_orders_checksum idiom)."""
    return F.sum(
        F.conv(F.substring(F.md5(F.col(col)), 1, 10), 16, 10).cast("long")
    )


@register(
    "src_csv_roundtrip_digest",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS price_cents_sum,
               CAST(SUM(CAST(epoch_us(o_orderdate) AS BIGINT) // 1000000)
                    AS BIGINT) AS epoch_sec_sum,
               CAST(SUM(('0x' || substr(md5(o_orderpriority), 1, 10))::BIGINT)
                    AS BIGINT) AS prio_hash_sum,
               COUNT(DISTINCT o_orderstatus) AS n_status
        FROM orders
    """,
    doc="S1+S6 driver gate: orders parquet → CSV sink (header, explicit "
    "microsecond timestamp format) → CSV scan with an EXPLICIT StructType "
    "(sources/readers.py read_csv — no inference pass) → one-pass digest. "
    "The oracle computes the identical digest on the original parquet, so "
    "a green row proves the CSV layer round-trips longs, Java-shortest "
    "double text, timestamps, and quoted strings losslessly. Reference: "
    "etl_pipeline/extract.py:44 (CSV extract), datalake CSV layer.",
)
def src_csv_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _gate_dir(sf_dir, "orders_csv")
    orders = table(spark, sf_dir, "orders")
    (
        orders.write.mode("overwrite")
        .option("header", True)
        .option("timestampNTZFormat", _TS_FMT)  # parquet timestamps are NTZ
        .csv(path)
    )
    back = readers.read_csv(
        spark, path, schema=_ORDERS_CSV_SCHEMA, timestampNTZFormat=_TS_FMT
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "price_cents_sum"
        ),
        F.sum(
            # NTZ has no epoch; the UTC session tz makes the cast an identity
            F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000")
        ).alias("epoch_sec_sum"),
        _md5_prefix_sum("o_orderpriority").alias("prio_hash_sum"),
        F.count_distinct(F.col("o_orderstatus")).alias("n_status"),
    )


@register(
    "src_table_roundtrip_digest",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS acctbal_cents_sum,
               CAST(SUM(('0x' || substr(md5(c_name), 1, 10))::BIGINT)
                    AS BIGINT) AS name_hash_sum,
               COUNT(DISTINCT c_mktsegment) AS n_segments
        FROM customer
    """,
    doc="S7+S8 driver gate: customer parquet → managed-table sink "
    "(sources/sinks.py save_as_table, mode=overwrite — the full-refresh "
    "TRUNCATE+INSERT replacement, reference etl_pipeline/load.py:143-157) "
    "→ catalog read-back via spark.table → one-pass digest vs the same "
    "digest on the original parquet. Gates the DDL/managed-table/"
    "overwrite layer end-to-end: atomicity of the overwrite, parquet "
    "fidelity of the managed copy, and catalog resolution.",
)
def src_table_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = "src_gate_customer_rt"
    cust = table(spark, sf_dir, "customer")
    # Idempotency across sessions: the warehouse DIRECTORY outlives the
    # in-memory catalog, and saveAsTable refuses a managed location it does
    # not own (LOCATION_ALREADY_EXISTS). Drop the catalog entry, then clear
    # any orphaned location left by a previous session.
    _drop_managed(spark, tbl)
    sinks.save_as_table(cust, tbl, mode="overwrite")
    back = spark.table(tbl)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("c_custkey").alias("key_sum"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias(
            "acctbal_cents_sum"
        ),
        _md5_prefix_sum("c_name").alias("name_hash_sum"),
        F.count_distinct(F.col("c_mktsegment")).alias("n_segments"),
    )


_DOCS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@register(
    "src_jsonl_roundtrip_digest",
    oracle="""
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum,
               CAST(SUM(('0x' || substr(md5(text), 1, 10))::BIGINT) AS BIGINT)
                   AS text_hash_sum,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum,
               COUNT(DISTINCT lang) AS n_langs,
               COUNT(DISTINCT source) AS n_sources,
               CAST(0 AS BIGINT) AS n_corrupt
        FROM documents
    """,
    doc="JSONL roundtrip driver gate — the corpus wire format (one JSON "
    "doc per line, splittable, append-only): documents parquet → "
    "spark.write.json → explicit-schema PERMISSIVE JSONL scan "
    "(sources/readers.read_jsonl) → one-pass digest vs the same digest "
    "on the original parquet, with every measure guarded to VALID rows "
    "and the reject count emitted as n_corrupt (must be 0 — a roundtrip "
    "of a valid corpus rejects nothing). The reject check rides INSIDE "
    "the aggregate rather than as a filter: a `_corrupt_record IS NULL` "
    "filter makes the corrupt column the only scan reference once an "
    "outer count() prunes the digest columns, and Spark refuses "
    "corrupt-column-only JSON scans (QUERY_ONLY_CORRUPT_RECORD_COLUMN — "
    "found by the harness-default full-registry sweep). A green row "
    "proves JSON string escaping, long fidelity, and reject routing "
    "reproduce the corpus byte-for-byte (text checksummed via the "
    "40-bit md5-prefix sum). The digest is a single partial-"
    "aggregatable reduce — the shape that validates a 100 TB corpus "
    "export without colocating copies.",
)
def src_jsonl_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _gate_dir(sf_dir, "documents_jsonl")
    docs = table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(path)
    back = readers.read_jsonl(spark, path, schema=_DOCS_JSONL_SCHEMA)
    ok = F.col("_corrupt_record").isNull()
    return back.agg(
        F.count(F.when(ok, 1)).alias("n_docs"),
        F.sum(F.when(ok, F.col("doc_id"))).alias("id_sum"),
        F.sum(
            F.when(
                ok,
                F.conv(F.substring(F.md5(F.col("text")), 1, 10), 16, 10).cast(
                    "long"
                ),
            )
        ).alias("text_hash_sum"),
        F.sum(F.when(ok, F.col("n_chars"))).alias("n_chars_sum"),
        F.count_distinct(F.when(ok, F.col("lang"))).alias("n_langs"),
        F.count_distinct(F.when(ok, F.col("source"))).alias("n_sources"),
        F.count("_corrupt_record").alias("n_corrupt"),
    )


def _drop_managed(spark: SparkSession, tbl: str) -> None:
    """DROP + clear any orphaned warehouse dir (see src_table_roundtrip)."""
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), tbl)
    if os.path.isdir(loc):
        import shutil

        shutil.rmtree(loc, ignore_errors=True)


@register(
    "src_bucketed_join_digest",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(o.o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents_sum,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents_sum,
               COUNT(DISTINCT l.l_suppkey) AS n_suppliers
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
    doc="Bucketed CO-LOCATED join driver gate — the shuffle-elimination "
    "layout a 100 TB lake uses for its hottest join key: orders and "
    "lineitem written as managed tables bucketBy(8, orderkey) + "
    "sortBy, re-read via the catalog, and joined on the bucket key — "
    "Spark plans a sort-merge join with ZERO Exchange on either side "
    "(both sides' bucketing satisfies the join's distribution; "
    "asserted by tests/test_scale_sources.py::"
    "test_bucketed_gate_join_plans_no_exchange), digested vs the same "
    "join over the original parquet. A green row proves the bucketed "
    "write+read+join path is lossless AND join-complete; the plan "
    "test proves it saves the shuffle that motivates bucketing.",
)
def src_bucketed_join_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ot, lt = "src_gate_orders_bkt", "src_gate_lineitem_bkt"
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_suppkey"
    )
    _drop_managed(spark, ot)
    _drop_managed(spark, lt)
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(ot)
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(lt)
    )
    o, l = spark.table(ot), spark.table(lt)
    j = o.join(l, o.o_orderkey == l.l_orderkey)
    return j.agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents_sum"
        ),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents_sum"
        ),
        F.count_distinct(F.col("l_suppkey")).alias("n_suppliers"),
    )


@register(
    "src_partitioned_prune_digest",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS price_cents_sum,
               COUNT(DISTINCT o_orderpriority) AS n_priorities
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1996 AND 1998
    """,
    doc="Hive-layout partitioned-write driver gate: orders re-written "
    "partitionBy(order_year) and read back with a year-range filter — "
    "the layout that turns the dashboard's date filter (SURVEY P7) into "
    "partition PRUNING instead of a 100 TB scan (directories outside "
    "1996–1998 contribute zero I/O; the pruning itself is plan-asserted "
    "by tests/test_scale_sources.py's PartitionFilters checks). The "
    "digest over the pruned read must hash-match the same digest the "
    "oracle computes with a plain WHERE over the original parquet — "
    "proving the partitioned write sheds no rows, mangles no values, "
    "and the partition column round-trips (it is encoded in directory "
    "names, not data pages, on the partitioned side).",
)
def src_partitioned_prune_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _gate_dir(sf_dir, "orders_by_year")
    orders = table(spark, sf_dir, "orders")
    (
        orders.withColumn(
            "order_year", F.year(F.col("o_orderdate").cast("date"))
        )
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        F.col("order_year").between(1996, 1998)
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "price_cents_sum"
        ),
        F.count_distinct(F.col("o_orderpriority")).alias("n_priorities"),
    )


@register(
    "src_compaction_digest",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS price_cents_sum,
               COUNT(DISTINCT o_orderstatus) AS n_status
        FROM orders
    """,
    doc="Small-files COMPACTION driver gate: orders deliberately written "
    "as 64 fragment files (the streaming-ingest pathology every lake "
    "accumulates — at 100 TB, million-file directories tax the driver's "
    "listing and every scan's task count), then rewritten by "
    "sources/sinks.compact_parquet (tmp-dir + swap with crash "
    "recovery) into ceil(bytes/128MB) right-sized files, read back, and "
    "digested vs the oracle over the original parquet. A green row proves the "
    "compaction rewrite sheds no rows and mangles no values; the file-"
    "count drop and the crash-recovery path are pinned by "
    "tests/test_scale_sources.py's compaction tests.",
)
def src_compaction_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import compact_parquet

    path = _gate_dir(sf_dir, "orders_fragmented")
    orders = table(spark, sf_dir, "orders")
    orders.repartition(64).write.mode("overwrite").parquet(path)
    compact_parquet(spark, path)
    back = spark.read.parquet(path)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "price_cents_sum"
        ),
        F.count_distinct(F.col("o_orderstatus")).alias("n_status"),
    )


@register(
    "src_orc_roundtrip_digest",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS price_cents_sum,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
               CAST(SUM(('0x' || substr(md5(l_returnflag || '|' || l_linestatus),
                                        1, 10))::BIGINT) AS BIGINT)
                   AS flag_hash_sum,
               COUNT(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem
    """,
    doc="ORC roundtrip driver gate — the Hive-era columnar interchange "
    "format: lineitem parquet → ORC sink → ORC scan "
    "(sources/readers.read_orc: same pushdown/pruning/vectorized decode "
    "surface as parquet, so a legacy ORC lake migrates with no query "
    "changes) → one-pass digest vs the same digest on the original "
    "parquet. Uses the widest fact table so the roundtrip stresses "
    "doubles, longs, and strings at volume. DuckDB cannot read ORC — "
    "irrelevant by construction: the oracle digests the ORIGINAL "
    "parquet, so a green row still proves the ORC write+read is "
    "lossless.",
)
def src_orc_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _gate_dir(sf_dir, "lineitem_orc")
    li = table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").orc(path)
    back = readers.read_orc(spark, path)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("l_orderkey").alias("key_sum"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents_sum"
        ),
        F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
        F.sum(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.col("l_returnflag"), F.col("l_linestatus")
                        )
                    ),
                    1,
                    10,
                ),
                16,
                10,
            ).cast("long")
        ).alias("flag_hash_sum"),
        F.count_distinct(F.col("l_suppkey")).alias("n_suppliers"),
    )


@register(
    "src_schema_evolution_digest",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS id_sum,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS price_cents_sum,
               COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_with_status,
               CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN
                        ('0x' || substr(md5(o_orderstatus), 1, 10))::BIGINT
                    END) AS BIGINT) AS status_hash_sum
        FROM orders
    """,
    doc="Schema-evolution driver gate: the warehouse reality that columns "
    "are ADDED over time and old files never rewrite. Orders are split "
    "into a v1 batch written WITHOUT o_orderstatus (even keys) and a v2 "
    "batch WITH it (odd keys); a mergeSchema parquet read over both "
    "batches must present the union schema with v1 rows NULL in the new "
    "column. The digest checksums row counts, key and price-cent sums "
    "over BOTH eras, and the status md5-prefix sum over the v2 era only "
    "— a green row proves column addition is non-destructive and NULL "
    "back-fill is exact, vs the same digest computed directly on the "
    "source table. mergeSchema is a footer-only union at plan time; the "
    "scan itself stays pruned and partial-aggregatable at any scale.",
)
def src_schema_evolution_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _gate_dir(sf_dir, "orders_evolution")
    v1_path, v2_path = os.path.join(base, "v1"), os.path.join(base, "v2")
    orders = table(spark, sf_dir, "orders")
    (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(v1_path)
    )
    (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .parquet(v2_path)
    )
    merged = spark.read.option("mergeSchema", "true").parquet(v1_path, v2_path)
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").alias("id_sum"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "price_cents_sum"
        ),
        F.count("o_orderstatus").alias("n_with_status"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("o_orderstatus")), 1, 10), 16, 10).cast(
                "long"
            )
        ).alias("status_hash_sum"),
    )


@register(
    "src_merge_upsert_digest",
    oracle="""
        WITH final AS (
            SELECT o_orderkey AS k,
                   CASE WHEN o_orderkey % 3 = 0
                        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 1000000
                        ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   END AS v
            FROM orders
            UNION ALL
            SELECT -o_orderkey AS k, o_custkey AS v
            FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(k) AS BIGINT) AS key_sum,
               CAST(SUM(v) AS BIGINT) AS v_sum
        FROM final
    """,
    doc="MERGE-upsert driver gate for the bucketed parquet-lake sink "
    "(sources/sinks.merge_upsert_parquet — the streaming capstone's gold "
    "layer): batch 1 inserts every order's price-cents keyed by orderkey; "
    "batch 2 UPDATES every key divisible by 3 (+1,000,000 cents) and "
    "INSERTS a disjoint negative-key row (custkey as value) for keys "
    "divisible by 7. The read-back digest (row count, key sum, value "
    "sum) matches the oracle's closed-form final state ONLY if updates "
    "replaced exactly their keys, inserts landed once, and untouched "
    "keys survived both merges — a mangled anti-join or double-applied "
    "batch shifts every column. Idempotent across driver runs (the gate "
    "dir is cleared first). Scale: each merge reads only the key-hash "
    "buckets its batch touches and rewrites them via dynamic partition "
    "overwrite; the digest is one partial-aggregatable pass.",
)
def src_merge_upsert_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    path = _gate_dir(sf_dir, "orders_merge")
    shutil.rmtree(path, ignore_errors=True)
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    sinks.merge_upsert_parquet(orders.select("k", "v"), path, ["k"], n_buckets=8)
    upd = orders.filter(F.col("k") % 3 == 0).select(
        "k", (F.col("v") + 1_000_000).alias("v")
    )
    ins = orders.filter(F.col("k") % 7 == 0).select(
        (-F.col("k")).alias("k"), F.col("o_custkey").alias("v")
    )
    sinks.merge_upsert_parquet(upd.unionByName(ins), path, ["k"], n_buckets=8)
    back = spark.read.parquet(path).drop("_bucket")
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("k").alias("key_sum"),
        F.sum("v").alias("v_sum"),
    )
