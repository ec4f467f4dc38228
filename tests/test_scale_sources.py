"""Scale-path primitives (salting, bucketing, stateful streaming) and the
source/sink layer: equivalence to unsalted twins, shuffle elimination via
bucketed tables, state carried across streaming restarts, and partition
pruning from the sink's layout."""

from __future__ import annotations

import datetime as dt
import os

import pytest
import zipfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_etl_elt_dashboard_spark.operators import scale as SC
from bigdata_etl_elt_dashboard_spark.sources import readers, sinks
from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
    running_user_totals,
    stream_dedup_exact,
)


def _skewed_df(spark):
    # user 1 owns ~70% of rows — the shape that funnels into one task unsalted
    rows = [(i, 1 if i % 10 < 7 else i % 10, float(i % 100)) for i in range(1000)]
    return spark.createDataFrame(rows, "event_id long, user_id long, value double")


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["user_id"]: (r["n"], r["s"], r["m"])
        for r in df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"), F.max("value").alias("m"))
        .collect()
    }
    salted = {
        r["user_id"]: (r["n"], r["s"], r["m"])
        for r in SC.salted_agg(
            df,
            keys=["user_id"],
            measures={
                "n": ("count", F.lit(1)),
                "s": ("sum", F.col("value")),
                "m": ("max", F.col("value")),
            },
            salt_from="event_id",
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [(u, f"user_{u}") for u in range(10)], "user_id long, user_name string"
    )
    plain = sorted(
        (r["event_id"], r["user_name"]) for r in fact.join(dim, "user_id").collect()
    )
    salted = sorted(
        (r["event_id"], r["user_name"])
        for r in SC.salted_broadcast_join(
            fact, dim, key="user_id", salt_from="event_id", buckets=8
        ).collect()
    )
    assert salted == plain


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Co-located join (SURVEY q8 doc: 'at 100 TB co-bucket both tables on
    orderkey'): with both sides bucketed on the join key, the sort-merge
    join needs NO Exchange."""
    fact = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    )
    dim = spark.range(0, 10000, 7).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    for name, df in (("t_bkt_fact", fact), ("t_bkt_dim", dim)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(name)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bkt_fact").join(spark.table("t_bkt_dim"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == len(range(0, 10000, 7))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bkt_fact")
        spark.sql("DROP TABLE IF EXISTS t_bkt_dim")


def test_bucketed_gate_join_plans_no_exchange(spark, sf_smoke):
    """The driver-gated src_bucketed_join_digest must actually get the
    shuffle elimination that motivates it: after the query writes its
    bucketed managed tables, the orders⋈lineitem join over them must be
    a sort-merge join with ZERO Exchange on the probe/build sides."""
    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

    # run once (writes the bucketed tables + returns the 1-row digest)
    assert REGISTRY["src_bucketed_join_digest"].fn(spark, sf_smoke).count() == 1
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table("src_gate_orders_bkt")
        l = spark.table("src_gate_lineitem_bkt")
        joined = o.join(l, o.o_orderkey == l.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_stateful_totals_survive_restart(spark, tmp_path):
    """applyInPandasWithState: state lives in the checkpoint, so a second
    availableNow run resumes the per-user totals instead of recounting."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    sink = str(tmp_path / "sink")

    def run(qname):
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(sink)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # update mode emits one row per touched user per micro-batch;
        # the latest emission (max n_events — totals only grow) is the state
        out: dict[int, tuple[int, float]] = {}
        for r in spark.read.parquet(sink).collect():
            cur = out.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                out[r["user_id"]] = (r["n_events"], r["total_value"])
        return out

    t0 = dt.datetime(2024, 3, 1, 10, 0)
    write([(1, t0, 1, 1.5), (2, t0, 1, 2.5), (3, t0, 2, 10.0)])
    first = run("stateful_run1")
    assert first[1] == (2, 4.0) and first[2] == (1, 10.0)

    write([(4, t0, 1, 1.0), (5, t0, 3, 7.0)])
    second = run("stateful_run2")
    # user 1 resumed from n=2/total=4.0 — not recounted from zero
    assert second[1] == (3, 5.0)
    assert second[3] == (1, 7.0)
    # batch cross-check: stream state == plain groupBy over everything
    batch = {
        r["user_id"]: (r["n"], r["t"])
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    merged = {**first, **second}
    assert merged == batch


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", None)], schema)
    path = str(tmp_path / "csv_out")
    sinks.write_csv(df, path)
    back = readers.read_csv(spark, path, schema=schema)
    assert back.schema == schema
    assert sorted((r["id"], r["name"], r["amount"]) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", None),
    ]


def test_partitioned_parquet_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, 2020 + i % 3, float(i)) for i in range(300)],
        "order_id long, order_year int, amount double",
    )
    path = str(tmp_path / "fact")
    sinks.write_parquet(df, path, partition_by=["order_year"])
    assert any(n.startswith("order_year=") for n in os.listdir(path))
    back = spark.read.parquet(path).filter(F.col("order_year") == 2021)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "2021" in plan.split("PartitionFilters:")[1].split("]")[0]
    assert back.count() == 100


def test_land_archive_zip(tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("a,b\n1,2\n")
    archive = tmp_path / "bundle.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        zf.write(csv, "data.csv")
    landed = readers.land_archive(str(archive), str(tmp_path / "landing"))
    assert len(landed) == 1 and landed[0].endswith("data.csv")
    assert open(landed[0]).read() == "a,b\n1,2\n"


def test_stream_dedup_exact_across_batches(spark, tmp_path):
    """dropDuplicates on a stream keeps a seen-set in the checkpoint: a key
    replayed in a LATER micro-batch (a re-delivered event) must not be
    emitted twice."""
    import datetime as dt

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    t0 = dt.datetime(2024, 3, 1, 10, 0)

    def write(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            stream_dedup_exact(stream, "event_id")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(r["event_id"] for r in spark.read.parquet(sink).collect())

    write([(1, t0, 1, 1.0), (2, t0, 1, 2.0), (2, t0, 1, 2.0)])  # in-batch dup
    assert run() == [1, 2]
    write([(2, t0, 1, 2.0), (3, t0, 2, 3.0)])  # cross-batch replay of id 2
    assert run() == [1, 2, 3]


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S3/S4/S5 against an embedded Derby DB (ships with Spark): overwrite
    sink, plain scan, and a partitioned range scan that fans out over
    numPartitions parallel connections."""
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) + 0.5) for i in range(10)],
        "id bigint, name string, amount double",
    )
    sinks.write_jdbc(df, url, "t_sales", mode="overwrite", properties=props)
    # append mode: second write adds rows (S4)
    sinks.write_jdbc(df.limit(2), url, "t_sales", mode="append", properties=props)

    back = readers.read_jdbc(spark, url, "t_sales", properties=props)
    assert back.count() == 12

    part = readers.read_jdbc(
        spark,
        url,
        "t_sales",
        properties=props,
        partition_column="id",
        lower_bound=0,
        upper_bound=10,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 12
    got = {r["id"] for r in part.collect()}
    assert got == set(range(10))


def test_csv_malformed_row_handling(spark, tmp_path):
    """S1 defensive-read semantics: PERMISSIVE captures a malformed row in
    the corrupt-record column (the row-level analog of the reference's
    errors='coerce'), DROPMALFORMED silently drops it."""
    p = tmp_path / "bad.csv"
    p.write_text("id,amount\n1,1.5\nnot_a_number,oops,extra\n3,2.5\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    permissive = readers.read_csv(
        spark,
        str(p),
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()
    bad = permissive.filter(F.col("_corrupt_record").isNotNull()).collect()
    good = permissive.filter(F.col("_corrupt_record").isNull()).collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]["_corrupt_record"]
    assert sorted(r["id"] for r in good) == [1, 3]

    dropped = readers.read_csv(
        spark,
        str(p),
        schema=T.StructType(schema.fields[:2]),
        mode="DROPMALFORMED",
    )
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]


def test_approx_sketches_error_bounds(spark, sf_oracle):
    """HLL distinct counts within the configured 2% rsd (allow 3x slack),
    t-digest median within 5% of exact — the contract that justifies
    replacing exact distinct/percentile at 100 TB."""
    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY
    from bigdata_etl_elt_dashboard_spark.sources.catalog import table as load

    approx = {
        r["event_type"]: (r["approx_users"], r["approx_median_value"])
        for r in REGISTRY["agg_approx_sketches"].fn(spark, sf_oracle).collect()
    }
    exact = {
        r["event_type"]: (r["exact_users"], r["exact_median"])
        for r in load(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.expr("percentile(value, 0.5)").alias("exact_median"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et, (au, am) in approx.items():
        eu, em = exact[et]
        assert abs(au - eu) / eu <= 0.06, f"{et}: HLL off by {abs(au-eu)/eu:.1%}"
        assert abs(am - em) / max(abs(em), 1e-9) <= 0.05, f"{et}: median off"


def test_asof_join_semantics(spark):
    """Inclusive (>=) as-of: a right row at exactly the left ts matches;
    earlier rights carry forward; lefts before any right get null."""
    from bigdata_etl_elt_dashboard_spark.operators.temporal import asof_join

    t = lambda m: dt.datetime(2024, 3, 1, 10, m)
    left = spark.createDataFrame(
        [(1, 1, t(0)), (2, 1, t(5)), (3, 1, t(20)), (4, 2, t(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(5), 50.0), (1, t(10), 100.0), (2, t(40), 7.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: r["asof_v"]
        for r in asof_join(left, right, "user_id", "ts", ["v"]).collect()
    }
    assert out[1] is None          # before any right row
    assert out[2] == 50.0          # right at exactly ts matches (inclusive)
    assert out[3] == 100.0         # latest at-or-before carries forward
    assert out[4] is None          # other key's rights never leak; 10:40 is after


def test_asof_join_null_payload_is_row_recency(spark):
    """A right row whose MEASUREMENT is null still wins as-of recency —
    the result is null, not an older row's value (ASOF attaches the most
    recent ROW; value-presence is a separate question). The r12 variant
    sweep caught the bare-value carry-forward skipping null payloads and
    silently resurrecting stale values; the struct-wrapped carry keeps
    row-recency and value-presence distinct."""
    from bigdata_etl_elt_dashboard_spark.operators.temporal import asof_join

    t = lambda m: dt.datetime(2024, 3, 1, 10, m)
    left = spark.createDataFrame(
        [(1, 1, t(20)), (2, 1, t(40))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(5), 50.0), (1, t(10), None), (1, t(30), 7.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: r["asof_v"]
        for r in asof_join(left, right, "user_id", "ts", ["v"]).collect()
    }
    assert out[1] is None  # most recent row (10:10) wins; its value IS null
    assert out[2] == 7.0   # a later real value supersedes the null row


def test_range_join_boundaries(spark):
    """[ts-600s, ts) inclusivity: a right row exactly 600s before is IN,
    one at exactly ts is OUT; bucket-boundary crossings are covered by the
    two-bucket probe."""
    from bigdata_etl_elt_dashboard_spark.operators.temporal import range_join

    t = lambda m, s=0: dt.datetime(2024, 3, 1, 10, m, s)
    left = spark.createDataFrame(
        [(1, 1, t(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, t(0), 1.0),    # exactly ts-600 -> included
            (1, t(9, 59), 2.0),  # just before ts -> included (crosses bucket)
            (1, t(10), 4.0),   # exactly ts -> excluded
            (2, t(5), 8.0),    # other key -> excluded
        ],
        "user_id long, ts timestamp, value double",
    )
    out = (
        range_join(left, right, "user_id", "ts", "ts", 600)
        .groupBy("event_id")
        .agg(F.count("r_ts").alias("n"), F.sum("r_value").alias("s"))
        .collect()
    )
    assert len(out) == 1 and out[0]["n"] == 2 and out[0]["s"] == 3.0


def test_range_join_row_level_left_semantics(spark):
    """Round-1 advice: the two-bucket probe explode must NOT leak padding
    rows. A matched left row emits exactly its matches (no extra null row
    from the other probe); an unmatched left row emits exactly ONE
    null-padded row — so count(*) consumers are correct, not just
    count(non-null) ones."""
    from bigdata_etl_elt_dashboard_spark.operators.temporal import range_join

    t = lambda m, s=0: dt.datetime(2024, 3, 1, 10, m, s)
    left = spark.createDataFrame(
        [(1, 1, t(10)), (2, 1, t(50)), (3, 2, t(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(5), 1.0), (1, t(9), 2.0)],  # matches left event 1 only
        "user_id long, ts timestamp, value double",
    )
    rows = range_join(left, right, "user_id", "ts", "ts", 600).collect()
    by_event = {}
    for r in rows:
        by_event.setdefault(r["event_id"], []).append(r)
    # matched row: exactly its 2 matches, no null padding
    assert len(by_event[1]) == 2
    assert all(r["r_ts"] is not None for r in by_event[1])
    # unmatched rows (wrong time / wrong key): exactly one null row each
    for eid in (2, 3):
        assert len(by_event[eid]) == 1
        assert by_event[eid][0]["r_ts"] is None
    # total row count == left matched rows + 1 per unmatched left row
    assert len(rows) == 4


def test_compact_parquet_small_files(spark, tmp_path):
    """64 tiny files -> 1 compacted file, same rows/values."""
    path = str(tmp_path / "many")
    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )
    df.repartition(64).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 32  # genuinely fragmented

    n_files = sinks.compact_parquet(spark, path, target_file_mb=128)
    assert n_files == 1
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after == 1
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("v")).first()[0] == sum(i * 2.0 for i in range(10000))


def test_read_jsonl_permissive_quarantine(spark, tmp_path):
    """JSONL corpus ingest: valid lines parse against the explicit schema;
    malformed lines land in _corrupt_record instead of failing the job."""
    from pyspark.sql import types as T

    from bigdata_etl_elt_dashboard_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        "this line is not json at all\n"
        '{"doc_id": 3, "text": "unterminated\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    # cache() before splitting: Spark disallows queries referencing only
    # the corrupt column on raw JSON (see read_jsonl docstring)
    df = read_jsonl(spark, str(p), schema).cache()
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
        assert bad.count() == 2  # the non-JSON line and the truncated line
        # rejects keep the raw line for quarantine/debugging
        assert any("not json" in r["_corrupt_record"] for r in bad.collect())
    finally:
        df.unpersist()


def test_write_clustered_prunes_and_sorts(spark, tmp_path):
    """Layout write: a partition filter must prune directories at plan time
    (PartitionFilters in the scan), and rows inside each file must be
    sorted by the cluster key (tight parquet min/max ranges)."""
    import glob

    import pyarrow.parquet as pq

    path = str(tmp_path / "clustered")
    df = spark.range(0, 9000).select(
        (F.col("id") % 3 + 2020).cast("int").alias("order_year"),
        # a key uncorrelated with insertion order: clustering must re-sort
        F.pmod(F.col("id") * 2654435761, F.lit(100000)).alias("custkey"),
        F.col("id").alias("payload"),
    )
    sinks.write_clustered(df, path, ["order_year"], ["custkey"])

    filtered = spark.read.parquet(path).filter(F.col("order_year") == 2021)
    assert filtered.count() == 3000
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "order_year" in plan.split("PartitionFilters")[1][:200]

    # every data file belongs to exactly one partition dir and is sorted by
    # the cluster key within the file
    files = glob.glob(os.path.join(path, "order_year=*", "*.parquet"))
    assert files
    for f in files:
        ck = pq.read_table(f, columns=["custkey"])["custkey"].to_pylist()
        assert ck == sorted(ck), f"file not clustered: {f}"


def test_compact_parquet_recovers_stranded_swap(spark, tmp_path):
    """Round-1 advice: a crash between the two directory moves strands data
    at path._compact_old. On the next run the operator must restore it (and
    discard any half-written ._compact_tmp) before compacting."""
    import shutil

    path = str(tmp_path / "lake")
    spark.range(0, 1000).select(F.col("id"), (F.col("id") + 1.0).alias("v")) \
        .repartition(8).write.parquet(path)

    # simulate: crash after `move(path, old)` but before `move(tmp, path)`
    shutil.move(path, path + "._compact_old")
    os.makedirs(path + "._compact_tmp")  # half-written rewrite left behind
    assert not os.path.exists(path)

    n_files = sinks.compact_parquet(spark, path, target_file_mb=128)
    assert n_files == 1
    assert not os.path.exists(path + "._compact_old")
    assert not os.path.exists(path + "._compact_tmp")
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == sum(i + 1.0 for i in range(1000))


def test_compact_parquet_chaos_crash_mid_swap(spark, tmp_path, monkeypatch):
    """Chaos test (round-2 advice): CRASH the compacter mid-swap for real —
    monkeypatched shutil.move raises on the second move (after ``path`` has
    been moved to ._compact_old, before ._compact_tmp takes its place) —
    then assert the documented recovery path restores the data bit-for-bit
    on the next run. Stronger than hand-built crash state: the stranded
    layout is produced by the operator's own failure, not simulated."""
    import shutil

    path = str(tmp_path / "lake")
    spark.range(0, 1000).select(F.col("id"), (F.col("id") + 1.0).alias("v")) \
        .repartition(8).write.parquet(path)
    expected_sum = sum(i + 1.0 for i in range(1000))

    real_move = shutil.move
    calls = {"n": 0}

    def dying_move(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the tmp -> path move: die in the swap window
            raise OSError("chaos: process killed mid-swap")
        return real_move(src, dst)

    monkeypatch.setattr(shutil, "move", dying_move)
    with pytest.raises(OSError, match="chaos"):
        sinks.compact_parquet(spark, path, target_file_mb=128)
    monkeypatch.setattr(shutil, "move", real_move)

    # crash window state: path is gone, data stranded at ._compact_old
    assert not os.path.exists(path)
    assert os.path.exists(path + "._compact_old")

    # next run must restore, discard the tmp, and complete the compaction
    n_files = sinks.compact_parquet(spark, path, target_file_mb=128)
    assert n_files == 1
    assert not os.path.exists(path + "._compact_old")
    assert not os.path.exists(path + "._compact_tmp")
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == expected_sum


def test_overwrite_partitions_is_surgical(spark, tmp_path):
    """Dynamic partition overwrite replaces only the incoming partitions:
    re-loading 2021 leaves 2020 untouched and fully replaces 2021."""
    path = str(tmp_path / "wh")
    b1 = spark.createDataFrame(
        [(1, 2020, 1.0), (2, 2020, 2.0), (3, 2021, 3.0)],
        "id long, order_year int, v double",
    )
    sinks.overwrite_partitions(b1, path, ["order_year"])
    b2 = spark.createDataFrame([(9, 2021, 9.0)], "id long, order_year int, v double")
    sinks.overwrite_partitions(b2, path, ["order_year"])

    back = spark.read.parquet(path)
    got = {(r["order_year"], r["id"]): r["v"] for r in back.collect()}
    assert got == {(2020, 1): 1.0, (2020, 2): 2.0, (2021, 9): 9.0}
    # conf restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"


def test_orc_roundtrip(spark, tmp_path):
    """ORC sink/reader round-trip preserves schema and values, including a
    partitioned layout whose partition filter prunes at plan time."""
    path = str(tmp_path / "orc")
    df = spark.createDataFrame(
        [(1, 2020, "a", 1.5), (2, 2020, "b", 2.5), (3, 2021, "c", 3.5)],
        "id long, order_year int, tag string, v double",
    )
    sinks.write_orc(df, path, partition_by=["order_year"])
    back = readers.read_orc(spark, path)
    got = {(r["order_year"], r["id"]): (r["tag"], r["v"]) for r in back.collect()}
    assert got == {(2020, 1): ("a", 1.5), (2020, 2): ("b", 2.5), (2021, 3): ("c", 3.5)}

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("order_year") == 2021).explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "order_year" in plan.split("PartitionFilters")[1][:200]


def test_zorder_value_interleaves_bits():
    """zorder_value is the Morton curve: (x=0b11, y=0b00, 2 bits) puts x's
    bits at even positions -> 0b0101; adjacent cells differ by curve step."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (1, 1)], "x int, y int")
    z = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", sinks.zorder_value([F.col("x"), F.col("y")], bits=2).alias("z")).collect()
    }
    assert z == {(3, 0): 0b0101, (0, 3): 0b1010, (3, 3): 0b1111, (1, 1): 0b0011}


def test_zorder_write_tightens_file_bounding_boxes(spark, tmp_path):
    """The point of Z-ordering: every output file covers a small bounding
    box in BOTH curve dimensions, so min/max skipping works for filters on
    either column. Against an unsorted layout with the same file count,
    the mean per-file bbox area must shrink by >2x (it's typically ~8x)."""
    n_files = 8
    df = spark.range(0, 8000).select(
        (F.col("id") % 97).alias("x"),
        (F.col("id") * 37 % 89).alias("y"),
    )
    plain_path = str(tmp_path / "plain")
    z_path = str(tmp_path / "zorder")
    df.repartition(n_files).write.parquet(plain_path)
    sinks.write_zorder(df, z_path, ["x", "y"], n_files=n_files)

    def mean_bbox_area(path):
        import glob

        files = glob.glob(os.path.join(path, "*.parquet"))
        assert len(files) == n_files
        areas = []
        for f in files:
            part = spark.read.parquet(f).agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")
            ).first()
            areas.append((part[1] - part[0] + 1) * (part[3] - part[2] + 1))
        return sum(areas) / len(areas)

    plain_area = mean_bbox_area(plain_path)
    z_area = mean_bbox_area(z_path)
    assert z_area * 2 < plain_area, (z_area, plain_area)

    # values survive the layout rewrite
    assert spark.read.parquet(z_path).count() == 8000


def test_stream_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a key re-delivered INSIDE the horizon
    is dropped; once the watermark passes the key's timestamp, its state is
    evicted and the same key re-emits — proving state is bounded by the
    horizon rather than growing forever."""
    import datetime as dt

    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        stream_dedup_within_watermark,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    t0 = dt.datetime(2024, 3, 1, 10, 0)

    def write(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            stream_dedup_within_watermark(stream, "ts", "event_id", "10 minutes")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(
            (r["event_id"], r["ts"]) for r in spark.read.parquet(sink).collect()
        )

    # batch 1: id 1 plus an in-batch duplicate; watermark advances to
    # max(ts) - 10m = t0 - 10m
    write([(1, t0, 1, 1.0), (1, t0, 1, 1.0), (2, t0, 1, 2.0)])
    assert run() == [(1, t0), (2, t0)]

    # batch 2: id 1 re-delivered 5 min later (inside horizon -> dropped);
    # a far-future event pushes the watermark well past id 1's state
    far = t0 + dt.timedelta(hours=2)
    write([(1, t0 + dt.timedelta(minutes=5), 1, 1.0), (3, far, 2, 3.0)])
    assert run() == [(1, t0), (2, t0), (3, far)]

    # batch 3: id 1 again, but its dedup state was evicted when the
    # watermark passed -> emits as a new event
    write([(1, far + dt.timedelta(minutes=1), 1, 1.0)])
    out = run()
    assert (1, far + dt.timedelta(minutes=1)) in out and len(out) == 4


def test_running_type_counts_v2_plan_and_exec(spark, tmp_path):
    """transformWithStateInPandas (arbitrary state v2): the plan constructs
    against a streaming source with the declared changelog schema; when
    protobuf is present (the state-server wire format), a full availableNow
    run must match the batch groupBy(user_id, event_type).count()."""
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        TYPE_COUNTS_SCHEMA,
        _protobuf_available,
        running_type_counts,
    )

    ev_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 3, 1, 10, 0)
    rows = [
        (1, t0, "view"),
        (1, t0, "view"),
        (1, t0, "click"),
        (2, t0, "view"),
    ]
    spark.createDataFrame(rows, ev_schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev_schema).parquet(src)
    out = running_type_counts(stream)
    assert out.isStreaming
    assert out.schema == T._parse_datatype_string(TYPE_COUNTS_SCHEMA)

    if not _protobuf_available():
        # xfail, not skip — this is a KNOWN, permanent limitation of this
        # container (protobuf is transformWithState's state-server wire
        # format, and installing packages is out of scope), not an
        # environment accident to paper over. The plan-construction half
        # above already ran; only the execution half is protobuf-gated.
        # On any cluster with protobuf present the full test runs.
        pytest.xfail(
            "protobuf not installed in this container — "
            "transformWithState's Python state client cannot start "
            "(execution half xfails by design; plan half asserted above)"
        )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("type_counts_v2")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["user_id"], r["event_type"]): r["n"]
            for r in spark.sql("select * from type_counts_v2").collect()
        }
        assert got == {(1, "view"): 2, (1, "click"): 1, (2, "view"): 1}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_running_type_counts_v2_state_survives_restart(spark, tmp_path):
    """transformWithStateInPandas checkpoint recovery: MapState must carry
    per-(user, type) counts ACROSS query restarts — a second availableNow
    run over newly-arrived files resumes from the RocksDB checkpoint and
    emits cumulative totals, not batch-local ones. This is the lifetime-
    aggregate semantics the v2 processor exists for (and what the shim's
    wire protocol must get right across sessions of state-server calls)."""
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
        running_type_counts,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    ev_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 3, 1, 10, 0)

    def write(rows):
        spark.createDataFrame(rows, ev_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run(qname):
        # foreachBatch, not the memory sink: memory-sink queries refuse to
        # RESTART from an existing checkpoint (not fault-tolerant); the
        # recovery semantics under test need a recoverable sink
        emitted: dict = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                emitted[(r["user_id"], r["event_type"])] = r["n"]

        stream = spark.readStream.schema(ev_schema).parquet(src)
        q = (
            running_type_counts(stream)
            .writeStream.foreachBatch(sink)
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return emitted

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        write([(1, t0, "view"), (1, t0, "click"), (2, t0, "view")])
        first = run("tc_v2_run1")
        assert first == {(1, "view"): 1, (1, "click"): 1, (2, "view"): 1}

        # restart over new arrivals: counts must ACCUMULATE from state
        write([(1, t0, "view"), (2, t0, "view"), (2, t0, "purchase")])
        second = run("tc_v2_run2")
        assert second == {(1, "view"): 2, (2, "view"): 2, (2, "purchase"): 1}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_running_last_k_v2_list_and_value_state(spark, tmp_path):
    """transformWithStateInPandas with ValueState + ListState (the two
    typed state kinds the MapState twin doesn't touch): per-user lifetime
    count and the last-3 values, truncated in state (O(k) per user), must
    accumulate across TWO availableNow runs of one checkpoint and match
    the batch twin (count + 3 latest values by (ts, event_id))."""
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
        running_last_k_values,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 3, 1, 10, 0)

    def write(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run(qname):
        emitted: dict = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                emitted[r["user_id"]] = (r["n_events"], list(r["last_values"]))

        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            running_last_k_values(stream, k=3)
            .writeStream.foreachBatch(sink)
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return emitted

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        write(
            [
                (1, t0, 1, 1.0),
                (2, t0 + dt.timedelta(minutes=1), 1, 2.0),
                (3, t0 + dt.timedelta(minutes=2), 2, 9.0),
            ]
        )
        first = run("lastk_run1")
        assert first == {1: (2, [1.0, 2.0]), 2: (1, [9.0])}

        # restart: list state must truncate to the 3 NEWEST values
        write(
            [
                (4, t0 + dt.timedelta(minutes=3), 1, 3.0),
                (5, t0 + dt.timedelta(minutes=4), 1, 4.0),
            ]
        )
        second = run("lastk_run2")
        assert second == {1: (4, [2.0, 3.0, 4.0])}  # 1.0 aged out; user 2 untouched
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_binary_file_ingestion_to_decode(spark, tmp_path):
    """binaryFile landing → multimodal decode end-to-end from DISK: the
    object-store ingestion path for media. Glob filtering prunes at the
    file listing; the max_bytes filter prunes oversized files by the
    LENGTH metadata column before content is materialized."""
    from bigdata_etl_elt_dashboard_spark.operators import multimodal as M

    media_dir = tmp_path / "media"
    media_dir.mkdir()
    for i in range(4):
        img = M.DecodedImage(
            width=4, height=2, pixels=bytes((i * 7 + j) % 256 for j in range(24))
        )
        (media_dir / f"img_{i}.ppm").write_bytes(M.encode_ppm(img))
    (media_dir / "notes.txt").write_text("not media")
    (media_dir / "huge.ppm").write_bytes(b"P6\n9 9\n255\n" + b"\0" * 500)

    df = readers.read_binary_files(
        spark, str(media_dir), glob="*.ppm", max_bytes=100
    )
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    assert df.count() == 4  # .txt excluded by glob, oversized ppm by length

    media = df.select(
        # filename → numeric media key (decode_image_stats contract: int64 id)
        F.regexp_extract(F.col("path"), r"img_(\d+)\.ppm$", 1)
        .cast("long")
        .alias("media_id"),
        F.col("content"),
    )
    stats = M.decode_image_stats(media).orderBy("media_id").collect()
    assert [r.media_id for r in stats] == [0, 1, 2, 3]
    assert [r.width for r in stats] == [4, 4, 4, 4]
    # decoded R-channel sum of img_0: sum((0*7 + j) % 256, j = 0,3,..,21)
    assert stats[0].sum_r == sum(range(0, 24, 3))


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """read_parquet_evolving reconciles files written under different
    schema versions into the union schema: old files NULL-fill the added
    column, values survive unchanged, and column pruning still reaches
    the per-file scan (evolution is a planning-time footer merge, not a
    data rewrite)."""
    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string").write.parquet(v1)
    spark.createDataFrame(
        [(3, "c", 9.5)], "id long, tag string, score double"
    ).write.parquet(v2)

    back = readers.read_parquet_evolving(spark, v1, v2)
    assert set(back.columns) == {"id", "tag", "score"}
    got = {r["id"]: (r["tag"], r["score"]) for r in back.collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.select("id").explain("formatted")
    plan = buf.getvalue()
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas and all("tag" not in l for l in read_schemas)


def test_merge_upsert_semantics(spark):
    """Batch MERGE apply: per key the batch wins, flagged keys delete, new
    keys insert, untouched keys pass through — on a hand-checkable frame."""
    from bigdata_etl_elt_dashboard_spark.operators.warehouse import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, v string, x long"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99, False), (3, "c", 30, True), (4, "d", 40, False)],
        "k long, v string, x long, is_del boolean",
    )
    out = {
        r["k"]: (r["v"], r["x"])
        for r in merge_upsert(target, updates, ["k"], delete_col="is_del").collect()
    }
    assert out == {1: ("a", 10), 2: ("B", 99), 4: ("d", 40)}  # 3 deleted

    # without a delete column: pure upsert
    out2 = {
        r["k"]: r["v"]
        for r in merge_upsert(
            target, updates.drop("is_del"), ["k"]
        ).collect()
    }
    assert out2 == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_partitioned_prune_gate_scan_prunes(spark, sf_smoke):
    """src_partitioned_prune_digest's read side must push the year-range
    filter into PartitionFilters (directory-level pruning, zero I/O for
    excluded years) — not re-filter rows after a full scan."""
    import contextlib
    import io

    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

    df = REGISTRY["src_partitioned_prune_digest"].fn(spark, sf_smoke)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters")[1][:250]


@pytest.mark.slow
def test_session_close_on_timer_v2(spark, tmp_path):
    """Event-time TIMERS (arbitrary state v2): sessions close through both
    paths — a successor event >= gap later closes inline ('gap'), and the
    trailing session closes via a registered timer once the WATERMARK
    passes last_ms + gap ('timer', fired in the no-data batch availableNow
    runs after the last data batch). A session whose expiry is still ahead
    of the watermark must stay open across runs, then close by 'gap' when
    a late successor arrives in a restarted query — exercising timer
    re-registration and checkpointed timer state."""
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
        session_close_on_timer,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    ev_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 3, 1, 10, 0)

    def m(mins):
        return t0 + dt.timedelta(minutes=mins)

    def ms(mins):
        return int(m(mins).timestamp() * 1000)

    def write(rows):
        spark.createDataFrame(rows, ev_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run(qname):
        emitted = []

        def sink(bdf, _bid):
            for r in bdf.collect():
                emitted.append(
                    (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"], r["closed_by"])
                )

        stream = spark.readStream.schema(ev_schema).parquet(src)
        q = (
            session_close_on_timer(stream, gap_ms=600_000)
            .writeStream.foreachBatch(sink)
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return sorted(emitted)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        # user 1: session A (2 events), >10m gap, session B (1 event @30);
        # user 2: one session ending @50 — the global max event time
        write(
            [
                (1, 1, m(0)),
                (2, 1, m(5)),
                (3, 1, m(30)),
                (4, 2, m(45)),
                (5, 2, m(50)),
            ]
        )
        first = run("timer_v2_run1")
        # gap path: session A closed by its in-batch successor; timer path:
        # session B's expiry (40) < watermark (50) fires in the no-data
        # batch. User 2's expiry (60) > watermark (50): still open.
        assert first == sorted(
            [
                (1, ms(0), ms(5), 2, "gap"),
                (1, ms(30), ms(30), 1, "timer"),
            ]
        )

        # restart: late successor for user 2 at minute 80 — closes the
        # checkpointed session by 'gap' (the event beats the timer); the
        # new session (80) stays open (expiry 90 > watermark 80)
        write([(6, 2, m(80))])
        second = run("timer_v2_run2")
        assert second == [(2, ms(45), ms(50), 2, "gap")]

        # second restart: user 2's run-2 session (80, expiry 90) closes by
        # its CHECKPOINTED timer — no user-2 row arrives; the unrelated
        # user-1 event at 95 advances the watermark past the expiry. This
        # is the cross-restart timer-persistence proof: registered in one
        # query run, fired in another.
        write([(7, 1, m(95))])
        third = run("timer_v2_run3")
        assert third == [(2, ms(80), ms(80), 1, "timer")]
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.mark.slow
def test_map_state_ttl_expires_after_idle_v2(spark, tmp_path):
    """State TTL (arbitrary state v2, ProcessingTime time mode): a map
    entry not rewritten for ttl_ms of wall-clock time must read as ABSENT,
    so the per-(user, type) count restarts instead of accumulating. In
    ProcessingTime mode the operator requests batches forever (timers may
    fire without data), so availableNow never self-terminates: the test
    drives ONE continuous query with a throttled trigger and stops it
    explicitly. The memory sink keeps the per-batch path JVM-side."""
    import time

    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
        recent_type_counts_ttl,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    ev_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 3, 1, 10, 0)

    def write(rows):
        spark.createDataFrame(rows, ev_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def rows_of(qtable):
        # the memory sink APPENDS update-mode rows (no by-key upsert), so
        # read it as the SET of (user, type, n) emissions ever made
        return {
            (r["user_id"], r["event_type"], r["n"])
            for r in spark.sql(f"select * from {qtable}").collect()
        }

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    write([(1, t0, "view"), (1, t0, "view"), (2, t0, "click")])
    stream = spark.readStream.schema(ev_schema).parquet(src)
    q = (
        recent_type_counts_ttl(stream, ttl_ms=4000)
        .writeStream.format("memory")
        .queryName("ttl_counts_v2")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and (1, "view", 2) not in rows_of("ttl_counts_v2"):
            time.sleep(0.5)
        assert (1, "view", 2) in rows_of("ttl_counts_v2")  # pre-TTL accumulate

        time.sleep(8)  # > ttl: both entries age out at the store level
        # counts chosen so expired-vs-accumulated is unambiguous: 3 new
        # 'view's read 3 if state expired, 5 if it wrongly accumulated
        write([(1, t0, "view"), (1, t0, "view"), (1, t0, "view"), (2, t0, "click"), (2, t0, "click")])
        deadline = time.time() + 120
        while time.time() < deadline and (2, "click", 2) not in rows_of("ttl_counts_v2"):
            time.sleep(0.5)
        got = rows_of("ttl_counts_v2")
        assert (1, "view", 3) in got and (2, "click", 2) in got
        assert (1, "view", 5) not in got and (2, "click", 3) not in got
    finally:
        q.stop()
        q.awaitTermination(60)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.mark.slow
def test_type_counts_backfill_initial_state_v2(spark, tmp_path):
    """initialState (arbitrary state v2): handleInitialState seeds MapState
    from a BATCH backfill DataFrame in the first micro-batch, so streaming
    counts continue from history ('backfill then stream' cutover) instead
    of restarting at zero — and later batches must NOT re-apply the seed."""
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
        running_type_counts_with_backfill,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    ev_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    hist_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 3, 1, 10, 0)
    history = spark.createDataFrame(
        [(1, "view", 5), (1, "click", 2), (3, "view", 7)], hist_schema
    )

    def write(rows):
        spark.createDataFrame(rows, ev_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run(qname):
        emitted: dict = {}

        def sink(bdf, _bid):
            for r in bdf.collect():
                emitted[(r["user_id"], r["event_type"])] = r["n"]

        stream = spark.readStream.schema(ev_schema).parquet(src)
        q = (
            running_type_counts_with_backfill(stream, history)
            .writeStream.foreachBatch(sink)
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return emitted

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        # user 1 continues from backfill (5 views + 2 = 7; 2 clicks stand),
        # user 2 is unseeded (fresh), user 3's seed is untouched (no rows,
        # so no emission — update mode only emits touched users)
        write([(1, t0, "view"), (1, t0, "view"), (2, t0, "view")])
        first = run("backfill_run1")
        assert first == {(1, "view"): 7, (2, "view"): 1}

        # restart: the seed must NOT re-apply on later batches — user 3's
        # first stream row reads 7 + 1 from the checkpointed seed, user
        # 1's counts keep accumulating from 7
        write([(1, t0, "view"), (3, t0, "view")])
        second = run("backfill_run2")
        assert second == {(1, "view"): 8, (3, "view"): 8}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_merge_upsert_parquet_update_insert_and_surgical_buckets(spark, tmp_path):
    """Direct unit coverage of the bucketed parquet-lake MERGE sink (the
    streaming capstone's gold layer only ever replays IDENTICAL rows —
    this pins the true UPDATE path): existing keys are REPLACED with new
    values, new keys insert, absent keys survive, and buckets the batch
    does not touch are not rewritten on disk (surgical rewrite bound)."""
    import glob
    import os

    from bigdata_etl_elt_dashboard_spark.sources.sinks import (
        merge_upsert_parquet,
        upsert_bucket_expr,
    )

    path = str(tmp_path / "gold")
    n_buckets = 4
    base = spark.createDataFrame(
        [(k, 100 + k) for k in range(40)], "k long, v long"
    )
    merge_upsert_parquet(base, path, ["k"], n_buckets=n_buckets)
    first = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert first == {k: 100 + k for k in range(40)}

    # pick an update batch confined to ONE bucket so the other buckets'
    # files must remain untouched
    bucketed = base.withColumn("_b", upsert_bucket_expr(["k"], n_buckets))
    target = bucketed.filter(F.col("_b") == 0).select("k").limit(3)
    keys = sorted(r["k"] for r in target.collect())
    assert keys, "bucket 0 unexpectedly empty"
    untouched_files = {
        b: sorted(glob.glob(os.path.join(path, f"_bucket={b}", "*.parquet")))
        for b in range(1, n_buckets)
    }
    untouched_mtimes = {
        b: [os.path.getmtime(f) for f in fs] for b, fs in untouched_files.items()
    }

    upd = spark.createDataFrame(
        [(keys[0], 999), (keys[1], 888), (10_000, 777)], "k long, v long"
    )  # two UPDATES + one INSERT (10000 hashes wherever it lands — may
    # touch another bucket; recompute the untouched set accordingly)
    ins_bucket = upd.withColumn("_b", upsert_bucket_expr(["k"], n_buckets)).filter(
        F.col("k") == 10_000
    ).first()["_b"]
    merge_upsert_parquet(upd, path, ["k"], n_buckets=n_buckets)

    after = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    want = dict(first)
    want[keys[0]], want[keys[1]], want[10_000] = 999, 888, 777
    assert after == want  # updates replaced, insert added, rest survived

    for b in range(1, n_buckets):
        if b == ins_bucket:
            continue  # the insert legitimately rewrote this bucket
        assert untouched_files[b] == sorted(
            glob.glob(os.path.join(path, f"_bucket={b}", "*.parquet"))
        ), f"bucket {b} files changed"
        assert untouched_mtimes[b] == [
            os.path.getmtime(f) for f in untouched_files[b]
        ], f"bucket {b} rewritten"


def test_merge_upsert_rides_pin_policy_and_prunes_buckets(spark, tmp_path):
    """(a) Under spark.graft.pin.strategy=reliable the merge's
    materialization goes through the fault-tolerant checkpoint path (the
    100 TB preemptible-cluster posture) and still merges correctly;
    (b) the gold layout's scale contract is real: _bucket is a PARTITION
    column, so the touched-buckets read the merge issues prunes to
    PartitionFilters — bounded I/O per merge regardless of table size."""
    import contextlib
    import io

    from bigdata_etl_elt_dashboard_spark.operators.scale import (
        PIN_DIR_CONF,
        PIN_STRATEGY_CONF,
    )
    from bigdata_etl_elt_dashboard_spark.sources.sinks import merge_upsert_parquet

    path = str(tmp_path / "gold")
    base = spark.createDataFrame([(k, k) for k in range(20)], "k long, v long")
    merge_upsert_parquet(base, path, ["k"], n_buckets=4)

    spark.conf.set(PIN_STRATEGY_CONF, "reliable")
    spark.conf.set(PIN_DIR_CONF, str(tmp_path / "pin"))
    try:
        upd = spark.createDataFrame([(3, 999), (77, 777)], "k long, v long")
        merge_upsert_parquet(upd, path, ["k"], n_buckets=4)
    finally:
        spark.conf.set(PIN_STRATEGY_CONF, "local")
        spark.conf.unset(PIN_DIR_CONF)
    after = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    want = {k: k for k in range(20)}
    want[3], want[77] = 999, 777
    assert after == want

    # the touched-bucket read shape prunes at the partition level
    probe = spark.read.parquet(path).filter(F.col("_bucket").isin([0, 2]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "_bucket" in plan.split("PartitionFilters")[1][:200]


@pytest.mark.slow
def test_session_timer_disorder_contract_v2(spark, tmp_path):
    """Cross-batch DISORDER contract of the timer sessionizer: (A) a
    straggler below the watermark is DROPPED in the processor (it must
    not stretch an already-emitted session backward — the giant-merged-
    session corruption mode); (B) with a delay that admits it, a
    straggler older than the open session by >= gap emits as its OWN
    gap-closed session via the interval-merge walk, never absorbed into
    a session it precedes."""
    from bigdata_etl_elt_dashboard_spark.streaming.stateful import (
        _protobuf_available,
        session_close_on_timer,
    )

    if not _protobuf_available():
        pytest.xfail("no protobuf runtime (real or vendored shim)")

    ev_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2024, 3, 1, 10, 0)

    def m(mins):
        return t0 + dt.timedelta(minutes=mins)

    def ms(mins):
        return int(m(mins).timestamp() * 1000)

    def drive(case_dir, delay, batches):
        src = str(tmp_path / case_dir / "src")
        ckpt = str(tmp_path / case_dir / "ckpt")
        out = []
        for rows in batches:
            spark.createDataFrame(rows, ev_schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            emitted = []

            def sink(bdf, _bid):
                for r in bdf.collect():
                    emitted.append(
                        (r["user_id"], r["start_ms"], r["end_ms"],
                         r["n_events"], r["closed_by"])
                    )

            stream = spark.readStream.schema(ev_schema).parquet(src)
            q = (
                session_close_on_timer(stream, gap_ms=600_000, delay=delay)
                .writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300)
            out.append(sorted(emitted))
        return out

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        # (A) delay=0: run 1 closes u1 [0,5] by timer (expiry 15 <= wm 50);
        # run 2's u1 straggler @20 is below the watermark (50) -> DROPPED
        # (no re-opened or stretched u1 session); u2 closes by gap.
        run1, run2 = drive(
            "disorder_a",
            "0 seconds",
            [
                [(1, 1, m(0)), (2, 1, m(5)), (3, 2, m(50))],
                [(4, 1, m(20)), (5, 2, m(80))],
            ],
        )
        assert run1 == [(1, ms(0), ms(5), 2, "timer")]
        assert run2 == [(2, ms(50), ms(50), 1, "gap")]

        # (B) delay=2h admits the straggler; it is >= gap older than u1's
        # OPEN session [90], so it emits as its own gap-closed session
        # instead of being absorbed (the pre-fix walk produced [30,90]).
        run1, run2 = drive(
            "disorder_b",
            "2 hours",
            [
                [(1, 1, m(0)), (2, 1, m(90)), (3, 9, m(100))],
                [(4, 1, m(30))],
            ],
        )
        assert run1 == [(1, ms(0), ms(0), 1, "gap")]  # closed inline by @90
        assert run2 == [(1, ms(30), ms(30), 1, "gap")]
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_merge_upsert_reraises_non_missing_analysis_errors(spark, tmp_path):
    """The first-batch catch in merge_upsert_parquet is narrow IN FACT:
    only PATH_NOT_FOUND means "no table yet". An existing-but-unreadable
    table dir (here: empty → UNABLE_TO_INFER_SCHEMA) must abort the merge
    — treating it as a first batch would make the dynamic partition
    overwrite replace every touched bucket with only the batch's rows,
    silently deleting all other keys in them."""
    from pyspark.errors import AnalysisException

    from bigdata_etl_elt_dashboard_spark.sources.sinks import merge_upsert_parquet

    path = tmp_path / "gold_broken"
    path.mkdir()  # exists, but holds no parquet → not PATH_NOT_FOUND
    batch = spark.createDataFrame([(1, 10)], "k long, v long")
    with pytest.raises(AnalysisException):
        merge_upsert_parquet(batch, str(path), ["k"], n_buckets=4)
    # the unreadable table dir was not clobbered by a batch-only overwrite
    assert list(path.iterdir()) == []

    # the genuine first-batch path (no dir at all) still initializes
    fresh = tmp_path / "gold_fresh"
    merge_upsert_parquet(batch, str(fresh), ["k"], n_buckets=4)
    assert {r["k"]: r["v"] for r in spark.read.parquet(str(fresh)).collect()} == {1: 10}


def test_is_missing_path_classless_fallback():
    """When NO Spark error class is extractable (older builds, some
    connectors, Spark Connect re-wrapping), the first-batch catch falls
    back to the stable "Path does not exist" message text; a classified
    non-missing error is never message-sniffed (round-11 ADVICE item)."""
    from bigdata_etl_elt_dashboard_spark.sources.sinks import _is_missing_path

    class Classless(Exception):
        pass

    assert _is_missing_path(Classless("Path does not exist: /tmp/gold"))
    assert not _is_missing_path(Classless("Unable to infer schema for Parquet"))

    class Classified(Exception):
        def getCondition(self):
            return "UNABLE_TO_INFER_SCHEMA"

    # carries a class -> the class decides, even if the message says "path"
    assert not _is_missing_path(Classified("x Path does not exist x"))
    # the bracketed message prefix counts as a class on accessor-less builds
    assert _is_missing_path(Exception("[PATH_NOT_FOUND] Path does not exist"))
    assert not _is_missing_path(Exception("[UNABLE_TO_INFER_SCHEMA] boom"))
