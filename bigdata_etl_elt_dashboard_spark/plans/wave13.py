"""Round-13 gate additions: offline state-format gates for the two
stateful-operator families src_state_reader_digest (wave12) does not
cover — stream-stream JOIN buffers and transformWithState variables
(r12 verdict task 5).

Like wave12's dedup-ledger gate, each query here performs a REAL
availableNow drain into a fresh checkpoint, then audits the checkpoint
OFFLINE through sources/state_reader and digests what it finds against
an oracle DuckDB computes directly on the events parquet. Reference
parity: the reference app has no streaming surface (SURVEY §2.12); these
gates belong to the §7.5 streaming extension and exist to pin the
state-store formats that the migration tooling (streaming/migration.py,
tools/join_state_probe.py) depends on.

Eviction-contract boundary semantics (measured on Spark 4.1.2 with
three µs-grid probes, r13):

- committed watermark W = min over sides of (ms-floored per-side max
  event time − delay); the offsets log stores it at ms precision;
- a buffered LEFT (click) row survives iff ``click_ts > W`` (strict,
  exact — a click at precisely W is evicted);
- a buffered RIGHT (view) row survives iff
  ``view_ts > W − window − 1 ms`` (Spark's state-value watermark for
  the range side lands 1 ms below the algebraic horizon — rows at
  exactly W − window − 1 ms are evicted, 1 µs above survive).

The oracles encode exactly those predicates, so a green row proves the
buffer contents, the watermark model, and the boundary semantics all at
once — the contract SCALING.md's O(rate × horizon) state-bound argument
rests on.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table
from ..sources.state_reader import checkpoint_watermark, state_rows
from ..streaming.events import stream_click_view_join
from ..streaming.migration import EVENTS_SCHEMA, read_click_view_buffers
from .registry import register

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _work_dir(sf_dir: str, tag: str) -> str:
    """PID-scoped per-SF scratch root, cleared on entry (the wave12
    recipe): streaming checkpoints must be fresh each run, and two
    concurrent harness processes must not clear each other's."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_{tag}_gate_{sf}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    return path


@register(
    "src_join_state_digest",
    oracle="""
        WITH e AS (
            -- the join's equi-key null filter sits BELOW the watermark
            -- operator (measured r14: a max-ts row with a null user_id
            -- does not advance the committed watermark, and null-key
            -- rows never enter the buffers), so EVERY term — watermark,
            -- buffers, pairs — is computed over non-null-key rows
            SELECT * FROM events WHERE user_id IS NOT NULL
        ), mx AS (
            SELECT event_type, date_trunc('milliseconds', MAX(ts)) AS m
            FROM e WHERE event_type IN ('click', 'view')
            GROUP BY event_type
        ), w AS (
            SELECT MIN(m) - INTERVAL 12 HOURS AS wm FROM mx
        )
        SELECT
            (SELECT wm FROM w) AS wm_ts,
            (SELECT COUNT(*) FROM e, w
             WHERE event_type = 'click' AND ts > wm) AS n_buf_clicks,
            (SELECT CAST(COALESCE(SUM(user_id), 0) AS BIGINT) FROM e, w
             WHERE event_type = 'click' AND ts > wm) AS click_user_sum,
            (SELECT CAST(COALESCE(SUM(epoch_us(ts)), 0) AS BIGINT)
             FROM e, w
             WHERE event_type = 'click' AND ts > wm) AS click_ts_us_sum,
            (SELECT COUNT(*) FROM e, w
             WHERE event_type = 'view'
               AND ts > wm - INTERVAL 60 MINUTES - INTERVAL 1 MILLISECOND
            ) AS n_buf_views,
            (SELECT CAST(COALESCE(SUM(user_id), 0) AS BIGINT) FROM e, w
             WHERE event_type = 'view'
               AND ts > wm - INTERVAL 60 MINUTES - INTERVAL 1 MILLISECOND
            ) AS view_user_sum,
            (SELECT CAST(COALESCE(SUM(epoch_us(ts)), 0) AS BIGINT)
             FROM e, w
             WHERE event_type = 'view'
               AND ts > wm - INTERVAL 60 MINUTES - INTERVAL 1 MILLISECOND
            ) AS view_ts_us_sum,
            (SELECT COUNT(*)
             FROM e c JOIN e v
               ON v.user_id = c.user_id
              AND v.ts >= c.ts - INTERVAL 60 MINUTES AND v.ts < c.ts
             WHERE c.event_type = 'click' AND v.event_type = 'view'
            ) AS n_emitted
    """,
    doc="Stream-stream JOIN buffer gate: events → availableNow "
    "click/view inner join (60 min window, 12 h watermark — sized so "
    "the buffers hold hundreds of rows at sf0.01, not single digits) "
    "drained "
    "into a fresh checkpoint (single source file → single data batch, "
    "so no cross-batch late-drop nondeterminism), second no-data drain "
    "to commit the advanced watermark and run eviction → OFFLINE read "
    "of BOTH join buffers via sources/state_reader (joinSide left/"
    "right) → one-row digest vs the eviction contract computed by the "
    "oracle directly on the events parquet. Green proves: the committed "
    "watermark equals min-of-sides ms-floored max − delay; the left "
    "buffer holds exactly the clicks with click_ts > W; the right "
    "buffer holds exactly the views with view_ts > W − window − 1 ms "
    "(boundary semantics measured, see module doc); and the sink "
    "emitted exactly the batch-join pair count. Null join keys are "
    "excluded from EVERY oracle term (r14, measured on the null-key "
    "variant corpus): Catalyst pushes the equi-join's isnotnull below "
    "the watermark operator, so null-key rows neither advance the "
    "watermark nor enter the buffers.",
)
def src_join_state_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _work_dir(sf_dir, "joinstate")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    out = os.path.join(work, "out")

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # one file → one data batch: watermark starts at epoch for batch 0,
    # so every row is admitted and the emitted set is batching-free
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    def drain() -> None:
        side = lambda et: (  # noqa: E731
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(src)
            .filter(F.col("event_type") == et)
        )
        q = (
            stream_click_view_join(
                side("click"), side("view"),
                window_minutes=60, watermark="12 hours",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            raise RuntimeError("join-state drain did not terminate in 600 s")

    # pin the CHECKPOINT's state partition count (fixed at first run from
    # spark.sql.shuffle.partitions): under the driver's default 200, the
    # join's four state stores cost ~100 s of per-partition instantiation
    # for a 10k-row gate; 8 partitions is the right size here and the
    # conf is restored either way
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        drain()
        drain()  # no-data batch: commits the advanced watermark + evicts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    wm = checkpoint_watermark(ckpt)
    if wm is None:
        raise RuntimeError("no committed watermark in the drained checkpoint")
    left, right = read_click_view_buffers(spark, ckpt)
    left_digest = left.agg(
        F.count("*").alias("n_buf_clicks"),
        F.coalesce(F.sum("user_id"), F.lit(0)).cast("long").alias("click_user_sum"),
        F.coalesce(F.sum(F.unix_micros("click_ts")), F.lit(0))
        .cast("long")
        .alias("click_ts_us_sum"),
    )
    right_digest = right.agg(
        F.count("*").alias("n_buf_views"),
        F.coalesce(F.sum("user_id"), F.lit(0)).cast("long").alias("view_user_sum"),
        F.coalesce(F.sum(F.unix_micros("view_ts")), F.lit(0))
        .cast("long")
        .alias("view_ts_us_sum"),
    )
    emitted = spark.read.parquet(out).agg(F.count("*").alias("n_emitted"))
    return (
        left_digest.crossJoin(F.broadcast(right_digest))
        .crossJoin(F.broadcast(emitted))
        .select(
            F.lit(wm).cast("timestamp").alias("wm_ts"),
            "n_buf_clicks",
            "click_user_sum",
            "click_ts_us_sum",
            "n_buf_views",
            "view_user_sum",
            "view_ts_us_sum",
            "n_emitted",
        )
    )


@register(
    "src_tws_state_digest",
    oracle="""
        WITH g AS (
            -- null keys excluded: the operator guards them out
            -- (stateful.drop_null_keys — the r14 measured Spark 4.1.2
            -- hazard: a null grouping key ABSORBS its whole partition's
            -- rows into the null group, corrupting co-partitioned users)
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events WHERE user_id IS NOT NULL
            GROUP BY user_id, event_type
        )
        SELECT COUNT(*) AS n_state_entries,
               CAST(SUM(user_id) AS BIGINT) AS user_sum,
               CAST(SUM(('0x' || substr(md5(event_type), 1, 10))::BIGINT)
                    AS BIGINT) AS etype_hash_sum,
               CAST(SUM(n) AS BIGINT) AS n_total,
               COUNT(DISTINCT user_id) AS n_users
        FROM g
    """,
    doc="transformWithState variable gate: events → running_type_counts "
    "(MapState 'counts' keyed by user_id, map key event_type → lifetime "
    "count, RocksDB-backed) drained availableNow in a HERMETIC "
    "subprocess (streaming/tws_drain.py — the vendored protobuf shim "
    "must be on PYTHONPATH before the JVM launches, which a harness-"
    "owned session cannot guarantee) → OFFLINE read of the MapState via "
    "sources/state_reader (stateVarName='counts'; flattens to key/"
    "user_map_key/user_map_value, one row per map entry) on THIS "
    "session → one-row digest vs the same per-(user, type) counts the "
    "oracle computes directly on the events parquet. Green proves the "
    "tWS state codec round-trips long keys, string map keys, and long "
    "map values bit-faithfully, and that the MapState holds exactly the "
    "batch GROUP BY over non-null keys — the contract the r11 "
    "initialState migration recipe rests on. (Null keys are guarded out "
    "of every tWS operator: stateful.drop_null_keys documents the "
    "measured Spark 4.1.2 partition-absorption hazard the r14 variant "
    "corpus caught here.)",
)
def src_tws_state_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _work_dir(sf_dir, "tws")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "bigdata_etl_elt_dashboard_spark.streaming.tws_drain",
            src,
            ckpt,
        ],
        cwd=_REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"tws drain subprocess failed (rc={proc.returncode}): "
            f"{proc.stderr[-2000:]}"
        )

    entries = state_rows(spark, ckpt, state_var_name="counts").select(
        F.col("key.user_id").alias("user_id"),
        F.col("user_map_key.k").alias("event_type"),
        F.col("user_map_value.n").alias("n"),
    )
    return entries.agg(
        F.count("*").alias("n_state_entries"),
        F.sum("user_id").cast("long").alias("user_sum"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("event_type")), 1, 10), 16, 10).cast(
                "long"
            )
        ).alias("etype_hash_sum"),
        F.sum("n").cast("long").alias("n_total"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )
