"""Round-12 registry additions.

``src_state_reader_digest`` — the driver gate for the OFFLINE state-store
readers (sources/state_reader.py, the round-11 S9 extension). Until this
round the readers were pytest-only; per the r11 verdict task 6, the
operational surface itself now holds a CORRECTNESS row. The query drives a
REAL streaming dedup over the sf events table into a fresh checkpoint,
then audits that checkpoint exactly the way a production operator would —
``state-metadata`` for the operator index, ``statestore`` for the ledger
rows — and reduces the audit to an order-independent digest whose oracle
is plain SQL over the ORIGINAL events parquet:

- the dedup ledger's keys must be EXACTLY the distinct
  (user_id, event_type) pairs of the source (count / sum / min / max /
  md5-prefix hash of the string key half all ride the digest);
- every state row must land inside the partition range the
  ``state-metadata`` row declares (``n_bad_partition`` = 0) — the
  invariant that lets an offline audit shard by ``partition_id``;
- the checkpoint must hold exactly ONE stateful operator, named
  ``dedupe`` (``n_bad_opname`` = 0);
- the sink's emitted rows must agree with the ledger (one emission per
  state key — ``n_emitted`` = ``n_state_keys``).

Determinism: WHICH arrival wins a dropDuplicates race is batch-order
dependent, so the digest only touches keyed quantities (the key set and
the one-row-per-key contract), never the winning row's payload.

Scale posture: the drain is one availableNow pass with state bounded by
the distinct-key count (the exact-dedup ledger class — the horizon-bounded
variant is gated through the medallion chain); the state read is a
partitioned batch scan of the checkpoint (no driver materialization), and
both digests are single partial-aggregatable reduces. The 1-row
``state-metadata`` frame rides the broadcast scalar-injection idiom.

The reference has no streaming surface (SURVEY §2.12 is an extension
family); this gate extends S9 (DESCRIBE/introspection —
`etl_pipeline/load.py` trusts its warehouse blindly) to streaming state.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table
from ..sources.state_reader import state_metadata, state_rows
from .registry import register


def _work_dir(sf_dir: str) -> str:
    """Deterministic per-SF scratch root, cleared on entry: a streaming
    checkpoint must be FRESH each run (a stale or half-written checkpoint
    would replay into the digest), unlike the overwrite-idempotent batch
    gate dirs in plans/sources_gate.py."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # PID-scoped (r12 advice): two concurrent harness processes at the
    # same SF must not rmtree each other's live checkpoint mid-drain.
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_state_gate_{sf}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    return path


@register(
    "src_state_reader_digest",
    oracle="""
        WITH keys AS (
            SELECT DISTINCT user_id, event_type FROM events
        )
        SELECT COUNT(*) AS n_state_keys,
               CAST(SUM(user_id) AS BIGINT) AS user_sum,
               CAST(MIN(user_id) AS BIGINT) AS user_min,
               CAST(MAX(user_id) AS BIGINT) AS user_max,
               CAST(SUM(('0x' || substr(md5(event_type), 1, 10))::BIGINT)
                    AS BIGINT) AS etype_hash_sum,
               COUNT(DISTINCT event_type) AS n_event_types,
               CAST(0 AS BIGINT) AS n_bad_partition,
               CAST(0 AS BIGINT) AS n_bad_opname,
               COUNT(*) AS n_emitted,
               COUNT(*) AS n_emitted_keys
        FROM keys
    """,
    doc="S9 streaming-state driver gate: events → availableNow "
    "dropDuplicates((user_id, event_type)) drain into a fresh checkpoint "
    "→ OFFLINE audit via sources/state_reader (state-metadata + "
    "statestore) → one-pass digest vs the same digest the oracle computes "
    "directly on the events parquet. A green row proves the checkpointed "
    "dedup ledger holds exactly the distinct composite keys of the "
    "source (long AND string key halves bit-faithful through the state "
    "store's key codec), that every state row sits inside the declared "
    "partition range, that the operator index lists the one dedupe "
    "operator, and that the sink emitted exactly one row per ledger key.",
)
def src_state_reader_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _work_dir(sf_dir)
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    out = os.path.join(work, "out")

    # land through the catalog loader (events.parquet is TIMESTAMP(NANOS);
    # the re-land is micros, the unit the file stream can read)
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.write.mode("overwrite").parquet(src)

    q = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .parquet(src)
        .dropDuplicates(["user_id", "event_type"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        raise RuntimeError("state-gate drain did not terminate within 600 s")

    meta = state_metadata(spark, ckpt).select("operatorName", "numPartitions")
    state = state_rows(spark, ckpt).select(
        F.col("key.user_id").alias("user_id"),
        F.col("key.event_type").alias("event_type"),
        "partition_id",
    )
    bad_part = (F.col("partition_id") < 0) | (
        F.col("partition_id") >= F.col("numPartitions")
    )
    state_digest = state.crossJoin(F.broadcast(meta)).agg(
        F.count("*").alias("n_state_keys"),
        F.sum("user_id").alias("user_sum"),
        F.min("user_id").alias("user_min"),
        F.max("user_id").alias("user_max"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("event_type")), 1, 10), 16, 10).cast(
                "long"
            )
        ).alias("etype_hash_sum"),
        F.count_distinct(F.col("event_type")).alias("n_event_types"),
        F.sum(F.when(bad_part, 1).otherwise(0)).cast("long").alias("n_bad_partition"),
        F.sum(F.when(F.col("operatorName") == "dedupe", 0).otherwise(1))
        .cast("long")
        .alias("n_bad_opname"),
    )
    emitted_digest = _emitted_digest(spark.read.parquet(out))
    return state_digest.crossJoin(F.broadcast(emitted_digest))


def _emitted_digest(emitted: DataFrame) -> DataFrame:
    """Sink-side digest: row count + distinct composite-key count,
    struct-wrapped (r12 advice) so it stays null-faithful — bare
    ``count_distinct(a, b)`` drops rows where EITHER key is null, while
    the oracle's COUNT(*) over SELECT DISTINCT counts a null pair as a
    key; a struct is non-null even when its fields are."""
    return emitted.agg(
        F.count("*").alias("n_emitted"),
        F.count_distinct(F.struct(F.col("user_id"), F.col("event_type"))).alias(
            "n_emitted_keys"
        ),
    )
