"""Offline streaming-state readers (round-11 operational extension).

At 100 TB, a streaming pipeline's state store IS production data — the
dedup ledgers, join buffers, and session registers that decide what the
gold tables contain. When a drain looks wrong, restarting the query with
debug prints is not an option; the operational tool is Spark's state data
source: read the checkpointed state OFFLINE as ordinary DataFrames, audit
it with the same SQL surface as any table, and only then touch the query.

Two public formats (Spark 4.x; no extra packages):

- ``state-metadata``: one row per stateful operator in the checkpoint —
  operator id/name, state store name(s), partition count, the min/max
  batch ids still readable. The index you consult FIRST, because the
  ``statestore`` reader needs the operator id and store name it lists.
- ``statestore``: the state rows themselves as ``key`` / ``value``
  structs (plus ``partition_id``), snapshotted at the last committed
  batch by default, or at ``batchId`` via option. Stream-stream joins
  expose their two sides via ``joinSide`` ("left"/"right") instead of raw
  store names; transformWithState exposes composite state via
  ``stateVarName``.

Read-only by construction — the readers never touch the commit log, so an
audit can run WHILE the query is live (snapshot isolation comes from the
checkpoint's versioned files). Tests: tests/test_state_reader.py drives a
dedup query and the round-11 outer join over real checkpoints and asserts
the state contents against the events that produced them.

The reference has no streaming surface (SURVEY §2.12 is an extension
family); this module extends S9 (DESCRIBE/introspection) to the streaming
state dimension the same way sources/catalog.py covers the table catalog.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import DataFrame, SparkSession


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator/store index of a streaming checkpoint.

    Columns (Spark 4.1): operatorId, operatorName, stateStoreName,
    numPartitions, minBatchId, maxBatchId, operatorProperties.
    """
    return spark.read.format("state-metadata").load(checkpoint)


def state_rows(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
    join_side: str | None = None,
    state_var_name: str | None = None,
) -> DataFrame:
    """State rows of one operator's store as a batch DataFrame.

    Defaults mirror the data source's: operator 0, store "default", the
    last committed batch. ``join_side`` ("left"/"right") replaces
    ``store_name`` for stream-stream join operators, whose four internal
    stores (keyToNumValues/keyWithIndexToValue per side) are only exposed
    pre-joined per side; ``state_var_name`` selects a transformWithState
    variable. The reader returns ``key``/``value`` structs — callers
    project ``key.*`` / ``value.*`` like any nested column. Shapes
    measured on Spark 4.1 (tests/test_state_reader.py): dropDuplicates
    keys carry the dedup columns by name; stream-stream join sides key
    by the equi-join key (unnamed ``field0``) with the buffered row
    under ``value``; a transformWithState MapState flattens to one row
    per entry as ``key`` / ``user_map_key`` / ``user_map_value``.
    """
    reader = spark.read.format("statestore").option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if join_side is not None:
        reader = reader.option("joinSide", join_side)
    if state_var_name is not None:
        reader = reader.option("stateVarName", state_var_name)
    return reader.load(checkpoint)


def checkpoint_watermark(checkpoint: str) -> dt.datetime | None:
    """Global watermark of the last COMMITTED batch, read offline.

    The state data source exposes state rows but not the watermark that
    governs them; that lives in the checkpoint's write-ahead offsets log —
    one text file per batch under ``offsets/``: a version line ("v1")
    followed by a JSON metadata line whose ``batchWatermarkMs`` is the
    global watermark the batch ran with (then per-source offset lines).
    This helper returns that value for the highest batch id present in
    ``commits/`` (an ``offsets/`` entry can exist for a batch that never
    committed — planning writes offsets first, commit seals it — so the
    commit log picks the batch whose state the checkpoint actually holds).

    Returns a naive UTC datetime (event-time watermarks are epoch-based),
    or ``None`` when no batch has committed or no watermark has been
    recorded yet (``batchWatermarkMs`` = 0 — e.g. a single-batch
    availableNow drain records its first nonzero watermark only in the
    NEXT batch's offsets entry; tests drain twice for exactly this
    reason). Local/NFS checkpoint paths — the deployment story for an
    object-store checkpoint is the same two files via its fs client.

    This is the number the cold-restart recipe needs: replaying a killed
    stream-stream join from ``watermark − join window`` re-buffers every
    row the old run had not provably closed
    (tests/test_stream_join_migration.py).
    """
    commits = os.path.join(checkpoint, "commits")
    offsets = os.path.join(checkpoint, "offsets")
    try:
        batch_ids = [int(f) for f in os.listdir(commits) if f.isdigit()]
    except FileNotFoundError:
        return None
    if not batch_ids:
        return None
    path = os.path.join(offsets, str(max(batch_ids)))
    with open(path, encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    # line 0: "v1"; line 1: JSON batch metadata; rest: per-source offsets
    meta = json.loads(lines[1])
    wm_ms = int(meta.get("batchWatermarkMs", 0))
    if wm_ms == 0:
        return None
    return dt.datetime.fromtimestamp(wm_ms / 1000.0, dt.timezone.utc).replace(
        tzinfo=None
    )
