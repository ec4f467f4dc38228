"""Round-14 gate addition: the schema-evolved checkpoint-migration PATH,
driver-gated end to end (r13 verdict task 6).

Rounds 11–13 gated the pieces this composition rests on — the tWS state
codec (``src_tws_state_digest``), the join buffers
(``src_join_state_digest``), the sessionizer's batch twin
(``ev_timer_session_close_twin``) — and proved the v1→v2 migration by
pytest on planted events. This gate closes the composition on REAL data:
a v1 sessionizer drains the first half of the events table into
checkpoint A, ``migrate_session_state_v1_to_v2`` lifts A's open sessions
into the v2 ``initialState`` seed (offline state read + the gained
``sum_v`` backfilled), a v2 continuation drains the second half on a
fresh checkpoint (``handleInitialState`` re-registers every open
session's close timer), and the CONVERGED session table — run A's
emissions plus run B's — is digested on its SHARED columns against the
oracle's direct batch sessionization of the same parquet.

Reference parity: the reference app has no streaming surface (SURVEY
§2.12); this belongs to the §7.5 streaming extension.

Emission/label semantics the oracle encodes (pinned by two r14 probes on
Spark 4.1.2, single-batch-per-phase ingestion):

- an ``availableNow`` run DOES fire event-time timers whose expiry the
  terminal watermark reaches, within the same run (measured — the run
  schedules a trailing batch after the data batch advances the
  watermark), and the boundary is ``expiry <= wm`` exactly (a timer at
  precisely the watermark fires; 1 ms above does not);
- so a session whose successor event lands in the SAME phase closes
  inline by 'gap'; a session whose remaining events are all post-cutover
  closes by 'timer' in run A iff ``end + gap <= max_ms(phase 1)``
  (otherwise it migrates and closes by 'gap'/'timer' in run B); a user's
  last session closes by 'timer' iff ``end + gap <= max_ms(all)``, else
  it is still open at drain and unemitted;
- the cutover is the midpoint of the event-time span — the converged
  SHARED columns are cutover-invariant, but ``closed_by`` labels are
  not, so the oracle recomputes the same midpoint.

``sum_v`` is EXCLUDED from the digest: for cutover-straddling sessions
it diverges exactly as the v1→v2 recipe documents (the backfill default
covers nothing pre-cutover) — tests/test_schema_evolution_migration.py
pins that divergence on planted data.
"""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table
from .registry import register
from .wave13 import _REPO_ROOT, _work_dir

_GAP_MS = 600_000


@register(
    "src_session_migration_digest",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) // 1000 AS ms
            FROM events WHERE user_id IS NOT NULL
        ), b AS (
            SELECT MIN(ms) AS mn, MAX(ms) AS mx FROM e
        ), cutp AS (
            SELECT mn + (mx - mn) // 2 AS c, mx FROM b
        ), p1 AS (
            SELECT MAX(ms) AS mx1 FROM e, cutp WHERE ms < c
        ), marked AS (
            SELECT user_id, ms, event_id,
                   CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id
                                                ORDER BY ms, event_id)
                             >= {_GAP_MS} THEN 1 ELSE 0 END AS new_s
            FROM e
        ), sess AS (
            SELECT user_id, ms,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess
            FROM marked
        ), agg AS (
            SELECT user_id, sess,
                   MIN(ms) AS start_ms, MAX(ms) AS end_ms,
                   COUNT(*) AS n_events
            FROM sess GROUP BY user_id, sess
        ), lab AS (
            SELECT user_id, start_ms, end_ms, n_events,
                   CASE
                     WHEN next_start IS NULL THEN
                       CASE WHEN end_ms + {_GAP_MS} <= (SELECT mx FROM cutp)
                            THEN 'timer' END
                     WHEN next_start >= (SELECT c FROM cutp)
                          AND end_ms + {_GAP_MS} <= (SELECT mx1 FROM p1)
                       THEN 'timer'
                     ELSE 'gap'
                   END AS closed_by
            FROM (
                SELECT *,
                       LEAD(start_ms) OVER (PARTITION BY user_id
                                            ORDER BY start_ms) AS next_start
                FROM agg
            )
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(user_id) AS BIGINT) AS user_sum,
               CAST(SUM(start_ms) AS BIGINT) AS start_sum,
               CAST(SUM(end_ms) AS BIGINT) AS end_sum,
               CAST(SUM(n_events) AS BIGINT) AS events_sum,
               CAST(COUNT(*) FILTER (WHERE closed_by = 'gap') AS BIGINT)
                   AS n_gap,
               CAST(COUNT(*) FILTER (WHERE closed_by = 'timer') AS BIGINT)
                   AS n_timer
        FROM lab WHERE closed_by IS NOT NULL
    """,
    doc="Schema-evolved checkpoint-migration gate: v1 sessionizer drains "
    "the pre-cutover half of events (hermetic subprocess — "
    "streaming/migration_drain.py; tWS needs protobuf on PYTHONPATH at "
    "JVM launch), migrate_session_state_v1_to_v2 lifts checkpoint A's "
    "open sessions into the v2 initialState seed (offline state read + "
    "sum_v backfill), the v2 processor drains the post-cutover half on "
    "a FRESH checkpoint re-registering open-session timers, and the "
    "converged session table (run A ∪ run B, shared columns) is "
    "digested against the oracle's direct batch sessionization with the "
    "probe-pinned emission rules (timers fire within an availableNow "
    "run at expiry <= watermark; successor-in-same-phase closes by gap; "
    "open-at-drain sessions unemitted). Green proves the COMPOSITION — "
    "offline read → transform → initialState seed → timer "
    "re-registration — lands the continuous-run session table on real "
    "data, not just the planted pytest corpus. Null user_ids are "
    "excluded on both sides (sessionization keys on user). "
    "closed_by participates via the gap/timer counts.",
)
def src_session_migration_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _work_dir(sf_dir, "mig")
    src = os.path.join(work, "src")

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .filter(F.col("user_id").isNotNull())
    )
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "bigdata_etl_elt_dashboard_spark.streaming.migration_drain",
            src,
            work,
        ],
        cwd=_REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"migration drain subprocess failed (rc={proc.returncode}): "
            f"{proc.stderr[-2000:]}"
        )

    shared = ["user_id", "start_ms", "end_ms", "n_events", "closed_by"]
    out_a = spark.read.parquet(os.path.join(work, "outA")).select(*shared)
    out_b = spark.read.parquet(os.path.join(work, "outB")).select(*shared)
    converged = out_a.unionByName(out_b)
    return converged.agg(
        F.count("*").alias("n_sessions"),
        F.sum("user_id").cast("long").alias("user_sum"),
        F.sum("start_ms").cast("long").alias("start_sum"),
        F.sum("end_ms").cast("long").alias("end_sum"),
        F.sum("n_events").cast("long").alias("events_sum"),
        F.count(F.when(F.col("closed_by") == "gap", 1)).alias("n_gap"),
        F.count(F.when(F.col("closed_by") == "timer", 1)).alias("n_timer"),
    )
