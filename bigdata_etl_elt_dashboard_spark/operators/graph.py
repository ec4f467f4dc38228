"""Reusable distributed graph primitives (SURVEY §7.5 extension surface).

Connected components live in ``operators.dedup`` (min-label + star
algorithms, built for the near-dup use case); this module holds the
generic graph ops the analytic plans share. Everything follows the
iterative-algorithm shape those CC implementations established: per-round
keyed shuffles over a shrinking frame, ``localCheckpoint`` per round so
round r never re-executes rounds 1..r-1 through lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .scale import pin


def kcore_peel(
    edges: DataFrame, k: int, rounds: int
) -> list[tuple[int, int, int]]:
    """Iteratively remove nodes of degree < k for ``rounds`` fixed rounds.

    ``edges`` is an undirected edge list (x, y) with x < y, no
    self-loops. Returns the per-round trajectory
    ``[(round, n_nodes, n_edges), ...]`` including round 0 (the input) —
    a stable tail means the true k-core fixpoint was reached within the
    unroll. Each round costs one degree groupBy + two semi-join filters
    of the (checkpointed, shrinking) edge frame; at 100 TB that is one
    edge-keyed shuffle per round.
    """
    e = edges.select("x", "y").transform(pin)

    def counts(frame: DataFrame) -> tuple[int, int]:
        row = (
            frame.select(F.col("x").alias("node"))
            .unionAll(frame.select(F.col("y").alias("node")))
            .agg(
                F.count_distinct("node").alias("n"),
                (F.count("*") / 2).cast("long").alias("m"),
            )
            .first()
        )
        return int(row["n"] or 0), int(row["m"] or 0)

    out = [(0, *counts(e))]
    for rnd in range(1, rounds + 1):
        deg = (
            e.select(F.col("x").alias("node"))
            .unionAll(e.select(F.col("y").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "x"), "x", "semi")
            .join(keep.withColumnRenamed("node", "y"), "y", "semi")
            .select("x", "y")
            .transform(pin)
        )
        out.append((rnd, *counts(e)))
    return out
