"""End-to-end training-corpus pipeline: the composition of the corpus
operators into one lazy curate → dedup → decontaminate → mix → pack →
shard-write DAG (the LLM-data counterpart of ``pipeline.py``'s ETL run).

Stage order matters and is the standard one:

1. **quality gate** — cheap narrow predicates first so everything
   downstream touches fewer rows;
2. **exact dedup** — fingerprint groupBy (one shuffle), before any
   pairwise work exists to waste;
3. **decontamination** — shingle inverted-index anti-join against the
   benchmark set;
4. **mixture** — deterministic hash sampling + epoch replication (narrow);
5. **packing** — per-(lang, shard) running token sum → pack ids;
6. **shard write** — hive-partitioned by (lang, shard), rows clustered by
   (pack_id, doc_id) inside each file so a trainer reading one shard
   streams packs in order.

Everything before the write is ONE lazy plan — Catalyst sees the whole
funnel and pushes the quality predicates into the parquet scan. Metrics
come from cheap counts on the materialized output, reusing
``pipeline.RunMetrics`` (S10 parity).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.corpus import decontaminate, mixture_sample, sequence_packing
from .operators.dedup import exact_dedup
from .operators.text import token_count
from .pipeline import RunMetrics
from .sources.catalog import table
from .sources.sinks import write_clustered


def build_training_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_chars: int = 50,
    pack_budget: int = 2048,
    n_shards: int = 4,
) -> RunMetrics:
    """Run the full corpus pipeline and write training shards to
    ``out_dir``. Returns stage metrics."""
    metrics = RunMetrics()
    t0 = time.perf_counter()

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)

    # 1. quality gate (narrow; predicate reaches the scan)
    gated = docs.filter(
        (F.col("doc_id") % 97 != 0) & (F.col("n_chars") >= min_chars)
    )

    # 2. exact dedup (fingerprint groupBy + semi-join)
    deduped = exact_dedup(gated)

    # 3. benchmark decontamination (shingle anti-join)
    clean = decontaminate(deduped, bench)

    # 4. mixture: full rate, one epoch by default shape — callers tune the
    # per-source columns; kept neutral here so the funnel count is exact
    mixed = mixture_sample(clean, F.lit(100), F.lit(1))

    # 5. packing per (lang, shard)
    with_shard = mixed.select(
        "doc_id",
        "lang",
        "text",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            ).cast("long"),
            F.lit(n_shards),
        )
        .cast("int")
        .alias("shard"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    packed = sequence_packing(
        with_shard, "n_tokens", budget=pack_budget, part_cols=("lang", "shard")
    )

    # 6. shard write: partition dirs by (lang, shard), packs clustered
    # inside each file
    out = packed.select(
        "doc_id", "lang", "shard", "n_tokens", "tok_offset", "pack_id", "text"
    )
    write_clustered(out, out_dir, ["lang", "shard"], ["pack_id", "doc_id"])

    written = spark.read.parquet(out_dir)
    metrics.record(
        "corpus_pipeline",
        time.perf_counter() - t0,
        rows=written.count(),
        n_packs=written.select("lang", "shard", "pack_id").distinct().count(),
    )
    return metrics
