"""Corpus-preparation operators for LLM training-data pipelines
(BASELINE.json north star) — the steps between "deduped documents" and
"training-ready shards": sequence packing, benchmark decontamination, PII
redaction, vocabulary building, and quality-percentile filtering.

All hot-path expressions are built-in Spark SQL functions (window sums,
regexp, explode/groupBy, joins on shingles) — JVM-side, codegen'd, zero
Python UDFs — and every operator has a DuckDB-oracle twin in
plans/extensions.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _doc_shingles

# Public, simple PII patterns (regex dialect shared by Java regex and RE2 so
# the DuckDB oracle runs the identical pattern).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\d{3}-\d{3}-\d{4}"


def sequence_packing(
    docs: DataFrame,
    token_col: str,
    budget: int,
    part_cols: tuple[str, ...] = ("lang",),
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a training pack: documents are concatenated
    in ``order_col`` order within each ``part_cols`` stratum and split into
    ``budget``-token context windows; a document's pack is the window its
    first token lands in (the standard concat-then-chunk pretraining
    layout, deterministic and engine-portable).

    Adds ``tok_offset`` (tokens before this doc in its stratum) and
    ``pack_id`` (= tok_offset div budget).

    Scale: the running sum is one window per stratum — a per-stratum
    ordered shuffle. At 100 TB pass a sharded stratum, e.g.
    ``part_cols=("lang", "shard")`` with ``shard = pmod(hash(doc_id), K)``,
    so no single partition holds a whole language; packs are then local to
    (lang, shard), which is exactly how sharded pretraining data is laid
    out anyway.
    """
    w = Window.partitionBy(*part_cols).orderBy(order_col)
    cum = F.sum(token_col).over(w)
    offset = (cum - F.col(token_col)).cast("long")
    return docs.withColumn("tok_offset", offset).withColumn(
        "pack_id", F.floor(F.col("tok_offset") / budget).cast("long")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: drop training documents sharing ANY
    ``n``-gram shingle with the benchmark set (the conservative exact
    n-gram-overlap rule used for eval-set hygiene).

    Shape: explode both sides to (doc_id, shingle), inner-join on the
    shingle (inverted index — only docs sharing content ever meet, never a
    cross join), distinct contaminated ids, then anti-join. Benchmark sets
    are tiny relative to the corpus, so the shingle join broadcasts the
    benchmark side under AQE."""
    t_sh = _doc_shingles(train, text_col, n)
    b_sh = _doc_shingles(benchmark, text_col, n).select("sh").distinct()
    contaminated = t_sh.join(b_sh, "sh").select("doc_id").distinct()
    return train.join(contaminated, "doc_id", "left_anti")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts for a text column."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_PATTERN), F.lit(0))),
    )


def redact_pii(text: Column) -> Column:
    """Replace emails/phones with typed placeholder tokens."""
    out = F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]")
    return F.regexp_replace(out, PHONE_PATTERN, "[PHONE]")


def vocab_top_terms(docs: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus vocabulary head: top-``k`` whitespace tokens by document-
    independent frequency, deterministic tie-break on the token itself.

    explode → groupBy(token) (partial-aggregatable, one shuffle) →
    TakeOrderedAndProject. The full vocabulary never sorts globally."""
    from .text import tokens

    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("token")).filter(
        F.col("token") != ""
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def hash_pct(col: Column) -> Column:
    """Deterministic per-row percentile in [0, 100): md5 of the stringified
    key → integer → mod 100. Engine-portable (identical in DuckDB via
    ``('0x' || substr(md5(x), 1, 15))::BIGINT % 100``) and stable across
    runs/partitionings — never ``rand()``."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(100))


def mixture_sample(
    docs: DataFrame,
    rate_pct_col: Column,
    epochs_col: Column,
    key_col: str = "doc_id",
) -> DataFrame:
    """Training-mixture construction: per-row sampling + replication.

    Down-weighting: keep a row iff its deterministic hash percentile falls
    under ``rate_pct_col`` (0–100) — an exact-rate Bernoulli sample that
    every engine and every re-run reproduces. Up-weighting: surviving rows
    replicate ``epochs_col`` times via explode(sequence(...)), adding an
    ``epoch`` column (1-based). This is the standard mixture-weights step
    between curation and packing; both steps are narrow (no shuffle)."""
    kept = docs.filter(hash_pct(F.col(key_col)) < rate_pct_col)
    return kept.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), epochs_col.cast("int")))
    )


def train_val_test_split(
    docs: DataFrame,
    key_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Deterministic corpus split: hash-percentile buckets assign each doc
    to train / val / test (defaults 90/5/5). The assignment is a pure
    per-row projection of the key's md5 — stable across runs, engines,
    partitionings, and INCREMENTAL ingests (a new batch lands in the same
    splits without re-shuffling history; rand() would re-deal every run).
    Adds a ``split`` column."""
    p = hash_pct(F.col(key_col))
    split = (
        F.when(p < val_pct, "val")
        .when(p < val_pct + test_pct, "test")
        .otherwise("train")
    )
    return docs.withColumn("split", split)


def quality_percentile_filter(
    docs: DataFrame,
    score_col: str,
    keep_fraction: float = 0.5,
    part_cols: tuple[str, ...] = ("lang",),
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_fraction`` of documents per stratum by
    ``score_col`` (highest first). percent_rank with an explicit tie-break
    column makes the cutoff deterministic and engine-exact (the rank is a
    ratio of integers). Adds ``pr`` (the percent_rank)."""
    w = Window.partitionBy(*part_cols).orderBy(
        F.desc(score_col), F.asc(tiebreak_col)
    )
    return docs.withColumn("pr", F.percent_rank().over(w)).filter(
        F.col("pr") <= keep_fraction
    )
