"""Text analysis for training-data pipelines (BASELINE.json north star).

All hot-path expressions are built-in Spark SQL functions (split,
higher-order array functions, regexp, md5) — JVM-side, codegen'd, zero
Python UDFs — so they scale to a 100 TB `documents` table exactly like any
other projection. Driver-side state: none.

Operators:
- tokenization + token counting (whitespace; BPE-ish regex variant)
- quality scoring (length / punctuation / stopword ratios)
- language ID (stopword-hit heuristic over a small per-language lexicon)
- document fingerprinting (md5 of whitespace-normalized text; shingle
  min-fingerprint as the rolling-hash analog)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lexicons for the language-ID heuristic.
#: Deliberately small and hard-coded: the heuristic must be reproducible in
#: ANSI SQL for the oracle, not model-driven.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein", "nicht"),
}

#: BPE-ish token pattern: runs of word chars OR single non-space symbols —
#: approximates subword pre-tokenization (public GPT-2 style regex, ASCII).
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(tokens(text)))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens (word runs + digit runs + symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in ``words`` (higher-order filter — no UDF)."""
    return F.size(F.filter(tokens(text), lambda x: x.isin(*words)))


def punct_count(text: Column) -> Column:
    """Number of punctuation characters ``.,!?;:`` in the text."""
    return F.length(F.regexp_replace(text, r"[^.,!?;:]", ""))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring projection: per-doc length, token count, mean token
    length, punctuation ratio, stopword ratio, and a deterministic composite
    quality bucket (good/fair/poor).

    Staged so each expensive string expression evaluates ONCE per row: the
    pre-r14 single-projection form re-ran ``split(lower(trim(text)))`` ~6×
    and both regexp_replaces 2× per row through Python-side expression
    reuse (r14 plan audit, text_quality ``split(`` ×6 in one Project) —
    guide §1.2 step 2. Catalyst's CollapseProject keeps multi-referenced
    non-cheap aliases staged, and every downstream value is the identical
    expression over the shared columns, so results are bit-equal."""
    t = F.col(text_col)
    toked = df.select(
        "doc_id",
        F.length(t).alias("n_chars_m"),
        (F.trim(t) == "").alias("_blank"),
        tokens(t).alias("_toks"),
        F.length(F.regexp_replace(t, r"\s+", "")).alias("_n_nospace"),
        punct_count(t).alias("_n_punct"),
    )
    counted = toked.select(
        "doc_id",
        "n_chars_m",
        "_n_nospace",
        "_n_punct",
        F.when(F.col("_blank"), F.lit(0)).otherwise(F.size("_toks")).alias("n_tokens"),
        F.size(
            F.filter(F.col("_toks"), lambda x: x.isin(*LANG_STOPWORDS["en"]))
        ).alias("_sw"),
    )
    n_tokens = F.col("n_tokens")
    nt_d = F.nullif(n_tokens.cast("double"), F.lit(0.0))
    punct_ratio = F.col("_n_punct") / F.nullif(
        F.col("n_chars_m").cast("double"), F.lit(0.0)
    )
    stop_ratio = F.col("_sw") / nt_d
    mean_tok_len = F.col("_n_nospace") / nt_d
    bucket = (
        F.when((n_tokens < 5) | (mean_tok_len > 15), "poor")
        .when(stop_ratio >= 0.05, "good")
        .otherwise("fair")
    )
    return counted.select(
        "doc_id",
        "n_chars_m",
        "n_tokens",
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        bucket.alias("quality_bucket"),
    )


def lang_scores(text: Column) -> list[Column]:
    """Per-language stopword-hit counts (one column per language)."""
    return [stopword_hits(text, ws).alias(f"hits_{lang}") for lang, ws in LANG_STOPWORDS.items()]


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword hits, with a
    deterministic tie-break (language name ascending); 'und' when no hits.

    Expressed as a greatest/CASE chain so the oracle can reproduce it."""
    t = F.col(text_col)
    scored = df.select("doc_id", "lang", *lang_scores(t))
    langs = sorted(LANG_STOPWORDS)  # tie-break order
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    # build reversed so earlier (alphabetical) languages win ties
    for lang in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"hits_{lang}") == best), lang).otherwise(pred)
    return scored.select("doc_id", "lang", pred.alias("lang_pred"))


def bigram_list(toks: Column) -> Column:
    """Adjacent word bigrams of a token array as ``array<string>``; empty
    array for docs with fewer than 2 tokens. Built with sequence+transform
    (JVM higher-order fns) — a per-row projection, no explode/shuffle."""
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        )
    )


def max_token_count(toks: Column) -> Column:
    """Highest per-token occurrence count within one document (the Gopher
    'top token fraction' numerator), without an explode+groupBy shuffle:
    sort the array, then a single O(n) aggregate() scan tracking the
    longest run of equal adjacent tokens. Per-row, embarrassingly
    parallel — the 100 TB plan is a narrow projection, not a per-token
    shuffle."""
    sorted_toks = F.array_sort(toks)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_toks, init, merge, lambda acc: acc["best"])


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, lowercased, trimmed text (fingerprint input)."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of normalized text. md5 (not xxhash64)
    because it is engine-portable — the DuckDB oracle computes the identical
    digest."""
    return F.md5(normalized_text(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> (near-dup unit).

    Built with sequence+transform+slice — all JVM higher-order functions;
    docs shorter than n shingle to the whole normalized text.

    The tokenization is bound to a lambda variable (via the one-element
    transform) so the regex+split runs ONCE per document; referencing the
    raw split expression inside the per-shingle lambda would re-evaluate
    it for every shingle index (~tokens× more regex work — measured 5×
    slower on the documents corpus)."""

    def build(toks: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )

    bound = F.transform(F.array(F.split(normalized_text(text), " ")), build)
    return F.array_distinct(bound[0])
