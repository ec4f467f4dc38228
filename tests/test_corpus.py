"""Unit semantics for the corpus-preparation operators (operators/corpus.py,
warehouse.scd2_merge) — hand-built inputs with known answers; the
registry-level DuckDB parity lives in test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_etl_elt_dashboard_spark.operators import corpus as C
from bigdata_etl_elt_dashboard_spark.operators.warehouse import scd2_merge


def test_sequence_packing_concat_then_chunk(spark):
    """pack_id = window the doc STARTS in; docs straddling a boundary keep
    the pack of their first token; strata pack independently."""
    docs = spark.createDataFrame(
        [
            # lang en: sizes 60, 50, 10 with budget 100
            (1, "en", 60),  # offset 0   -> pack 0
            (2, "en", 50),  # offset 60  -> pack 0 (straddles into 1)
            (3, "en", 10),  # offset 110 -> pack 1
            # lang fr packs from zero again
            (4, "fr", 250),  # offset 0  -> pack 0
            (5, "fr", 1),    # offset 250 -> pack 2
        ],
        "doc_id long, lang string, n_tokens long",
    )
    out = {
        r["doc_id"]: r
        for r in C.sequence_packing(docs, "n_tokens", budget=100).collect()
    }
    assert [out[i]["pack_id"] for i in (1, 2, 3)] == [0, 0, 1]
    assert [out[i]["tok_offset"] for i in (1, 2, 3)] == [0, 60, 110]
    assert out[4]["pack_id"] == 0 and out[5]["pack_id"] == 2


def test_decontaminate_drops_only_overlapping(spark):
    schema = "doc_id long, text string"
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # shares 'alpha beta gamma'
            (2, "totally different words here"),
            (3, "beta gamma delta epsilon"),    # shares 'beta gamma delta'
        ],
        schema,
    )
    bench = spark.createDataFrame([(100, "alpha beta gamma delta zeta")], schema)
    kept = sorted(r["doc_id"] for r in C.decontaminate(train, bench).collect())
    assert kept == [2]


def test_pii_redaction_patterns(spark):
    df = spark.createDataFrame(
        [(1, "write a@b.co or bob.smith+x@mail.example.org, call 555-123-4567 now")],
        "id long, text string",
    )
    n_e, n_p = C.pii_counts(F.col("text"))
    row = df.select(
        n_e.alias("e"), n_p.alias("p"), C.redact_pii(F.col("text")).alias("red")
    ).first()
    assert row["e"] == 2 and row["p"] == 1
    assert row["red"] == "write [EMAIL] or [EMAIL], call [PHONE] now"


def test_quality_percentile_filter_deterministic_ties(spark):
    """Equal scores are ordered by the tie-break column, so the kept set is
    exactly reproducible: 4 docs, keep pr <= 0.5 -> top 3 ranks of the
    DESC ordering (pr of rank k is (k-1)/3)."""
    docs = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 10), (3, "en", 5), (4, "en", 1)],
        "doc_id long, lang string, score long",
    )
    kept = sorted(
        r["doc_id"] for r in C.quality_percentile_filter(docs, "score", 0.5).collect()
    )
    # order: doc1 (pr 0), doc2 (pr 1/3), doc3 (pr 2/3 > 0.5 dropped)...
    assert kept == [1, 2]


def test_scd2_merge_versions_and_late_keys(spark):
    base = spark.createDataFrame(
        [(1, "BUILDING", dt.date(2020, 1, 1)), (2, "AUTO", dt.date(2020, 1, 1))],
        "k long, seg string, valid_from date",
    )
    upd = spark.createDataFrame(
        [(1, "MACHINERY", dt.date(2024, 1, 1)), (3, "NEW", dt.date(2024, 6, 1))],
        "k long, seg string, valid_from date",
    )
    rows = {
        (r["k"], r["valid_from"]): r
        for r in scd2_merge(base, upd, "k", ["seg"]).collect()
    }
    # key 1: closed old version, open new one
    v1_old = rows[(1, dt.date(2020, 1, 1))]
    assert v1_old["valid_to"] == dt.date(2024, 1, 1) and not v1_old["is_current"]
    v1_new = rows[(1, dt.date(2024, 1, 1))]
    assert v1_new["valid_to"] is None and v1_new["is_current"]
    # key 2: untouched single current version
    assert rows[(2, dt.date(2020, 1, 1))]["is_current"]
    # key 3: late-arriving member gets one open version
    v3 = rows[(3, dt.date(2024, 6, 1))]
    assert v3["seg"] == "NEW" and v3["is_current"] and v3["valid_to"] is None
    assert len(rows) == 4


def test_star_cc_converges_logarithmically_on_chains(spark):
    """The reason connected_components_star exists: a 64-node CHAIN
    (worst case for min-label propagation, which needs O(diameter) = 63
    rounds) must fully converge within 10 star rounds (O(log n) ≈ 6)."""
    from bigdata_etl_elt_dashboard_spark.operators.dedup import (
        connected_components_star,
    )

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_star(chain, nodes, max_iter=10).collect()
    }
    assert labels == {i: 0 for i in range(n)}


def test_mixture_sample_deterministic_and_replicated(spark):
    docs = spark.createDataFrame([(i, "s") for i in range(200)], "doc_id long, source string")
    rate = F.when(F.col("doc_id") < 100, 100).otherwise(50)
    epochs = F.when(F.col("doc_id") % 2 == 0, 2).otherwise(1)
    out = C.mixture_sample(docs, rate, epochs).collect()
    again = C.mixture_sample(docs, rate, epochs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))  # run-stable
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # rate 100 slice: all 100 docs kept; rate 50 slice: a strict subset
    assert all(d in by_doc for d in range(100))
    kept_half = [d for d in range(100, 200) if d in by_doc]
    assert 0 < len(kept_half) < 100
    # replication: even docs appear with epochs [1, 2], odd with [1]
    for d, eps in by_doc.items():
        assert sorted(eps) == ([1, 2] if d % 2 == 0 else [1])


def test_corpus_pipeline_end_to_end(spark, tmp_path, sf_oracle):
    """curate -> dedup -> decontaminate -> mix -> pack -> shard write as one
    run: shards land partitioned by (lang, shard); every surviving doc
    passed the quality gate, is fingerprint-unique, shares no shingle with
    the benchmark slice; packs are contiguous within each stratum."""
    import glob
    import os

    from bigdata_etl_elt_dashboard_spark.corpus_pipeline import build_training_shards

    out = str(tmp_path / "shards")
    metrics = build_training_shards(spark, sf_oracle, out, min_chars=50)
    stage = metrics.stages["corpus_pipeline"]
    assert stage["rows"] > 0 and stage["n_packs"] > 0

    assert glob.glob(os.path.join(out, "lang=*", "shard=*", "*.parquet"))
    shards = spark.read.parquet(out)
    rows = shards.collect()
    # quality gate + benchmark exclusion held
    assert all(r["n_tokens"] >= 0 and r["doc_id"] % 97 != 0 for r in rows)
    # fingerprint-unique: no two rows share normalized text
    texts = [" ".join(r["text"].split()).lower() for r in rows]
    assert len(texts) == len(set(texts))
    # packs contiguous: within (lang, shard), offsets are the running sum
    by_stratum = {}
    for r in sorted(rows, key=lambda r: (r["lang"], r["shard"], r["doc_id"])):
        key = (r["lang"], r["shard"])
        expect = by_stratum.get(key, 0)
        assert r["tok_offset"] == expect
        assert r["pack_id"] == expect // 2048
        by_stratum[key] = expect + r["n_tokens"]


def test_vocab_top_terms_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "b a b c a b"), (2, "c a  ")], "doc_id long, text string"
    )
    out = [(r["token"], r["n_occurrences"]) for r in C.vocab_top_terms(docs, k=3).collect()]
    assert out == [("a", 3), ("b", 3), ("c", 2)]
