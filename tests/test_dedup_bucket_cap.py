"""Pre-verify bucket-cap contract (operators/dedup.lsh_candidate_pairs
``bucket_cap`` — r13 verdict task 1).

Three guarantees, each tested directly:

1. **Identity below the cap**: when every (band_idx, band_sig) bucket has
   multiplicity ≤ cap, the capped pair set is BIT-IDENTICAL to the
   uncapped one (full cliques everywhere) — this is why the oracle-gated
   pipelines can run capped against uncapped-pair oracle SQL on the gate
   corpora (measured max multiplicity: sf0.01 = 3, variant sf0.01v = 10,
   both < DEFAULT_BUCKET_CAP = 16).
2. **Keeper preservation past the cap**: on a duplicate-saturated corpus
   (every fixture doc replicated K times with disjoint ids — the 64×/128×
   capstone regime) with a cap ≪ K, verified-edge connected components
   elect EXACTLY the same keepers as the uncapped pipeline: exact-dup
   groups are contiguous in the (sig_key, doc_id) chain order, so their
   chain edges are Jaccard-1 pairs that always survive verification, and
   CC labels depend only on connectivity.
3. **The quadratic term is actually bounded**: capped candidate volume on
   that corpus is a small fraction of the uncapped volume and respects
   the per-bucket closed form Σ C(min(m,cap),2) + max(0, m−cap).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdata_etl_elt_dashboard_spark.operators import dedup as D
from bigdata_etl_elt_dashboard_spark.sources.catalog import table

_SF = "/root/testdata/sf0.001"
_K = 12  # replicas per doc in the adversarial corpus
_CAP = 4  # ≪ K so the cap engages on every dup bucket


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def _replicated_docs(spark, k: int):
    docs = table(spark, _SF, "documents").select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    rep = spark.range(k).select(F.col("id").alias("replica"))
    return docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("replica") * F.lit(n)).alias("doc_id"), "text"
    )


def _keepers(spark, docs, bucket_cap):
    """The dedup_verified_keepers composition (plans/wave7.py) with the
    cap as a knob: LSH candidates → candidate-restricted exact-Jaccard
    verify → connected components → min-id keeper per cluster."""
    sh = D._doc_shingles(docs, "text", 3)
    sigs = D.minhash_signatures(docs, num_hashes=8, shingles_df=sh)
    cand = D.lsh_candidate_pairs(
        docs, num_hashes=8, bands=4, signatures_df=sigs, bucket_cap=bucket_cap
    )
    verified = D.verify_candidates(sh, cand, min_jaccard=0.5)
    edges = verified.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = D.connected_components_minlabel(edges, docs.select("doc_id"))
    return {
        (r["cluster_id"], r["n"])
        for r in labels.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }


def test_cap_is_identity_when_buckets_fit(spark):
    docs = table(spark, _SF, "documents").select("doc_id", "text")
    sh = D._doc_shingles(docs, "text", 3)
    sigs = D.minhash_signatures(docs, num_hashes=8, shingles_df=sh)
    uncapped = _pairs(
        D.lsh_candidate_pairs(docs, num_hashes=8, bands=4, signatures_df=sigs)
    )
    capped = _pairs(
        D.lsh_candidate_pairs(
            docs, num_hashes=8, bands=4, signatures_df=sigs,
            bucket_cap=D.DEFAULT_BUCKET_CAP,
        )
    )
    assert capped == uncapped  # full cliques everywhere below the cap


def test_cap_preserves_keepers_on_duplicate_saturated_corpus(spark):
    docs = _replicated_docs(spark, _K).localCheckpoint()
    assert _keepers(spark, docs, _CAP) == _keepers(spark, docs, None)


def test_cap_bounds_candidate_volume(spark):
    docs = _replicated_docs(spark, _K).localCheckpoint()
    sh = D._doc_shingles(docs, "text", 3).localCheckpoint()
    sigs = D.minhash_signatures(docs, num_hashes=8, shingles_df=sh).localCheckpoint()
    uncapped = D.lsh_candidate_pairs(
        docs, num_hashes=8, bands=4, signatures_df=sigs
    ).count()
    capped = D.lsh_candidate_pairs(
        docs, num_hashes=8, bands=4, signatures_df=sigs, bucket_cap=_CAP
    ).count()
    # closed-form per-bucket ceiling from the actual bucket multiplicities
    rows_per_band = 8 // 4
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"h{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"b{b}")
        for b in range(4)
    ]
    banded = sigs.select("doc_id", *band_cols)
    bound = 0
    for b in range(4):
        for (m,) in (
            banded.groupBy(f"b{b}").agg(F.count("*").alias("m")).select("m").collect()
        ):
            h = min(m, _CAP)
            bound += h * (h - 1) // 2 + max(0, m - _CAP)
    assert capped <= bound < uncapped
    # every dup bucket has m ≥ K = 12 ≫ cap: the reduction must be large
    assert capped < uncapped / 3
