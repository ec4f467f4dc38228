"""Behavioral tests for the LLM-pipeline operators on planted cases: exact
dups, near-dups (one-word edits), unrelated docs — plus ANN recall vs the
brute-force baseline and multimodal feature determinism."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdata_etl_elt_dashboard_spark.operators import dedup as D
from bigdata_etl_elt_dashboard_spark.operators import multimodal as M
from bigdata_etl_elt_dashboard_spark.operators import similarity as S
from bigdata_etl_elt_dashboard_spark.sources.catalog import table

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the morning sun"
)
_NEAR = _BASE.replace("morning", "evening")  # one-word edit → near-dup
_OTHER = (
    "completely different text about spark query engines and distributed "
    "shuffle joins running on large clusters every day"
)

_DOCS = [
    (1, _BASE),
    (2, "  " + _BASE.upper() + "  "),  # exact dup after normalization
    (3, _NEAR),
    (4, _OTHER),
]


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_exact_dedup_normalized(spark):
    docs = _docs_df(spark)
    groups = {r["keep_doc_id"]: r["n_copies"] for r in D.exact_dedup_groups(docs).collect()}
    assert groups[1] == 2  # doc 2 is doc 1 after lower/trim normalization
    assert groups[3] == 1 and groups[4] == 1
    kept = sorted(r["doc_id"] for r in D.exact_dedup(docs).collect())
    assert kept == [1, 3, 4]


def test_jaccard_finds_near_dup(spark):
    docs = _docs_df(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in D.jaccard_pairs(docs).collect()}
    assert pairs[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.7  # near-dup
    assert all(4 not in p for p in pairs)  # unrelated doc never pairs


def test_minhash_lsh_candidates(spark):
    docs = _docs_df(spark)
    pairs = {(r["doc_a"], r["doc_b"]) for r in D.lsh_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs  # identical signatures must collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup should band-collide
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_near_dup_clusters_transitive(spark):
    """1~2 (exact) and 1~3 (near) must land in ONE cluster even if 2~3
    never directly band-collides — that's the transitivity clusters add
    over raw pair output. Doc 4 stays a singleton."""
    docs = _docs_df(spark)
    labels = {r["doc_id"]: r["cluster_id"] for r in D.near_dup_clusters(docs).collect()}
    assert labels[1] == labels[2] == 1
    assert labels[3] == 1  # pulled in via doc 1 or doc 2
    assert labels[4] == 4


def test_simhash_hamming(spark):
    docs = _docs_df(spark)
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]  # identical shingle sets → identical signature
    near = bin(sigs[1] ^ sigs[3]).count("1")
    far = bin(sigs[1] ^ sigs[4]).count("1")
    assert near < far and near <= 12
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in D.simhash_near_pairs(docs, max_hamming=12).collect()}
    assert pairs.get((1, 2)) == 0


def test_ann_recall_vs_bruteforce(spark, sf_oracle):
    emb = table(spark, sf_oracle, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in S.topk_cosine(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in S.ann_lsh_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # deterministic (seeded planes): recall must be meaningfully better than
    # random bucketing; brute force stays the exactness baseline
    assert recall >= 0.2, f"ANN recall collapsed: {recall}"


def test_ivf_recall_vs_bruteforce(spark, sf_oracle):
    emb = table(spark, sf_oracle, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in S.topk_cosine(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in S.ivf_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # nprobe=3 of 8 cells scans ~3/8 of the corpus; near neighbors
    # concentrate in the probed cells so recall must beat that fraction
    assert recall >= 0.4, f"IVF recall collapsed: {recall}"
    # every query produced a full (or cell-limited) ranked list
    ranks = S.ivf_topk(emb, queries, k=5).groupBy("query_id").count().collect()
    assert len(ranks) == 5


def test_near_dup_pairs_symmetric_subset(spark, sf_oracle):
    emb = table(spark, sf_oracle, "embeddings")
    pairs = S.near_dup_pairs(emb, min_sim=0.45).collect()
    assert all(r["doc_a"] < r["doc_b"] for r in pairs)
    assert all(r["cosine_sim"] >= 0.45 for r in pairs)
    # loosening the threshold can only add pairs
    looser = {(r["doc_a"], r["doc_b"]) for r in S.near_dup_pairs(emb, min_sim=0.4).collect()}
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} <= looser


def test_frame_sampling_fanout(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 300, "en", "src0", 300), (2, "", "en", "src0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = M.as_media_table(docs)
    frames = M.sample_frames(media, frame_size=64, stride=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["media_id"], []).append(r)
    # 300 bytes / 64 = 5 frames, stride 2 keeps idx 0, 2, 4
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [0, 2, 4]
    assert sorted(by_doc[1], key=lambda r: r["frame_idx"])[-1]["frame_len"] == 300 - 4 * 64
    # empty payload still yields exactly one (empty) frame
    assert len(by_doc[2]) == 1 and by_doc[2][0]["frame_len"] == 0
    assert by_doc[2][0]["frame_sha"] == hashlib.sha256(b"").hexdigest()


def test_ppm_codec_roundtrip():
    """Pure-Python PPM codec: encode -> decode is identity; header comments
    and maxval parsing honored; truncated rasters rejected."""
    img = M.DecodedImage(3, 2, bytes(range(18)))
    assert M.decode_ppm(M.encode_ppm(img)) == img
    # hand-written header with a comment line
    with_comment = b"P6\n# made by hand\n3 2\n255\n" + bytes(range(18))
    assert M.decode_ppm(with_comment) == img
    import pytest as _pytest

    with _pytest.raises(ValueError):
        M.decode_ppm(b"P6\n3 2\n255\n" + bytes(10))  # truncated raster
    with _pytest.raises(ValueError):
        M.decode_ppm(b"\x89PNG....")  # not a PPM


def test_resize_nearest_neighbor_exact():
    """Downscale 4x4 -> 2x2 picks source pixel (2x, 2y) exactly."""
    # pixel (x, y) has RGB (x, y, 0)
    px = bytes(b for y in range(4) for x in range(4) for b in (x, y, 0))
    small = M.decode_ppm(M.resize_image(M.encode_ppm(M.DecodedImage(4, 4, px)), 2, 2))
    assert (small.width, small.height) == (2, 2)
    for y in range(2):
        for x in range(2):
            assert small.pixel(x, y) == (2 * x, 2 * y, 0)
    # upscale 1x1 -> 3x3 replicates the single pixel
    one = M.encode_ppm(M.DecodedImage(1, 1, bytes((9, 8, 7))))
    big = M.decode_ppm(M.resize_image(one, 3, 3))
    assert all(big.pixel(x, y) == (9, 8, 7) for x in range(3) for y in range(3))


def test_decoder_is_pluggable():
    """set_decoder swaps the decode path (the PIL/opencv hook)."""
    calls = []

    def fake_decoder(content: bytes) -> M.DecodedImage:
        calls.append(content)
        return M.DecodedImage(1, 1, b"\x00\x01\x02")

    try:
        M.set_decoder(fake_decoder)
        img = M.decode_image(b"anything")
        assert img.pixel(0, 0) == (0, 1, 2) and calls == [b"anything"]
    finally:
        M.set_decoder(M.decode_auto)


def test_decode_image_stats_spark(spark):
    """synth PPM -> decode -> per-channel sums through mapInPandas match a
    driver-side recomputation of the closed-form raster."""
    docs = spark.createDataFrame([(0,), (5,), (300,)], "doc_id long")
    rows = {r["media_id"]: r for r in M.decode_image_stats(M.synth_ppm_table(docs)).collect()}
    for did in (0, 5, 300):
        raster = [((did % 256) * 7 + i) % 256 for i in range(8 * 4 * 3)]
        assert rows[did]["width"] == 8 and rows[did]["height"] == 4
        assert rows[did]["sum_r"] == sum(raster[0::3])
        assert rows[did]["sum_g"] == sum(raster[1::3])
        assert rows[did]["sum_b"] == sum(raster[2::3])


def test_multimodal_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "src0", 11), (2, "", "en", "src0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = M.as_media_table(docs)
    feats = {r["media_id"]: r for r in M.extract_features(media).collect()}
    assert feats[1]["byte_len"] == 11
    assert feats[1]["content_sha"] == hashlib.sha256(b"hello world").hexdigest()
    assert len(feats[1]["feature"]) == 8
    assert all(0.0 <= v < 1.0 for v in feats[1]["feature"])
    assert feats[2]["byte_len"] == 0  # empty payload handled


def test_bmp_codec_roundtrip():
    """BMP encode→decode is the identity on RGB pixels, including a width
    (3) whose row needs stride padding, and decode handles both bottom-up
    (positive height) and top-down (negative height) storage."""
    from bigdata_etl_elt_dashboard_spark.operators import multimodal as M

    px = bytes(range(3 * 2 * 3))  # 3x2 RGB, distinct bytes
    img = M.DecodedImage(3, 2, px)
    back = M.decode_bmp(M.encode_bmp(img))
    assert (back.width, back.height, back.pixels) == (3, 2, px)

    # top-down variant: flip height sign and drop the row reversal
    import struct

    bot_up = bytearray(M.encode_bmp(img))
    struct.pack_into("<i", bot_up, 22, -2)  # height := -2 (top-down)
    stride = (3 * 3 + 3) & ~3
    raster = bot_up[54:]
    flipped = raster[stride : 2 * stride] + raster[:stride]
    td = M.decode_bmp(bytes(bot_up[:54]) + bytes(flipped))
    assert (td.width, td.height, td.pixels) == (3, 2, px)


def test_decode_auto_dispatches_by_magic():
    from bigdata_etl_elt_dashboard_spark.operators import multimodal as M

    img = M.DecodedImage(2, 2, bytes(range(12)))
    assert M.decode_image(M.encode_ppm(img)).pixels == img.pixels
    assert M.decode_image(M.encode_bmp(img)).pixels == img.pixels
    import pytest

    with pytest.raises(ValueError):
        M.decode_auto(b"GIF89a...")


def test_pca_projection_matches_numpy_direction(spark, sf_smoke):
    """Semantic check beyond the hash gate: the integer power iteration must
    land (up to sign and near-degenerate-spectrum tolerance) on numpy's top
    eigenvector of the centered scatter matrix — i.e. the per-vector scores
    are real PCA scores, not just engine-consistent numbers. The synthetic
    cloud is near-isotropic (eigengap ~1.07), which is exactly why the
    operator runs 48 iterations."""
    import numpy as np
    import pyarrow.parquet as pq

    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

    rows = REGISTRY["emb_pca_project"].fn(spark, sf_smoke).collect()
    scores = {int(r["vec_id"]): float(r["score"]) for r in rows}

    X = np.array(
        pq.read_table(sf_smoke + "/embeddings.parquet")["embedding"].to_pylist(),
        dtype=np.float64,
    )
    ids = pq.read_table(sf_smoke + "/embeddings.parquet")["vec_id"].to_pylist()
    Xc = X - X.mean(0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc)
    ref = X @ evecs[:, -1]  # uncentered projection, like the operator's

    ours = np.array([scores[int(i)] for i in ids])
    cos = abs(ours @ ref) / (np.linalg.norm(ours) * np.linalg.norm(ref))
    assert cos > 0.98, cos


def test_png_codec_roundtrip_all_filters():
    """PNG encode→decode must be lossless under every scanline filter type
    (None/Sub/Up/Average/Paeth) — the decoder's unfilter paths are all
    load-bearing because synth_mixed_media_table cycles them by doc_id."""
    from bigdata_etl_elt_dashboard_spark.operators import multimodal as M

    for w, h in ((8, 4), (33, 7), (1, 1)):
        img = M.DecodedImage(w, h, bytes((i * 11 + 5) % 256 for i in range(w * h * 3)))
        for ft in range(5):
            dec = M.decode_png(M.encode_png(img, filter_type=ft))
            assert (dec.width, dec.height, dec.pixels) == (w, h, img.pixels), (w, h, ft)


def test_png_crc_and_magic_guards():
    import pytest

    from bigdata_etl_elt_dashboard_spark.operators import multimodal as M

    img = M.DecodedImage(4, 2, bytes(range(24)))
    enc = bytearray(M.encode_png(img))
    enc[30] ^= 0xFF  # corrupt a byte inside IHDR payload -> CRC fails
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png(bytes(enc))
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png(b"BM" + bytes(enc[2:]))
    # magic dispatch routes PNG payloads to the PNG decoder
    assert M.decode_auto(M.encode_png(img, filter_type=4)).pixels == img.pixels


def test_emb_exact_dup_sizes_positive(spark, sf_smoke, tmp_path):
    """The real corpus has no bit-identical quantized vectors (every
    group_size == 1) — plant duplicates and assert the histogram and the
    min-id keeper digest on the engineered frame."""
    from pyspark.sql import functions as F

    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    base = emb.orderBy("vec_id").limit(4)
    clones = base.filter(F.col("vec_id") < 2).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    triple = base.filter(F.col("vec_id") == 0).withColumn(
        "vec_id", F.col("vec_id") + 2000
    )
    base.unionByName(clones).unionByName(triple).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    rows = {
        r["group_size"]: (r["n_groups"], r["keeper_id_sum"])
        for r in REGISTRY["emb_exact_dup_sizes"].fn(spark, str(tmp_path)).collect()
    }
    # vec 0 appears 3x (keeper 0), vec 1 appears 2x (keeper 1), vecs 2/3 unique
    assert rows == {1: (2, 5), 2: (1, 1), 3: (1, 0)}


def test_emb_exact_dup_sizes_all_unique_on_corpus(spark, sf_smoke):
    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

    rows = REGISTRY["emb_exact_dup_sizes"].fn(spark, sf_smoke).collect()
    assert [r["group_size"] for r in rows] == [1]


def test_pandas_udf_cosine_equals_jvm_kernel(spark, sf_smoke):
    """API-surface proof for the vectorized-UDF path (SURVEY §2.11): an
    Arrow-batched @pandas_udf dot product must agree with the JVM-side
    zip_with/aggregate kernel bit-for-bit on the micro-quantized integer
    embeddings. The engine's parity surface deliberately uses ONLY the
    JVM kernel (UDFs are the slow path); this pins that the pandas_udf
    route — the sanctioned escape hatch when built-ins can't express an
    op — produces identical numbers, so swapping it in can never change
    results, only speed."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from bigdata_etl_elt_dashboard_spark.plans.iterative import _to_fixed

    emb = (
        spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
        .limit(64)
        .select("vec_id", _to_fixed(F.col("embedding")).alias("q"))
    )
    paired = emb.alias("a").join(
        emb.alias("b"), F.col("a.vec_id") < F.col("b.vec_id")
    ).select(
        F.col("a.vec_id").alias("u"),
        F.col("b.vec_id").alias("v"),
        F.col("a.q").alias("qa"),
        F.col("b.q").alias("qb"),
    )
    jvm = paired.select(
        "u",
        "v",
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot"),
    )

    # NOTE: `from __future__ import annotations` stringifies hints, which
    # pandas_udf's hint inference rejects — bind real types via a local
    # function whose annotations are evaluated eagerly
    def _dot(a, b):
        return pd.Series(
            [sum(int(x) * int(y) for x, y in zip(av, bv)) for av, bv in zip(a, b)]
        )

    _dot.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    pd_dot = pandas_udf(_dot, "long")

    py = paired.select("u", "v", pd_dot("qa", "qb").alias("dot"))
    jvm_rows = {(r["u"], r["v"]): r["dot"] for r in jvm.collect()}
    py_rows = {(r["u"], r["v"]): r["dot"] for r in py.collect()}
    assert jvm_rows == py_rows and len(jvm_rows) > 100
