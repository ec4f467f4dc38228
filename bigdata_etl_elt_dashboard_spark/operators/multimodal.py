"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
container has no decode libraries, so the DECODE step is stubbed (clearly
marked), but everything Spark-side is real and tested: schema, partitioning,
Arrow batch shape, and the ``mapInPandas`` pipeline that a real decoder
would drop into.

Pattern: a media table is (media_id long, content binary, media_type string,
meta map/string). Feature extraction is ``mapInPandas`` — Arrow-batched,
one Python worker per partition, constant memory per batch — NOT a per-row
UDF. At 100 TB the binary payloads dominate I/O, so extraction projects
only (media_id, features) forward and the binary column is dropped
immediately after the map (column pruning keeps it out of later shuffles).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(content: bytes) -> object:
    """STUB: real image decode (PIL/opencv are not in this container).

    The Spark plumbing around this stub is real; swap in a real decoder on
    a cluster image that ships one."""
    raise NotImplementedError("image decode requires PIL/opencv in the runtime image")


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    sha256 scaled to [0,1). Keeps tests reproducible without codecs."""
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:dim]]


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """STUB: real image resize (PIL/opencv are not in this container).

    A real implementation decodes, resamples, and re-encodes inside the
    same mapInPandas batch loop as ``extract_features``."""
    raise NotImplementedError("image resize requires PIL/opencv in the runtime image")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
        T.StructField("frame_len", T.IntegerType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 64, stride: int = 4) -> DataFrame:
    """Video-style frame sampling over an opaque binary column.

    DECODE IS STUBBED (no av/ffmpeg in this container): the byte stream is
    treated as fixed-``frame_size`` frames and every ``stride``-th frame is
    kept — deterministic, so the Spark plumbing (mapInPandas fan-out of one
    input row to many output rows, Arrow batch shape, binary column dropped
    after the map) is real and testable. A real decoder replaces only the
    inner slicing loop."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas, lens = [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                n_frames = max((len(content) + frame_size - 1) // frame_size, 1)
                for i in range(0, n_frames, stride):
                    frame = content[i * frame_size : (i + 1) * frame_size]
                    ids.append(media_id)
                    idxs.append(i)
                    shas.append(hashlib.sha256(frame).hexdigest())
                    lens.append(len(frame))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                }
            )

    return media.select("media_id", "content").mapInPandas(sample, FRAME_SCHEMA)


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media-shaped table from `documents` (content = utf-8 bytes).

    Stands in for an image/audio table: opaque binary + typed metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.col("n_chars").alias("meta_n_chars"),
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Arrow ships (media_id, content) batches to Python; each batch returns a
    small feature frame. The binary column does not survive the operator."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": content.map(len).astype("int64"),
                    "content_sha": content.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": content.map(lambda b: _fake_feature(b, dim)),
                }
            )

    return media.select("media_id", "content").mapInPandas(extract, FEATURE_SCHEMA)
