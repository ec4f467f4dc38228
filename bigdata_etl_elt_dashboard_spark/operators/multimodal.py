"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata.

Pattern: a media table is (media_id long, content binary, media_type string,
meta map/string). Feature extraction is ``mapInPandas`` — Arrow-batched,
one Python worker per partition, constant memory per batch — NOT a per-row
UDF. At 100 TB the binary payloads dominate I/O, so extraction projects
only (media_id, features) forward and the binary column is dropped
immediately after the map (column pruning keeps it out of later shuffles).

Decoding is PLUGGABLE: ``set_decoder`` swaps in PIL/opencv on a cluster
image that ships one. The default decoder is a real, dependency-free codec
for binary PPM (P6) — decode, nearest-neighbor resize, re-encode all run
and are tested in-container; compressed formats (JPEG/PNG/video) raise a
clear error until a library decoder is registered.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# Image codec: pluggable decoder with a pure-Python PPM (P6) default
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DecodedImage:
    """Minimal decoded-image interchange: RGB, 8 bits/channel, row-major
    interleaved bytes (len == width * height * 3)."""

    width: int
    height: int
    pixels: bytes

    def pixel(self, x: int, y: int) -> tuple[int, int, int]:
        off = (y * self.width + x) * 3
        return tuple(self.pixels[off : off + 3])


def _ppm_header_tokens(content: bytes, n: int) -> tuple[list[int], int]:
    """Parse ``n`` whitespace/comment-separated integer tokens after the P6
    magic; return (values, offset-just-past-the-single-whitespace-after-them)."""
    vals: list[int] = []
    i = 2  # past b"P6"
    while len(vals) < n:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(content) and content[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        vals.append(int(content[i:j]))
        i = j
    return vals, i + 1  # exactly ONE whitespace byte separates header from raster


def decode_ppm(content: bytes) -> DecodedImage:
    """Decode a binary PPM (P6, maxval <= 255) — pure Python, no deps."""
    if content[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    (width, height, maxval), off = _ppm_header_tokens(content, 3)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported by the built-in decoder")
    need = width * height * 3
    pixels = content[off : off + need]
    if len(pixels) != need:
        raise ValueError(f"truncated PPM raster: want {need} bytes, have {len(pixels)}")
    return DecodedImage(width, height, bytes(pixels))


def encode_ppm(img: DecodedImage) -> bytes:
    """Encode RGB bytes as binary PPM (P6)."""
    return b"P6\n%d %d\n255\n" % (img.width, img.height) + img.pixels


#: active decoder — swap via set_decoder() for PIL/opencv runtimes.
_DECODER: Callable[[bytes], DecodedImage] = decode_ppm


def set_decoder(fn: Callable[[bytes], DecodedImage]) -> None:
    """Install a library-backed decoder (e.g. wrap PIL: open → convert('RGB')
    → tobytes). All decode paths (decode_image / resize_image /
    decode_image_stats) route through it."""
    global _DECODER
    _DECODER = fn

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(content: bytes) -> DecodedImage:
    """Decode an image payload via the active decoder (default: built-in
    PPM codec; ``set_decoder`` installs PIL/opencv where available)."""
    return _DECODER(bytes(content))


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    sha256 scaled to [0,1). Keeps tests reproducible for non-image media."""
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:dim]]


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode (PPM out).

    Nearest-neighbor keeps the path dependency-free and deterministic; a
    library decoder installed via ``set_decoder`` still flows through the
    same resample (it only needs to yield ``DecodedImage``)."""
    img = decode_image(content)
    out = bytearray(width * height * 3)
    for y in range(height):
        sy = y * img.height // height
        row = sy * img.width
        for x in range(width):
            sx = x * img.width // width
            src = (row + sx) * 3
            dst = (y * width + x) * 3
            out[dst : dst + 3] = img.pixels[src : src + 3]
    return encode_ppm(DecodedImage(width, height, bytes(out)))


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def synth_ppm_table(docs: DataFrame, width: int = 8, height: int = 4) -> DataFrame:
    """Deterministic synthetic RGB images, one per document row: raster byte
    ``i`` is ``((doc_id % 256) * 7 + i) % 256``, encoded as binary PPM (P6).

    Closed-form pixels make decode verifiable by an independent oracle that
    never touches the codec (the DuckDB twin recomputes the same modular
    arithmetic in SQL)."""
    n = width * height * 3

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = []
            for did in pdf["doc_id"]:
                base = int(did) % 256
                raster = bytes((base * 7 + i) % 256 for i in range(n))
                contents.append(encode_ppm(DecodedImage(width, height, raster)))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "content": contents}
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def decode_image_stats(media: DataFrame, resize_to: tuple[int, int] | None = None) -> DataFrame:
    """Decode (optionally resize) every image and emit per-channel integer
    pixel sums — mapInPandas, binary dropped after the map. Integer sums
    keep the result exactly reproducible on any engine (the consumer
    divides once for means)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, rs, gs, bs = [], [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                c = bytes(content)
                if resize_to is not None:
                    c = resize_image(c, *resize_to)
                img = decode_image(c)
                px = img.pixels
                ids.append(mid)
                ws.append(img.width)
                hs.append(img.height)
                rs.append(sum(px[0::3]))
                gs.append(sum(px[1::3]))
                bs.append(sum(px[2::3]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "sum_r": pd.Series(rs, dtype="int64"),
                    "sum_g": pd.Series(gs, dtype="int64"),
                    "sum_b": pd.Series(bs, dtype="int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(stats, STATS_SCHEMA)


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

    VIDEO DECODE IS A FAKE (no av/ffmpeg in this container — images have a
    real built-in codec, video does not): the byte stream is treated as
    fixed-``frame_size`` frames and every ``stride``-th frame is kept —
    deterministic, so the Spark plumbing (mapInPandas fan-out of one input
    row to many output rows, Arrow batch shape, binary column dropped
    after the map) is real and testable. A real container decoder replaces
    only the inner slicing loop."""

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
