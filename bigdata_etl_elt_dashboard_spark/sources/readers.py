"""Readers (SURVEY §2.1 S1–S3).

The reference reads CSVs with inferred dtypes (etl_pipeline/extract.py:44),
fetches a Kaggle dataset over HTTPS (etl_pipeline/extract_api.py:51-79), and
round-trips through MySQL with ``pd.read_sql`` (etl_pipeline/load.py:178-199).
Spark-first equivalents:

- S1 CSV scan: ``spark.read.csv`` with an explicit StructType (deterministic,
  single pass; inference would cost an extra full scan at 100 TB).
- S2 HTTP/API landing: a driver-side fetch into a landing directory is NOT a
  distributed operation — we keep it a tiny helper and hand the landed files
  to S1. Credentials come from the environment (the reference hardcodes
  Kaggle keys at extract_api.py:12-13; we deliberately do not port that).
- S3 JDBC scan: ``spark.read.jdbc`` with partitioned reads — the reference's
  whole-table ``read_sql`` becomes numPartitions parallel range scans.
"""

from __future__ import annotations

import os
import shutil
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan (S1). Prefer an explicit ``schema``; inference is opt-in."""
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", True).csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet scan across schema versions (schema evolution / drift).

    A long-lived lake accumulates files written under different schema
    versions — columns added, never silently dropped. ``mergeSchema``
    makes Spark reconcile all footers into the union schema; files
    missing a column yield NULLs for it, so old and new data read as one
    relation. Footer merging is a one-time planning cost proportional to
    the file count (not data size); per-file column pruning and pushdown
    still apply, so at 100 TB the scan itself is unchanged — keep it off
    (the default) for single-version lakes to skip the extra footer pass.
    """
    return spark.read.option("mergeSchema", True).parquet(*paths)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the columnar interchange format of Hive-era warehouses.
    Spark's native ORC reader supports the same predicate pushdown, column
    pruning, and vectorized decode as parquet, so migrating a legacy ORC
    lake needs no query changes."""
    return spark.read.orc(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan with an explicit schema — the standard wire format
    for document corpora (one JSON doc per line, splittable, append-only).

    PERMISSIVE mode: malformed lines land in ``corrupt_col`` instead of
    failing the 100 TB job; callers split the frame on
    ``col(corrupt_col).isNull()`` to route rejects to a quarantine sink.
    Spark refuses queries that reference ONLY the corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — ``cache()`` the parsed frame (or
    write it) before counting/inspecting rejects in isolation.
    The explicit schema matters doubly here: inference would full-scan the
    corpus AND silently widen types on dirty data."""
    full = T.StructType(schema.fields + [T.StructField(corrupt_col, T.StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-media ingestion via Spark's ``binaryFile`` source: one row per
    file with ``(path, modificationTime, length, content binary)`` — the
    landing step that turns an object-store prefix of images/audio into
    the opaque-binary media table consumed by ``operators.multimodal``.

    Scale notes: the source lists files on the driver but reads contents
    in executors, splitting the file LIST (not file bodies) across tasks,
    so millions of small media files parallelize; ``glob`` pushes the
    pattern into the listing (``pathGlobFilter``), and ``max_bytes`` sets
    ``spark.sql.sources.binaryFile.maxLength`` semantics via a pushed
    length filter — both prune BEFORE content bytes are read. Keep
    per-file size under ~2 GB (single-row limit); shard bigger media at
    produce time."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC scan (S3). With a numeric ``partition_column`` + bounds the scan
    fans out over ``num_partitions`` executors instead of one connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def land_archive(archive_path: str, landing_dir: str) -> list[str]:
    """Unpack a downloaded archive into a landing dir and return member paths
    (S2's unzip step, reference extract_api.py:62-70). Driver-side by design:
    an HTTP fetch has no distributed representation — the *scan* of the
    landed files is the distributed part."""
    os.makedirs(landing_dir, exist_ok=True)
    out: list[str] = []
    if archive_path.endswith(".zip"):
        with zipfile.ZipFile(archive_path) as zf:
            zf.extractall(landing_dir)
            out = [os.path.join(landing_dir, n) for n in zf.namelist()]
    else:
        dest = os.path.join(landing_dir, os.path.basename(archive_path))
        shutil.copy(archive_path, dest)
        out = [dest]
    return out
