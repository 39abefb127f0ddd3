"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as `binary` columns with typed
metadata and run decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas functions over `mapInPandas`.  The decode libs
(PIL/ffmpeg/...) are NOT in this container, so the decode kernel is a
clearly-marked deterministic STUB — but the Spark-side plumbing
(binary encoding, schema contract, mapInPandas batch iteration,
partition-preserving projection) is real and oracle-checked: the stub
derives width/height from the byte payload with arithmetic DuckDB can
replicate.

Scale shape: mapInPandas is a narrow transformation — no shuffle; Arrow
batches stream through Python at columnar speed, and binary payloads
never pass through a Python row loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, channels int, "
    "content_hash string"
)


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded to a binary payload column — the stand-in
    for an image/audio blob column at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.col("source"),
    )


def _decode_stub_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """STUB image decode.

    A real implementation would do `PIL.Image.open(io.BytesIO(b))` per
    payload; that library is unavailable here, so dimensions are derived
    deterministically from the payload bytes.  The batch shape, Arrow
    transfer, and output schema contract are exactly what a real decoder
    would use.
    """
    import hashlib

    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "width": (32 + (n_bytes % 608)).astype("int32"),
                "height": (32 + ((n_bytes * 7) % 608)).astype("int32"),
                "channels": 3,
                "content_hash": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
            }
        )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-metadata extraction over binary payloads via mapInPandas
    (stubbed kernel, real plumbing)."""
    return binary_documents(spark, sf_dir).mapInPandas(
        _decode_stub_batches, schema=DECODE_SCHEMA
    )


MULTIMODAL_DECODE_SQL = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  CAST(32 + (octet_length(encode(text)) % 608) AS INTEGER) AS width,
  CAST(32 + ((octet_length(encode(text)) * 7) % 608) AS INTEGER) AS height,
  3 AS channels,
  md5(text) AS content_hash
FROM documents
"""


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM metadata over the binary column (no Python at all):
    the cheap pre-filter stage that runs before any decode at scale."""
    b = binary_documents(spark, sf_dir)
    return b.select(
        "doc_id",
        "source",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
        (F.length("payload") >= 256).alias("decode_worthy"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id, source,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS content_hash,
  octet_length(encode(text)) >= 256 AS decode_worthy
FROM documents
"""
