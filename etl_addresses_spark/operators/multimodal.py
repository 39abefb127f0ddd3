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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_payload(doc_id: int) -> bytes:
    """A fully valid RGB8 PNG (signature, IHDR+CRC32, zlib IDAT, IEND)
    built from the stdlib only (struct + zlib — no PIL).  Dimensions and
    pixel fill derive deterministically from doc_id so the decode stage
    has an arithmetic oracle."""
    import struct
    import zlib

    width = 8 + doc_id % 56
    height = 8 + (doc_id * 3) % 56
    row = b"\x00" + bytes([doc_id % 256]) * (3 * width)  # filter 0 + RGB
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(row * height, 6))
        + chunk(b"IEND", b"")
    )


def _encode_png_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": pdf["doc_id"].map(lambda i: _png_payload(int(i))),
            }
        )


def binary_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synthetic PNG blob per document row — the image-column
    stand-in, with REAL image bytes (parseable by any PNG reader)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _encode_png_batches, schema="doc_id bigint, payload binary"
    )


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png_meta(p: bytes) -> tuple[int, int, int, int, bool]:
    """Parse the IHDR chunk of a PNG byte payload: width/height are the
    big-endian u32 pair at bytes 16-24, bit depth and color type follow,
    and the chunk CRC32 (bytes 29-33) covers tag+data (bytes 12-29)."""
    import zlib

    if p[:8] != PNG_SIG or p[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    width = int.from_bytes(p[16:20], "big")
    height = int.from_bytes(p[20:24], "big")
    bit_depth = p[24]
    channels = _PNG_CHANNELS[p[25]]
    crc_ok = zlib.crc32(p[12:29]) == int.from_bytes(p[29:33], "big")
    return width, height, channels, bit_depth, crc_ok


def _decode_png_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Real image decode kernel: header parse + CRC verification per
    payload, Arrow-batched.  (A full pixel decode would additionally
    zlib-decompress the IDAT stream — same batch shape.)"""
    for pdf in batches:
        meta = pdf["payload"].map(_decode_png_meta)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": meta.map(lambda m: m[0]).astype("int32"),
                "height": meta.map(lambda m: m[1]).astype("int32"),
                "channels": meta.map(lambda m: m[2]).astype("int32"),
                "bit_depth": meta.map(lambda m: m[3]).astype("int32"),
                "crc_ok": meta.map(lambda m: m[4]),
            }
        )


DECODE_PNG_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, bit_depth int, "
    "crc_ok boolean"
)


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG metadata decode over binary payloads via mapInPandas — a real
    byte-level parser (signature, IHDR fields, CRC32 check), no image
    libraries.  Oracle: the generator derives dimensions from doc_id, so
    DuckDB replays the arithmetic; a parser that mis-read any header
    byte would hash-mismatch."""
    return binary_images(spark, sf_dir).mapInPandas(
        _decode_png_batches, schema=DECODE_PNG_SCHEMA
    )


MULTIMODAL_DECODE_SQL = """
SELECT doc_id,
  CAST(8 + doc_id % 56 AS INTEGER) AS width,
  CAST(8 + (doc_id * 3) % 56 AS INTEGER) AS height,
  3 AS channels,
  8 AS bit_depth,
  TRUE AS crc_ok
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
