"""Multimodal binary-column queries (E28).

Drives the real plumbing — binary payload synthesis, Arrow-batched
``mapInPandas`` decode, JVM-side frame sampling — with oracle twins for
everything expressible in SQL. (The decode kernel itself is the
documented deterministic stub; see ``python_cdc_spark.multimodal``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.io import table
from python_cdc_spark.multimodal import (
    attach_binary_payload,
    decode_media,
    frame_sample,
    resize_media,
)
from python_cdc_spark.queries.registry import register


@register(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS checksum,
           substr(hex(encode(text)), 1, 16) AS header_hex,
           lang
    FROM documents
    """,
    doc="E28: binary payload synthesis + metadata struct (JVM-side)",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_binary_payload(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("media_meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("media_meta.checksum").alias("checksum"),
        F.hex(F.substring("payload", 1, 8)).alias("header_hex"),
        "lang",
    )


@register(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           ascii(substring(text, 1, 1)) + 1 AS width,
           ascii(substring(text, length(text), 1)) + 1 AS height,
           3 AS channels
    FROM documents
    """,
    doc="E28: Arrow-batched mapInPandas media decode (stub kernel)",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the full Python-worker path: binary → Arrow batch →
    pandas decode → typed rows. The oracle reproduces the stub kernel's
    byte math in SQL (texts are ASCII, so first byte == first char)."""
    d = attach_binary_payload(table(spark, sf_dir, "documents"))
    decoded = decode_media(d, "doc_id", "payload")
    return decoded.select(
        "doc_id",
        "n_bytes",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (SELECT doc_id, hex(encode(text)) AS payload_hex,
                      octet_length(encode(text)) AS n_bytes FROM documents),
    idx AS (
      SELECT doc_id, payload_hex, UNNEST(generate_series(0,
               GREATEST(CAST(CEIL(n_bytes / 64.0) AS INTEGER) - 1, 0)))
             AS frame_idx
      FROM b
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(length(substr(payload_hex, frame_idx * 128 + 1, 128)) // 2 AS BIGINT)
             AS frame_bytes
    FROM idx WHERE frame_idx % 4 = 0
    """,
    doc="E28: video-style frame sampling (every 4th 64-byte chunk, JVM-side)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_binary_payload(table(spark, sf_dir, "documents"))
    frames = frame_sample(d, "doc_id", "payload", chunk_size=64, every_k=4)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.octet_length("frame").cast("long").alias("frame_bytes"),
    )


@register(
    "multimodal_resize",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    s AS (
      SELECT doc_id, n,
             CASE WHEN n = 0 THEN 1
                  ELSE GREATEST(1, CAST(CEIL(n / 64.0) AS INTEGER)) END AS stride,
             h
      FROM b
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_in,
           stride,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE CAST(CEIL(CAST(n AS DOUBLE) / stride) AS BIGINT) END
             AS BIGINT) AS n_out,
           CONCAT(
             CASE WHEN n > 0          THEN substr(h, 1, 2) ELSE '' END,
             CASE WHEN stride * 1 < n THEN substr(h, stride * 2 + 1, 2) ELSE '' END,
             CASE WHEN stride * 2 < n THEN substr(h, stride * 4 + 1, 2) ELSE '' END,
             CASE WHEN stride * 3 < n THEN substr(h, stride * 6 + 1, 2) ELSE '' END
           ) AS head_hex
    FROM s
    """,
    doc="E28: Arrow-batched media resize (stub strided-resample kernel); "
    "the oracle replays the kernel via hex-string slicing",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the resize plumbing end-to-end: payload → mapInPandas
    strided downsample → size stats + head bytes. The oracle reproduces
    stride/sampling arithmetic on the hex string (2 chars/byte — DuckDB
    cannot slice BLOBs directly)."""
    d = attach_binary_payload(table(spark, sf_dir, "documents"))
    resized = resize_media(d, "doc_id", "payload", target=64)
    return resized.select(
        "doc_id",
        "n_in",
        "stride",
        "n_out",
        F.hex(F.substring("resized", 1, 4)).alias("head_hex"),
    )
