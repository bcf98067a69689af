"""Multimodal columns: opaque binary payloads + typed metadata (E28).

Design for a real corpus: image/audio/video live as ``binary`` columns
(or object-store URIs) beside a metadata struct; decode / resize /
feature-extraction run as Arrow-batched ``mapInPandas`` stages so the
Python worker sees columnar batches, not rows.

This container has no image/audio codecs, so the DECODE KERNEL is a
deterministic fake (clearly marked); everything around it — schema,
batch iteration, partitioning, UDF signatures — is the real plumbing
and is tested. Swapping ``_fake_decode_kernel`` for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

#: Output schema of the decode stage: original id + typed media metadata.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the multimodal layout from the documents table: an
    opaque ``payload`` binary column plus a metadata struct — the shape
    a real ingest (image bytes + EXIF-ish struct) would produce."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.sha2(F.col(text_col), 256).alias("checksum"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def _fake_decode_kernel(buf: bytes) -> tuple[int, int, int, list[float]]:
    """STUB — deterministic stand-in for a real image decode.

    A real implementation would be ``PIL.Image.open(io.BytesIO(buf))``;
    unavailable in this environment. Derives (width, height, channels,
    features) purely from the bytes so tests are reproducible.
    """
    n = len(buf)
    width = (buf[0] if n else 0) + 1
    height = (buf[-1] if n else 0) + 1
    channels = 3
    # bucket byte-sums into FEATURE_DIM "histogram" features
    feats = [0.0] * FEATURE_DIM
    for i, b in enumerate(buf):
        feats[i % FEATURE_DIM] += float(b)
    scale = float(max(n, 1))
    return width, height, channels, [f / scale for f in feats]


def decode_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode stage: binary payloads → typed media rows.

    ``mapInPandas`` receives an iterator of pandas batches (zero-copy
    Arrow transfer) and yields decoded frames; on a cluster each
    partition decodes independently — the correct shape for a 100 TB
    media corpus (decode is CPU-bound; parallelism = partitions).
    """
    cols = [id_col, payload_col]

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "n_bytes": [],
                "width": [],
                "height": [],
                "channels": [],
                "features": [],
            }
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf) if buf is not None else b""
                w, h, c, feats = _fake_decode_kernel(buf)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(buf))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(decode_batches, DECODED_SCHEMA)


#: Output schema of the resize stage.
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_in", T.LongType()),
        T.StructField("stride", T.IntegerType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def _fake_resize_kernel(buf: bytes, target: int) -> tuple[int, bytes]:
    """STUB — deterministic stand-in for a real image resize.

    A real implementation would be ``PIL.Image.resize``; unavailable in
    this environment. Downsamples by strided byte sampling so the output
    is a pure function of the input (oracle-reproducible): stride =
    ceil(n/target), resized = buf[::stride].
    """
    import math

    n = len(buf)
    if n == 0:
        return 1, b""
    stride = max(1, math.ceil(n / target))
    return stride, buf[::stride]


def resize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target: int = 64,
) -> DataFrame:
    """Arrow-batched resize stage: payload → downsampled payload.

    Same plumbing contract as ``decode_media``: ``mapInPandas`` over
    columnar batches, partition-parallel, kernel swappable for a real
    codec. Returns (doc_id, n_in, stride, n_out, resized)."""
    cols = [id_col, payload_col]

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "n_in": [], "stride": [], "n_out": [], "resized": []}
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf) if buf is not None else b""
                stride, resized = _fake_resize_kernel(buf, target)
                out["doc_id"].append(doc_id)
                out["n_in"].append(len(buf))
                out["stride"].append(stride)
                out["n_out"].append(len(resized))
                out["resized"].append(resized)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(resize_batches, RESIZED_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    chunk_size: int = 64,
    every_k: int = 4,
) -> DataFrame:
    """'Video' frame sampling: split the payload into fixed-size chunks
    and keep every k-th — pure JVM expression (no Python), returning
    one row per sampled frame with its index."""
    n_chunks = F.ceil(F.length(payload_col) / F.lit(chunk_size)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    sampled = F.filter(idx, lambda i: i % every_k == 0)
    frames = F.transform(
        sampled,
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col(payload_col), i * chunk_size + 1, chunk_size).alias("frame"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.explode(frames).alias("f"),
    ).select(id_col, F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame").alias("frame"))
