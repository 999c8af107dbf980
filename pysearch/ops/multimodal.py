"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched UDFs.

The decode step (actual image/audio codecs) is STUBBED — the libraries are
not in this container — behind `decode_media(..., strict=True)` which raises
NotImplementedError, with a deterministic byte-level fake
(`_fake_decode_features`) standing in so the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def attach_media(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Manufacture a binary media column deterministically (utf-8 bytes of
    the text stand in for a real blob) + typed metadata. At 100 TB the blob
    column lives in its own parquet files; the metadata columns are what
    scans/prunes touch."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text), "utf-8").alias("media"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col(text)).cast("long").alias("n_bytes"),
    )


def decode_media(blob: bytes, mime: str, strict: bool = True) -> np.ndarray:
    """REAL decoder stub: would dispatch to PIL/libav by mime. The container
    has no media codecs, so strict mode raises — callers use the
    deterministic fake for plumbing tests."""
    if strict:
        raise NotImplementedError(
            "media codecs (PIL/libav) are not available in this environment; "
            "use extract_features(fake=True) for the deterministic stand-in"
        )
    return _fake_decode_features(blob)


def _fake_decode_features(blob: bytes) -> np.ndarray:
    """Deterministic byte-level 'features' (decode stand-in)."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    return arr


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction over binary media columns.

    Everything a built-in expression can compute stays JVM-side (codegen'd,
    zero Python): byte length, crc32, head hex. Only the decode-derived
    feature (byte_mean, standing in for real image/audio statistics) runs in
    the Arrow kernel — and that kernel is loop-free: all blobs of a batch are
    concatenated into ONE buffer, per-blob sums come from a prefix-sum
    difference over offsets (the round-1 per-row Python loop violated the
    input_hint and is gone).
    """
    if not fake:
        # strict mode dispatches the real decoder, which raises in this
        # container (no media codecs) — keep the contract observable
        decode_media(b"", "application/octet-stream", strict=True)

    base = media.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "media",
        F.octet_length("media").cast("long").alias("n_bytes"),
        F.crc32("media").cast("long").alias("crc32"),
        F.lower(F.hex(F.substring(F.col("media"), 1, 8))).alias("head_hex"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            blobs = pdf["media"]
            lens = pdf["n_bytes"].to_numpy(dtype=np.int64)
            buf = _fake_decode_features(b"".join(blobs.tolist()))
            cum = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
            offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
            sums = cum[offsets + lens] - cum[offsets]
            mean = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
            out = pdf.drop(columns=["media"]).copy()
            out["byte_mean"] = mean
            yield out[["doc_id", "n_bytes", "crc32", "byte_mean", "head_hex"]]

    return base.mapInPandas(run, schema=FEATURE_SCHEMA)
