"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched UDFs.

The decode step (actual image/audio codecs) is STUBBED — the libraries are
not in this container — behind `decode_media(..., strict=True)` which raises
NotImplementedError, with a deterministic byte-level fake
(`_fake_decode_features`) standing in so the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

import zlib
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
    """mapInPandas feature extraction over binary batches. Real plumbing
    (Arrow binary transfer, per-batch numpy), stubbed decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = {"doc_id": [], "n_bytes": [], "crc32": [], "byte_mean": [], "head_hex": []}
            for did, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                arr = (
                    _fake_decode_features(b)
                    if fake
                    else decode_media(b, "application/octet-stream")
                )
                feats["doc_id"].append(int(did))
                feats["n_bytes"].append(len(b))
                feats["crc32"].append(zlib.crc32(b))
                feats["byte_mean"].append(float(arr.mean()) if arr.size else 0.0)
                feats["head_hex"].append(b[:8].hex())
            yield pd.DataFrame(feats)

    return media.select("doc_id", "media").mapInPandas(run, schema=FEATURE_SCHEMA)
