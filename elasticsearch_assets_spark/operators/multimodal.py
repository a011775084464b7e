"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode/feature plumbing as Arrow-batched UDFs.

The container has no image/audio libraries, so the DECODE step is
stubbed two ways (per round brief):
- `decode_image` raises NotImplementedError (clearly-marked stub for a
  real decoder: PIL/libvips behind the same signature)
- `fake_decode_features` is a deterministic stand-in (hash-derived
  pseudo-features) so the Spark-side plumbing — schema, batch shape,
  partitioning — is real and tested end to end.

Schema convention:
    media: binary                (opaque payload)
    media_meta: struct<mime string, width int, height int, duration_ms int>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)


def decode_image(payload: bytes, mime: str) -> np.ndarray:
    """STUB: real implementation decodes to HxWxC uint8 via PIL/libvips.
    Deliberately unimplemented in this container (no imaging libs)."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; swap in PIL.Image.open(BytesIO(payload)) here"
    )


def fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode→embed: FEATURE_DIM floats
    derived from sha256(payload). Pure function — safe for oracle tests."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / 65535.0


def extract_features(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """mapInPandas feature extraction over binary payloads: the real
    shape of a multimodal pipeline stage (Arrow batches of bytes in,
    fixed-dim float arrays out). Swap fake_decode_features for a real
    decode+model without touching the Spark plumbing."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_decode_features(b) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "features": [f.tolist() for f in feats],
                    "n_bytes": pdf[media_col].map(len).astype("int32"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(gen, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, meta_col: str = "media_meta", every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: computes per-row frame timestamps from
    metadata (JVM-side sequence); the actual frame decode would consume
    this plan inside the same mapInPandas pattern as extract_features."""
    dur = F.col(f"{meta_col}.duration_ms")
    return df.withColumn(
        "frame_ts_ms",
        F.when(
            dur.isNotNull() & (dur > 0),
            F.sequence(F.lit(0), dur - F.lit(1), F.lit(every_ms)),
        ).otherwise(F.array().cast("array<int>")),
    )


def synth_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media payloads for tests: bytes derived from a
    text column; metadata derived from the id."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.col(id_col) % 640 + 1).cast("int").alias("width"),
            (F.col(id_col) % 480 + 1).cast("int").alias("height"),
            (F.col(id_col) % 5000 + 100).cast("int").alias("duration_ms"),
        ).alias("media_meta"),
    )
