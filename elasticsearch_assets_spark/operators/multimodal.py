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
    Deliberately unimplemented in this container (no imaging libs).
    Header METADATA (mime/width/height) needs no imaging library — see
    parse_media_header / media_meta_from_payload below."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; swap in PIL.Image.open(BytesIO(payload)) here"
    )


# ---- header-parse media metadata (r6, VERDICT r5 #6) -----------------
#
# PNG / JPEG / GIF dimensions are plain header fields — a pure-Python
# byte parse, no imaging library. This turns media_meta from synthetic
# into DERIVED-FROM-PAYLOAD; only pixel decode stays stubbed.


def parse_media_header(payload: bytes) -> tuple[str, int, int] | None:
    """(mime, width, height) from the container header, or None when the
    payload is not a recognized image format.

    - PNG: 8-byte signature, then the IHDR chunk (always first, spec
      §5.6): width/height big-endian uint32 at offsets 16/20.
    - JPEG: SOI then a marker walk to the first SOFn segment (C0-CF
      except DHT C4 / JPG C8 / DAC CC): height/width big-endian uint16
      at segment offsets +5/+7.
    - GIF: GIF87a/GIF89a signature, width/height little-endian uint16
      at offsets 6/8.
    """
    if (
        len(payload) >= 24
        and payload[:8] == b"\x89PNG\r\n\x1a\n"
        and payload[12:16] == b"IHDR"
    ):
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("image/png", w, h)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return ("image/gif", w, h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:  # standalone
                i += 2
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seglen < 2:
                return None
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(payload):
                    return None
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("image/jpeg", w, h)
            i += 2 + seglen
    return None


HEADER_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def media_meta_from_payload(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Header-derived media metadata over Arrow batches of binary
    payloads (same mapInPandas shape as extract_features). Unrecognized
    payloads yield NULL mime/width/height rather than dropping the row
    — a pipeline wants to see its undecodable inputs."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_media_header(b) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "mime": [p[0] if p else None for p in parsed],
                    "width": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, media_col).mapInPandas(gen, schema=HEADER_META_SCHEMA)


def synth_png_bytes(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG (signature + IHDR + IEND, correct
    CRCs, no pixel data) — deterministic test/benchmark payloads."""
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    out = sig + struct.pack(">I", 13) + b"IHDR" + ihdr
    out += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    out += struct.pack(">I", 0) + b"IEND"
    out += struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    return out


def synth_jpeg_bytes(width: int, height: int) -> bytes:
    """Minimal JPEG header stream (SOI + JFIF APP0 + SOF0 + EOI) with
    real dimensions in the SOF0 frame header."""
    soi = b"\xff\xd8"
    app0 = (
        b"\xff\xe0"
        + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    sof0 = (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x01\x11\x00"
    )
    return soi + app0 + sof0 + b"\xff\xd9"


def synth_real_media(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-format payloads (PNG for even ids, JPEG for
    odd) with dimensions derived from the id — so an arithmetic oracle
    can value-check the header parser end to end: any parse bug breaks
    equality with `id % 640 + 1` / `id % 480 + 1`."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), False),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                w, h = int(i % 640 + 1), int(i % 480 + 1)
                payloads.append(
                    synth_png_bytes(w, h) if i % 2 == 0 else synth_jpeg_bytes(w, h)
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "media": payloads}
            )

    return df.select(id_col).mapInPandas(gen, schema=schema)


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
