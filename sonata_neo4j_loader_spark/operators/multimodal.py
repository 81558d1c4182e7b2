"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (no image/audio libraries in this container): ``deterministic=True``
substitutes a seeded fake decoder so the Spark-side plumbing — schema,
batch shape, partitioning — is real and testable; ``deterministic=False``
raises ``NotImplementedError`` where a real codec (Pillow/ffmpeg) would be
called.

Batch-shape contract: ``mapInPandas`` receives an iterator of
pandas.DataFrame batches (one per Arrow record batch, bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``); each kernel is pure and
per-batch, so partitioning is free to change without affecting results.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("n_frames_sampled", IntegerType(), True),
    ]
)


def synthesize_media(
    spark, refs: DataFrame, ref_col: str = "media_ref", hash_impl: str = "xxhash64"
) -> DataFrame:
    """Deterministic fake media table for the given refs (payload = seeded
    bytes, metadata derived from the ref hash). Real pipelines read these
    from object storage; shape is identical.

    ``hash_impl='md5'`` derives the metadata from a 60-bit md5 prefix that
    DuckDB reproduces exactly (``('0x'||substr(md5(ref),1,15))::BIGINT``),
    so the whole media table is cross-engine-verifiable; the default
    xxhash64 stays the fast JVM path."""
    if hash_impl == "md5":
        h = F.conv(F.substring(F.md5(F.col(ref_col)), 1, 15), 16, 10).cast("bigint")
    else:
        h = F.xxhash64(F.col(ref_col))
    return refs.select(
        F.col(ref_col).alias("media_ref"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(h, F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.format_string("payload:%d", h), "utf-8").cast("binary").alias("payload"),
        (F.pmod(h, F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(h, F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(h, F.lit(60000)) + 100).cast("int").alias("duration_ms"),
    )


def _fake_feature(ref: str, media_type: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.blake2b(f"{media_type}:{ref}".encode(), digest_size=4).digest(), "big"
    )
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def resize_media(
    media: DataFrame,
    max_width: int = 224,
    max_height: int = 224,
    deterministic: bool = True,
) -> DataFrame:
    """Aspect-preserving downscale for image/video rows (audio passes
    through). The geometry — scale factor, rounded target dimensions — is
    real and vectorized (numpy over the Arrow batch); the pixel resample
    itself is where Pillow/ffmpeg would run and is stubbed like the other
    decode kernels. Output schema = input schema, so resize composes
    anywhere in the media pipeline."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real pixel resampling requires Pillow/ffmpeg; "
                    "not available in this environment"
                )
            visual = pdf["media_type"].isin(["image", "video"]).to_numpy()
            # MEDIA_SCHEMA permits null dims (natural for audio rows):
            # resize only rows that are visual AND fully dimensioned,
            # pass everything else through unchanged — nulls included.
            w_ser = pdf["width"].astype("Int32")
            h_ser = pdf["height"].astype("Int32")
            w = w_ser.to_numpy(dtype="float64", na_value=np.nan)
            h = h_ser.to_numpy(dtype="float64", na_value=np.nan)
            valid = visual & np.isfinite(w) & np.isfinite(h)
            with np.errstate(invalid="ignore", divide="ignore"):
                scale = np.minimum(1.0, np.minimum(max_width / w, max_height / h))
                new_w = np.maximum(1.0, np.floor(w * scale))
                new_h = np.maximum(1.0, np.floor(h * scale))
            w_out, h_out = w_ser.copy(), h_ser.copy()
            w_out[valid] = new_w[valid].astype("int64")
            h_out[valid] = new_h[valid].astype("int64")
            out = pdf.copy()
            out["width"] = w_out
            out["height"] = h_out
            yield out

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    frame_stride_ms: int = 1000,
    deterministic: bool = True,
) -> DataFrame:
    """Decode + feature-extract (+ frame-sample for video) via mapInPandas.

    With ``deterministic=False`` this is where Pillow/librosa/ffmpeg would
    decode ``payload``; the container has none, so only the seeded fake
    path is executable (clearly marked).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real media decoding requires Pillow/librosa/ffmpeg; "
                    "not available in this environment"
                )
            feats = [
                _fake_feature(r, t, dim).tolist()
                for r, t in zip(pdf["media_ref"], pdf["media_type"], strict=True)
            ]
            n_frames = [
                int(max(1, d // frame_stride_ms)) if t == "video" else None
                for t, d in zip(pdf["media_type"], pdf["duration_ms"], strict=True)
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "n_frames_sampled": pd.array(n_frames, dtype="Int32"),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)
