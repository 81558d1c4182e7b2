"""Multimodal plumbing: schema, batch shape, determinism, stub gating.

The decode kernels are stubbed (no Pillow/ffmpeg here) — what MUST be
real and tested is the Spark side: mapInPandas schemas, partitioning
independence, the resize geometry, and the explicit NotImplementedError
on the real-codec path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    refs = spark.range(60).select(
        F.format_string("img://doc/%d.png", F.col("id")).alias("media_ref")
    )
    return multimodal.synthesize_media(spark, refs)


def test_features_partition_invariant(spark, media):
    a = multimodal.extract_features(media.repartition(1), dim=8).collect()
    b = multimodal.extract_features(media.repartition(7), dim=8).collect()
    key = lambda r: r.media_ref
    assert sorted((r.media_ref, r.feature) for r in a) == sorted(
        (r.media_ref, r.feature) for r in b
    )
    assert all(len(r.feature) == 8 for r in a)


def test_frame_sampling_only_for_video(media):
    rows = multimodal.extract_features(media, dim=4, frame_stride_ms=1000).collect()
    meta = {r.media_ref: r for r in media.collect()}
    for r in rows:
        if r.media_type == "video":
            assert r.n_frames_sampled == max(1, meta[r.media_ref].duration_ms // 1000)
        else:
            assert r.n_frames_sampled is None


def test_resize_geometry(media):
    out = {r.media_ref: r for r in multimodal.resize_media(media, 224, 224).collect()}
    for r in media.collect():
        o = out[r.media_ref]
        if r.media_type == "audio":
            assert (o.width, o.height) == (r.width, r.height)
            continue
        assert o.width <= 224 and o.height <= 224
        if r.width > 224 or r.height > 224:
            # aspect preserved within floor-rounding
            scale = min(224 / r.width, 224 / r.height)
            assert o.width == max(1, int(r.width * scale))
            assert o.height == max(1, int(r.height * scale))
        else:
            assert (o.width, o.height) == (r.width, r.height)
        assert o.payload == r.payload  # stub never touches pixels


def test_resize_preserves_null_dims(spark):
    # MEDIA_SCHEMA permits null width/height (natural for audio, possible
    # for any external media table) — resize must pass nulls through, not
    # crash on NaN→Int32 conversion.
    rows = [
        ("a://1", "audio", None, None, None, 5000),
        ("i://2", "image", None, None, 400, 5000),  # half-dimensioned
        ("i://3", "image", None, 640, 480, None),
        ("v://4", "video", None, None, None, 9000),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_ref: r for r in multimodal.resize_media(media, 224, 224).collect()}
    assert (out["a://1"].width, out["a://1"].height) == (None, None)
    assert (out["i://2"].width, out["i://2"].height) == (None, 400)
    assert (out["i://3"].width, out["i://3"].height) == (224, 168)
    assert (out["v://4"].width, out["v://4"].height) == (None, None)


def test_real_codec_path_is_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        multimodal.extract_features(media, deterministic=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|Pillow|ffmpeg"):
        multimodal.resize_media(media, deterministic=False).collect()
