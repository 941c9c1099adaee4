"""Multimodal binary-column plumbing (stubbed decode, real Spark shape)."""

from __future__ import annotations

import hashlib

import pytest

from wistia_video_analytics_project_spark import schemas
from wistia_video_analytics_project_spark.operators import multimodal


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"img-bytes-a", 640, 480, None, "png"),
        (2, "image", b"img-bytes-a", 640, 480, None, "png"),  # dup content
        (3, "audio", b"pcm-bytes", None, None, 2500, "opus"),
        (4, "video", b"h264-bytes", 1920, 1080, 3500, "h264"),
        (5, "video", None, None, None, 1000, "h264"),  # missing payload
    ]
    return spark.createDataFrame(rows, schemas.MEDIA_ASSETS)


def test_extract_features_shape_and_determinism(spark, assets):
    out = multimodal.extract_features(assets)
    rows = {r.asset_id: r for r in out.collect()}
    assert len(rows) == 5
    assert len(rows[1].feature) == multimodal.FEATURE_DIM
    assert rows[1].feature == rows[2].feature  # same bytes -> same features
    assert rows[1].content_sha256 == hashlib.sha256(b"img-bytes-a").hexdigest()
    assert rows[5].feature is None and rows[5].n_bytes == 0
    # deterministic across repartitioning
    again = {r.asset_id: r.feature
             for r in multimodal.extract_features(assets.repartition(3)).collect()}
    assert again == {k: r.feature for k, r in rows.items()}


def test_sample_frames_grid(spark, assets):
    out = multimodal.sample_frames(assets, every_ms=1000)
    by_asset = {}
    for r in out.collect():
        by_asset.setdefault(r.asset_id, []).append(r.frame_ms)
    # only video assets; 3500ms -> frames at 0,1000,2000,3000
    assert sorted(by_asset) == [4, 5]
    assert sorted(by_asset[4]) == [0, 1000, 2000, 3000]
    assert sorted(by_asset[5]) == [0]


def test_dedup_by_content(spark, assets):
    out = multimodal.dedup_by_content(assets.filter("payload IS NOT NULL"))
    canon = {r.asset_id: r.is_canonical for r in out.collect()}
    assert canon == {1: True, 2: False, 3: True, 4: True}


def test_codecs_absent_stub_raises():
    if not multimodal.HAVE_CODECS:
        with pytest.raises(NotImplementedError, match="codec"):
            multimodal.real_decode(b"x", "image")


def test_resize_images(spark, assets):
    out = {r.asset_id: r for r in
           multimodal.resize_images(assets, max_width=320).collect()}
    r1 = out[1]  # 640x480 image -> 320x240, payload transformed
    assert (r1.width, r1.height) == (320, 240)
    assert bytes(r1.payload) != b"img-bytes-a"
    # non-image rows and small images pass through untouched
    assert bytes(out[3].payload) == b"pcm-bytes"
    assert out[4].width == 1920  # video untouched
    # deterministic
    again = {r.asset_id: bytes(r.payload) if r.payload is not None else None
             for r in multimodal.resize_images(assets.repartition(3), max_width=320).collect()}
    assert again[1] == bytes(r1.payload)
