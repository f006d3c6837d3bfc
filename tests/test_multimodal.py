"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic fake
features, frame-sampling row explosion, exact media dedup."""

import pytest
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    DecoderUnavailable,
    extract_features,
    media_dedup_edges,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes" * 40, "image/png", 64, 64, None),
        (2, "image", b"\x89PNGfakebytes" * 40, "image/png", 64, 64, None),  # exact dup of 1
        (3, "image", b"\xffotherimage" * 33, "image/jpeg", 32, 32, None),
        (4, "audio", b"RIFFfakeaudio" * 25, "audio/wav", None, None, 3000),
        (5, "video", b"FTYPfakevideo" * 100, "video/mp4", 640, 480, 4500),
        (6, "video", b"", "video/mp4", 640, 480, 500),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(spark, media):
    out = extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    for r in rows.values():
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["feature"])
    assert rows[1]["feature"] == rows[2]["feature"]  # same payload, same feature
    assert rows[1]["feature"] != rows[3]["feature"]
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert again == {k: r["feature"] for k, r in rows.items()}


def test_real_decoder_is_explicit_stub(spark, media):
    with pytest.raises(Exception) as exc_info:
        extract_features(media, use_real_decoder=True).collect()
    assert "DecoderUnavailable" in str(exc_info.value) or "decoding requires" in str(exc_info.value)


def test_sample_frames_explosion(spark, media):
    frames = sample_frames(media, every_ms=1000)
    by_id = {}
    for r in frames.collect():
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(by_id) == {5, 6}          # only video rows
    assert sorted(by_id[5]) == [0, 1, 2, 3]  # 4500ms @ 1000ms
    assert by_id[6] == [0]               # min 1 frame
    assert frames.where(F.col("media_id") == 5).count() == 4


def test_media_dedup_edges(spark, media):
    edges = {(r["src"], r["dst"]) for r in media_dedup_edges(media).collect()}
    assert edges == {(1, 2)}
