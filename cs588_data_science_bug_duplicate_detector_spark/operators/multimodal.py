"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed through mapInPandas.

The decode kernels are STUBS (no image/audio libs in this container — see
``DecoderUnavailable``): the Spark-side contract — schemas, batch shapes,
partitioning, deterministic fake features for tests — is real and tested.
Swapping in PIL/librosa later changes only ``_decode_image_batch`` /
``_frame_sample_batch`` bodies, nothing in the dataflow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_payload binary"

FEATURE_DIM = 16


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-decoder path; tests exercise the fake path."""


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-media embedding: bytes of
    sha256(payload) scaled to [0,1). Stable across processes."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """media -> (media_id, kind, n_bytes, feature[16]) via mapInPandas.

    Arrow batches stream through Python once; no per-row spark calls.
    """

    def run(batches):
        for pdf in batches:
            if use_real_decoder:
                raise DecoderUnavailable(
                    "real image/audio decoding requires PIL/librosa; "
                    "not installed in this environment"
                )
            feats = [_fake_feature(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, use_real_decoder: bool = False) -> DataFrame:
    """video rows -> (media_id, frame_idx, frame_payload) one row per sampled
    frame. The fake path emits deterministic byte slices standing in for
    decoded frames; the row-explosion dataflow is the real contract."""

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if use_real_decoder:
                    raise DecoderUnavailable("real frame decode requires av/ffmpeg")
                n_frames = max(1, int((dur or 0) // every_ms))
                b = payload or b""
                for i in range(n_frames):
                    lo = (i * 97) % max(1, len(b))
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(b[lo : lo + 64])
            yield pd.DataFrame(out)

    videos = media.where(F.col("kind") == "video")
    return videos.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_dedup_edges(media: DataFrame) -> DataFrame:
    """Exact-payload dedup for media columns: md5 over binary, star edges."""
    h = media.select(F.col("media_id").alias("id"), F.md5("payload").alias("h"))
    roots = h.groupBy("h").agg(F.min("id").alias("root"), F.count("*").alias("n"))
    return (
        h.join(roots.where(F.col("n") > 1), "h")
        .where(F.col("id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("id").alias("dst"))
    )
