"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video assets travel as ``binary`` columns with typed metadata
(schemas.ASSETS). Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages with real schemas, partitioning and
batch shapes; the codec call itself is stubbed (this container ships no
image/audio libraries): ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a clearly-marked deterministic fake
produces stable features so the distributed plumbing is testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURES_SCHEMA = "asset_id long, kind string, feat array<float>, feat_dim int, decoder string"


def synth_assets(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic synthetic asset table (payload bytes from xxhash64 —
    generated distributed via spark.range, no driver loop)."""
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (64 + F.pmod(F.xxhash64("id"), 512)).cast("int").alias("width"),
        (64 + F.pmod(F.xxhash64("id", F.lit(1)), 512)).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 600) / 10.0).alias("duration_s"),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real image decode requires PIL/opencv, absent here."""
    raise NotImplementedError(
        "image decode requires an image codec library not present in this "
        "container; use extract_features(fake=True) for the plumbing path"
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'embedding' from the payload digest — a stand-in
    with the exact shape/dtype a real encoder would produce."""
    h = hashlib.blake2b(payload, digest_size=dim)
    return (np.frombuffer(h.digest(), dtype=np.uint8).astype(np.float32) - 128.0) / 128.0


def extract_features(assets: DataFrame, dim: int = 32, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real semantics when a codec lands: decode → model forward per batch.
    The batch shape (one Arrow batch of payload bytes at a time, features
    returned as array<float>) is exactly what a GPU encoder stage needs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for payload in b["payload"]:
                if payload is None:
                    feats.append(None)
                elif fake:
                    feats.append(_fake_features(bytes(payload), dim).tolist())
                else:
                    feats.append(decode_image(bytes(payload)).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "kind": b["kind"],
                    "feat": feats,
                    "feat_dim": dim,
                    "decoder": "fake-blake2b" if fake else "real",
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(assets: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts) —
    pure column algebra (sequence+explode); the decode of each frame is
    the stubbed stage above. Shows the scale shape: a 2-hour video at
    1 fps fans out to 7200 rows before the decoder stage."""
    return (
        assets.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest((F.col("duration_s") * fps).cast("int") - 1, F.lit(0)),
                )
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_s", F.col("frame_idx") / fps)
    )
