"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video assets travel as ``binary`` columns with typed metadata
(schemas.ASSETS). Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages with real schemas, partitioning and
batch shapes.

Decode is REAL for raw-bitmap images: PPM (P6) needs no codec library —
header parse + numpy frombuffer — so the image path exercises genuine
pixel math end-to-end (decode → mean-pool features, nearest-neighbor
resize). Compressed formats (JPEG/PNG) and audio/video decode stay
honestly stubbed behind NotImplementedError (this container ships no
codec libraries); ``decoder='auto'`` dispatches per payload and falls
back to a clearly-marked deterministic fake for undecodable kinds so the
distributed plumbing stays testable everywhere.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

FEATURES_SCHEMA = "asset_id long, kind string, feat array<float>, feat_dim int, decoder string"


# -- real raw-bitmap codec (pure numpy, no external libs) ----------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 HxWx3 array → binary PPM (P6)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 HxWx3 array. Raises ValueError on a
    malformed header (captured per-row by the feature stage)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    if len(parts) < 4:
        raise ValueError("truncated PPM header")
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3)
    return data.reshape(h, w, 3)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload. P6 PPM decodes for real; compressed
    formats require a codec library absent from this container."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "compressed image decode requires a codec library not present in "
        "this container; raw P6 PPM payloads decode natively"
    )


def _mean_pool_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real pixel features: grayscale mean-pool over a ceil-sqrt grid,
    truncated/padded to ``dim`` and scaled to [−1, 1]."""
    gray = img.mean(axis=2)
    g = int(np.ceil(np.sqrt(dim)))
    h, w = gray.shape
    ys = np.linspace(0, h, g + 1).astype(int)
    xs = np.linspace(0, w, g + 1).astype(int)
    cells = [
        gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
        for i in range(g)
        for j in range(g)
    ]
    out = (np.asarray(cells[:dim], dtype=np.float32) - 127.5) / 127.5
    if len(out) < dim:
        out = np.pad(out, (0, dim - len(out)))
    return out


def synth_assets(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic synthetic asset table, generated distributed via
    spark.range. Image assets carry REAL P6 PPM payloads (pixels are a
    deterministic gradient+hash pattern, built executor-side in a pandas
    UDF); audio/video assets carry opaque digest bytes."""

    @F.pandas_udf(BinaryType())
    def payload_for(ids: pd.Series, kinds: pd.Series) -> pd.Series:
        out = []
        for i, kind in zip(ids, kinds):
            if kind == "image":
                rng = np.random.default_rng(int(i))
                h, w = 24 + int(i) % 17, 24 + (int(i) * 7) % 23
                base = np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256
                img = np.stack(
                    [(base + k * 37 + rng.integers(0, 8)) % 256 for k in range(3)],
                    axis=2,
                ).astype(np.uint8)
                out.append(encode_ppm(img))
            else:
                out.append(hashlib.sha256(str(int(i)).encode()).digest())
        return pd.Series(out)

    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("kind"),
        (64 + F.pmod(F.xxhash64("id"), 512)).cast("int").alias("width"),
        (64 + F.pmod(F.xxhash64("id", F.lit(1)), 512)).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 600) / 10.0).alias("duration_s"),
    )
    return base.select(
        "asset_id",
        "kind",
        payload_for(F.col("asset_id"), F.col("kind")).alias("payload"),
        F.when(F.col("kind") == "image", F.lit("image/x-portable-pixmap"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
        "width",
        "height",
        "duration_s",
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'embedding' from the payload digest — a stand-in
    with the exact shape/dtype a real encoder would produce."""
    h = hashlib.blake2b(payload, digest_size=dim)
    return (np.frombuffer(h.digest(), dtype=np.uint8).astype(np.float32) - 128.0) / 128.0


def extract_features(assets: DataFrame, dim: int = 32, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``fake=True``: every row gets the digest fake (plumbing-only mode).
    ``fake=False``: auto-dispatch — P6 PPM payloads decode for REAL and
    produce mean-pooled pixel features (decoder='ppm-numpy'); payloads no
    native decoder can handle fall back to the fake, clearly labeled.
    The batch shape (one Arrow batch of payload bytes at a time, features
    as array<float>) is exactly what a GPU encoder stage needs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            decoders = []
            for payload in b["payload"]:
                if payload is None:
                    feats.append(None)
                    decoders.append(None)
                    continue
                raw = bytes(payload)
                if not fake and raw[:2] == b"P6":
                    feats.append(_mean_pool_features(decode_ppm(raw), dim).tolist())
                    decoders.append("ppm-numpy")
                else:
                    feats.append(_fake_features(raw, dim).tolist())
                    decoders.append("fake-blake2b")
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "kind": b["kind"],
                    "feat": feats,
                    "feat_dim": dim,
                    "decoder": decoders,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = "asset_id long, payload binary, width int, height int"


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize of P6 PPM image payloads (pure numpy
    index selection), Arrow-batched. Non-PPM rows pass through with a
    null payload — at scale this is the normalize-before-encode stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for payload in b["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if raw[:2] == b"P6":
                    img = decode_ppm(raw)
                    h, w = img.shape[:2]
                    yi = (np.arange(height) * h // height).clip(0, h - 1)
                    xi = (np.arange(width) * w // width).clip(0, w - 1)
                    payloads.append(encode_ppm(img[yi][:, xi]))
                else:
                    payloads.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


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
