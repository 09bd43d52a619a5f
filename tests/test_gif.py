"""GIF codec tests (operators/gif.py): LZW, palettes, interlace,
animation compositing, error-path discipline, fuzz."""

import random

import numpy as np
import pytest

from outage_data_scraper_spark.operators import gif, multimodal


def _paletted(h, w, ncolors=16, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, (h, w))]


def test_exact_palette_roundtrip_lossless():
    img = _paletted(24, 37)
    enc = gif.encode_gif(img)
    assert enc == gif.encode_gif(img)  # deterministic
    assert (gif.decode_gif(enc) == img).all()
    # odd sizes + tiny
    for h, w in [(1, 1), (7, 3), (8, 64)]:
        im = _paletted(h, w, 4, seed=h * w)
        assert (gif.decode_gif(gif.encode_gif(im)) == im).all()


def test_interlaced_roundtrip_lossless():
    img = _paletted(29, 21)
    assert (gif.decode_gif(gif.encode_gif(img, interlace=True)) == img).all()


def test_animation_frames_composite():
    frames = [_paletted(16, 20, 8, seed=s) for s in range(4)]
    out = gif.decode_gif_frames(gif.encode_gif(frames))
    assert len(out) == 4
    for o, f in zip(out, frames):
        assert (o == f).all()


def test_many_colors_quantize_bounded():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    d = gif.decode_gif(gif.encode_gif(img))
    err = np.abs(d.astype(int) - img.astype(int))
    assert err.max() <= 25 and err.mean() < 15  # 6/7/6 cube bound


def test_malformed_inputs_raise_value_error():
    for bad in [b"", b"GIF", b"GIF89a", b"GIF89a" + b"\x00" * 6,
                b"NOTGIF" + b"\x00" * 20]:
        with pytest.raises(ValueError):
            gif.decode_gif(bad)


def test_corruption_and_truncation_fuzz():
    good = gif.encode_gif([_paletted(20, 24, 12, seed=s) for s in range(2)])
    rng = random.Random(9)
    for _ in range(400):
        cut = rng.randrange(1, len(good))
        try:
            gif.decode_gif(good[:cut])
        except ValueError:
            pass
    for _ in range(2000):
        b = bytearray(good)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        try:
            gif.decode_gif_frames(bytes(b))
        except ValueError:
            pass  # the only permitted failure mode


def test_multimodal_dispatch_gif():
    img = _paletted(24, 24)
    feat, label = multimodal.payload_features(gif.encode_gif(img), 8)
    assert label == "gif-lzw" and len(feat) == 8
    assert (multimodal.decode_image(gif.encode_gif(img)) == img).all()
    # malformed gif magic → labeled fake, never an exception
    feat, label = multimodal.payload_features(b"GIF89agarbage", 8)
    assert label == "fake-blake2b"


def test_frame_features_dispatch_gif_animation(spark):
    """extract_frame_features accepts GIF animations alongside AVI
    (fps 0 — GIF timing is not parsed)."""
    from pyspark.sql import functions as F

    frames = [_paletted(16, 16, 8, seed=s) for s in range(4)]
    anim = gif.encode_gif(frames)
    assets = spark.createDataFrame(
        [(0, "video", bytearray(anim))], "asset_id long, kind string, payload binary"
    )
    rows = multimodal.extract_frame_features(assets, every=2, dim=8).collect()
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 2]
    assert all(r.n_frames == 4 and r.fps == 0 for r in rows)
