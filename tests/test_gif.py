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


def _hand_gif(pal, items, table_bits=2, mcs=2):
    """Hand-assemble a GIF89a: global palette `pal` (padded to
    2**table_bits entries), then per item (idx_rows, transp) an optional
    GCE + full-screen image block LZW-encoded at `mcs`."""
    import struct

    h, w = items[0][0].shape
    size = 1 << table_bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (table_bits - 1), 0, 0]) + table.tobytes()
    for rows, transp in items:
        if transp is not None:
            out += bytes([0x21, 0xF9, 0x04, 0x01, 0, 0, transp, 0x00])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([mcs])
        data = gif._lzw_encode(rows.tobytes(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gce_transparency_composites_through():
    """ADVICE r4: GCE transparency index must show the PRIOR canvas
    through, not composite the palette entry as an opaque color."""
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]], np.uint8
    )
    f1 = np.array([[0, 1], [2, 3]], np.uint8)
    f2 = np.array([[3, 1], [1, 1]], np.uint8)  # idx 1 transparent below
    frames = gif.decode_gif_frames(_hand_gif(pal, [(f1, None), (f2, 1)]))
    assert len(frames) == 2
    assert (frames[0] == pal[f1]).all()
    expect = pal[f2].copy()
    expect[f2 == 1] = frames[0][f2 == 1]  # see-through pixels
    assert (frames[1] == expect).all()
    # a GCE governs exactly ONE image: a third frame without its own GCE
    # renders index 1 opaque again
    frames3 = gif.decode_gif_frames(
        _hand_gif(pal, [(f1, None), (f2, 1), (f2, None)])
    )
    assert (frames3[2] == pal[f2]).all()


def test_gce_transparent_index_outside_palette():
    """A transparent index >= palette size is legal (those pixels never
    hit the palette); opaque out-of-range pixels still raise."""
    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    f1 = np.array([[0, 1], [1, 0]], np.uint8)
    f2 = np.array([[5, 0], [0, 5]], np.uint8)  # 5 transparent, >= len(pal)
    frames = gif.decode_gif_frames(
        _hand_gif(pal, [(f1, None), (f2, 5)], table_bits=1, mcs=3)
    )
    expect = pal[np.minimum(f2, 1)].copy()
    expect[f2 == 5] = frames[0][f2 == 5]
    assert (frames[1] == expect).all()
    # same stream WITHOUT the GCE: index 5 is out of range -> ValueError
    with pytest.raises(ValueError):
        gif.decode_gif_frames(
            _hand_gif(pal, [(f1, None), (f2, None)], table_bits=1, mcs=3)
        )
