"""VP8L (lossless WebP) codec tests: roundtrips across the option
grid, the distance-map invariants, hand-targeted decode paths, and the
codec family's fuzz discipline (malformed bytes -> ValueError /
NotImplementedError, never anything else; crafted bombs cannot blow
the decode budget)."""

from __future__ import annotations

import numpy as np
import pytest

from outage_data_scraper_spark.operators.webp import (
    _PLANE_OFFSETS,
    _distance_to_plane_map,
    _plane_to_distance,
    _prefix_encode_value,
    _read_prefix_value,
    _BitReader,
    decode_webp,
    encode_webp,
)


def _gradient(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256
    return np.stack(
        [(base + k * 37 + rng.integers(0, 8)) % 256 for k in range(3)], axis=2
    ).astype(np.uint8)


def _noise(h, w, seed=1):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _lowcolor(h, w, ncol, seed=2):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    idx = (np.add.outer(np.arange(h), np.arange(w) * 3) + rng.integers(0, 2, (h, w))) % ncol
    return pal[idx]


# ------------------------------------------------------------ roundtrips


@pytest.mark.parametrize(
    "opts",
    [
        {},
        {"use_lz77": False},
        {"cache_bits": 0},
        {"cache_bits": 9},
        {"subtract_green": True},
        {"color_transform": (-3, 5, -7)},
        {"subtract_green": True, "color_transform": (12, -1, 4)},
        {"meta_split": True},
        {"subtract_green": True, "meta_split": True, "cache_bits": 3},
    ],
)
def test_roundtrip_options(opts):
    for img in (_gradient(24, 31), _noise(17, 23), _gradient(8, 8, seed=9)):
        assert np.array_equal(decode_webp(encode_webp(img, **opts)), img)


@pytest.mark.parametrize("mode", range(14))
def test_roundtrip_every_predictor_mode(mode):
    img = _gradient(21, 26, seed=mode)
    out = decode_webp(encode_webp(img, predictor_mode=mode))
    assert np.array_equal(out, img)


def test_roundtrip_transform_stack():
    img = _gradient(33, 19, seed=4)
    enc = encode_webp(
        img, subtract_green=True, color_transform=(7, -9, 3), predictor_mode=11
    )
    assert np.array_equal(decode_webp(enc), img)


@pytest.mark.parametrize("ncol", [2, 4, 11, 16, 17, 64, 250])
def test_roundtrip_palette_all_bundle_widths(ncol):
    # 2 -> 8px/byte, 4 -> 4px, 16 -> 2px, >16 -> unbundled
    img = _lowcolor(13, 29, ncol)
    enc = encode_webp(img, palette=True, cache_bits=0)
    assert np.array_equal(decode_webp(enc), img)


def test_roundtrip_palette_width_not_multiple_of_bundle():
    # w=30 with 8px bundling leaves a partial trailing packed pixel
    img = _lowcolor(5, 30, 2)
    assert np.array_equal(decode_webp(encode_webp(img, palette=True)), img)


def test_roundtrip_tiny_and_single_pixel():
    for h, w in ((1, 1), (1, 7), (7, 1), (2, 2)):
        img = _gradient(h, w, seed=h * 10 + w)
        assert np.array_equal(decode_webp(encode_webp(img)), img)


def test_roundtrip_uniform_image_compresses_and_decodes():
    img = np.full((40, 50, 3), 137, dtype=np.uint8)
    enc = encode_webp(img)
    assert len(enc) < 200  # LZ77 run collapses the constant plane
    assert np.array_equal(decode_webp(enc), img)


def test_lz77_row_copy_path():
    # identical rows -> distance == width back-references
    row = _noise(1, 37, seed=8)
    img = np.repeat(row, 23, axis=0)
    enc = encode_webp(img, cache_bits=0)
    assert np.array_equal(decode_webp(enc), img)
    assert len(enc) < img.nbytes // 4


# -------------------------------------------------------- distance map


def test_plane_offsets_are_the_spec_window():
    assert len(_PLANE_OFFSETS) == 120
    assert len(set(_PLANE_OFFSETS)) == 120
    for dx, dy in _PLANE_OFFSETS:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
        assert dy > 0 or dx > 0
    # closest neighbors come first, in the documented tie-break order
    assert _PLANE_OFFSETS[:6] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0)]


def test_plane_distance_roundtrip():
    for w in (5, 64, 1000):
        m = _distance_to_plane_map(w)
        for dist, code in m.items():
            assert _plane_to_distance(code, w) == dist
        assert _plane_to_distance(121, w) == 1
        assert _plane_to_distance(120 + 999, w) == 999


def test_prefix_value_roundtrip():
    for v in list(range(1, 70)) + [255, 4096, 10000, (1 << 20)]:
        code, extra_val, extra_bits = _prefix_encode_value(v)
        assert code < 40
        raw = bytes(
            [(extra_val >> (8 * i)) & 0xFF for i in range(4)]
        )  # LSB-first extras
        assert _read_prefix_value(_BitReader(raw), code) == v


# ---------------------------------------------------------- containers


def test_vp8x_wrapped_vp8l_decodes():
    img = _gradient(9, 12)
    plain = encode_webp(img)
    vp8l = plain[12:]  # the VP8L chunk (incl. header + possible pad)
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
    body = b"WEBP" + vp8x + vp8l
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert np.array_equal(decode_webp(wrapped), img)


def test_lossy_vp8_is_an_honest_stub():
    body = b"WEBP" + b"VP8 " + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00"
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    with pytest.raises(NotImplementedError):
        decode_webp(payload)


def test_not_a_webp():
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_webp(b"")


# ------------------------------------------------------- fuzz + budget


def test_dimension_bomb_rejected_fast():
    # header declaring 16384x16384 (1 GiB of pixels) from a tiny payload
    from outage_data_scraper_spark.operators.webp import _BitWriter

    bw = _BitWriter()
    bw.write(16383, 14)
    bw.write(16383, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    body = b"\x2f" + bw.finish() + b"\x00" * 8
    chunk = b"WEBP" + b"VP8L" + len(body).to_bytes(4, "little") + body
    payload = b"RIFF" + len(chunk).to_bytes(4, "little") + chunk
    with pytest.raises(ValueError, match="budget"):
        decode_webp(payload)


def test_fuzz_mutations_never_escape_valueerror():
    img = _gradient(16, 20)
    base = bytearray(encode_webp(img, subtract_green=True, meta_split=True))
    rng = np.random.default_rng(42)
    failures = 0
    for _ in range(400):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        try:
            out = decode_webp(bytes(buf))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            failures += 1
    assert failures > 0  # mutations do get caught, not silently "decoded"


def test_truncation_never_escapes_valueerror():
    img = _gradient(14, 14)
    base = encode_webp(img)
    for cut in range(12, len(base), 3):
        try:
            decode_webp(base[:cut])
        except (ValueError, NotImplementedError):
            pass


# ----------------------------------------------- multimodal integration


def test_multimodal_dispatch_decodes_webp():
    from outage_data_scraper_spark.operators.multimodal import (
        decode_image,
        payload_features,
    )

    img = _gradient(20, 25)
    payload = encode_webp(img)
    assert np.array_equal(decode_image(payload), img)
    feat, label = payload_features(payload, 16)
    assert label == "webp-vp8l"
    assert feat.shape == (16,)
