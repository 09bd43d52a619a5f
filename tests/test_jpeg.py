"""Baseline JPEG + MJPEG-AVI codec tests (operators/jpeg.py).

The reference repo treats scraped media as opaque bytes (no decoder
anywhere); this codec is part of the multimodal training-data surface.
Tests cover roundtrip accuracy on smooth/structured content,
determinism, grayscale, error-path discipline (every malformed input →
ValueError/NotImplementedError so the per-row O23 handlers catch it),
and a corruption fuzz.
"""

import random

import numpy as np
import pytest

from outage_data_scraper_spark.operators import jpeg, multimodal


def _smooth(h, w):
    base = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 50, w))
    return np.stack([base, base * 0.8 + 20, base * 0.5 + 90], axis=2).astype(np.uint8)


def test_roundtrip_smooth_content_tight():
    img = _smooth(40, 56)
    enc = jpeg.encode_jpeg(img)
    dec = jpeg.decode_jpeg(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() <= 12, (err.mean(), err.max())


def test_roundtrip_non_multiple_of_8_dims():
    for h, w in [(8, 8), (9, 15), (17, 23), (57, 41)]:
        img = _smooth(h, w)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
        assert dec.shape == (h, w, 3)


def test_block_aligned_checkerboard_exact():
    chk = (np.add.outer(np.arange(32) // 8, np.arange(32) // 8) % 2 * 200 + 20)
    img = np.stack([chk] * 3, axis=2).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    # per-block-constant content has only a DC coefficient — exact
    assert (dec == img).all()


def test_flat_image_exact_and_deterministic():
    img = np.full((24, 24, 3), 100, np.uint8)
    enc = jpeg.encode_jpeg(img)
    assert enc == jpeg.encode_jpeg(img)
    assert (jpeg.decode_jpeg(enc) == 100).all()


def test_grayscale_single_component():
    g = (np.add.outer(np.arange(20) * 4, np.arange(30) * 3) % 200).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g))
    assert dec.shape == (20, 30, 3)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 4
    # gray replicated across channels
    assert (dec[:, :, 0] == dec[:, :, 1]).all() and (dec[:, :, 1] == dec[:, :, 2]).all()


def test_malformed_inputs_raise_value_error():
    for bad in [b"", b"\xff", b"\xff\xd8", b"\xff\xd8\x00\x00", b"\x89PNG"]:
        with pytest.raises((ValueError, NotImplementedError)):
            jpeg.decode_jpeg(bad)


def test_truncation_and_corruption_fuzz_never_leaks_exotic_exceptions():
    img = _smooth(40, 56)
    good = jpeg.encode_jpeg(img)
    rng = random.Random(11)
    for _ in range(400):
        cut = rng.randrange(2, len(good))
        with pytest.raises((ValueError, NotImplementedError)):
            jpeg.decode_jpeg(good[:cut])
    for _ in range(1500):
        b = bytearray(good)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        try:
            jpeg.decode_jpeg(bytes(b))
        except (ValueError, NotImplementedError):
            pass  # the only permitted failure modes


def test_avi_mjpeg_roundtrip_and_fps():
    frames = []
    for f in range(5):
        base = (np.add.outer(np.arange(24) * 3, np.arange(32) * 5) + f * 40) % 200
        frames.append(np.stack([base, base + 20, base + 40], axis=2).astype(np.uint8))
    avi = jpeg.encode_avi_mjpeg(frames, fps=10)
    out, fps = jpeg.decode_avi_mjpeg(avi)
    assert len(out) == 5 and fps == 10
    for o, f in zip(out, frames):
        assert o.shape == f.shape
        assert np.abs(o.astype(int) - f.astype(int)).mean() < 8
    assert jpeg.encode_avi_mjpeg(frames, fps=10) == avi


def test_avi_corruption_fuzz():
    frames = [_smooth(16, 16) for _ in range(3)]
    avi = jpeg.encode_avi_mjpeg(frames, fps=8)
    rng = random.Random(5)
    for _ in range(1500):
        b = bytearray(avi)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        try:
            jpeg.decode_avi_mjpeg(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_non_baseline_markers_raise_not_implemented():
    img = _smooth(16, 16)
    good = bytearray(jpeg.encode_jpeg(img))
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    good[sof + 1] = 0xC3  # rewrite SOF0 → SOF3 (lossless)
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(good))
    # SOF2 with a full-band sequential scan is INVALID progressive —
    # rejected as malformed, not silently half-decoded
    bad = bytearray(jpeg.encode_jpeg(img))
    bad[bad.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(bad))


def test_progressive_bit_identical_to_baseline():
    """The load-bearing invariant: a progressive stream carries the
    SAME quantized coefficients as the baseline stream of the same
    image, so both must decode to bit-identical pixels — this pins
    every progressive path (DC first/refine, AC spectral bands, AC
    successive-approximation refinement with held-bit ordering)."""
    rng = np.random.default_rng(7)
    cases = [
        _smooth(40, 56),
        rng.integers(0, 256, (33, 29, 3), dtype=np.uint8),
        (rng.integers(0, 2, (24, 24, 1)) * 255 * np.ones((1, 1, 3))).astype(np.uint8),
    ]
    for img in cases:
        for ss in ("444", "420"):
            b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, subsampling=ss))
            p = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, subsampling=ss))
            assert (p == b).all()
    g = (np.add.outer(np.arange(20) * 4, np.arange(30) * 3) % 200).astype(np.uint8)
    assert (jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(g))
            == jpeg.decode_jpeg(jpeg.encode_jpeg(g))).all()


def test_progressive_corruption_fuzz():
    img = _smooth(40, 56)
    good = jpeg.encode_jpeg_progressive(img, subsampling="420")
    rng = random.Random(31)
    for _ in range(1500):
        b = bytearray(good)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        try:
            jpeg.decode_jpeg(bytes(b))
        except (ValueError, NotImplementedError):
            pass  # only permitted failure modes


def test_multimodal_dispatch_uses_jpeg_and_avi():
    img = _smooth(24, 24)
    feat, label = multimodal.payload_features(jpeg.encode_jpeg(img), 8)
    assert label == "jpeg-numpy" and len(feat) == 8
    avi = jpeg.encode_avi_mjpeg([img, img], fps=6)
    feat, label = multimodal.payload_features(avi, 8)
    assert label == "mjpeg-avi" and len(feat) == 8
    # malformed jpeg magic → labeled fake, never an exception
    feat, label = multimodal.payload_features(b"\xff\xd8garbage", 8)
    assert label == "fake-blake2b"


def test_deeply_nested_avi_list_raises_value_error_not_recursion():
    """Adversarial RIFF nesting must surface as ValueError (caught per
    row upstream), never RecursionError (which would abort the task)."""
    import struct as _struct

    inner = b"\x00" * 4
    for _ in range(2000):
        inner = b"LIST" + _struct.pack("<I", len(inner) + 4) + b"hdrl" + inner
    payload = b"RIFF" + _struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    with pytest.raises(ValueError):
        jpeg.decode_avi_mjpeg(payload)


def test_bitwriter_acc_stays_bounded():
    """Regression: an unmasked accumulator turns encode into O(n²)
    bigint shifts — encoding a 256x256 noisy frame must stay fast."""
    import time

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    t0 = time.monotonic()
    enc = jpeg.encode_jpeg(img)
    wall = time.monotonic() - t0
    assert wall < 20, wall  # unmasked acc takes minutes here
    dec = jpeg.decode_jpeg(enc)
    assert dec.shape == img.shape


def test_short_sof_sos_segments_raise_value_error_not_index_error():
    """Repro from review: SOF0/SOS with a tiny declared seglen must be
    ValueError (caught per row), never IndexError (task abort)."""
    for seg in (b"\xff\xc0\x00\x02", b"\xff\xda\x00\x02"):
        with pytest.raises((ValueError, NotImplementedError)):
            jpeg.decode_jpeg(b"\xff\xd8" + seg)
    feat, label = multimodal.payload_features(b"\xff\xd8\xff\xc0\x00\x02", 8)
    assert label == "fake-blake2b"


def test_adversarial_dimensions_rejected_cheaply():
    """A few-hundred-byte payload declaring huge SOF dims must raise
    before allocating the coefficient buffers."""
    import struct as _struct

    good = bytearray(jpeg.encode_jpeg(_smooth(16, 16)))
    sof = good.find(b"\xff\xc0")
    good[sof + 5 : sof + 9] = _struct.pack(">HH", 10000, 10000)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(good))


def test_chroma_subsampling_and_restart_intervals_roundtrip():
    """Real-world layouts: 4:2:0 / 4:2:2 chroma and DRI/RSTn resync
    markers decode natively; byte size shrinks with subsampling."""
    img = _smooth(45, 62)
    sizes = {}
    for ss in ("444", "422", "420"):
        for ri in (0, 3):
            enc = jpeg.encode_jpeg(img, subsampling=ss, restart_interval=ri)
            dec = jpeg.decode_jpeg(enc)
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.mean() < 4, (ss, ri, err.mean())
            sizes[(ss, ri)] = len(enc)
    assert sizes[("420", 0)] < sizes[("422", 0)] < sizes[("444", 0)]
    # odd (non-MCU-multiple) dims under 420 + restarts
    odd = img[:17, :23]
    d = jpeg.decode_jpeg(jpeg.encode_jpeg(odd, subsampling="420", restart_interval=2))
    assert d.shape == odd.shape


def test_subsampled_corruption_fuzz():
    img = _smooth(32, 40)
    good = jpeg.encode_jpeg(img, subsampling="420", restart_interval=2)
    rng = random.Random(21)
    for _ in range(1500):
        b = bytearray(good)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        try:
            jpeg.decode_jpeg(bytes(b))
        except (ValueError, NotImplementedError):
            pass  # only permitted failure modes


_AC_SPEC = ([1, 2] + [0] * 14, [0x10, 0x01, 0x00])


def _custom_tables():
    """(dc_codes, ac_codes) for the hand-assembled streams below: a
    CUSTOM AC table carrying the EOBn symbol (0x10) that real
    progressive encoders emit but ours does not — values 0x10 (EOB1,
    1-bit code '0'), 0x01 and 0x00 (2-bit codes '10'/'11')."""
    from outage_data_scraper_spark.operators.jpeg import (
        _DC_LUMA, _huffman_codes,
    )

    return _huffman_codes(*_DC_LUMA), _huffman_codes(*_AC_SPEC)


def _custom_stream(scans):
    """Hand-assemble a 4-block (8x32 grayscale) progressive stream."""
    import struct as _struct

    from outage_data_scraper_spark.operators.jpeg import (
        QUANT_LUMA, ZIGZAG, _DC_LUMA,
    )

    ac_spec = _AC_SPEC
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _struct.pack(">HB", 67, 0) + bytes(
        int(x) for x in QUANT_LUMA.reshape(-1)[ZIGZAG]
    )
    out += b"\xff\xc2" + _struct.pack(">HBHHB", 11, 8, 8, 32, 1)
    out += _struct.pack("BBB", 1, 0x11, 0)
    for cls, spec in ((0, _DC_LUMA), (1, ac_spec)):
        bits, values = spec
        out += b"\xff\xc4" + _struct.pack(">HB", 19 + len(values), (cls << 4) | 0)
        out += bytes(bits) + bytes(values)
    for (ss, se, ah, al), payload_bits in scans:
        out += b"\xff\xda" + _struct.pack(">HB", 8, 1)
        out += _struct.pack("BB", 1, 0x00)
        out += _struct.pack("BBB", ss, se, (ah << 4) | al)
        bw = jpeg._BitWriter()
        for code, length in payload_bits:
            bw.write(code, length)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _expected_pixels(coef_map):
    """Dequantize + IDCT the 4 hand-chosen blocks exactly as the
    decoder does; coef_map: {block_idx: {zigzag_k: value}}."""
    from outage_data_scraper_spark.operators.jpeg import (
        QUANT_LUMA, _T, _UNZIGZAG,
    )

    out = np.zeros((8, 32), dtype=np.uint8)
    for b in range(4):
        zz = np.zeros(64, dtype=np.int64)
        for k, v in coef_map.get(b, {}).items():
            zz[k] = v
        deq = zz[_UNZIGZAG].reshape(8, 8) * QUANT_LUMA
        px = _T.T @ deq.astype(np.float64) @ _T + 128.0
        out[:, b * 8 : (b + 1) * 8] = np.clip(np.round(px), 0, 255)
    return np.stack([out] * 3, axis=2)


def test_eobrun_multi_block_ac_first_decode():
    """EOBn>1 in an AC-first scan (real progressive encoders emit these
    with custom tables): EOB1 + extra bit 1 covers blocks 1-2 after
    block 0; block 3 codes its own coefficient."""
    dc, ac = _custom_tables()
    stream = _custom_stream([
        # DC first scan: 4 blocks, diff 0 each (DC code for size 0)
        ((0, 0, 0, 0), [dc[0]] * 4),
        # AC first scan (Al=0): block0: (r=0,s=1) coeff +1 at k=1, then
        # EOB1 with extra bit 1 -> covers blocks 1 and 2;
        # block3: coeff -1 at k=1, then EOB0... EOB0 is symbol 0x00
        ((1, 63, 0, 0), [
            ac[0x01], (1, 1),            # +1 at k=1
            ac[0x10], (1, 1),            # EOB1, extra bit 1 => run 2
            ac[0x01], (0, 1),            # block3: -1 at k=1
            ac[0x00],                    # EOB0 ends block3
        ]),
    ])
    dec = jpeg.decode_jpeg(stream)
    exp = _expected_pixels({0: {1: 1}, 3: {1: -1}})
    assert (dec == exp).all()


def test_eobrun_multi_block_ac_refine_decode():
    """EOBn>1 in an AC-REFINEMENT scan: the run INCLUDES the current
    block, whose band tail still takes correction bits; covered blocks
    with nonzero history each consume one correction bit."""
    dc, ac = _custom_tables()
    stream = _custom_stream([
        ((0, 0, 0, 0), [dc[0]] * 4),
        # AC first at Al=1: blocks 0 and 3 get ±1<<1 = ±2 at k=1
        ((1, 63, 0, 1), [
            ac[0x01], (1, 1), ac[0x10], (1, 1),   # +1@k1; EOB1+bit -> 2 blocks
            ac[0x01], (0, 1), ac[0x00],           # -1@k1; EOB0
        ]),
        # AC refine Ah=1,Al=0: EOB1 + extra bit 1 => eobrun=3 covering
        # blocks 0-2 (block0's coeff takes a correction bit 1 -> |2|+1);
        # block3: EOB0, its coeff corrects with bit 1 -> -3
        ((1, 63, 1, 0), [
            ac[0x10], (1, 1),            # EOB1 + bit -> covers blocks 0..2
            (1, 1),                      # correction bit for block0 k=1
            ac[0x00],                    # block3 EOB0
            (1, 1),                      # correction bit for block3 k=1
        ]),
    ])
    dec = jpeg.decode_jpeg(stream)
    exp = _expected_pixels({0: {1: 3}, 3: {1: -3}})
    assert (dec == exp).all()
