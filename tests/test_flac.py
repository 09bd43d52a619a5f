"""FLAC codec tests: bit-exact lossless round trips across every
subframe type / stereo mode / bit depth, hand-crafted bitstreams for
the decoder branches our encoder never emits (rice2, escape
partitions, wasted bits, spec blocksize/samplerate codes), CRC/MD5
tamper detection, and the codec family's fuzz discipline (malformed
bytes -> ValueError, never anything else)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from outage_data_scraper_spark.operators.flac import (
    _BitWriter,
    _decode_utf8_number,
    _encode_utf8_number,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def _tone(n, seed=0, amp=0.6):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64) / 8000.0
    x = amp * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return (np.clip(x, -1, 1) * 32767).astype(np.int32)


def _stereo(n, seed=0):
    left = _tone(n, seed)
    right = (np.roll(left, 3) // 2 + 11).astype(np.int32)
    return np.stack([left, right], axis=1)


# ------------------------------------------------------- round trips


@pytest.mark.parametrize("mode", ["independent", "left-side", "right-side", "mid-side", "auto"])
def test_roundtrip_stereo_modes(mode):
    s = _stereo(3000, seed=3)
    blob = encode_flac(s, 44100, 16, 512, stereo_mode=mode)
    dec, rate, bps = decode_flac(blob)
    assert rate == 44100 and bps == 16
    assert (dec == s).all()


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_roundtrip_bit_depths(bps):
    scale = (1 << (bps - 1)) - 1
    s = (_tone(2500, seed=bps).astype(np.int64) * scale // 32767).astype(np.int32)
    blob = encode_flac(s[:, None], 8000, bps, 1024)
    dec, rate, dbps = decode_flac(blob)
    assert dbps == bps and (dec[:, 0] == s).all()


@pytest.mark.parametrize("bsz", [192, 256, 333, 1024, 4096])
def test_roundtrip_block_sizes_and_ragged_tail(bsz):
    s = _tone(bsz * 2 + 77, seed=bsz)
    blob = encode_flac(s[:, None], 8000, 16, bsz)
    dec, _, _ = decode_flac(blob)
    assert (dec[:, 0] == s).all()


def test_roundtrip_lpc_and_fixed_agree():
    s = _stereo(4000, seed=9)
    for lpc in (False, True):
        dec, _, _ = decode_flac(encode_flac(s, 8000, 16, 1024, use_lpc=lpc))
        assert (dec == s).all()


def test_roundtrip_constant_silence_noise_tiny_empty():
    rng = np.random.default_rng(4)
    cases = [
        np.full((900, 2), -7, dtype=np.int32),
        np.zeros((500, 1), dtype=np.int32),
        rng.integers(-32768, 32768, (2000, 2)).astype(np.int32),
        rng.integers(-100, 100, (3, 1)).astype(np.int32),
        np.zeros((0, 1), dtype=np.int32),
    ]
    for s in cases:
        dec, _, _ = decode_flac(encode_flac(s, 8000, 16, 256))
        assert dec.shape == s.shape and (dec == s).all()


def test_roundtrip_seeded_random_signals():
    """48 seeded signals through every encoder knob combination."""
    rng = np.random.default_rng(12)
    for i in range(48):
        n = int(rng.integers(1, 5000))
        ch = int(rng.integers(1, 3))
        bps = (8, 16, 24)[i % 3]
        scale = (1 << (bps - 1)) - 1
        kind = i % 4
        if kind == 0:
            s = rng.integers(-scale - 1, scale + 1, (n, ch))
        elif kind == 1:
            t = np.arange(n)
            s = np.stack(
                [(np.sin(t / (3 + c)) * scale * 0.8).astype(np.int64) for c in range(ch)],
                axis=1,
            )
        elif kind == 2:
            s = np.cumsum(rng.integers(-40, 41, (n, ch)), axis=0)
            s = np.clip(s, -scale - 1, scale)
        else:
            s = np.full((n, ch), int(rng.integers(-scale, scale)))
        s = s.astype(np.int32)
        blob = encode_flac(
            s, 8000, bps,
            block_size=(192, 576, 1024)[i % 3],
            stereo_mode="auto",
            use_lpc=bool(i % 2),
        )
        dec, _, _ = decode_flac(blob)
        assert (dec == s).all(), f"seeded case {i} diverged"


def test_utf8_number_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, (1 << 31), (1 << 36) - 1]:
        enc = _encode_utf8_number(v)
        dec, nxt = _decode_utf8_number(enc, 0)
        assert dec == v and nxt == len(enc), hex(v)


# --------------------------- hand-crafted decoder-only branch coverage


def _craft_frame(subframe_bits, blocksize, rate_code_byte, channels=1):
    """Minimal single-frame stream: STREAMINFO + one crafted frame."""
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # bps 16
    si.write(blocksize, 36)
    si.align()
    streaminfo = si.getvalue() + b"\x00" * 16  # md5 unset -> skip verify
    meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    hdr = bytearray([0xFF, 0xF8, rate_code_byte, ((channels - 1) << 4) | (4 << 1)])
    hdr += _encode_utf8_number(0)
    if rate_code_byte >> 4 == 6:  # 8-bit blocksize-1 at end
        hdr.append(blocksize - 1)
    elif rate_code_byte >> 4 == 7:
        hdr += struct.pack(">H", blocksize - 1)
    sr = rate_code_byte & 0xF
    if sr == 12:
        hdr.append(8)
    elif sr in (13, 14):
        hdr += struct.pack(">H", 8000 if sr == 13 else 800)
    hdr.append(crc8(bytes(hdr)))
    frame = bytes(hdr) + subframe_bits
    return b"fLaC" + meta + frame + struct.pack(">H", crc16(frame))


def test_decoder_rice2_and_escape_partitions():
    # FIXED order 1, rice2 (method 01), 2 partitions: first rice2
    # param 3, second escaped raw 7-bit
    bw = _BitWriter()
    vals = [10, 12, 11, 13, 9, 12, 14, 10]  # blocksize 8, order 1
    res = [vals[i] - vals[i - 1] for i in range(1, 8)]
    bw.write(0, 1)
    bw.write(8 + 1, 6)  # FIXED order 1
    bw.write(0, 1)
    bw.write(vals[0] & 0xFFFF, 16)  # warmup
    bw.write(1, 2)  # rice2
    bw.write(1, 4)  # partition order 1 -> 2 partitions of 4
    bw.write(3, 5)  # rice2 param 3
    for v in res[:3]:
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(u >> 3)
        bw.write(u & 7, 3)
    bw.write(31, 5)  # escape
    bw.write(7, 5)  # raw 7-bit residuals
    for v in res[3:]:
        bw.write(v & 0x7F, 7)
    bw.align()
    blob = _craft_frame(bw.getvalue(), 8, (6 << 4) | 0)
    dec, rate, bps = decode_flac(blob)
    assert rate == 8000 and bps == 16
    assert dec[:, 0].tolist() == vals


def test_decoder_wasted_bits_constant():
    # CONSTANT subframe with 2 wasted bits: stored value 5 -> sample 20
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)  # CONSTANT
    bw.write(1, 1)  # wasted flag
    bw.write(1, 2)  # unary 1 -> wasted = 2
    bw.write(5, 14)  # effective bps = 16 - 2
    bw.align()
    blob = _craft_frame(bw.getvalue(), 192, (1 << 4) | 4)  # bsz code 1 = 192, sr code 4 = 8k
    dec, rate, _ = decode_flac(blob)
    assert rate == 8000
    assert (dec[:, 0] == 20).all() and len(dec) == 192


@pytest.mark.parametrize("rate_code", [0, 4, 9, 12, 13, 14])
def test_decoder_samplerate_code_table(rate_code):
    """Every sample-rate code parses with its exact trailing-byte
    layout — proven by the CRC-8 landing on the right byte and the
    CRC-16 covering the whole frame (decode returns the canonical
    STREAMINFO rate)."""
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write(77, 16)
    bw.align()
    dec, rate, _ = decode_flac(_craft_frame(bw.getvalue(), 192, (1 << 4) | rate_code))
    assert rate == 8000 and (dec[:, 0] == 77).all()


# --------------------------------------------- tamper + fuzz discipline


def test_crc_and_md5_tamper_detected():
    s = _stereo(2000, seed=5)
    blob = bytearray(encode_flac(s, 8000, 16, 512))
    # flip one bit inside frame payload bytes (past 4+4+34 metadata)
    blob[60] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_truncation_never_escapes_valueerror():
    s = _tone(1500, seed=6)
    blob = encode_flac(s[:, None], 8000, 16, 512)
    for cut in range(0, len(blob), 7):
        try:
            decode_flac(blob[:cut])
        except ValueError:
            pass


def test_fuzz_mutations_never_escape_valueerror():
    rng = np.random.default_rng(7)
    s = _stereo(1200, seed=7)
    base = encode_flac(s, 8000, 16, 256, use_lpc=True)
    for i in range(2000):
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
        try:
            decode_flac(bytes(blob))
        except (ValueError, NotImplementedError):
            pass
        # anything else (IndexError, struct.error, hang, segv) fails


def test_decode_budget_rejects_sample_bomb():
    # STREAMINFO claiming 2^35 samples must be rejected before allocation
    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(1 << 35, 36)
    si.align()
    streaminfo = si.getvalue() + b"\x00" * 16
    blob = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    with pytest.raises(ValueError, match="budget"):
        decode_flac(blob)


# ------------------------------------------------ multimodal dispatch


def test_multimodal_dispatch_decodes_flac():
    from outage_data_scraper_spark.operators.multimodal import (
        asset_payload,
        decode_audio,
        payload_features,
    )

    # audio ids are 3j+1; j%4 in (1,2,3) are the FLAC variants
    for i in (4, 7, 10):
        payload = asset_payload(i, "audio")
        assert payload[:4] == b"fLaC"
        feat, label = payload_features(payload, 16)
        assert label == "flac-rice" and len(feat) == 16
    # WAV/FLAC twins of the same mono PCM give bit-identical floats
    from outage_data_scraper_spark.operators.multimodal import encode_wav

    mono = _tone(1600, seed=11).astype(np.int16)
    wav_f, _ = decode_audio(encode_wav(mono, 8000))
    flac_f, _ = decode_audio(encode_flac(mono.astype(np.int32), 8000, block_size=512))
    assert wav_f.shape == flac_f.shape
    assert (wav_f == flac_f).all()
