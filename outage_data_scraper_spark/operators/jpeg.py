"""Baseline JPEG (ITU T.81 sequential DCT, 8-bit, 4:4:4) encoder and
decoder in pure numpy + stdlib — no codec library.

This closes the honest-stub gap for compressed images: the reference
pipelines treat scraped media as opaque bytes (it has no decoder at
all), while our multimodal stage (operators/multimodal.py) previously
decoded only PPM/PNG/WAV natively and fell back to a labeled fake for
JPEG. The encoder exists so synth_assets can stamp deterministic,
REAL-decodable JPEG payloads; the decoder is the product path.

Scope is honest and explicit: 8-bit Huffman JPEG — baseline sequential
(SOF0) AND progressive (SOF2, spectral selection + successive
approximation, T.81 G.2), sampling factors up to 2x2 (4:4:4 / 4:2:2 /
4:2:0), restart intervals. Arithmetic coding, hierarchical/lossless
SOFs and 12-bit precision raise NotImplementedError/ValueError, which
the per-row handlers upstream (multimodal.payload_features) catch — a
malformed or exotic payload never aborts a Spark task (O23
failure-side-output design).

DCT path is vectorized numpy over all 8x8 blocks at once (einsum with
the orthonormal DCT-II matrix); only the entropy coding is a Python
loop, which is fine because payloads are decoded inside Arrow-batched
mapInPandas stages, not per-row UDF calls.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables at the spec's example quality
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K Huffman table specs: (bits[1..16] counts, value list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _huffman_codes(bits, values):
    """Canonical Huffman: value -> (code, length), per T.81 C.2."""
    codes, code = {}, 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _huffman_lut(bits, values):
    """Decoder map: (length, code) -> value."""
    if len(values) < sum(bits):
        raise ValueError("jpeg: truncated DHT value list")
    lut, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return lut


# orthonormal 8x8 DCT-II matrix
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    T = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    T[0] *= 1 / np.sqrt(2)
    return T * 0.5


_T = _dct_matrix()


def _blockify(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a 2-D plane to 8-multiples (edge replication) and return
    (blocks[n, 8, 8], blocks_y, blocks_x)."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    by, bx = H // 8, W // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def _deblockify(blocks: np.ndarray, by: int, bx: int, h: int, w: int) -> np.ndarray:
    plane = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return plane[:h, :w]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # drop emitted bits — an unmasked acc grows monotonically and
        # turns every later shift into an O(total-bits) bigint op
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude-bits) for a signed coefficient, T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


_SAMPLING = {  # name -> (luma_h, luma_v); chroma is always 1x1
    "444": (1, 1),
    "422": (2, 1),
    "420": (2, 2),
}


def _encode_block(bw, zz, tsel, pred, ci, dc_codes, ac_codes):
    """Entropy-encode one quantized zigzag block; returns new DC pred."""
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size, bits = _magnitude(diff)
    code, length = dc_codes[tsel][size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz[1:])[0])) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[tsel][0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[tsel][(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[tsel][0x00]  # EOB
        bw.write(code, length)


def _prepare_coeffs(arr: np.ndarray, subsampling: str):
    """Color transform + subsample + MCU-grid quantized zigzag coeffs —
    shared by the baseline and progressive encoders so both emit the
    EXACT same coefficients (the bit-identical-pixels test hinges on
    it)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ncomp = arr.shape
    if ncomp == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        if subsampling not in _SAMPLING:
            raise ValueError(f"jpeg: unknown subsampling {subsampling!r}")
        lh, lv = _SAMPLING[subsampling]
        if (lh, lv) != (1, 1):
            # pad to the sampling multiple (edge), then box-mean pool
            ph = (h + lv - 1) // lv * lv
            pw = (w + lh - 1) // lh * lh
            def pool(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return p.reshape(ph // lv, lv, pw // lh, lh).mean(axis=(1, 3))
            cb, cr = pool(cb), pool(cr)
        planes = [y, cb, cr]
        samps = [(lh, lv), (1, 1), (1, 1)]

    quants = [QUANT_LUMA, QUANT_CHROMA]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per component: pad the plane to the full MCU grid, then quantized
    # zigzag coefficients on that grid (vectorized DCT)
    comp_coeffs, comp_bx = [], []
    for ci, plane in enumerate(planes):
        hi, vi = samps[ci]
        gh, gw = mcuy * vi * 8, mcux * hi * 8
        ph, pw = plane.shape
        padded = np.pad(plane, ((0, gh - ph), (0, gw - pw)), mode="edge")
        blocks, _, bx = _blockify(padded - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _T, blocks, _T)
        qz = np.round(coef / quants[min(ci, 1)]).astype(np.int32)
        comp_coeffs.append(qz.reshape(-1, 64)[:, ZIGZAG])
        comp_bx.append(bx)
    return h, w, samps, quants, mcux, mcuy, comp_coeffs, comp_bx


def _headers(h, w, samps, quants, sof_marker: bytes) -> bytearray:
    """SOI + JFIF APP0 + DQT + SOF + DHT shared by both encoders."""
    n = len(samps)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(quants[: min(n, 2)]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in q.reshape(-1)[ZIGZAG]
        )
    out += sof_marker + struct.pack(">HBHHB", 8 + 3 * n, 8, h, w, n)
    for ci in range(n):
        hi, vi = samps[ci]
        out += struct.pack("BBB", ci + 1, (hi << 4) | vi, min(ci, 1))
    for cls, tid, (bits, values) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA),
    )[: 2 if n == 1 else 4]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), (cls << 4) | tid)
        out += bytes(bits) + bytes(values)
    return out


def encode_jpeg(
    arr: np.ndarray, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode HxWx3 uint8 RGB (or HxW grayscale) as baseline JFIF with
    Annex K quant + Huffman tables. Deterministic.

    ``subsampling``: '444' (no chroma subsampling), '422' (2x1 luma,
    horizontally-halved chroma) or '420' (2x2 luma, box-mean-halved
    chroma both ways — the dominant real-world layout).
    ``restart_interval``: emit a DRI segment and RSTn markers every N
    MCUs (0 = none) — the resync structure real encoders write."""
    h, w, samps, quants, mcux, mcuy, comp_coeffs, comp_bx = _prepare_coeffs(
        arr, subsampling
    )
    planes = comp_coeffs  # one entry per component
    dc_codes = [_huffman_codes(*_DC_LUMA), _huffman_codes(*_DC_CHROMA)]
    ac_codes = [_huffman_codes(*_AC_LUMA), _huffman_codes(*_AC_CHROMA)]

    bw = _BitWriter()
    pred = [0] * len(planes)
    rst = 0
    n_mcus = mcux * mcuy
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            pred = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci in range(len(planes)):
            hi, vi = samps[ci]
            for v in range(vi):
                for u in range(hi):
                    bidx = (my * vi + v) * comp_bx[ci] + (mx * hi + u)
                    _encode_block(
                        bw, comp_coeffs[ci][bidx], min(ci, 1), pred, ci,
                        dc_codes, ac_codes,
                    )
    bw.flush()

    out = _headers(h, w, samps, [QUANT_LUMA, QUANT_CHROMA], b"\xff\xc0")
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for ci in range(len(planes)):
        out += struct.pack("BB", ci + 1, (min(ci, 1) << 4) | min(ci, 1))
    out += b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(arr: np.ndarray, subsampling: str = "444") -> bytes:
    """Progressive (SOF2) encoder over the SAME quantized coefficients
    as encode_jpeg — it exists to generate real test vectors for the
    progressive decode paths, so its scan script deliberately exercises
    all of them: interleaved DC first + refinement, per-component AC
    spectral bands, and AC successive-approximation refinement
    (T.81 G.1; EOB runs are emitted per block — EOB0 — because the
    Annex K baseline AC tables carry no EOBn>0 symbols).

    Invariant the tests pin: decode(progressive) == decode(baseline)
    BIT-IDENTICAL, since both streams carry identical coefficients."""
    h, w, samps, quants, mcux, mcuy, comp_coeffs, comp_bx = _prepare_coeffs(
        arr, subsampling
    )
    n = len(comp_coeffs)
    dc_codes = [_huffman_codes(*_DC_LUMA), _huffman_codes(*_DC_CHROMA)]
    ac_codes = [_huffman_codes(*_AC_LUMA), _huffman_codes(*_AC_CHROMA)]

    out = _headers(h, w, samps, quants, b"\xff\xc2")

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for ci in comp_ids:
            hdr += struct.pack("BB", ci + 1, (min(ci, 1) << 4) | min(ci, 1))
        return hdr + struct.pack("BBB", ss, se, (ah << 4) | al)

    def mcu_block_indices(ci):
        """Block indices of comp ci in interleaved MCU order."""
        hi, vi = samps[ci]
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for v in range(vi):
                for u in range(hi):
                    yield (my * vi + v) * comp_bx[ci] + (mx * hi + u)

    def comp_block_indices(ci):
        """Block indices in the comp's own (non-interleaved) raster."""
        hi, vi = samps[ci]
        hmax = max(s[0] for s in samps)
        vmax = max(s[1] for s in samps)
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        for r in range((ch + 7) // 8):
            for c in range((cw + 7) // 8):
                yield r * comp_bx[ci] + c

    def dc_scan(ah, al):
        bw = _BitWriter()
        pred = [0] * n
        iters = [mcu_block_indices(ci) for ci in range(n)]
        for m in range(mcux * mcuy):
            for ci in range(n):
                hi, vi = samps[ci]
                for _ in range(hi * vi):
                    bidx = next(iters[ci])
                    v = int(comp_coeffs[ci][bidx][0])
                    if ah == 0:
                        sv = v >> al  # arithmetic shift, T.81 G.1.2.1
                        diff = sv - pred[ci]
                        pred[ci] = sv
                        size, bits = _magnitude(diff)
                        code, length = dc_codes[min(ci, 1)][size]
                        bw.write(code, length)
                        if size:
                            bw.write(bits, size)
                    else:
                        bw.write((v >> al) & 1, 1)
        bw.flush()
        return sos_header(list(range(n)), 0, 0, ah, al) + bw.out

    def ac_scan(ci, ss, se, ah, al):
        bw = _BitWriter()
        acs = ac_codes[min(ci, 1)]
        eobrun = 0  # only ever 0/1: EOB0 per block (see docstring)

        def emit_eob(held):
            nonlocal eobrun
            if eobrun:
                code, length = acs[0x00]
                bw.write(code, length)
                eobrun = 0
            for b in held:
                bw.write(b, 1)
            held.clear()

        for bidx in comp_block_indices(ci):
            zz = comp_coeffs[ci][bidx]
            if ah == 0:  # first pass for this band
                run = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = abs(v) >> al
                    if t == 0:
                        run += 1
                        continue
                    emit_eob([])
                    while run > 15:
                        code, length = acs[0xF0]
                        bw.write(code, length)
                        run -= 16
                    sv = t if v >= 0 else -t
                    size, bits = _magnitude(sv)
                    code, length = acs[(run << 4) | size]
                    bw.write(code, length)
                    bw.write(bits, size)
                    run = 0
                if run > 0:
                    eobrun = 1
                    emit_eob([])
            else:  # refinement pass (T.81 G.1.2.3 / jcphuff)
                absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                eob_pos = ss - 1
                for i, t in enumerate(absv):
                    if t == 1:
                        eob_pos = ss + i
                run = 0
                held: list[int] = []
                for k in range(ss, se + 1):
                    t = absv[k - ss]
                    if t == 0:
                        run += 1
                        continue
                    # ZRLs not foldable into the trailing EOB; held
                    # correction bits follow EACH symbol (jcphuff order)
                    while run > 15 and k <= eob_pos:
                        code, length = acs[0xF0]
                        bw.write(code, length)
                        run -= 16
                        for b in held:
                            bw.write(b, 1)
                        held.clear()
                    if t > 1:
                        held.append(t & 1)  # correction bit (next mag bit)
                        continue
                    code, length = acs[(run << 4) | 1]
                    bw.write(code, length)
                    bw.write(1 if int(zz[k]) >= 0 else 0, 1)
                    for b in held:
                        bw.write(b, 1)
                    held.clear()
                    run = 0
                if run > 0 or held:
                    eobrun = 1
                    emit_eob(held)
        bw.flush()
        return sos_header([ci], ss, se, ah, al) + bw.out

    # scan script: every progressive decode path gets exercised
    out += dc_scan(0, 1)
    for ci in range(n):
        out += ac_scan(ci, 1, 5, 0, 2)
    for ci in range(n):
        out += ac_scan(ci, 6, 63, 0, 2)
    for ci in range(n):
        out += ac_scan(ci, 1, 63, 2, 1)
    for ci in range(n):
        out += ac_scan(ci, 1, 63, 1, 0)
    out += dc_scan(1, 0)
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs
    0xFF00 and stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated entropy segment")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("jpeg: unexpected marker in scan")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, lut: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            if (length, code) in lut:
                return lut[(length, code)]
        raise ValueError("jpeg: bad huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume the expected RSTn marker (T.81 E.2.4:
        pad bits discarded, markers byte-aligned in the scan)."""
        self.nbits = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("jpeg: truncated at restart marker")
        if self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("jpeg: expected restart marker")
        self.pos += 2


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _decode_scan(
    payload, entropy_start, coeffs, comps, samps, grids, mcux, mcuy,
    hmax, vmax, h, w, scan_sel, ss, se, ah, al, dc_luts, ac_luts, quant,
    restart_interval, progressive,
) -> int:
    """Decode ONE scan's entropy-coded segment into the coefficient
    grids (sequential full-band, progressive DC/AC first/refinement —
    T.81 F.2 + G.2) and return the byte offset of the next marker."""
    if not (0 <= ss <= se <= 63):
        raise ValueError("jpeg: bad spectral band")
    if progressive and ss == 0 and se != 0:
        raise ValueError("jpeg: progressive DC scan must have Se=0")
    if not progressive and (ss != 0 or se != 63 or ah != 0 or al != 0):
        raise ValueError("jpeg: sequential scan must cover the full band")
    if progressive and ss > 0 and len(scan_sel) != 1:
        raise ValueError("jpeg: progressive AC scan must be single-component")
    for (ci, dc_tid, ac_tid) in scan_sel:
        if ss == 0 and dc_tid not in dc_luts:
            raise ValueError("jpeg: scan references missing DC table")
        if se > 0 and ac_tid not in ac_luts:
            raise ValueError("jpeg: scan references missing AC table")
        if comps[ci][1] not in quant:
            raise ValueError("jpeg: component references missing quant table")

    br = _BitReader(payload, entropy_start)
    pred = [0] * len(comps)
    eobrun = 0

    def dc_first(ci, dc_tid, zz):
        size = br.decode_huffman(dc_luts[dc_tid])
        if size > 11:  # T.81 F.1.2.1.1: 8-bit DC categories are 0..11
            raise ValueError("jpeg: DC magnitude category out of range")
        diff = _extend(br.receive(size), size)
        pred[ci] += diff
        if not -(1 << 31) <= pred[ci] < (1 << 31):
            raise ValueError("jpeg: DC predictor overflow")
        zz[0] = pred[ci] << al

    def dc_refine(zz):
        if br.read_bit():
            zz[0] = int(zz[0]) | (1 << al)

    def ac_sequential(ac_tid, zz):
        k = ss if ss else 1
        while k <= se:
            rs = br.decode_huffman(ac_luts[ac_tid])
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise ValueError("jpeg: AC index overflow")
            zz[k] = _extend(br.receive(size), size)
            k += 1

    def ac_first(ac_tid, zz):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = br.decode_huffman(ac_luts[ac_tid])
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run == 15:
                    k += 16  # ZRL
                    continue
                eobrun = (1 << run) - 1
                if run:
                    eobrun += br.receive(run)
                break
            k += run
            if k > se:
                raise ValueError("jpeg: AC index beyond band")
            zz[k] = _extend(br.receive(size), size) << al
            k += 1

    def ac_refine(ac_tid, zz):
        # T.81 G.2 / libjpeg decode_mcu_AC_refine
        nonlocal eobrun
        p1, m1 = 1 << al, -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.decode_huffman(ac_luts[ac_tid])
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run != 15:
                        # NOTE: unlike ac_first, the run here INCLUDES
                        # the current block — its band tail still takes
                        # correction bits in the sweep below, then the
                        # decrement counts it (T.81 G.2 / jdphuff)
                        eobrun = 1 << run
                        if run:
                            eobrun += br.receive(run)
                        break
                    val = 0  # ZRL: skip 16 zero-history positions
                else:
                    if size != 1:
                        raise ValueError("jpeg: bad AC refinement size")
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    c = int(zz[k])
                    if c != 0:
                        if br.read_bit() and (c & p1) == 0:
                            zz[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:  # correction bits for the EOB-covered tail
                c = int(zz[k])
                if c != 0 and br.read_bit() and (c & p1) == 0:
                    zz[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1

    def decode_unit_block(ci, dc_tid, ac_tid, zz):
        if not progressive:
            dc_first(ci, dc_tid, zz)
            ac_sequential(ac_tid, zz)
        elif ss == 0:
            if ah == 0:
                dc_first(ci, dc_tid, zz)
            else:
                dc_refine(zz)
        else:
            if ah == 0:
                ac_first(ac_tid, zz)
            else:
                ac_refine(ac_tid, zz)

    if len(scan_sel) > 1:
        # interleaved MCU order
        n_units = mcux * mcuy
        for m in range(n_units):
            if restart_interval and m and m % restart_interval == 0:
                br.sync_restart()
                pred[:] = [0] * len(comps)
                eobrun = 0
            my, mx = divmod(m, mcux)
            for (ci, dc_tid, ac_tid) in scan_sel:
                hi, vi = samps[ci]
                bcx = grids[ci][1]
                for v in range(vi):
                    for u in range(hi):
                        decode_unit_block(
                            ci, dc_tid, ac_tid,
                            coeffs[ci][(my * vi + v) * bcx + (mx * hi + u)],
                        )
    else:
        # non-interleaved (single-component scan, T.81 A.2.2): data
        # units walk the component's OWN block grid, not the MCU grid
        (ci, dc_tid, ac_tid) = scan_sel[0]
        hi, vi = samps[ci]
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        cbw, cbh = (cw + 7) // 8, (ch + 7) // 8
        bcx = grids[ci][1]
        n_units = cbw * cbh
        for m in range(n_units):
            if restart_interval and m and m % restart_interval == 0:
                br.sync_restart()
                pred[:] = [0] * len(comps)
                eobrun = 0
            r, c = divmod(m, cbw)
            decode_unit_block(ci, dc_tid, ac_tid, coeffs[ci][r * bcx + c])

    # the scan's entropy data ends at the next marker (pad bits dropped)
    p = br.pos
    n = len(payload)
    while p + 1 < n and not (payload[p] == 0xFF and payload[p + 1] != 0x00):
        p += 1
    return p


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode 8-bit Huffman JPEG (baseline sequential OR progressive,
    sampling up to 2x2, restart intervals) to HxWx3 uint8 RGB. Raises
    ValueError on malformed input and NotImplementedError on
    arithmetic-coded/hierarchical/12-bit streams — both caught per row
    upstream (multimodal.payload_features)."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError) as e:  # short slice/segment in a
        raise ValueError(f"jpeg: truncated segment ({e})") from e  # corrupt stream


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    h = w = 0
    restart_interval = 0
    progressive = False
    n_scans = 0
    comps: list[tuple[int, int, int]] = []  # (id, quant_tid, sampling)
    scan_sel: list[tuple[int, int, int]] = []  # (comp_idx, dc_tid, ac_tid)
    samps: list[tuple[int, int]] = []
    grids: list[tuple[int, int]] = []
    coeffs: list[np.ndarray] = []
    mcux = mcuy = hmax = vmax = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("jpeg: truncated marker segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                if p + 65 > len(seg):
                    raise ValueError("jpeg: truncated DQT")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                quant[tid] = tbl[_UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ValueError("jpeg: truncated DHT header")
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17 : p + 17 + nvals])
                (ac_luts if cls else dc_luts)[tid] = _huffman_lut(bits, values)
                p += 17 + nvals
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if seg[0] != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            # this decode path feeds per-row feature extraction; the
            # coeff+plane buffers cost ~36 B/px, so cap well below what
            # a crafted few-hundred-byte SOF could make us allocate
            if h * w > 8_000_000:
                raise ValueError("jpeg: dimensions beyond feature-path cap")
            ncomp = seg[5]
            for ci in range(ncomp):
                cid, samp, qid = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError("jpeg: sampling factors beyond 2x2")
                comps.append((cid, qid, samp))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("jpeg: unsupported SOF variant")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("jpeg: truncated DRI")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — decode this scan's entropy data now
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("jpeg: truncated SOS header")
            scan_sel = []
            for si in range(ns):
                cid, tids = seg[1 + 2 * si], seg[2 + 2 * si]
                idx = next((i for i, c in enumerate(comps) if c[0] == cid), None)
                if idx is None:
                    raise ValueError("jpeg: SOS references unknown component")
                scan_sel.append((idx, tids >> 4, tids & 0xF))
            ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0xF
            if not comps or h == 0:
                raise ValueError("jpeg: SOS before SOF")
            if not coeffs:  # first scan: allocate the coefficient grids
                samps = [((s >> 4) & 0xF, s & 0xF) for (_, _, s) in comps]
                hmax = max(s[0] for s in samps)
                vmax = max(s[1] for s in samps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                grids = [(mcuy * vi, mcux * hi) for (hi, vi) in samps]
                coeffs = [
                    np.zeros((bcy * bcx, 64), dtype=np.int32)
                    for (bcy, bcx) in grids
                ]
            pos = _decode_scan(
                payload, pos + seglen, coeffs, comps, samps, grids,
                mcux, mcuy, hmax, vmax, h, w, scan_sel, ss, se, ah, al,
                dc_luts, ac_luts, quant, restart_interval, progressive,
            )
            n_scans += 1
            continue
        pos += seglen
    if not coeffs or n_scans == 0:
        raise ValueError("jpeg: missing SOF/SOS")

    planes = []
    for ci, (cid, qid, _) in enumerate(comps):
        hi, vi = samps[ci]
        bcy, bcx = grids[ci]
        deq = (coeffs[ci][:, _UNZIGZAG].reshape(-1, 8, 8)
               * quant[qid][None, :, :]).astype(np.float64)
        blocks = np.einsum("ji,njk,kl->nil", _T, deq, _T) + 128.0
        # component resolution, then nearest-upsample to full frame
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        plane = _deblockify(blocks, bcy, bcx, ch, cw)
        if (hi, vi) != (hmax, vmax):
            plane = np.repeat(np.repeat(plane, vmax // vi, axis=0),
                              hmax // hi, axis=1)[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bch], axis=2)), 0, 255).astype(np.uint8)


# ------------------------------------------------------- AVI container
# Minimal RIFF-AVI with an MJPG video stream: each frame is a complete
# baseline JPEG in a '00dc' chunk. This upgrades the pipeline's "video"
# kind from opaque digest bytes to a REAL container + codec path
# (reference has no media decode at all; SURVEY's multimodal surface).


def encode_avi_mjpeg(frames: list, fps: int = 10) -> bytes:
    """Pack HxWx3 uint8 frames as an MJPG AVI. Deterministic."""
    if not frames:
        raise ValueError("avi: no frames")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f) for f in frames]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(listtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", listtype + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> tuple[list, int]:
    """(frames, fps) from an MJPG AVI. Walks the RIFF tree tolerantly;
    malformed input raises ValueError (caught per-row upstream)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF-AVI payload")
    fps = 0
    frames = []

    def walk(data: bytes, depth: int = 0) -> None:
        nonlocal fps
        if depth > 16:  # RIFF nesting is ~3 deep; adversarial nesting
            raise ValueError("avi: LIST nesting too deep")  # not RecursionError
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError("avi: truncated chunk")
            if fourcc == b"LIST":
                walk(body[4:], depth + 1)
            elif fourcc == b"strh" and body[:4] == b"vids":
                if len(body) < 28:
                    raise ValueError("avi: truncated strh")
                scale, rate = struct.unpack("<II", body[20:28])
                fps = rate // scale if scale else 0
            elif fourcc[2:4] in (b"dc", b"db") and body[:2] == b"\xff\xd8":
                frames.append(decode_jpeg(body))
            pos += 8 + size + (size % 2)

    walk(payload[12:])
    if not frames:
        raise ValueError("avi: no video frames found")
    return frames, fps
