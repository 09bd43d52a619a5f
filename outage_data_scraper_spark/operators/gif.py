"""GIF87a/89a codec in pure numpy + stdlib — no codec library.

Completes the native web-image surface next to PPM/PNG/JPEG
(operators/multimodal.py, operators/jpeg.py): variable-width LZW
decompression, global/local palettes, the 4-pass interlace layout, and
multi-frame animations (frames composited left/top onto the logical
screen — the overlay semantics browsers apply for disposal 0/1; other
disposal modes degrade to overlay, documented, never wrong-shaped).
The Graphic Control Extension's transparency index IS honored: marked
pixels show the prior canvas through instead of an opaque palette color.

The encoder exists to generate deterministic test vectors and synth
assets (standard table-building LZW with width growth and code-12
clears). Error discipline matches the rest of the codec family: every
malformed input raises ValueError, which the per-row handlers upstream
catch (O23 failure-side-output design) — fuzz-asserted in tests.
"""

from __future__ import annotations

import struct

import numpy as np


# ----------------------------------------------------------------- LZW

def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """Variable-width GIF-LZW decode of a concatenated sub-block
    payload. Stops at the end code or when max_pixels are produced."""
    if not (2 <= min_code_size <= 8):
        raise ValueError("gif: bad LZW minimum code size")
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # dictionary: list of bytes
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("gif: first LZW code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("gif: LZW code out of range")
            out += entry
            if len(out) > max_pixels:
                raise ValueError("gif: LZW output exceeds frame size")
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Standard GIF-LZW encode (table build, width growth, clear at
    4096). Deterministic."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


# --------------------------------------------------------------- decode

def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-block chain")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("gif: truncated sub-block")
        chunks.append(payload[pos : pos + size])
        pos += size


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> list[np.ndarray]:
    """Frames of a GIF as HxWx3 uint8 canvases (logical screen size;
    each frame overlaid on the previous canvas at its left/top),
    optionally stopping after ``max_frames``. Raises ValueError on
    malformed input. Decode budget: a sub-KB payload can DECLARE a huge
    screen x many frames, so total decoded pixels are capped — the
    per-row feature path must never allocate GBs from crafted bytes
    (same discipline as the JPEG dimension cap)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(payload) < 13:
        raise ValueError("gif: truncated header")
    w, h = struct.unpack("<HH", payload[6:10])
    packed, bg, _aspect = payload[10], payload[11], payload[12]
    if w == 0 or h == 0 or w * h > 4_000_000:
        raise ValueError("gif: unreasonable dimensions")
    budget = 32_000_000  # total decoded pixels across all frames
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("gif: truncated global color table")
        global_pal = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None and bg < len(global_pal):
        canvas[:] = global_pal[bg]
    frames: list[np.ndarray] = []
    transp: int | None = None  # GCE transparent index for the next image
    n_bytes = len(payload)
    while pos < n_bytes:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n_bytes:
                raise ValueError("gif: truncated extension")
            label = payload[pos]
            pos += 1
            ext_data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(ext_data) >= 4 and (ext_data[0] & 0x01):
                # Graphic Control Extension transparency: pixels of the
                # NEXT image equal to this index show through to the
                # prior canvas instead of compositing the palette color
                transp = ext_data[3]
        elif block == 0x2C:  # image descriptor
            if pos + 9 > n_bytes:
                raise ValueError("gif: truncated image descriptor")
            left, top, fw, fh = struct.unpack("<HHHH", payload[pos : pos + 8])
            fpacked = payload[pos + 8]
            pos += 9
            pal = global_pal
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                if pos + 3 * n > n_bytes:
                    raise ValueError("gif: truncated local color table")
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("gif: frame without color table")
            if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
                raise ValueError("gif: frame outside logical screen")
            if pos >= n_bytes:
                raise ValueError("gif: missing LZW code size")
            mcs = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            idx = _lzw_decode(data, mcs, fw * fh)
            if len(idx) < fw * fh:
                raise ValueError("gif: LZW output short of frame size")
            rows = np.frombuffer(bytes(idx[: fw * fh]), dtype=np.uint8).reshape(
                fh, fw
            )
            if fpacked & 0x40:
                rows = _deinterlace(rows)
            opaque = rows if transp is None else rows[rows != transp]
            if opaque.size and int(opaque.max()) >= len(pal):
                raise ValueError("gif: pixel index outside palette")
            budget -= w * h
            if budget < 0:
                raise ValueError("gif: decode budget exceeded")
            canvas = canvas.copy()
            region = canvas[top : top + fh, left : left + fw]
            if transp is None:
                region[:] = pal[rows]
            else:
                # transparent index may legally sit outside the palette
                # (only opaque pixels were range-checked): clip for the
                # lookup, then restore the see-through pixels
                patch = pal[np.minimum(rows, len(pal) - 1)]
                keep = rows == transp
                patch[keep] = region[keep]
                region[:] = patch
            transp = None  # a GCE governs exactly one following image
            frames.append(canvas)
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("gif: no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF as HxWx3 uint8 RGB (decode stops there)."""
    return decode_gif_frames(payload, max_frames=1)[0]


# --------------------------------------------------------------- encode

# level centers: (level + 0.5) * 256 / n_levels, clamped into uint8
_CUBE_PAL = np.stack(
    [
        (np.arange(252) // 42) * 43 + 21,
        ((np.arange(252) // 6) % 7) * 36 + 18,
        (np.arange(252) % 6) * 43 + 21,
    ],
    axis=1,
).astype(np.uint8)


def _cube_index(flat: np.ndarray) -> np.ndarray:
    """Fixed 6/7/6-level cube index per RGB pixel (the >256-color
    fallback palette)."""
    r = (flat[:, 0].astype(np.int32) * 6) // 256
    g = (flat[:, 1].astype(np.int32) * 7) // 256
    b = (flat[:, 2].astype(np.int32) * 6) // 256
    return (r * 42 + g * 6 + b).astype(np.uint8)


def encode_gif(
    frames: list | np.ndarray, interlace: bool = False
) -> bytes:
    """Encode one HxWx3 frame (or a list of equally-sized frames, as a
    GIF89a animation) with a shared exact/quantized palette.
    Deterministic."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("gif: no frames")
    h, w = frames[0].shape[:2]
    allpx = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors = np.unique(allpx, axis=0)
    exact = len(colors) <= 256
    pal = colors if exact else _CUBE_PAL
    # palette table sized to a power of two
    bits = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    lut = {tuple(c): i for i, c in enumerate(pal)} if exact else None

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += table.tobytes()
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("gif: frames must share dimensions")
        fl = f.reshape(-1, 3)
        if exact:
            # vectorized: dict lookups only per DISTINCT frame color
            fcolors, inv = np.unique(fl, axis=0, return_inverse=True)
            fidx = np.array([lut[tuple(c)] for c in fcolors], dtype=np.uint8)
            idx = fidx[inv]
        else:
            idx = _cube_index(fl)
        rows = idx.reshape(h, w)
        if interlace:
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, h, step))
            rows = rows[order]
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00])
        mcs = max(2, bits)
        out += bytes([mcs])
        data = _lzw_encode(rows.tobytes(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
