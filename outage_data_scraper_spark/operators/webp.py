"""WebP lossless (VP8L) codec in pure numpy + stdlib — no codec library.

Closes the largest remaining stub in the native web-image surface next
to PPM/PNG/JPEG/GIF (operators/multimodal.py, operators/jpeg.py,
operators/gif.py). Everything here derives from the PUBLIC WebP
lossless bitstream specification (RFC 9649); the reference repo has no
codec code at all — images there arrive through selenium screenshots,
which SURVEY.md §2 scopes out (O5).

Decoder surface (the full VP8L still-image feature set):

- LSB-first bit reading, 14-bit dimensions, version-0 streams.
- All four transforms, any combination, inverted in reverse stream
  order with per-transform width tracking (a color-indexing transform
  read mid-chain shrinks the width every LATER element sees, exactly
  as the spec's running-``xsize`` update describes):
  predictor (all 14 modes incl. Select and the ClampAddSubtract pair,
  borders per spec — top-left 0xff000000, top row forced L, left
  column forced T, top-right of the rightmost column wrapping to the
  current row's leftmost pixel via flat addressing), cross-color
  (signed int8 multiplier deltas ``(int8(t)*int8(c)) >> 5``),
  subtract-green, and color-indexing with sub-byte pixel bundling
  (8/4/2/1 pixels per green byte; out-of-range palette index decodes
  to transparent black).
- Prefix codes in both forms: simple (1–2 symbols, 1-or-8-bit first
  symbol) and normal (19-symbol code-length code in the spec's
  permuted order, 16/17/18 repeat codes, optional max_symbol token
  budget). Canonical code assignment as in DEFLATE; a normal-form
  code whose single symbol is the only nonzero length decodes at zero
  bits (the spec's trivial-code special case); multi-symbol codes must
  be exactly complete (Kraft sum 1) or the stream is rejected.
- Color cache (1..11 bits, the 0x1e35a7bd multiplicative hash),
  inserted on literal and back-reference pixels.
- Meta prefix groups: block-grid entropy image, group index
  ``(red << 8) | green``, group resolved per emitted pixel position.
- LZ77 back-references: prefix-coded lengths/distances, and the
  120-entry two-dimensional distance map for codes 1..120 (generated
  from the spec's ordering — neighborhood offsets sorted by squared
  Euclidean distance, then larger y first, then positive x before
  negative — and mirrored by the encoder, so the mapping is pinned by
  roundtrip tests), direct ``code - 120`` distances beyond.

Encoder surface (spec-compliant streams for synth assets + tests —
this is a real entropy coder, not a fixture dump): greedy LZ77 with
overlap-tolerant matches against distance candidates (run, row-above,
last-occurrence), color cache, canonical length-limited Huffman codes
(15 for the five main codes, 7 for the code-length code) with
RLE-of-code-lengths emission, the simple two-symbol form where it
fits, subtract-green / uniform cross-color / uniform-mode predictor /
palette (bundled and unbundled) transforms, and optional two-group
meta-prefix spatial splitting.

Lossy VP8 stays an HONEST stub (NotImplementedError): it is a
DCT-based predictive codec with an arithmetic bool-coder — a different
engineering project, and the labeled per-row fallback upstream
(multimodal.payload_features) handles it by design.

Error discipline matches the codec family: malformed input raises
ValueError (fuzz-asserted); a sub-KB payload cannot allocate beyond
the 32M-pixel decode budget shared with the GIF decoder.
"""

from __future__ import annotations

import heapq

import numpy as np

# ------------------------------------------------------------------ bits

_MAX_CODE_LEN = 15  # main prefix codes
_MAX_CLC_LEN = 7  # the code-length code's lengths are stored in 3 bits
_DECODE_PIXEL_BUDGET = 32_000_000  # shared with gif.py's budget
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40


class _BitReader:
    """LSB-first bit reader over the VP8L stream body."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self.data):
            raise ValueError("vp8l: truncated bitstream")
        self.pos = p + 1
        return (self.data[byte] >> (p & 7)) & 1

    def read(self, n: int) -> int:
        v = 0
        for k in range(n):
            v |= self.bit() << k
        return v


class _BitWriter:
    """LSB-first bit writer (prefix-code bits go MSB-first via write_code)."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


# ------------------------------------------------- canonical prefix codes


def _build_decode_table(lengths):
    """Canonical (DEFLATE-style) decode table from code lengths.

    Returns ("single", sym) for the trivial one-symbol code (0 bits per
    symbol), else a dict {(len, code): sym}. Multi-symbol codes must be
    exactly complete — over- or under-subscribed lengths reject the
    stream, matching libwebp's strictness."""
    nonzero = [(s, l) for s, l in enumerate(lengths) if l > 0]
    if not nonzero:
        raise ValueError("vp8l: empty prefix code")
    if len(nonzero) == 1:
        return ("single", nonzero[0][0])
    maxlen = max(l for _, l in nonzero)
    if maxlen > _MAX_CODE_LEN:
        raise ValueError("vp8l: code length overflow")
    bl_count = [0] * (maxlen + 1)
    for _, l in nonzero:
        bl_count[l] += 1
    kraft = sum(bl_count[l] << (maxlen - l) for l in range(1, maxlen + 1))
    if kraft != (1 << maxlen):
        raise ValueError("vp8l: incomplete or oversubscribed prefix code")
    next_code = [0] * (maxlen + 2)
    code = 0
    for l in range(1, maxlen + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    table = {}
    for sym, l in nonzero:  # enumerate() order == ascending symbol
        table[(l, next_code[l])] = sym
        next_code[l] += 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    if isinstance(table, tuple):  # ("single", sym): zero bits consumed
        return table[1]
    code = 0
    for l in range(1, _MAX_CODE_LEN + 1):
        code = (code << 1) | br.bit()
        sym = table.get((l, code))
        if sym is not None:
            return sym
    raise ValueError("vp8l: invalid prefix code sequence")


def _huffman_lengths(freqs: dict, limit: int) -> dict:
    """Code lengths (<= limit) for a frequency map; single symbol -> {sym: 0}."""
    syms = sorted(s for s, f in freqs.items() if f > 0)
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 0}
    heap = [(freqs[s], i, (s,)) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    tick = len(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, _, la = heapq.heappop(heap)
        fb, _, lb = heapq.heappop(heap)
        for s in la + lb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, tick, la + lb))
        tick += 1
    # length-limit fixup: clamp then restore the Kraft equality
    lens = {s: min(l, limit) for s, l in depth.items()}
    full = 1 << limit

    def kraft():
        return sum(1 << (limit - l) for l in lens.values())

    while kraft() > full:
        # lengthen the deepest non-maxed symbol (cheapest Kraft payer)
        cand = max((l, s) for s, l in lens.items() if l < limit)
        lens[cand[1]] += 1
    return lens


def _canonical_codes(lens: dict) -> dict:
    """sym -> (code, nbits) matching _build_decode_table's assignment."""
    maxlen = max(lens.values())
    bl_count = [0] * (maxlen + 1)
    for l in lens.values():
        bl_count[l] += 1
    next_code = [0] * (maxlen + 2)
    code = 0
    for l in range(1, maxlen + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym in sorted(lens):
        l = lens[sym]
        out[sym] = (next_code[l], l)
        next_code[l] += 1
    return out


# ------------------------------------------------------ prefix-coded ints


def _read_prefix_value(br: _BitReader, code: int) -> int:
    """length/distance prefix decoding: code + extra bits -> value >= 1."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode_value(value: int):
    """value >= 1 -> (code, extra_value, extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    code = 2 * extra + 2 + ((v >> extra) & 1)
    offset = (2 + (code & 1)) << extra
    return code, value - offset - 1, extra


# ------------------------------------------------------- distance mapping


def _plane_offsets():
    """The 120 near-pixel offsets for distance codes 1..120.

    Candidate window: dy in 0..7, dx in -7..8, excluding non-causal
    entries (dy == 0 and dx <= 0); ordered by squared Euclidean
    distance, then larger dy first, then positive dx before negative.
    The encoder emits codes through this same table, so roundtrip tests
    pin the ordering."""
    cands = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0, abs(p[0])))
    return cands


_PLANE_OFFSETS = _plane_offsets()
assert len(_PLANE_OFFSETS) == 120


def _plane_to_distance(plane_code: int, xsize: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _PLANE_OFFSETS[plane_code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _distance_to_plane_map(xsize: int) -> dict:
    """distance -> smallest plane code, for the encoder."""
    out = {}
    for i, (dx, dy) in enumerate(_PLANE_OFFSETS):
        dist = dy * xsize + dx
        if dist >= 1 and dist not in out:
            out[dist] = i + 1
    return out


# ----------------------------------------------------------- color cache


def _cache_index(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


# -------------------------------------------------------------- decoding


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_prefix_code(br: _BitReader, alphabet: int):
    if br.read(1):  # simple form
        nsym = br.read(1) + 1
        first8 = br.read(1)
        s0 = br.read(8 if first8 else 1)
        if nsym == 1:
            if s0 >= alphabet:
                raise ValueError("vp8l: simple-code symbol out of range")
            return ("single", s0)
        s1 = br.read(8)
        if s0 == s1 or s0 >= alphabet or s1 >= alphabet:
            raise ValueError("vp8l: bad simple code")
        # read order defines the code: first symbol = bit 0
        return {(1, 0): s0, (1, 1): s1}
    # normal form: code-length code first
    num_cl = br.read(4) + 4
    cl_lens = [0] * 19
    for i in range(num_cl):
        cl_lens[_CLC_ORDER[i]] = br.read(3)
    cl_table = _build_decode_table(cl_lens)
    if br.read(1):  # bounded token count
        length_nbits = 2 + 2 * br.read(3)
        max_tokens = 2 + br.read(length_nbits)
    else:
        max_tokens = alphabet
    lengths = [0] * alphabet
    symbol = 0
    prev_nz = 8
    while symbol < alphabet:
        if max_tokens == 0:
            break
        max_tokens -= 1
        s = _read_symbol(br, cl_table)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_nz = s
        elif s == 16:
            rep = 3 + br.read(2)
            fill = prev_nz
            for _ in range(min(rep, alphabet - symbol)):
                lengths[symbol] = fill
                symbol += 1
        else:
            rep = (3 + br.read(3)) if s == 17 else (11 + br.read(7))
            symbol = min(symbol + rep, alphabet)
    return _build_decode_table(lengths)


def _read_code_group(br: _BitReader, cache_size: int):
    green = _read_prefix_code(br, 256 + _NUM_LENGTH_CODES + cache_size)
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    dist = _read_prefix_code(br, _NUM_DISTANCE_CODES)
    return green, red, blue, alpha, dist


def _decode_image_stream(br: _BitReader, xsize: int, ysize: int, top_level: bool):
    """One VP8L image stream -> (pixel list of packed ARGB ints, transforms).

    Sub-resolution images (transform data, palette, entropy image) are
    the same stream minus transforms and meta-prefix."""
    transforms = []
    cur_w = xsize
    if top_level:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype == 2:  # subtract green
                transforms.append(("subtract_green", cur_w, None, None))
            elif ttype in (0, 1):  # predictor / cross-color
                bits = br.read(3) + 2
                sw, sh = _sub_size(cur_w, bits), _sub_size(ysize, bits)
                data, _ = _decode_image_stream(br, sw, sh, False)
                name = "predictor" if ttype == 0 else "color"
                transforms.append((name, cur_w, bits, data))
            else:  # color indexing
                ncol = br.read(8) + 1
                raw_pal, _ = _decode_image_stream(br, ncol, 1, False)
                pal = []
                prev = 0
                for p in raw_pal:  # palette entries are component deltas
                    a = ((p >> 24) + (prev >> 24)) & 0xFF
                    r = ((p >> 16) + (prev >> 16)) & 0xFF
                    g = ((p >> 8) + (prev >> 8)) & 0xFF
                    b = (p + prev) & 0xFF
                    prev = (a << 24) | (r << 16) | (g << 8) | b
                    pal.append(prev)
                wb = 3 if ncol <= 2 else 2 if ncol <= 4 else 1 if ncol <= 16 else 0
                transforms.append(("palette", cur_w, wb, pal))
                cur_w = _sub_size(cur_w, wb)  # later readers see packed width
    # meta prefix groups (top-level only)
    meta_idx, meta_bits, meta_w, num_groups = None, 0, 0, 1
    if top_level and br.read(1):
        meta_bits = br.read(3) + 2
        meta_w, meta_h = _sub_size(cur_w, meta_bits), _sub_size(ysize, meta_bits)
        meta_img, _ = _decode_image_stream(br, meta_w, meta_h, False)
        meta_idx = [(p >> 8) & 0xFFFF for p in meta_img]
        num_groups = max(meta_idx) + 1
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [_read_code_group(br, cache_size) for _ in range(num_groups)]

    npx = cur_w * ysize
    out = []
    cache = [0] * cache_size if cache_bits else None
    w = cur_w
    while len(out) < npx:
        if meta_idx is None:
            g = groups[0]
        else:
            pos = len(out)
            block = ((pos // w) >> meta_bits) * meta_w + ((pos % w) >> meta_bits)
            g = groups[meta_idx[block]]
        s = _read_symbol(br, g[0])
        if s < 256:  # literal
            r = _read_symbol(br, g[1])
            b = _read_symbol(br, g[2])
            a = _read_symbol(br, g[3])
            px = (a << 24) | (r << 16) | (s << 8) | b
            out.append(px)
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
        elif s < 256 + _NUM_LENGTH_CODES:  # LZ77 back-reference
            length = _read_prefix_value(br, s - 256)
            dcode = _read_symbol(br, g[4])
            dist = _plane_to_distance(_read_prefix_value(br, dcode), w)
            if dist > len(out) or len(out) + length > npx:
                raise ValueError("vp8l: back-reference out of range")
            for _ in range(length):
                px = out[-dist]
                out.append(px)
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
        else:  # color-cache hit
            idx = s - 256 - _NUM_LENGTH_CODES
            if cache is None or idx >= cache_size:
                raise ValueError("vp8l: cache symbol without cache")
            out.append(cache[idx])
    return out, transforms


# --------------------------------------------------- inverse transforms


def _avg2(a: int, b: int) -> int:
    return (  # per-channel (x + y) >> 1, no cross-channel carries
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) >> 1)
    )


def _select(t: int, l: int, tl: int) -> int:
    p = 0
    for sh in (24, 16, 8, 0):
        tc, lc, tlc = (t >> sh) & 0xFF, (l >> sh) & 0xFF, (tl >> sh) & 0xFF
        p += abs(lc - tlc) - abs(tc - tlc)
    return t if p <= 0 else l


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a, b = (ave >> sh) & 0xFF, (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc-toward-zero
        v = a + half
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _add_pixels(px: int, pred: int) -> int:
    return (
        (((px >> 24) + (pred >> 24)) & 0xFF) << 24
        | ((((px >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((px >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((px & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _predict(mode: int, flat, p: int, w: int) -> int:
    L, T = flat[p - 1], flat[p - w]
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return flat[p - w + 1]
    if mode == 4:
        return flat[p - w - 1]
    if mode == 5:
        return _avg2(_avg2(L, flat[p - w + 1]), T)
    if mode == 6:
        return _avg2(L, flat[p - w - 1])
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(flat[p - w - 1], T)
    if mode == 9:
        return _avg2(T, flat[p - w + 1])
    if mode == 10:
        return _avg2(_avg2(L, flat[p - w - 1]), _avg2(T, flat[p - w + 1]))
    if mode == 11:
        return _select(T, L, flat[p - w - 1])
    if mode == 12:
        return _clamp_add_sub_full(L, T, flat[p - w - 1])
    if mode == 13:
        return _clamp_add_sub_half(_avg2(L, T), flat[p - w - 1])
    raise ValueError("vp8l: bad predictor mode")


def _inv_predictor(flat, w: int, h: int, bits: int, modes) -> None:
    """In-place: residuals -> pixels, scan order. ``flat[p - w + 1]`` at
    the rightmost column wraps to the current row's first pixel — the
    spec's contiguous-memory top-right addressing."""
    mw = _sub_size(w, bits)
    for p in range(w * h):
        y, x = divmod(p, w)
        if p == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = flat[p - 1]
        elif x == 0:
            pred = flat[p - w]
        else:
            mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
            pred = _predict(mode, flat, p, w)
        flat[p] = _add_pixels(flat[p], pred)


def _ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t  # both operands are signed int8
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(flat, w: int, h: int, bits: int, elements) -> None:
    mw = _sub_size(w, bits)
    for p in range(w * h):
        y, x = divmod(p, w)
        e = elements[(y >> bits) * mw + (x >> bits)]
        g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
        px = flat[p]
        a, r, g, b = (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF
        r = (r + _ct_delta(g2r, g)) & 0xFF
        b = (b + _ct_delta(g2b, g)) & 0xFF
        b = (b + _ct_delta(r2b, r)) & 0xFF  # uses the NEW red
        flat[p] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(flat) -> None:
    for p in range(len(flat)):
        px = flat[p]
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        flat[p] = (px & 0xFF00FF00) | (r << 16) | b


def _inv_palette(flat, packed_w: int, h: int, wb: int, pal, out_w: int):
    """Unbundle sub-byte indices and map through the palette."""
    out = []
    if wb == 0:
        for p in flat:
            idx = (p >> 8) & 0xFF
            out.append(pal[idx] if idx < len(pal) else 0)
        return out
    per = 1 << wb
    width_bits = 8 >> wb
    mask = (1 << width_bits) - 1
    for y in range(h):
        row = []
        for xp in range(packed_w):
            packed = (flat[y * packed_w + xp] >> 8) & 0xFF
            for s in range(per):
                idx = (packed >> (s * width_bits)) & mask
                row.append(pal[idx] if idx < len(pal) else 0)
        out.extend(row[:out_w])
    return out


# --------------------------------------------------------- decode entry


def _decode_vp8l(data: bytes) -> np.ndarray:
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")
    if w * h > _DECODE_PIXEL_BUDGET:
        raise ValueError("vp8l: decode budget exceeded")
    flat, transforms = _decode_image_stream(br, w, h, True)
    # invert in reverse stream order; each stage restores that stage's width
    for name, t_w, bits, payload in reversed(transforms):
        if name == "palette":
            flat = _inv_palette(flat, _sub_size(t_w, bits), h, bits, payload, t_w)
        elif name == "predictor":
            _inv_predictor(flat, t_w, h, bits, payload)
        elif name == "color":
            _inv_color_transform(flat, t_w, h, bits, payload)
        else:
            _inv_subtract_green(flat)
    arr = np.asarray(flat, dtype=np.uint32).reshape(h, w)
    rgb = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=2
    ).astype(np.uint8)
    return rgb


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a WebP container to HxWx3 uint8 RGB (alpha dropped).

    VP8L (lossless) decodes natively; lossy VP8 raises
    NotImplementedError (bool-coder + DCT codec, honestly out of
    scope) — both caught per row upstream (O23 design)."""
    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    pos = 12
    saw_lossy = False
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("webp: truncated chunk")
        if fourcc == b"VP8L":
            return _decode_vp8l(body)
        if fourcc == b"VP8 ":
            saw_lossy = True
        pos += 8 + size + (size & 1)
    if saw_lossy:
        raise NotImplementedError(
            "webp: lossy VP8 requires a bool-coder/DCT codec; only VP8L "
            "(lossless) decodes natively"
        )
    raise ValueError("webp: no VP8L chunk")


# -------------------------------------------------------------- encoding


def _token_stream(pixels, w: int, cache_bits: int, use_lz77: bool):
    """Greedy LZ77 + color-cache tokenization of packed-ARGB pixels.

    Tokens: ("lit", pos, argb) | ("cache", pos, idx) |
    ("copy", pos, length, plane_code)."""
    n = len(pixels)
    dist_map = _distance_to_plane_map(w) if use_lz77 else {}
    cache = [0] * (1 << cache_bits) if cache_bits else None
    last_pos: dict = {}
    tokens = []
    i = 0
    while i < n:
        best_len, best_dist = 0, 0
        if use_lz77 and i > 0:
            cands = {1}
            if i >= w:
                cands.update((w, w - 1, w + 1))
            prev = last_pos.get(pixels[i])
            if prev is not None:
                cands.add(i - prev)
            for dist in cands:
                # direct codes top out at prefix code 39 -> value 2^20,
                # i.e. distance 2^20 - 120; farther matches are skipped
                if dist <= 0 or dist > i or dist > (1 << 20) - 120:
                    continue
                length = 0
                limit = min(n - i, 4096)
                while length < limit and pixels[i + length] == pixels[i + length - dist]:
                    length += 1
                if length > best_len:
                    best_len, best_dist = length, dist
        if best_len >= 4:
            plane = dist_map.get(best_dist, best_dist + 120)
            tokens.append(("copy", i, best_len, plane))
            for k in range(best_len):
                px = pixels[i + k]
                last_pos[px] = i + k
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
            i += best_len
            continue
        px = pixels[i]
        if cache is not None and cache[_cache_index(px, cache_bits)] == px:
            tokens.append(("cache", i, _cache_index(px, cache_bits)))
        else:
            tokens.append(("lit", i, px))
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
        last_pos[px] = i
        i += 1
    return tokens


def _write_prefix_code(bw: _BitWriter, lens: dict, alphabet: int):
    """Write one prefix code (simple form where it fits, else normal
    form with RLE'd code lengths) and return sym -> (code, nbits)."""
    syms = sorted(lens)
    if len(syms) == 1 and syms[0] <= 255:
        s0 = syms[0]
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        return {s0: (0, 0)}
    if len(syms) == 2 and syms[1] <= 255:
        s0, s1 = syms
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    # normal form
    bw.write(0, 1)
    lengths = [0] * alphabet
    for s, l in lens.items():
        lengths[s] = max(l, 1) if len(syms) == 1 else l
    # RLE tokens over the full alphabet (trailing zeros spelled out, so
    # the decoder's unbounded token loop terminates exactly at alphabet)
    tokens = []
    i = 0
    while i < alphabet:
        l = lengths[i]
        if l == 0:
            j = i
            while j < alphabet and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                c = min(run, 138)
                tokens.append((18, c - 11, 7))
                run -= c
            if run >= 3:
                tokens.append((17, run - 3, 3))
                run = 0
            tokens.extend((0, 0, 0) for _ in range(run))
            i = j
        else:
            tokens.append((l, 0, 0))
            i += 1
            run = 0
            while i < alphabet and lengths[i] == l:
                run += 1
                i += 1
            while run >= 3:
                c = min(run, 6)
                tokens.append((16, c - 3, 2))
                run -= c
            tokens.extend((l, 0, 0) for _ in range(run))
    freqs: dict = {}
    for s, _, _ in tokens:
        freqs[s] = freqs.get(s, 0) + 1
    cl_lens = _huffman_lengths(freqs, _MAX_CLC_LEN)
    stored = {s: (l if l else 1) for s, l in cl_lens.items()}  # 0-bit trivial
    num_cl = max(
        (i + 1 for i, s in enumerate(_CLC_ORDER) if stored.get(s)), default=4
    )
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(stored.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol bound: tokens cover the whole alphabet
    if len(cl_lens) == 1:
        cl_codes = {next(iter(cl_lens)): (0, 0)}
    else:
        cl_codes = _canonical_codes(cl_lens)
    for s, ev, eb in tokens:
        code, nb = cl_codes[s]
        bw.write_code(code, nb)
        if eb:
            bw.write(ev, eb)
    return _canonical_codes(lens) if len(syms) > 1 else {syms[0]: (0, 0)}


def _write_code_group(bw: _BitWriter, tokens, cache_bits: int):
    """Histogram + write the 5 prefix codes for one token group; return
    the per-channel encode tables."""
    hist = [dict() for _ in range(5)]

    def bump(i, s):
        hist[i][s] = hist[i].get(s, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            px = t[2]
            bump(0, (px >> 8) & 0xFF)
            bump(1, (px >> 16) & 0xFF)
            bump(2, px & 0xFF)
            bump(3, (px >> 24) & 0xFF)
        elif t[0] == "cache":
            bump(0, 256 + _NUM_LENGTH_CODES + t[2])
        else:
            code, _, _ = _prefix_encode_value(t[2])
            bump(0, 256 + code)
            dcode, _, _ = _prefix_encode_value(t[3])
            bump(4, dcode)
    cache_size = (1 << cache_bits) if cache_bits else 0
    alphabets = (256 + _NUM_LENGTH_CODES + cache_size, 256, 256, 256, _NUM_DISTANCE_CODES)
    tables = []
    for i, alphabet in enumerate(alphabets):
        if not hist[i]:
            hist[i] = {0: 1}  # unused channel: 1-symbol placeholder code
        lens = _huffman_lengths(hist[i], _MAX_CODE_LEN)
        tables.append(_write_prefix_code(bw, lens, alphabet))
    return tables


def _write_tokens(bw: _BitWriter, tokens, tables_of, group_of):
    for t in tokens:
        g = tables_of[group_of(t[1])]
        if t[0] == "lit":
            px = t[2]
            for chan, val in (
                (0, (px >> 8) & 0xFF),
                (1, (px >> 16) & 0xFF),
                (2, px & 0xFF),
                (3, (px >> 24) & 0xFF),
            ):
                code, nb = g[chan][val]
                bw.write_code(code, nb)
        elif t[0] == "cache":
            code, nb = g[0][256 + _NUM_LENGTH_CODES + t[2]]
            bw.write_code(code, nb)
        else:
            lcode, lev, leb = _prefix_encode_value(t[2])
            code, nb = g[0][256 + lcode]
            bw.write_code(code, nb)
            if leb:
                bw.write(lev, leb)
            dcode, dev, deb = _prefix_encode_value(t[3])
            code, nb = g[4][dcode]
            bw.write_code(code, nb)
            if deb:
                bw.write(dev, deb)


def _write_image_stream(
    bw, pixels, w, h, *, cache_bits=0, use_lz77=True, meta_bits=0, top_level=True
):
    """Meta-prefix bit (+ optional two-group split), cache bit, code
    groups, tokens — the shared tail for main and sub-images. Only
    top-level streams carry the meta-prefix bit (the decoder does not
    read one for sub-resolution images)."""
    meta_w = _sub_size(w, meta_bits) if meta_bits else 0
    if top_level and meta_bits and meta_w >= 2:
        bw.write(1, 1)
        bw.write(meta_bits - 2, 3)
        half = meta_w // 2
        meta_h = _sub_size(h, meta_bits)
        meta_px = [
            (0xFF << 24) | ((1 if bx >= half else 0) << 8)
            for _by in range(meta_h)
            for bx in range(meta_w)
        ]
        _write_image_stream(bw, meta_px, meta_w, meta_h, use_lz77=False, top_level=False)

        def group_of(pos):
            return 1 if ((pos % w) >> meta_bits) >= half else 0

        ngroups = 2
    else:
        if top_level:
            bw.write(0, 1)

        def group_of(pos):
            return 0

        ngroups = 1
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    tokens = _token_stream(pixels, w, cache_bits, use_lz77)
    grouped = [[t for t in tokens if group_of(t[1]) == g] for g in range(ngroups)]
    tables_of = [_write_code_group(bw, grouped[g], cache_bits) for g in range(ngroups)]
    _write_tokens(bw, tokens, tables_of, group_of)


def _write_sub_image(bw, pixels, w, h):
    """Transform/palette/entropy sub-image: no meta-prefix allowed, but
    the stream still carries its own cache bit (0 here)."""
    _write_image_stream(bw, pixels, w, h, use_lz77=(len(pixels) > 16), top_level=False)


def _forward_predictor(flat, w, h, bits, mode):
    """residual = pixel - predict(final neighbors); scan order safe
    because prediction only reads already-final earlier pixels."""
    out = list(flat)
    for p in range(w * h - 1, -1, -1):
        y, x = divmod(p, w)
        if p == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = flat[p - 1]
        elif x == 0:
            pred = flat[p - w]
        else:
            pred = _predict(mode, flat, p, w)
        out[p] = (
            (((flat[p] >> 24) - (pred >> 24)) & 0xFF) << 24
            | ((((flat[p] >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16
            | ((((flat[p] >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8
            | (((flat[p] & 0xFF) - (pred & 0xFF)) & 0xFF)
        )
    return out


def encode_webp(
    img: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple | None = None,
    palette: bool = False,
    cache_bits: int = 5,
    use_lz77: bool = True,
    meta_split: bool = False,
) -> bytes:
    """Encode HxWx3 uint8 RGB as lossless WebP (VP8L).

    Transform order on the wire is subtract-green, cross-color,
    predictor (decoder inverts in reverse); ``palette`` is exclusive
    with the pixel transforms (the libwebp encoder makes the same
    either/or choice). ``predictor_mode``/``color_transform`` apply one
    uniform element over a 16px block grid — spec-complete streams that
    pin the decoder's block math without a rate-distortion search."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = [
        (0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for r, g, b in img.reshape(-1, 3)
    ]
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    cur_w = w
    if palette:
        colors = sorted(set(flat))
        if len(colors) > 256:
            raise ValueError("vp8l: palette mode needs <=256 colors")
        ncol = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)  # color-indexing transform
        bw.write(ncol - 1, 8)
        deltas, prev = [], 0
        for c in colors:
            deltas.append(
                ((((c >> 24) - (prev >> 24)) & 0xFF) << 24)
                | ((((c >> 16) - ((prev >> 16) & 0xFF)) & 0xFF) << 16)
                | ((((c >> 8) - ((prev >> 8) & 0xFF)) & 0xFF) << 8)
                | (((c - (prev & 0xFF)) & 0xFF))
            )
            prev = c
        _write_sub_image(bw, deltas, ncol, 1)
        index_of = {c: i for i, c in enumerate(colors)}
        wb = 3 if ncol <= 2 else 2 if ncol <= 4 else 1 if ncol <= 16 else 0
        if wb == 0:
            flat = [(0xFF << 24) | (index_of[c] << 8) for c in flat]
        else:
            per = 1 << wb
            width_bits = 8 >> wb
            packed_w = _sub_size(w, wb)
            packed = []
            for y in range(h):
                row = flat[y * w : (y + 1) * w]
                for xp in range(packed_w):
                    val = 0
                    for s in range(per):
                        x = xp * per + s
                        if x < w:
                            val |= index_of[row[x]] << (s * width_bits)
                    packed.append((0xFF << 24) | (val << 8))
            flat = packed
            cur_w = packed_w
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            flat = [
                (px & 0xFF00FF00)
                | (((px >> 16) - (px >> 8) & 0xFF) & 0xFF) << 16
                | (((px & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF)
                for px in flat
            ]
        if color_transform is not None:
            g2r, g2b, r2b = (v & 0xFF for v in color_transform)
            bw.write(1, 1)
            bw.write(1, 2)
            bits = 4
            bw.write(bits - 2, 3)
            sw, sh = _sub_size(cur_w, bits), _sub_size(h, bits)
            elem = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
            _write_sub_image(bw, [elem] * (sw * sh), sw, sh)
            out = []
            for px in flat:
                a, r, g, b = (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF
                nr = (r - _ct_delta(g2r, g)) & 0xFF
                nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
                out.append((a << 24) | (nr << 16) | (g << 8) | nb)
            flat = out
        if predictor_mode is not None:
            bw.write(1, 1)
            bw.write(0, 2)
            bits = 4
            bw.write(bits - 2, 3)
            sw, sh = _sub_size(cur_w, bits), _sub_size(h, bits)
            mode_px = (0xFF << 24) | ((predictor_mode & 0xFF) << 8)
            _write_sub_image(bw, [mode_px] * (sw * sh), sw, sh)
            flat = _forward_predictor(flat, cur_w, h, bits, predictor_mode)
    bw.write(0, 1)  # end of transforms
    _write_image_stream(
        bw,
        flat,
        cur_w,
        h,
        cache_bits=cache_bits,
        use_lz77=use_lz77,
        meta_bits=3 if meta_split else 0,
    )
    body = b"\x2f" + bw.finish()
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
