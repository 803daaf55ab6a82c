"""WebP lossless (VP8L) decoder + minimal encoder, pure numpy.

Built from the public WebP Lossless Bitstream Specification (RFC 9649)
— no codec library. Scope:

- decode: full VP8L feature set — simple and full (code-length-coded)
  canonical prefix codes, meta prefix images, color cache, LZ77
  backward references with the 120-entry 2D distance map, and all
  four transforms (predictor, color, subtract-green, color-indexing
  incl. sub-byte pixel bundling), applied in reverse order.
- encode: the subset the tests need to prove the decoder against
  round-trips — literal-only coding (no LZ77/cache) with simple or
  full prefix codes, optional subtract-green and fixed-mode predictor
  transforms. Output is a valid minimal RIFF/WEBP/VP8L file.

Lossy VP8 and animation stay with multimodal.py's labeled fallback:
they require an inter-frame DCT codec, out of scope for a
training-data pipeline's metadata/feature path.

Reference behavior parity: dburkart/fossil has no image decoding at
all; this exists for the LLM-pipeline multimodal brief (SURVEY §2
E11), same standing as operators/jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are stored (RFC 9649 §5.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2D distance map: the first 120 distance codes address near pixels as
# (dx, dy) offsets in scan order (RFC 9649 §5.2.3)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (3, 8),
    (-3, 8), (8, 5), (4, 8), (-4, 8), (6, 7), (-6, 7), (7, 6), (-7, 6),
]


class BitReader:
    """LSB-first bit reader over bytes (VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return v


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are emitted MSB-first (deflate convention)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# --- canonical prefix codes ------------------------------------------------

class PrefixCode:
    """Canonical prefix code from symbol code lengths; decoded bit by
    bit MSB-first (codes assigned as in DEFLATE)."""

    def __init__(self, lengths: list[int]):
        self.table: dict[tuple[int, int], int] = {}
        self.single: int | None = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][1]  # 0-bit code: always that symbol
            return
        max_len = max((l for l, _ in nz), default=0)
        bl_count = [0] * (max_len + 1)
        for l, _ in nz:
            bl_count[l] += 1
        code = 0
        next_code = [0] * (max_len + 2)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        for l, s in sorted(nz):
            self.table[(l, next_code[l])] = s
            next_code[l] += 1

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("invalid prefix code")


def _code_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Huffman code lengths via pairing; depth-limited by flattening
    (fixtures are tiny, depth never realistically exceeds max_len)."""
    import heapq

    syms = [i for i, f in enumerate(freqs) if f > 0]
    if not syms:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[syms[0]] = 1
        return out
    heap = [(freqs[s], s, None) for s in syms]
    heapq.heapify(heap)
    nodes: list[tuple] = []
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        node = (a[0] + b[0], len(nodes) + len(freqs), (a, b))
        nodes.append(node)
        heapq.heappush(heap, node)
    out = [0] * len(freqs)

    def walk(node, depth):
        if node[2] is None:
            out[node[1]] = max(depth, 1)
        else:
            walk(node[2][0], depth + 1)
            walk(node[2][1], depth + 1)

    walk(heap[0], 0)
    if max(out) > max_len:
        raise ValueError("code too deep for minimal encoder")
    return out


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    nz = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in nz:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


# --- decoding --------------------------------------------------------------

def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1
            pc = PrefixCode(lengths)
            pc.single = sym0  # 0-bit read
            return pc
        sym1 = br.read(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return PrefixCode(lengths)
    # full code: code-length code first
    num_clc = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = PrefixCode(clc_lengths)
    # max_symbol cap
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = clc.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return PrefixCode(lengths)


def _prefix_value(code: int, br: BitReader) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


class _CodeGroup:
    __slots__ = ("g", "r", "b", "a", "d")

    def __init__(self, br: BitReader, cache_size: int):
        self.g = _read_prefix_code(br, 256 + 24 + cache_size)
        self.r = _read_prefix_code(br, 256)
        self.b = _read_prefix_code(br, 256)
        self.a = _read_prefix_code(br, 256)
        self.d = _read_prefix_code(br, 40)


def _decode_entropy_image(br: BitReader, w: int, h: int,
                          allow_meta: bool) -> np.ndarray:
    """Decode one spatially-coded image (the core of VP8L): returns
    HxWx4 uint8 ARGB-channel-order array [a, r, g, b]."""
    meta_codes = None
    meta_bits = 0
    if allow_meta and br.read(1):  # meta prefix image present
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta_codes = (meta_img[:, :, 1].astype(np.int32) << 8) | meta_img[
            :, :, 2
        ].astype(np.int32)
        n_groups = int(meta_codes.max()) + 1
    else:
        n_groups = 1

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    groups = [_CodeGroup(br, cache_size) for _ in range(n_groups)]

    out = np.zeros((h, w, 4), dtype=np.uint8)  # a, r, g, b
    pos = 0
    total = w * h
    flat = out.reshape(-1, 4)

    def cache_insert(px):
        if cache_bits:
            argb = (int(px[0]) << 24) | (int(px[1]) << 16) | (int(px[2]) << 8) | int(px[3])
            cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while pos < total:
        if meta_codes is not None:
            y, x = divmod(pos, w)
            grp = groups[int(meta_codes[y >> meta_bits, x >> meta_bits])]
        else:
            grp = groups[0]
        s = grp.g.decode(br)
        if s < 256:  # literal: green, then r, b, a
            g = s
            r = grp.r.decode(br)
            b = grp.b.decode(br)
            a = grp.a.decode(br)
            flat[pos] = (a, r, g, b)
            cache_insert(flat[pos])
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(grp.d.decode(br), br)
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            for _ in range(length):
                if pos >= total:
                    break
                flat[pos] = flat[pos - dist]
                cache_insert(flat[pos])
                pos += 1
        else:  # color cache hit
            argb = cache[s - 256 - 24]
            flat[pos] = (
                (argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF, argb & 0xFF,
            )
            pos += 1
    return out


def _avg2(a, b):
    return ((a.astype(np.int32) + b.astype(np.int32)) // 2).astype(np.int32)


def _apply_inverse_predictor(img: np.ndarray, pred_img: np.ndarray,
                             bits: int) -> None:
    """In-place inverse predictor transform (RFC 9649 §4.2.2). Pixel
    (0,0) uses mode 0 (black), the rest of row 0 uses L, the rest of
    column 0 uses T. Neighbors are addressed in raster order, so the
    top-right of the rightmost column wraps to the current row's
    first pixel (linear index pos - w + 1), which is already decoded."""
    h, w, _ = img.shape
    imgi = img.astype(np.int32)
    flat = imgi.reshape(-1, 4)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = imgi[0, x - 1]
            elif x == 0:
                pred = imgi[y - 1, 0]
            else:
                mode = int(pred_img[y >> bits, x >> bits, 2])
                pos = y * w + x
                L = imgi[y, x - 1]
                T = imgi[y - 1, x]
                TL = imgi[y - 1, x - 1]
                TR = flat[pos - w + 1]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:  # Select
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:  # ClampAddSubtractHalf
                    ave = _avg2(L, T)
                    pred = np.clip(ave + (ave - TL) // 2, 0, 255)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            imgi[y, x] = (imgi[y, x] + pred) & 0xFF
    img[:] = imgi.astype(np.uint8)


def _apply_inverse_color_transform(img: np.ndarray, cte_img: np.ndarray,
                                   bits: int) -> None:
    """Inverse color transform (RFC 9649 §4.2.3). ColorTransformElement
    channels: blue holds green_to_red, green holds green_to_blue, red
    holds red_to_blue; deltas are signed 3.5 fixed point."""
    h, w, _ = img.shape

    def s8(v):
        return v - 256 if v >= 128 else v

    for y in range(h):
        for x in range(w):
            cte = cte_img[y >> bits, x >> bits]
            g2r, g2b, r2b = s8(int(cte[3])), s8(int(cte[2])), s8(int(cte[1]))
            a, r, g, b = (int(v) for v in img[y, x])
            sg = g - 256 if g >= 128 else g
            r = (r + ((g2r * sg) >> 5)) & 0xFF
            sr = r - 256 if r >= 128 else r
            b = (b + ((g2b * sg) >> 5)) & 0xFF
            b = (b + ((r2b * sr) >> 5)) & 0xFF
            img[y, x] = (a, r, g, b)


def decode_vp8l(data: bytes) -> tuple[int, int, bool, np.ndarray]:
    """Decode a raw VP8L chunk payload. Returns (width, height,
    has_alpha_hint, RGBA uint8 array HxWx4)."""
    br = BitReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = bool(br.read(1))
    if br.read(3) != 0:
        raise ValueError("bad VP8L version")

    # transforms, in stream order; applied inverse in reverse order
    transforms: list[tuple] = []
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            pw = (xsize + (1 << bits) - 1) >> bits
            ph = (h + (1 << bits) - 1) >> bits
            pred_img = _decode_entropy_image(br, pw, ph, False)
            transforms.append(("pred", bits, pred_img))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            pw = (xsize + (1 << bits) - 1) >> bits
            ph = (h + (1 << bits) - 1) >> bits
            cte_img = _decode_entropy_image(br, pw, ph, False)
            transforms.append(("color", bits, cte_img))
        elif ttype == 2:  # subtract green
            transforms.append(("subgreen",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are delta-coded left to right
            pal = pal_img[0].astype(np.int32)
            for i in range(1, n_colors):
                pal[i] = (pal[i] + pal[i - 1]) & 0xFF
            if n_colors <= 2:
                wbits = 3
            elif n_colors <= 4:
                wbits = 2
            elif n_colors <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append(("palette", n_colors, pal.astype(np.uint8), wbits))
            if wbits:
                xsize = (xsize + (1 << wbits) - 1) >> wbits

    img = _decode_entropy_image(br, xsize, h, True)

    for t in reversed(transforms):
        if t[0] == "palette":
            _, n_colors, pal, wbits = t
            if wbits:
                pix_per_byte = 1 << wbits
                bpp = 8 >> wbits  # bits per pixel index
                full = np.zeros((h, w, 4), dtype=np.uint8)
                for y in range(h):
                    for x in range(w):
                        packed = int(img[y, x >> wbits, 2])  # green channel
                        idx = (packed >> ((x % pix_per_byte) * bpp)) & (
                            (1 << bpp) - 1
                        )
                        full[y, x] = pal[idx] if idx < n_colors else 0
                img = full
            else:
                full = np.zeros((h, w, 4), dtype=np.uint8)
                for y in range(h):
                    for x in range(w):
                        idx = int(img[y, x, 2])
                        full[y, x] = pal[idx] if idx < n_colors else 0
                img = full
        elif t[0] == "subgreen":
            g = img[:, :, 2].astype(np.int32)
            img[:, :, 1] = ((img[:, :, 1].astype(np.int32) + g) & 0xFF).astype(np.uint8)
            img[:, :, 3] = ((img[:, :, 3].astype(np.int32) + g) & 0xFF).astype(np.uint8)
        elif t[0] == "color":
            _apply_inverse_color_transform(img, t[2], t[1])
        elif t[0] == "pred":
            _apply_inverse_predictor(img, t[2], t[1])

    rgba = img[:, :, [1, 2, 3, 0]]  # a,r,g,b -> r,g,b,a
    return w, h, alpha_hint, np.ascontiguousarray(rgba)


def decode_webp(data: bytes) -> tuple[int, int, bool, np.ndarray]:
    """Parse the RIFF container and decode a VP8L (lossless) payload.
    Raises ValueError for lossy VP8 / animation (codec required)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP file")
    off = 12
    while off + 8 <= len(data):
        fourcc = data[off:off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        payload = data[off + 8:off + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(payload)
        if fourcc == b"VP8 ":
            raise ValueError("lossy VP8 requires a codec library")
        off += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk found")


def webp_meta(data: bytes) -> tuple[int, int, str]:
    """(width, height, kind) for ANY WEBP flavor — real header
    dimensions even when the pixels need a codec. kind in
    {'lossless', 'lossy', 'extended'}. Sources: VP8L 14-bit header
    dims (RFC 9649 §3), the VP8 keyframe tag (RFC 6386 §9.1 — the
    dims live in the UNCOMPRESSED part of the frame header), or the
    VP8X canvas field (24-bit minus-one)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP file")
    off = 12
    while off + 8 <= len(data):
        fourcc = data[off:off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        payload = data[off + 8:off + 8 + size]
        if fourcc == b"VP8L" and len(payload) >= 5:
            if payload[0] != 0x2F:
                raise ValueError("bad VP8L signature")
            bits = int.from_bytes(payload[1:5], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return w, h, "lossless"
        if fourcc == b"VP8 " and len(payload) >= 10:
            if payload[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 keyframe start code")
            w = struct.unpack_from("<H", payload, 6)[0] & 0x3FFF
            h = struct.unpack_from("<H", payload, 8)[0] & 0x3FFF
            return w, h, "lossy"
        if fourcc == b"VP8X" and len(payload) >= 10:
            w = int.from_bytes(payload[4:7], "little") + 1
            h = int.from_bytes(payload[7:10], "little") + 1
            return w, h, "extended"
        off += 8 + size + (size & 1)
    raise ValueError("no image chunk found")


# --- minimal encoder (tests' ground truth) ---------------------------------

def _write_prefix_code(bw: BitWriter, lengths: list[int]) -> dict:
    """Emit a prefix code; returns symbol->(code,len) for payload use."""
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if len(nz) == 1 and nz[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if nz[0] < 2:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        return {nz[0]: (0, 0)}
    if len(nz) == 2 and nz[0] < 2 and nz[1] < 256:
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        bw.write(0, 1)  # first symbol in 1 bit
        bw.write(nz[0], 1)
        bw.write(nz[1], 8)
        return {nz[0]: (0, 1), nz[1]: (1, 1)}
    # full code via the code-length code, no RLE (every length literal)
    bw.write(0, 1)
    used = sorted(set(lengths[s] for s in range(len(lengths))))
    clc_freq = [0] * 19
    for l in lengths:
        clc_freq[l] += 1
    clc_lengths = _code_lengths(clc_freq, max_len=7)
    # num_code_lengths must cover every order position we need
    need = max(
        (i for i, sym in enumerate(_CLC_ORDER) if clc_lengths[sym] > 0),
        default=0,
    ) + 1
    num_clc = max(need, 4)
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol cap
    clc_codes = _canonical_codes(clc_lengths)
    for l in lengths:
        code, ln = clc_codes[l]
        bw.write_code(code, ln)
    return _canonical_codes(lengths)


def encode_vp8l(
    rgba: np.ndarray,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
) -> bytes:
    """Encode an RGBA array as a literal-only VP8L stream (no LZ77, no
    cache, no meta codes), optionally with subtract-green and/or a
    single fixed-mode predictor transform — enough surface to prove
    the decoder's transform + prefix-code paths by round-trip."""
    h, w, _ = rgba.shape
    img = rgba[:, :, [3, 0, 1, 2]].astype(np.int32)  # -> a, r, g, b

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (rgba[:, :, 3] != 255).any() else 0, 1)
    bw.write(0, 3)

    if predictor_mode is not None:
        # residuals in scan order, matching the decoder's special cases
        res = img.copy()
        imgi = img
        for y in range(h - 1, -1, -1):
            for x in range(w - 1, -1, -1):
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int32)
                elif y == 0:
                    pred = imgi[0, x - 1]
                elif x == 0:
                    pred = imgi[y - 1, 0]
                else:
                    pos = y * w + x
                    L = imgi[y, x - 1]
                    T = imgi[y - 1, x]
                    TL = imgi[y - 1, x - 1]
                    TR = imgi.reshape(-1, 4)[pos - w + 1]
                    pred = {1: L, 2: T, 3: TR, 4: TL, 7: _avg2(L, T)}[
                        predictor_mode
                    ]
                res[y, x] = (imgi[y, x] - pred) & 0xFF
        bw.write(1, 1)  # transform present
        bw.write(0, 2)  # predictor
        bits = 4  # block size 16: one block for small fixtures
        bw.write(bits - 2, 3)
        pw = (w + (1 << bits) - 1) >> bits
        ph = (h + (1 << bits) - 1) >> bits
        _encode_literal_image(
            bw,
            np.full((ph, pw, 4), [255, 0, predictor_mode, 0], dtype=np.int32),
        )
        img = res

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        g = img[:, :, 2]
        img = img.copy()
        img[:, :, 1] = (img[:, :, 1] - g) & 0xFF
        img[:, :, 3] = (img[:, :, 3] - g) & 0xFF

    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no meta prefix image   (root image starts here)
    _encode_literal_image(bw, img, root=True)

    payload = bw.tobytes()
    if len(payload) & 1:
        payload += b"\x00"
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _encode_literal_image(bw: BitWriter, img: np.ndarray,
                          root: bool = False) -> None:
    """Emit one entropy-coded image as literals only. For non-root
    (transform) images the meta-prefix bit is NOT part of the syntax;
    for the root image the caller writes it."""
    # sub-images (transform data) carry no meta-prefix bit; the root
    # image's meta bit is written by the caller — both match
    # _decode_entropy_image's allow_meta switch.
    bw.write(0, 1)  # no color cache
    h, w, _ = img.shape
    ga = 256 + 24
    freqs = {
        "g": [0] * ga, "r": [0] * 256, "b": [0] * 256, "a": [0] * 256,
    }
    for y in range(h):
        for x in range(w):
            a, r, g, b = (int(v) for v in img[y, x])
            freqs["g"][g] += 1
            freqs["r"][r] += 1
            freqs["b"][b] += 1
            freqs["a"][a] += 1
    codes = {}
    for key, alph in (("g", ga), ("r", 256), ("b", 256), ("a", 256)):
        lengths = _code_lengths(freqs[key])
        codes[key] = _write_prefix_code(bw, lengths[:alph])
    # distance code: unused, single dummy symbol
    dist_lengths = [0] * 40
    dist_lengths[0] = 1
    _write_prefix_code(bw, dist_lengths)
    for y in range(h):
        for x in range(w):
            a, r, g, b = (int(v) for v in img[y, x])
            for key, v in (("g", g), ("r", r), ("b", b), ("a", a)):
                code, ln = codes[key][v]
                if ln:
                    bw.write_code(code, ln)
