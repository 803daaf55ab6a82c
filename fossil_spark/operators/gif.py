"""Pure-Python GIF (87a/89a) codec — no external libraries.

Implemented from the public GIF89a specification
(https://www.w3.org/Graphics/GIF/spec-gif89a.txt): logical screen
descriptor, global/local color tables, variable-width LSB-first LZW
with CLEAR/END codes and the 4096-entry dictionary cap, the four-pass
interlace order, and the 89a extension blocks (graphic control:
disposal methods 0-3, transparency, frame delay). Animated GIFs
compose frames on the logical-screen canvas exactly as a viewer does,
so every frame yields REAL pixels — this makes GIF the third
container (after motion-JPEG MP4 and raw MJPEG) whose video frames
decode for real in extract_video_frames.

The encoder is a minimal but real LZW compressor (greedy longest-
match dictionary, reset at 4096) used by tests to prove exact decode
round-trips, mirroring the in-repo JPEG/WEBP encoder strategy.
"""

from __future__ import annotations

import struct

import numpy as np

# --- bit-level LZW ---------------------------------------------------------


class _LZWReader:
    """LSB-first variable-width code reader over concatenated
    sub-block payloads (GIF appendix F)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated LZW stream")
            self.bitbuf |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        code = self.bitbuf & ((1 << width) - 1)
        self.bitbuf >>= width
        self.nbits -= width
        return code


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-flavor LZW: dictionary seeded with 2^min single-byte roots,
    CLEAR = 2^min, END = CLEAR+1, width grows at 2^w up to 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    r = _LZWReader(data)
    out = bytearray()

    def reset() -> tuple[list[bytes | None], int, int]:
        table: list[bytes | None] = [bytes([i]) for i in range(clear)]
        table += [None, None]  # CLEAR, END placeholders
        return table, min_code_size + 1, -1

    table, width, prev = reset()
    while len(out) < n_pixels:
        code = r.read(width)
        if code == clear:
            table, width, prev = reset()
            continue
        if code == end:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev >= 0:
            entry = table[prev] + table[prev][:1]  # the KwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev >= 0 and len(table) < 4096:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = code
    return out


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Greedy longest-match LZW encoder (the real algorithm, not the
    clear-code-per-symbol trick), emitting CLEAR up front and on
    dictionary overflow — decodable by any conforming reader."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# --- container parse -------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos:pos + n])
        pos += n
    return b"".join(chunks), pos


def decode_gif(
    data: bytes,
) -> tuple[int, int, list[tuple[int, np.ndarray]]]:
    """Full decode: (width, height, [(delay_cs, HxWx3 uint8 RGB)]).
    Frames are composed on the logical-screen canvas honoring
    disposal methods and transparency, so each returned frame is what
    a viewer displays at that step."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_ct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), np.uint8)
    if global_ct is not None and bg_idx < len(global_ct):
        canvas[:] = global_ct[bg_idx]
    background = canvas.copy()

    frames: list[tuple[int, np.ndarray]] = []
    delay, disposal, transparent = 0, 0, -1
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags, delay = struct.unpack_from("<BH", payload, 0)
                disposal = (flags >> 2) & 0x07
                transparent = payload[3] if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = global_ct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without a color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(
            lzw_decode(lzw, min_code, fw * fh), np.uint8
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)

        before = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append((delay, canvas.copy()))
        if disposal == 2:
            canvas[top:top + fh, left:left + fw] = background[
                top:top + fh, left:left + fw
            ]
        elif disposal == 3 and before is not None:
            canvas = before
        delay, disposal, transparent = 0, 0, -1
    if not frames:
        raise ValueError("GIF contains no image data")
    return w, h, frames


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delays_cs: list[int] | None = None,
) -> bytes:
    """Minimal GIF89a writer: one global color table (len a power of
    two >= 2), every frame full-canvas, index arrays HxW uint8 into
    `palette` (Nx3 uint8). Real LZW compression."""
    n = len(palette)
    if n & (n - 1) or n < 2:
        raise ValueError("palette length must be a power of two >= 2")
    h, w = frames[0].shape
    size_field = n.bit_length() - 2  # 2 << f == n
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    min_code = max(2, n.bit_length() - 1)
    for i, fr in enumerate(frames):
        delay = (delays_cs or [0] * len(frames))[i]
        out += b"\x21\xF9\x04" + struct.pack("<BHB", 0, delay, 0) + b"\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        payload = lzw_encode(fr.astype(np.uint8).tobytes(), min_code)
        for off in range(0, len(payload), 255):
            chunk = payload[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
