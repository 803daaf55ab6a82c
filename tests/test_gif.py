"""GIF codec: LZW + container from the public GIF89a spec, proven by
exact round-trips against the in-repo encoder (no media libraries)."""

import struct

import numpy as np
import pytest

from fossil_spark.operators import multimodal as mm
from fossil_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _palette(n):
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (n, 3), dtype=np.uint8)


def test_lzw_roundtrip_random():
    rng = np.random.default_rng(1)
    for size in (1, 7, 255, 4097, 20_000):
        data = rng.integers(0, 16, size, dtype=np.uint8).tobytes()
        assert bytes(lzw_decode(lzw_encode(data, 4), 4, size)) == data


def test_lzw_roundtrip_repetitive():
    # long runs force the KwK case and dictionary growth to 12 bits
    data = (b"\x00" * 5000 + b"\x01\x02\x03" * 3000) * 2
    assert bytes(lzw_decode(lzw_encode(data, 2), 2, len(data))) == data


def test_gif_single_frame_exact():
    pal = _palette(16)
    idx = (np.add.outer(np.arange(13) * 3, np.arange(17) * 5) % 16).astype(np.uint8)
    blob = encode_gif([idx], pal)
    w, h, frames = decode_gif(blob)
    assert (w, h) == (17, 13) and len(frames) == 1
    assert np.array_equal(frames[0][1], pal[idx])


def test_gif_animation_delays_and_frames():
    pal = _palette(4)
    f0 = np.zeros((8, 8), np.uint8)
    f1 = np.full((8, 8), 1, np.uint8)
    f2 = np.full((8, 8), 3, np.uint8)
    blob = encode_gif([f0, f1, f2], pal, delays_cs=[10, 20, 30])
    w, h, frames = decode_gif(blob)
    assert [d for d, _ in frames] == [10, 20, 30]
    assert np.array_equal(frames[2][1], pal[f2])


def test_gif_interlace():
    # hand-build an interlaced frame: rows permuted per appendix E
    pal = _palette(8)
    idx = (np.arange(16)[:, None] % 8 * np.ones((1, 4), int)).astype(np.uint8)
    order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, 16, st)]
    stored = idx[np.asarray(order)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 16, 0x80 | 2, 0, 0)  # 8-entry GCT
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, 4, 16, 0x40)  # interlaced
    out.append(3)
    payload = lzw_encode(stored.tobytes(), 3)
    for off in range(0, len(payload), 255):
        c = payload[off:off + 255]
        out.append(len(c))
        out += c
    out += b"\x00\x3B"
    w, h, frames = decode_gif(bytes(out))
    assert np.array_equal(frames[0][1], pal[idx])


def test_gif_transparency_composes_over_previous():
    pal = _palette(4)
    base = np.zeros((6, 6), np.uint8)
    overlay = np.full((6, 6), 2, np.uint8)
    overlay[:3] = 1  # index 1 will be declared transparent
    blob = bytearray(encode_gif([base, overlay], pal))
    # rewrite the second GCE: transparency flag on, index 1
    gce_positions = []
    i = 0
    while True:
        i = blob.find(b"\x21\xF9\x04", i)
        if i < 0:
            break
        gce_positions.append(i)
        i += 3
    assert len(gce_positions) == 2
    p = gce_positions[1]
    blob[p + 3] = 0x01  # flags: transparent color follows
    blob[p + 6] = 1     # transparent index
    w, h, frames = decode_gif(bytes(blob))
    shown = frames[1][1]
    # transparent region shows the PREVIOUS frame (base = palette[0])
    assert np.array_equal(shown[:3], np.broadcast_to(pal[0], (3, 6, 3)))
    assert np.array_equal(shown[3:], np.broadcast_to(pal[2], (3, 6, 3)))


def test_decode_image_dispatches_gif():
    pal = _palette(4)
    idx = np.full((5, 9), 3, np.uint8)
    w, h, mode, px = mm.decode_image(encode_gif([idx], pal))
    assert (w, h, mode) == (9, 5, "RGB")
    assert np.array_equal(px, pal[idx])


def test_extract_video_frames_animated_gif(spark):
    pal = _palette(4)
    frames = [np.full((8, 8), i, np.uint8) for i in range(4)]
    blob = encode_gif(frames, pal, delays_cs=[5] * 4)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, content binary")
    rows = mm.extract_video_frames(df, every_n=2).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2]
    for r, i in zip(rows, (0, 2)):
        assert r["decoded"] == "real" and r["width"] == 8 and r["height"] == 8
        assert r["mean"] == pytest.approx(float(pal[i].mean()))


# --- property test: LZW round-trip over arbitrary index streams -------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        data=st.binary(min_size=1, max_size=3000).map(
            lambda b: bytes(x % 16 for x in b)
        ),
        min_code=st.integers(min_value=4, max_value=8),
    )
    @settings(max_examples=60, deadline=None)
    def test_lzw_roundtrip_property(data, min_code):
        assert bytes(lzw_decode(lzw_encode(data, min_code), min_code, len(data))) == data
except ImportError:  # pragma: no cover
    pass
