"""WebP lossless (VP8L) codec: decoder proven against the minimal
in-repo encoder by exact round-trip (RFC 9649; no media libraries)."""

import struct

import numpy as np
import pytest

from fossil_spark.operators import multimodal as mm
from fossil_spark.operators import webp

rng = np.random.default_rng(7)


def _roundtrip(img, **kw):
    data = webp.encode_vp8l(img, **kw)
    w, h, _alpha, out = webp.decode_webp(data)
    assert (w, h) == (img.shape[1], img.shape[0])
    assert np.array_equal(out, img), f"pixel mismatch for {kw}"
    return data


def test_two_color_simple_codes():
    img = np.zeros((5, 7, 4), dtype=np.uint8)
    img[..., 3] = 255
    img[1:3, 2:5, 0] = 200
    data = _roundtrip(img)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"


def test_random_full_prefix_codes():
    _roundtrip(rng.integers(0, 256, (9, 11, 4), dtype=np.uint8))


def test_subtract_green_transform():
    _roundtrip(rng.integers(0, 256, (6, 6, 4), dtype=np.uint8),
               subtract_green=True)


@pytest.mark.parametrize("mode", [1, 2, 3, 4, 7])
def test_predictor_transform_modes(mode):
    _roundtrip(rng.integers(0, 256, (8, 5, 4), dtype=np.uint8),
               predictor_mode=mode)


def test_stacked_transforms():
    _roundtrip(rng.integers(0, 256, (7, 9, 4), dtype=np.uint8),
               predictor_mode=7, subtract_green=True)


def test_alpha_hint_and_opaque():
    img = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    img[..., 3] = 255
    data = _roundtrip(img)
    # opaque image -> alpha hint bit clear
    assert webp.decode_webp(data)[2] is False


def test_decode_image_dispatches_webp():
    img = rng.integers(0, 256, (10, 6, 4), dtype=np.uint8)
    w, h, mode, out = mm.decode_image(webp.encode_vp8l(img))
    assert (w, h, mode) == (6, 10, "RGBA")
    assert np.array_equal(out, img)


def test_lossy_vp8_still_fake():
    import struct

    fake_vp8 = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
                + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError):
        mm.decode_image(fake_vp8)


def test_distributed_meta_real_for_webp(spark):
    img = rng.integers(0, 256, (12, 8, 4), dtype=np.uint8)
    rows = [(1, bytearray(webp.encode_vp8l(img)))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = mm.decode_image_meta(df).collect()
    assert (out[0]["width"], out[0]["height"], out[0]["mode"]) == (8, 12, "RGBA")


# --- header metadata for codec-required flavors -----------------------------

def _lossy_vp8_stub(w, h):
    """Minimal RIFF/VP8 container: real keyframe tag + start code +
    dims, garbage coefficients (pixels undecodable, header real)."""
    tag = (0).to_bytes(3, "little")  # keyframe, version 0, show_frame 0
    payload = tag + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + b"\x00" * 16
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_meta_lossy_dims():
    from fossil_spark.operators.webp import webp_meta

    w, h, kind = webp_meta(_lossy_vp8_stub(321, 97))
    assert (w, h, kind) == (321, 97, "lossy")


def test_webp_meta_vp8x_canvas():
    from fossil_spark.operators.webp import webp_meta

    payload = b"\x00" * 4 + (639).to_bytes(3, "little") + (359).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert webp_meta(blob) == (640, 360, "extended")


def test_image_meta_real_dims_for_lossy_webp(spark):
    from fossil_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, bytearray(_lossy_vp8_stub(321, 97)))], "doc_id long, content binary"
    )
    row = mm.decode_image_meta(df).collect()[0]
    # pixels need a codec, but the reported dims are the REAL header dims
    assert (row["width"], row["height"]) == (321, 97)
