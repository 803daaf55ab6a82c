"""Baseline JPEG codec (fossil_spark.operators.jpeg): encode/decode
round-trips from the public ITU-T T.81 spec, integration with the
multimodal operators, and error behavior on unsupported processes."""

from __future__ import annotations

import numpy as np
import pytest

from fossil_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient_rgb(w: int = 64, h: int = 48) -> np.ndarray:
    x = np.linspace(0, 255, w)
    return np.stack([
        np.tile(x, (h, 1)),
        np.tile(x[::-1], (h, 1)),
        np.tile(np.linspace(30, 220, h)[:, None], (1, w)),
    ], axis=-1).astype(np.uint8)


def test_rgb_roundtrip_444():
    img = _gradient_rgb()
    data = encode_jpeg(img, quality=95)
    assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
    w, h, mode, px = decode_jpeg(data)
    assert (w, h, mode) == (64, 48, "RGB")
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.max() <= 4  # smooth content at q95: near-lossless


def test_rgb_roundtrip_420_subsampled():
    img = _gradient_rgb()
    w, h, mode, px = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert (w, h, mode) == (64, 48, "RGB")
    assert np.abs(px.astype(int) - img.astype(int)).mean() < 4


def test_grayscale_roundtrip():
    g = np.tile(np.linspace(0, 255, 40), (24, 1)).astype(np.uint8)
    w, h, mode, px = decode_jpeg(encode_jpeg(g, quality=90))
    assert (w, h, mode) == (40, 24, "L")
    assert px.shape == (24, 40, 1)
    assert np.abs(px[:, :, 0].astype(int) - g.astype(int)).max() <= 3


def test_odd_dimensions_both_samplings():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    for sub in (False, True):
        w, h, _, px = decode_jpeg(encode_jpeg(img, quality=92, subsample=sub))
        assert (w, h) == (53, 37)
        assert px.shape == (37, 53, 3)


def test_quality_monotonic():
    """Lower quality -> smaller file and larger error (sanity that the
    quant scaling actually engages)."""
    img = _gradient_rgb()
    hi = encode_jpeg(img, quality=95)
    lo = encode_jpeg(img, quality=20)
    assert len(lo) < len(hi)
    _, _, _, phi = decode_jpeg(hi)
    _, _, _, plo = decode_jpeg(lo)
    e_hi = np.abs(phi.astype(int) - img.astype(int)).mean()
    e_lo = np.abs(plo.astype(int) - img.astype(int)).mean()
    assert e_lo > e_hi


def test_rejects_non_baseline():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # genuinely unsupported processes (lossless SOF3) declared
    # unsupported, not mis-decoded; progressive (SOF2) decodes for real
    img = encode_jpeg(_gradient_rgb(16, 16), quality=80)
    sof0 = img.find(b"\xFF\xC0")
    corrupted = img[:sof0 + 1] + b"\xC3" + img[sof0 + 2:]
    with pytest.raises(ValueError, match="unsupported JPEG process"):
        decode_jpeg(corrupted)


def test_multimodal_dispatch_real_jpeg():
    """decode_image now decodes JPEG for real (no fake fallback)."""
    from fossil_spark.operators.multimodal import decode_image

    img = _gradient_rgb(32, 16)
    w, h, mode, px = decode_image(encode_jpeg(img, quality=90))
    assert (w, h, mode) == (32, 16, "RGB")
    assert np.abs(px.astype(int) - img.astype(int)).mean() < 3


def test_jpeg_through_spark_operators(spark):
    """image_features over a binary column of JPEGs reports
    decoded='real' with correct dims and plausible stats."""
    from fossil_spark.operators.multimodal import image_features

    imgs = [
        (1, encode_jpeg(_gradient_rgb(24, 16), quality=90)),
        (2, encode_jpeg(
            np.full((8, 8), 128, np.uint8), quality=90)),
        (3, b"\xFF\xD8 not really a jpeg"),  # falls back to fake
    ]
    df = spark.createDataFrame(imgs, "doc_id long, content binary")
    rows = {r["doc_id"]: r for r in image_features(df).collect()}
    assert rows[1]["decoded"] == "real"
    assert (rows[1]["width"], rows[1]["height"]) == (24, 16)
    assert rows[2]["decoded"] == "real"
    assert rows[2]["mean"] == pytest.approx(128.0, abs=2.0)
    assert rows[3]["decoded"] == "fake"


def test_restart_interval_roundtrip():
    """DRI + RSTn markers every 2 MCUs (T.81 E.2.4): the decoder's
    aligned restart path must resync and reset DC predictions."""
    img = _gradient_rgb()
    data = encode_jpeg(img, quality=95, restart_interval=2)
    assert b"\xFF\xDD" in data  # DRI segment present
    w, h, mode, px = decode_jpeg(data)
    assert (w, h, mode) == (64, 48, "RGB")
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.max() <= 4


def test_early_restart_tolerated_per_marker():
    """Markers every 2 MCUs but a header declaring 6: every other
    marker arrives "early" relative to DRI. The decoder must skip past
    each early marker and re-decode the interrupted MCU from the
    post-marker data — not zero-fill the rest of the interval."""
    img = _gradient_rgb()
    data = encode_jpeg(img, quality=95, restart_interval=2,
                       _declared_dri=6)
    w, h, mode, px = decode_jpeg(data)
    assert (w, h, mode) == (64, 48, "RGB")
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.max() <= 4


def test_restart_interval_grayscale_subsampled():
    img = _gradient_rgb(40, 24)
    data = encode_jpeg(img, quality=90, subsample=True,
                       restart_interval=3)
    w, h, mode, px = decode_jpeg(data)
    assert (w, h) == (40, 24)
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.mean() < 8


# --- progressive (SOF2) ----------------------------------------------------

def _err(a, b):
    return np.abs(a.astype(int) - b.astype(int))


def test_progressive_spectral_selection_only():
    """Al=0 everywhere: pure spectral selection (DC scan + per-band AC
    scans). Must reconstruct identically to baseline tolerance."""
    from fossil_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient_rgb()
    data = encode_jpeg_progressive(img, quality=95, dc_al=0, ac_al=0)
    assert data[2:4] != b"\xFF\xC0"  # really SOF2, not baseline
    assert b"\xFF\xC2" in data
    w, h, mode, px = decode_jpeg(data)
    assert (w, h, mode) == (64, 48, "RGB")
    assert _err(px, img).max() <= 4


def test_progressive_successive_approximation():
    """DC and AC successive approximation at 1 and 2 bits: first scans
    at reduced precision, refinement scans restore the low bits. The
    final image must match the straight-baseline encode of the same
    pixels — refinement must recover every dropped bit."""
    from fossil_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient_rgb()
    base = decode_jpeg(encode_jpeg(img, quality=90))[3]
    for dal, aal in [(1, 1), (2, 2), (0, 2), (2, 0)]:
        data = encode_jpeg_progressive(img, quality=90, dc_al=dal, ac_al=aal)
        px = decode_jpeg(data)[3]
        # same quantized coefficients -> identical reconstruction
        assert _err(px, base).max() == 0, (dal, aal)


def test_progressive_grayscale_odd_dims():
    from fossil_spark.operators.jpeg import encode_jpeg_progressive

    g = np.linspace(0, 255, 37 * 23).reshape(23, 37).astype(np.uint8)
    data = encode_jpeg_progressive(g, quality=92)
    w, h, mode, px = decode_jpeg(data)
    assert (w, h, mode) == (37, 23, "L")
    assert _err(px[:, :, 0], g).max() <= 3


def test_progressive_through_multimodal(spark):
    """decode_image_meta must now decode progressive JPEGs for real
    (decoded='real'), not fall back to the labeled fake."""
    from fossil_spark.operators import multimodal as mm
    from fossil_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient_rgb(32, 16)
    blob = encode_jpeg_progressive(img, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, content binary"
    )
    row = mm.image_features(df).collect()[0]
    assert row.decoded == "real"
    assert (row.width, row.height) == (32, 16)
