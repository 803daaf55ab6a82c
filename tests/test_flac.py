"""FLAC decode (RFC 9639 layout) — round-trip-proven against the
in-repo minimal encoder across subframe types, stereo decorrelation
modes, and CRC validation, then end-to-end through the Spark audio
pipeline (features for FLAC bytes must equal features for WAV bytes
of the SAME samples)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from fossil_spark.operators.flac import decode_flac, encode_flac


def test_verbatim_roundtrip_mono():
    rng = np.random.RandomState(3)
    x = rng.randint(-32768, 32768, size=500).astype(np.int32)
    rate, nch, bps, out = decode_flac(encode_flac(x, sample_rate=44100))
    assert (rate, nch, bps) == (44100, 1, 16)
    assert np.array_equal(out[:, 0], x)


def test_fixed_predictor_rice_roundtrip():
    rng = np.random.RandomState(5)
    t = np.arange(700)
    y = (1000 * np.sin(t / 20) + rng.randint(-20, 20, 700)).astype(np.int32)
    _, _, _, out = decode_flac(encode_flac(y, subframe="fixed2"))
    assert np.array_equal(out[:, 0], y)


@pytest.mark.parametrize("mode", ["independent", "left-side", "mid-side"])
def test_stereo_modes_roundtrip(mode):
    rng = np.random.RandomState(11)
    st = rng.randint(-30000, 30000, size=(513, 2)).astype(np.int32)
    _, nch, _, out = decode_flac(encode_flac(st, stereo_mode=mode))
    assert nch == 2
    assert np.array_equal(out, st), mode


def test_crc_validation_rejects_corruption():
    x = np.arange(300, dtype=np.int32) % 1000
    data = bytearray(encode_flac(x))
    data[-10] ^= 0x40  # flip a bit inside the last frame's payload
    with pytest.raises(ValueError):
        decode_flac(bytes(data))


def test_non_flac_rejected():
    with pytest.raises(ValueError):
        decode_flac(b"RIFF....WAVE")


def _wav_bytes(samples: np.ndarray, rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1 if samples.ndim == 1 else samples.shape[1])
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_flac_features_equal_wav_features(spark):
    """The pipeline contract: identical samples produce identical
    features whether they arrive as WAV or FLAC."""
    from fossil_spark.operators.multimodal import audio_features

    rng = np.random.RandomState(7)
    t = np.arange(4096)
    sig = (8000 * np.sin(2 * np.pi * 440 * t / 8000)
           + rng.randint(-100, 100, len(t))).astype(np.int32)
    wav = _wav_bytes(sig.astype(np.int16), 8000)
    flc = encode_flac(sig, sample_rate=8000, subframe="fixed2")
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(flc))],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert rows[1]["sample_rate"] == rows[2]["sample_rate"] == 8000
    for field in ("n_samples", "rms", "peak", "zero_crossing_rate",
                  "spectral_centroid_hz", "spectral_rolloff_hz"):
        assert rows[1][field] == rows[2][field], field
    assert rows[2]["spectral_centroid_hz"] is not None


def test_lpc_subframe_roundtrip():
    rng = np.random.RandomState(13)
    t = np.arange(512)
    y = (3000 * np.sin(t / 9) + rng.randint(-40, 40, len(t))).astype(np.int32)
    _, _, _, out = decode_flac(encode_flac(y, subframe="lpc2"))
    assert np.array_equal(out[:, 0], y)


def test_escape_partition_roundtrip():
    rng = np.random.RandomState(17)
    y = rng.randint(-30000, 30000, 512).astype(np.int32)
    _, _, _, out = decode_flac(
        encode_flac(y, subframe="fixed2", residual="escape")
    )
    assert np.array_equal(out[:, 0], y)


def test_rice2_and_partitioned_residual_roundtrip():
    rng = np.random.RandomState(19)
    t = np.arange(512)
    y = (500 * np.sin(t / 15) + rng.randint(-10, 10, len(t))).astype(np.int32)
    _, _, _, out = decode_flac(
        encode_flac(y, subframe="fixed2", residual="rice2",
                    partition_order=2)
    )
    assert np.array_equal(out[:, 0], y)


def test_wasted_bits_roundtrip():
    rng = np.random.RandomState(23)
    y = (rng.randint(-4000, 4000, 300) * 4).astype(np.int32)  # 2 low zero bits
    _, _, _, out = decode_flac(encode_flac(y, wasted_bits=2))
    assert np.array_equal(out[:, 0], y)


from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767),
             min_size=2, max_size=600),
    st.sampled_from(["verbatim", "fixed2", "lpc2"]),
    st.sampled_from(["rice", "rice2", "escape"]),
)
def test_flac_property_roundtrip(xs, subframe, residual):
    """Random signals through every (subframe, residual) pairing
    decode back exactly."""
    y = np.array(xs, dtype=np.int32)
    data = encode_flac(y, subframe=subframe, residual=residual)
    _, _, _, out = decode_flac(data)
    assert np.array_equal(out[:, 0], y), (subframe, residual, len(xs))
