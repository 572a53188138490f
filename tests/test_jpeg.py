"""Baseline JPEG codec (operators/jpeg.py): real bytes-in-pixels-out,
round-tripped over every stream feature the decoder supports — 4:4:4,
4:2:0 multi-block MCUs, restart markers, grayscale, non-multiple-of-8
dims.  The decoder builds every table from the stream's DQT/DHT segments,
so these round trips exercise the full marker parse, not a shared
in-memory dialect."""

from __future__ import annotations

import numpy as np
import pytest

from tegallega_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    x = np.linspace(0, 255, w)[None, :].repeat(h, axis=0)
    y = np.linspace(0, 255, h)[:, None].repeat(w, axis=1)
    return np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8)


def test_rgb_444_round_trip_within_quantization():
    img = _gradient(40, 56)
    payload = encode_jpeg(img, quality=90)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    out = decode_jpeg(payload)
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 12


def test_rgb_420_subsampled_round_trip():
    img = _gradient(40, 56)
    p444 = encode_jpeg(img, quality=90)
    p420 = encode_jpeg(img, quality=90, subsample=True)
    assert len(p420) < len(p444)  # subsampling must actually shrink chroma
    out = decode_jpeg(p420)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4.0  # extra chroma loss, still close on a gradient


def test_restart_markers_round_trip():
    img = _gradient(40, 56)
    p = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in p  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in p for i in range(8))
    out = decode_jpeg(p)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 2.0  # identical to the no-restart stream's error


def test_grayscale_and_odd_dimensions():
    g = (
        128
        + 100
        * np.sin(np.linspace(0, 6, 33))[:, None]
        * np.cos(np.linspace(0, 4, 45))[None, :]
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=85))
    assert out.shape == (33, 45)
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 3.0

    odd = _gradient(37, 51)
    out = decode_jpeg(encode_jpeg(odd, quality=85, subsample=True))
    assert out.shape == (37, 51, 3)


def test_quality_monotone_and_noise_survival():
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    errs, sizes = [], []
    for q in (50, 75, 95):
        p = encode_jpeg(noise, quality=q)
        o = decode_jpeg(p)
        errs.append(np.abs(o.astype(int) - noise.astype(int)).mean())
        sizes.append(len(p))
    assert errs[0] > errs[-1]  # higher quality → lower error
    assert sizes[0] < sizes[-1]  # ... and bigger payload
    assert errs[-1] < 8.0  # q95 noise still decodes close


def test_decoder_rejects_garbage_and_progressive():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n garbage")
    # splice a progressive SOF2 marker in place of SOF0: must refuse
    # loudly, not mis-decode
    p = bytearray(encode_jpeg(_gradient(16, 16), quality=80))
    idx = p.find(b"\xff\xc0")
    p[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="unsupported JPEG mode"):
        decode_jpeg(bytes(p))


def test_decode_batches_dispatches_real_jpeg(spark):
    """JPEG payloads take the real decode path in the Spark pipeline:
    true dims, and the feature hash is over DECODED pixels — the same
    image encoded 4:4:4 vs 4:2:0 differs (lossy), but byte-identical
    payloads of different images never collide with each other."""
    from tegallega_spark.operators import multimodal as MM

    img_a = _gradient(24, 17)
    img_b = _gradient(17, 24)
    rows = [
        (1, bytearray(encode_jpeg(img_a, quality=90))),
        (2, bytearray(encode_jpeg(img_b, quality=90))),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in MM.decode_batches(df).collect()}
    assert (got[1].width, got[1].height, got[1].format) == (17, 24, "jpeg")
    assert (got[2].width, got[2].height, got[2].format) == (24, 17, "jpeg")
    assert got[1].feature_hash != got[2].feature_hash
    assert got[3].format in ("png", "jpg")  # the audio/video fake path
