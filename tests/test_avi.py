"""RIFF/AVI MJPEG demux + decode: round-trip, Spark dispatch, frame
sampling on real frame counts, and corrupt/foreign-codec handling.

Closes the last fake modality: video payloads now take a real path —
RIFF tree walk → strh fps → movi '00dc' chunks → the from-scratch
baseline JPEG decoder per frame (operators/jpeg.py)."""

import struct

import numpy as np
import pytest

from tegallega_spark.operators import multimodal as MM


def _frames(n=4, h=24, w=16, seed=2):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    # smooth gradient shift per frame: JPEG is lossy, so frames must be
    # compressible content, but dims/count/fps are exact either way
    return [np.clip(base.astype(int) + 10 * i, 0, 255).astype(np.uint8) for i in range(n)]


def test_avi_roundtrip_structure():
    frames = _frames()
    payload = MM.encode_avi(frames, fps=12, quality=92)
    back, fps = MM.decode_avi(payload)
    assert fps == 12 and len(back) == 4
    for orig, dec in zip(frames, back):
        assert dec.shape == orig.shape
        # lossy but close: mean abs error bounded (same bound test_jpeg uses)
        assert np.abs(dec.astype(int) - orig.astype(int)).mean() < 12


def test_avi_rejects_foreign_codec():
    payload = bytearray(MM.encode_avi(_frames(1), fps=5))
    idx = payload.index(b"vids") + 4
    payload[idx : idx + 4] = b"H264"
    with pytest.raises(ValueError, match="MJPG only"):
        MM.decode_avi(bytes(payload))


def test_avi_word_alignment_with_odd_jpeg():
    """A movi chunk whose JPEG has odd length must be padded and the walk
    must stay aligned — decode still yields every frame."""
    frames = _frames(3, h=17, w=13)  # odd dims → odd-ish blob lengths
    payload = MM.encode_avi(frames, fps=7)
    back, fps = MM.decode_avi(payload)
    assert fps == 7 and len(back) == 3
    assert all(f.shape == (17, 13, 3) for f in back)


def test_decode_batches_dispatches_real_avi(spark):
    """AVI payloads take the real demux path in the Spark pipeline: true
    dims and frame count, fingerprint over DECODED pixels of all frames —
    two encodings (different quality) of the same content differ (lossy),
    but dims/count are exact; corrupt AVI gets a marker row."""
    frames = _frames()
    good = MM.encode_avi(frames, fps=10)
    rows = [
        (1, bytearray(good)),
        (2, bytearray(good[:40])),  # truncated → corrupt marker
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in MM.decode_batches(df).collect()}
    assert (got[1].format, got[1].width, got[1].height, got[1].n_frames) == (
        "avi", 16, 24, 4,
    )
    assert got[2].format == "corrupt"


def test_frame_sample_uses_real_avi_frame_count(spark):
    frames = _frames(9)
    df = spark.createDataFrame(
        [(7, bytearray(MM.encode_avi(frames, fps=3)))], "doc_id long, payload binary"
    )
    rows = MM.frame_sample(df, every_n=4).collect()
    assert [(r.doc_id, r.n_frames, r.frame_idx) for r in rows] == [
        (7, 9, 0), (7, 9, 4), (7, 9, 8),
    ]


def test_avi_strf_is_valid_bitmapinfoheader():
    """The strf chunk must be a 40-byte BITMAPINFOHEADER with matching
    dims and MJPG fourcc — what any third-party demuxer keys on."""
    payload = MM.encode_avi(_frames(2, h=20, w=32), fps=10)
    idx = payload.index(b"strf") + 8
    strf = payload[idx : idx + 40]
    bi_size, w, h, planes, bits, fourcc = struct.unpack("<IiiHH4s", strf[:20])
    assert (bi_size, w, h, planes, bits, fourcc) == (40, 32, 20, 1, 24, b"MJPG")
