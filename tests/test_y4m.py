"""YUV4MPEG2 (y4m) parse + decode: round-trip through the real plane
parser, colorspace variants, Spark dispatch, frame sampling, and
corrupt-stream handling.

Closes the r5 verdict's last fake path: a parseable raw-video container
(y4m is what mplayer/ffmpeg exchange uncompressed video in) so every
modality — PNG, JPEG, WAV, AVI/MJPEG, y4m — takes a real codec path; the
deterministic fake remains only for payloads no codec claims."""

import numpy as np
import pytest

from tegallega_spark.operators import multimodal as MM


def _frames(n=3, h=12, w=16, seed=5):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_y4m_c444_roundtrip_near_lossless():
    """C444 keeps full chroma: the only loss is the ±2 rounding of the
    8-bit BT.601 limited-range matrix pair (forward quantizes to uint8
    before the inverse runs)."""
    frames = _frames()
    payload = MM.encode_y4m(frames, fps=25, colorspace="C444")
    back, fps = MM.decode_y4m(payload)
    assert fps == 25 and len(back) == len(frames)
    for orig, dec in zip(frames, back):
        assert dec.shape == orig.shape
        assert np.abs(dec.astype(int) - orig.astype(int)).max() <= 2


def test_y4m_c420_roundtrip_chroma_subsampled():
    """C420 averages chroma 2×2: luma stays near-exact, chroma is smoothed
    — mean error bounded, Y-plane recoverable."""
    frames = _frames(2, h=16, w=20)
    payload = MM.encode_y4m(frames, fps=10, colorspace="C420")
    back, fps = MM.decode_y4m(payload)
    assert fps == 10 and len(back) == 2
    for orig, dec in zip(frames, back):
        assert dec.shape == orig.shape
        # random chroma is the worst case for 2x2 averaging; the decoded
        # luma (BT.601 weighted sum) must still track closely
        yo = orig.astype(float) @ np.array([0.299, 0.587, 0.114])
        yd = dec.astype(float) @ np.array([0.299, 0.587, 0.114])
        assert np.abs(yo - yd).mean() < 4


def test_y4m_default_colorspace_is_c420():
    """A stream header with no C tag is C420 per spec — build one by
    stripping the tag from an encoded C420 stream."""
    frames = _frames(1, h=8, w=8)
    payload = MM.encode_y4m(frames, fps=9, colorspace="C420")
    header, rest = payload.split(b"\n", 1)
    header = b" ".join(t for t in header.split(b" ") if not t.startswith(b"C"))
    back, fps = MM.decode_y4m(header + b"\n" + rest)
    assert fps == 9 and back[0].shape == (8, 8, 3)


def test_y4m_mono_neutral_chroma():
    """Cmono: only the Y plane; decode yields gray RGB (R==G==B)."""
    h, w = 6, 10
    y = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    payload = (f"YUV4MPEG2 W{w} H{h} F5:1 Cmono".encode() + b"\n"
               + b"FRAME\n" + y.tobytes())
    back, fps = MM.decode_y4m(payload)
    assert fps == 5 and back[0].shape == (h, w, 3)
    assert (back[0][..., 0] == back[0][..., 1]).all()
    assert (back[0][..., 1] == back[0][..., 2]).all()


def test_y4m_rejects_truncated_and_unknown():
    frames = _frames(2)
    payload = MM.encode_y4m(frames, fps=10)
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_y4m(payload[:-5])
    bad = payload.replace(b"C444", b"C411", 1)
    with pytest.raises(ValueError, match="colorspace"):
        MM.decode_y4m(bad)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        MM.decode_y4m(b"RIFFxxxx not y4m")


def test_decode_batches_dispatches_real_y4m(spark):
    """y4m payloads take the real parser in the Spark pipeline: true dims
    and frame count; a truncated stream gets a corrupt marker row, not a
    task failure."""
    frames = _frames(4, h=24, w=16)
    good = MM.encode_y4m(frames, fps=12)
    rows = [(1, bytearray(good)), (2, bytearray(good[:-10]))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in MM.decode_batches(df).collect()}
    assert (got[1].format, got[1].width, got[1].height, got[1].n_frames) == (
        "y4m", 16, 24, 4,
    )
    assert got[2].format == "corrupt"


def test_frame_sample_uses_real_y4m_frame_count(spark):
    df = spark.createDataFrame(
        [(3, bytearray(MM.encode_y4m(_frames(7), fps=2)))],
        "doc_id long, payload binary",
    )
    rows = MM.frame_sample(df, every_n=3).collect()
    assert [(r.doc_id, r.n_frames, r.frame_idx) for r in rows] == [
        (3, 7, 0), (3, 7, 3), (3, 7, 6),
    ]
