"""RIFF/WAVE PCM codec: round-trip, dispatch, and corrupt-payload marker
rows (VERDICT r4 next-round #5 + ADVICE r4 corrupt-JPEG resilience).

The reference has no audio code; WAV is the bytes-in-samples-out contract
(mirroring PNG/JPEG) for the multimodal north-star tier."""

import struct

import numpy as np
import pytest

from tegallega_spark.operators import multimodal as MM


def _tone(n=1600, rate=16000, hz=440.0, channels=1):
    t = np.arange(n) / rate
    s = (np.sin(2 * np.pi * hz * t) * 12000).astype(np.int16)
    if channels == 1:
        return s
    return np.stack([s, (s // 2).astype(np.int16)], axis=1)


def test_wav_roundtrip_mono():
    s = _tone()
    payload = MM.encode_wav(s, sample_rate=16000)
    back, rate = MM.decode_wav(payload)
    assert rate == 16000
    assert back.shape == (len(s), 1)
    assert (back[:, 0] == s).all()


def test_wav_roundtrip_stereo():
    s = _tone(channels=2)
    payload = MM.encode_wav(s, sample_rate=44100)
    back, rate = MM.decode_wav(payload)
    assert rate == 44100 and back.shape == s.shape and (back == s).all()


def test_wav_8bit_and_word_alignment():
    """Hand-built 8-bit WAV with an odd-length extra chunk before data:
    the RIFF walk must word-align, and 8-bit samples are unsigned."""
    raw = bytes([128, 255, 0, 128, 200])  # 5 samples, odd data length too
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd chunk, padded
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    back, rate = MM.decode_wav(payload)
    assert rate == 8000 and back.shape == (5, 1)
    expected = (np.array([128, 255, 0, 128, 200], dtype=np.int16) - 128) * 256
    assert (back[:, 0] == expected).all()


def test_wav_rejects_non_pcm():
    s = _tone(64)
    payload = bytearray(MM.encode_wav(s))
    # fmt tag lives right after 'fmt '+len; flip PCM(1) -> float(3)
    idx = payload.index(b"fmt ") + 8
    payload[idx] = 3
    with pytest.raises(ValueError, match="PCM only"):
        MM.decode_wav(bytes(payload))


def test_decode_batches_dispatches_real_wav(spark):
    """WAV payloads take the real decode path: sample rate / channels /
    sample count land in width/height/n_frames, and the feature hash is
    over DECODED samples — two encodings of the same audio (16-bit direct
    vs the same values via a different chunk layout) hash identically."""
    s = _tone(800, channels=2)
    plain = MM.encode_wav(s, sample_rate=16000)
    # same samples, extra LIST chunk inserted -> different bytes
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    data = s.astype("<i2").tobytes()
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"meta"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    alt = b"RIFF" + struct.pack("<I", len(body)) + body
    assert plain != alt
    df = spark.createDataFrame(
        [(1, bytearray(plain)), (2, bytearray(alt))], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in MM.decode_batches(df).collect()}
    assert (got[1].format, got[1].width, got[1].height, got[1].n_frames) == (
        "wav", 16000, 2, 800,
    )
    assert got[1].feature_hash == got[2].feature_hash  # content, not bytes
    assert got[1].byte_len == len(plain) and got[2].byte_len == len(alt)


def test_decode_batches_corrupt_payloads_marked_not_fatal(spark):
    """One truncated/corrupt magic-matched payload must not kill the task
    (ADVICE r4): it yields a format='corrupt' marker row while healthy
    payloads in the same batch decode normally."""
    px = np.arange(24 * 16 * 3, dtype=np.uint8).reshape(24, 16, 3)
    good_png = MM.encode_png(px)
    rows = [
        (1, bytearray(good_png)),
        (2, bytearray(good_png[:20])),          # truncated PNG
        (3, bytearray(b"\xff\xd8\xff\xe0junk")),  # corrupt JPEG
        (4, bytearray(MM.encode_wav(_tone(32))[:16])),  # truncated WAV
        (5, bytearray(b"plain text payload")),  # fake path unaffected
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in MM.decode_batches(df).collect()}
    assert got[1].format == "png" and got[1].width == 16
    for bad in (2, 3, 4):
        assert got[bad].format == "corrupt"
        assert (got[bad].width, got[bad].height, got[bad].n_frames) == (0, 0, 0)
        assert got[bad].byte_len == len(bytes(rows[bad - 1][1]))
    assert got[5].format in ("png", "jpg")
