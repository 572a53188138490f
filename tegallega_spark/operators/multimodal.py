"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque `binary` columns with typed metadata.  The
Spark-side plumbing — schema, partition-friendly batch iteration, Arrow
batch shape — is real and tested; the actual codec call is stubbed behind a
deterministic fake (the decode libraries are not in this container), with
the real integration point clearly marked.

At 100 TB: mapInPandas streams Arrow record batches through the Python
worker without collecting a partition in memory; batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch.  Binary payloads stay in
Arrow buffers end-to-end (no per-row pickling).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "doc_id bigint, byte_len int, format string, width int, height int, "
    "n_frames int, feature_hash bigint"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text column
    plus typed metadata.  In production the payload column comes straight
    from parquet BINARY — this adapter only exists because the test corpus
    is text."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("fake/raw").alias("mime"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image/audio decoder.

    REAL INTEGRATION POINT: replace the body with e.g.
        img = PIL.Image.open(io.BytesIO(payload)); return {...}
    The container lacks codec libraries, so derive metadata from the bytes
    deterministically instead — keeps schema, batching, and tests real.
    """
    n = len(payload)
    return {
        "byte_len": n,
        "format": "png" if n % 2 == 0 else "jpg",
        "width": n % 640 + 16,
        "height": (n * 7) % 480 + 16,
        "n_frames": 1,
        # xxhash-free fingerprint: first/last bytes + length (deterministic)
        "feature_hash": (n * 1315423911 + (payload[0] if n else 0) * 2654435761
                         + (payload[-1] if n else 0)) % (1 << 62),
    }


def decode_batches(df: DataFrame) -> DataFrame:
    """mapInPandas decode: iterate Arrow batches, emit typed metadata rows.

    The iterator-of-DataFrames shape means one output batch per input batch
    — constant memory regardless of partition size.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: 1 row → N frame rows
    via explode(sequence(...)) — the decode per frame stays stubbed."""
    decoded = decode_batches(df)
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
