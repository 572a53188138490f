"""Streaming dedup — exactly-once-style ingestion for a training-data feed.

A 100 TB corpus is ingested continuously, and upstream systems replay:
crawler retries, at-least-once queues, backfills.  Dropping replays at
ingestion is the streaming face of exact dedup (operators/dedup.py A1):
key by event id — or a content fingerprint (textual.fingerprint) for
documents — and keep the first arrival.

`dropDuplicatesWithinWatermark` is the scale-correct variant: the state
store only remembers keys younger than the watermark, so state is bounded
by (arrival rate × watermark horizon) instead of growing with the stream's
lifetime.  Plain `dropDuplicates` on a stream never evicts — correct only
for bounded replays in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key among events within the watermark
    horizon; replays arriving later than the watermark are assumed already
    compacted downstream (the standard at-least-once → effectively-once
    trade)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
