"""Streaming surface: AvailableNow file-source batch equals the batch query
(SURVEY §2.10 — streaming mirrors CI incrementality)."""

from __future__ import annotations

import tempfile

from tegallega_spark.queries import SPARK_QUERIES
from tegallega_spark.streaming import (
    read_events_stream,
    run_available_now,
    session_counts,
    tumbling_counts,
)


def test_tumbling_stream_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    assert stream.isStreaming
    result = tumbling_counts(stream, "15 minutes", "30 minutes")
    with tempfile.TemporaryDirectory() as ckpt:
        run_available_now(result, "tumbling_test", ckpt)
    got = {
        (r.win_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    want = {
        (r.win_start, r.event_type): (r.n, r.sum_value)
        for r in SPARK_QUERIES["q31_tumbling_window"](spark, sf_dir).collect()
    }
    # AvailableNow over a static dir sees all data → exact batch parity
    assert got == want


def test_session_window_stream_runs(spark, sf_dir):
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    result = session_counts(stream, "30 minutes", "1 hour")
    with tempfile.TemporaryDirectory() as ckpt:
        run_available_now(result, "sessions_test", ckpt)
    rows = spark.sql("SELECT * FROM sessions_test").collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)


def test_dedup_stream_drops_replayed_files(spark, sf_dir, tmp_path):
    """Replayed input (same file delivered twice) must come out once —
    idempotent ingestion via dropDuplicatesWithinWatermark on event_id."""
    import shutil

    from tegallega_spark.streaming import dedup_stream

    src = f"{sf_dir}/events.parquet"
    feed = tmp_path / "feed"
    feed.mkdir()
    shutil.copy(src, feed / "delivery1.parquet")
    shutil.copy(src, feed / "delivery2.parquet")  # the replay

    stream = read_events_stream(spark, str(feed))
    result = dedup_stream(stream, ["event_id"], ts_col="ts", watermark="1 hour")
    with tempfile.TemporaryDirectory() as ckpt:
        run_available_now(result, "dedup_stream_test", ckpt, output_mode="append")
    got = spark.sql("SELECT * FROM dedup_stream_test").collect()

    from tegallega_spark.session import load_table

    want_ids = {r.event_id for r in load_table(spark, sf_dir, "events").collect()}
    got_ids = [r.event_id for r in got]
    assert len(got_ids) == len(set(got_ids)) == len(want_ids)
    assert set(got_ids) == want_ids


def test_schema_probe_fails_loudly_on_empty_dir(spark, tmp_path):
    """An empty/parquet-less directory must raise a clear error up front,
    not silently assume MICROS and die downstream (ADVICE r3)."""
    import pytest

    empty = tmp_path / "empty_feed"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no \\*.parquet files"):
        read_events_stream(spark, str(empty))


def test_schema_probe_finds_nested_parquet(spark, sf_dir, tmp_path):
    """Partitioned-style layout (files under a subdirectory) must probe
    recursively — the old top-level-only glob found nothing and guessed."""
    import shutil

    feed = tmp_path / "feed"
    nested = feed / "date=2026-01-01"
    nested.mkdir(parents=True)
    shutil.copy(f"{sf_dir}/events.parquet", nested / "part-0.parquet")
    stream = read_events_stream(spark, str(feed))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_raw_int64_ts_unit_validated_by_magnitude(tmp_path):
    """A raw-int64 ts column is only accepted as nanoseconds when a sample
    value has nanosecond-epoch magnitude (~1e18); a micros-scale column
    must raise instead of being silently misscaled 1000x (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from tegallega_spark.streaming.events import _events_schema

    def write(path, ts_values):
        t = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(ts_values, pa.int64()),
                "user_id": pa.array([10, 11], pa.int64()),
                "event_type": pa.array(["a", "b"]),
                "value": pa.array([1.0, 2.0]),
                "props": pa.array(["{}", "{}"]),
            }
        )
        pq.write_table(t, path)
        return str(path)

    ns_2026 = 1_770_000_000 * 10**9
    good = write(tmp_path / "ns.parquet", [ns_2026, ns_2026 + 10**9])
    schema, from_nanos = _events_schema(good)
    assert from_nanos

    micros = write(tmp_path / "us.parquet", [ns_2026 // 1000, ns_2026 // 1000 + 10**6])
    with pytest.raises(RuntimeError, match="not a plausible nanosecond epoch"):
        _events_schema(micros)
