"""Mirror of the driver's t2 correctness gate: run every queries() entry and
its oracle_sql() side-by-side, compare row count, column names, and an
order-insensitive value hash.

Floats are compared through the queries' own explicit rounding — no
tolerance here, exactly like the driver.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from tests.conftest import SF_SMOKE

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def _canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    body = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return cols, body


QUERY_NAMES = sorted(entry_mod.queries().keys())


def _assert_parity(spark, name: str, sf_dir: str,
                   timings: dict | None = None) -> None:
    """Value-hash parity of one queries() entry vs its DuckDB oracle.

    When `timings` is passed, records {"spark_s", "oracle_s"} into it —
    the Spark plan+collect wall vs the DuckDB sql+fetch wall (r11 verdict
    #7: nightly-tail adjudications like "q36's wall is the oracle's"
    must be numbers in NIGHTLY_r{N}.json, not COVERAGE prose)."""
    import time as _time

    q = entry_mod.queries()[name]
    t0 = _time.perf_counter()
    sdf = q(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    if timings is not None:
        timings["spark_s"] = round(_time.perf_counter() - t0, 2)
    # free this query's persisted intermediates NOW: in a 74-query sweep
    # session the un-released caches (LSH encodes, LM model tables,
    # checkpointed label frames, ...) otherwise accumulate until storage
    # eviction/GC pressure inflates later queries' walls — NIGHTLY_r13
    # measured q54 at 15.7 s mid-sweep vs 1.0 s isolated before this fix
    from tegallega_spark.session import release_intermediates

    release_intermediates(sdf, blocking=False)
    spark.catalog.clearCache()

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only check, like the driver's weak mode
        assert len(spark_rows) >= 0
        return

    t0 = _time.perf_counter()
    con = _duck(sf_dir)
    rel = con.sql(sql)
    duck_cols, duck_rows = rel.columns, rel.fetchall()
    if timings is not None:
        timings["oracle_s"] = round(_time.perf_counter() - t0, 2)

    s_cols, s_body = _canon(spark_cols, [tuple(r) for r in spark_rows])
    d_cols, d_body = _canon(duck_cols, duck_rows)

    assert s_cols == [c.lower() for c in d_cols], f"{name}: column names differ"
    assert len(s_body) == len(d_body), (
        f"{name}: row count {len(s_body)} vs oracle {len(d_body)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_body, d_body)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    _assert_parity(spark, name, SF_SMOKE)


def _headline_names() -> list[str]:
    import bench

    return sorted(bench.HEADLINE)


@pytest.mark.nightly
@pytest.mark.skipif(
    not os.environ.get("TEGALLEGA_NIGHTLY"),
    reason="sf0.1 parity is the nightly tier — set TEGALLEGA_NIGHTLY=1",
)
@pytest.mark.parametrize("name", _headline_names())
def test_headline_parity_at_bench_scale(spark, name):
    """The quick suite checks value-hash parity at sf0.001; the bench
    publishes numbers at sf0.1.  This nightly tier runs the SAME gate on
    the bench-headline queries at the published scale, so a result that
    only diverges on bigger data (overflow, precision drift under
    different partial-agg orders, sampling-threshold edges) can't hide
    behind the small-sf green."""
    _assert_parity(
        spark, name, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
