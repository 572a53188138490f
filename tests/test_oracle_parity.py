"""Mirror of the driver's t2 correctness gate: run every queries() entry and
its oracle_sql() side-by-side, compare row count, column names, and an
order-insensitive value hash.

Floats are compared through the queries' own explicit rounding — no
tolerance here, exactly like the driver.
"""

from __future__ import annotations

import math

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


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_SMOKE)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only check, like the driver's weak mode
        assert len(spark_rows) >= 0
        return

    con = _duck(SF_SMOKE)
    rel = con.sql(sql)
    duck_cols, duck_rows = rel.columns, rel.fetchall()

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
