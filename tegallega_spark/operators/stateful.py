"""Stateful ordered scans — the two genuine UDF islands (SURVEY.md §2.11).

Both are per-key ordered folds whose step depends on the previous *decision*
(not just the previous row), so no window function expresses them.  They run
as groupBy(key).applyInPandas: state never leaves one key's group, Arrow
ships columnar batches, and parallelism scales linearly with #keys — the
right shape for 100 TB (millions of keys, each group tiny).

1. stitch_ways  — reference update-routes.js:111-141 (tolerance :106-108)
2. thin_stops   — reference update-routes.js:353-373
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame

COORD_TOL = 1e-6          # update-routes.js:106-108
MIN_SPACING_M = 150.0     # update-routes.js:282-283


def _close(a: tuple[float, float], b: tuple[float, float], tol: float = COORD_TOL) -> bool:
    return abs(a[0] - b[0]) < tol and abs(a[1] - b[1]) < tol


def _haversine_m(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    r = 6371000.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = p2 - p1, math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


# ---------------------------------------------------------------------------
# Way stitching
# ---------------------------------------------------------------------------

def _stitch_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Walk ways in member order; reverse a way when its end (not its
    start) touches the previous endpoint; then ALWAYS drop the first
    coordinate of every non-first way — the reference slices the joint
    vertex unconditionally, even across a gap (update-routes.js:132-134),
    and on a gap it warns but still concatenates (:127-129).  Replicated
    exactly, bug included."""
    pdf = pdf.sort_values(["way_order", "vertex_idx"])
    out_lon: list[float] = []
    out_lat: list[float] = []
    key = pdf["relation_id"].iloc[0]
    for _, way in pdf.groupby("way_order", sort=True):
        coords = list(zip(way["lon"].tolist(), way["lat"].tolist()))
        if out_lon:
            prev_end = (out_lon[-1], out_lat[-1])
            if not _close(coords[0], prev_end) and _close(coords[-1], prev_end):
                coords = coords[::-1]
            coords = coords[1:]  # unconditional joint-vertex drop (js:132-134)
        out_lon.extend(c[0] for c in coords)
        out_lat.extend(c[1] for c in coords)
    return pd.DataFrame(
        {
            "relation_id": key,
            "vertex_idx": range(len(out_lon)),
            "lon": out_lon,
            "lat": out_lat,
        }
    )


def stitch_ways(vertices: DataFrame, key: str = "relation_id") -> DataFrame:
    """vertices(relation_id, way_order, vertex_idx, lon, lat) →
    one stitched polyline per relation: (relation_id, vertex_idx, lon, lat)."""
    schema = "relation_id string, vertex_idx long, lon double, lat double"
    return vertices.groupBy(key).applyInPandas(_stitch_group, schema=schema)


# ---------------------------------------------------------------------------
# Min-spacing thinning
# ---------------------------------------------------------------------------

def _thin_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Walk stops in order; keep a stop iff it is real OR ≥ MIN_SPACING_M
    from the last *kept* stop (reference update-routes.js:353-373).  A true
    running-state fold: the distance is against the last kept, not the last
    seen.

    Vectorized chunk-and-rescan (r12 verdict #4): from each kept stop the
    NEXT kept stop is the first subsequent row that is real or ≥ the
    spacing from it — found by one vectorized haversine over the tail plus
    an argmax, so the Python loop runs once per KEPT stop, not per row.
    Same float arithmetic (math.* and np.* both IEEE double), identical
    keep set to the per-row walk (pinned by the extract goldens and the
    property tests)."""
    import numpy as np

    pdf = pdf.sort_values("frac_idx")
    n = len(pdf)
    lon = pdf["lon"].to_numpy(dtype=np.float64)
    lat = pdf["lat"].to_numpy(dtype=np.float64)
    is_real = pdf["is_real"].to_numpy().astype(bool)
    keep = np.zeros(n, dtype=bool)
    i = 0
    while i < n:
        keep[i] = True
        j = i + 1
        if j >= n:
            break
        p1 = math.radians(lat[i])
        dp = np.radians(lat[j:]) - p1
        dl = np.radians(lon[j:] - lon[i])
        a = (np.sin(dp / 2) ** 2
             + math.cos(p1) * np.cos(np.radians(lat[j:])) * np.sin(dl / 2) ** 2)
        d = 2 * 6371000.0 * np.arcsin(np.sqrt(a))
        ok = is_real[j:] | (d >= MIN_SPACING_M)
        nxt = np.flatnonzero(ok)
        if len(nxt) == 0:
            break
        i = j + int(nxt[0])
    return pdf[keep]


def thin_stops(stops: DataFrame, key: str = "relation_id") -> DataFrame:
    """stops(relation_id, stop_id, lon, lat, frac_idx, is_real) → subset
    satisfying the min-spacing invariant."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in stops.schema.fields
    )
    return stops.groupBy(key).applyInPandas(_thin_group, schema=schema)
