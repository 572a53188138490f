"""Extract pipeline tests with an offline fake Overpass fetcher
(SURVEY §3.1: W8 stitch, J4 projection, W10 virtual stops, J5 proximity
anti-join, W9 thinning, K2 sink)."""

from __future__ import annotations

import json
import math
import os

import pytest

from tegallega_spark.pipeline.extract import extract_route, write_route_geojson
from tegallega_spark.sources.overpass import (
    nodes_query,
    relation_query,
    ways_query,
)

# A straight east-west street of 3 ways; way2 is reversed (stitch must flip
# it); stops at the ends ~1.1 km apart force virtual-stop synthesis.
WAY1 = {"id": 101, "tags": {"name": "Jalan Satu"},
        "geometry": [{"lon": 0.000, "lat": 0.0}, {"lon": 0.002, "lat": 0.0}]}
WAY2 = {"id": 102, "tags": {"name": "Jalan Dua"},
        "geometry": [{"lon": 0.006, "lat": 0.0}, {"lon": 0.004, "lat": 0.0},
                      {"lon": 0.002, "lat": 0.0}]}  # reversed orientation
WAY3 = {"id": 103, "tags": {},
        "geometry": [{"lon": 0.006, "lat": 0.0}, {"lon": 0.010, "lat": 0.0}]}
NODE_A = {"id": 201, "lon": 0.0, "lat": 0.0, "tags": {"name": "Alpha"}}
NODE_B = {"id": 202, "lon": 0.010, "lat": 0.0, "tags": {"name": "Beta"}}

RELATION = {
    "type": "relation",
    "id": 900,
    "members": [
        {"type": "way", "ref": 101, "role": ""},
        {"type": "way", "ref": 102, "role": ""},
        {"type": "way", "ref": 103, "role": ""},
        {"type": "node", "ref": 201, "role": "stop"},
        {"type": "node", "ref": 202, "role": "stop_exit_only"},
        {"type": "node", "ref": 999, "role": "platform"},  # filtered role
    ],
}


def fake_fetch(query: str) -> list[dict]:
    if query == relation_query("900"):
        return [RELATION]
    if query == ways_query([101, 102, 103]):
        return [WAY1, WAY2, WAY3]
    if query == nodes_query([201, 202]):
        return [NODE_A, NODE_B]
    raise AssertionError(f"unexpected query: {query}")


@pytest.fixture(scope="module")
def extracted(spark):
    return extract_route(spark, "900", mode="angkot", fetch_fn=fake_fetch)


def test_stitching_reverses_and_dedups(extracted):
    stitched, _ = extracted
    coords = [(r.lon, r.lat) for r in stitched.orderBy("vertex_idx").collect()]
    # way2 reversed + joint vertices dropped: 0,.002 | .004,.006 | .010
    assert coords == [
        (0.000, 0.0), (0.002, 0.0), (0.004, 0.0), (0.006, 0.0), (0.010, 0.0)
    ]


def test_virtual_stops_created_and_spaced(extracted):
    _, stops = extracted
    rows = stops.orderBy("frac_idx").collect()
    reals = [r for r in rows if r.is_real]
    virts = [r for r in rows if not r.is_real]
    assert [r.stop_id for r in reals] == ["201", "202"]
    # ~1.11 km gap → floor(1.11/0.25) = 4 virtual candidates, all ≥150 m
    # from the real ends after the anti-join
    assert len(virts) == 4
    assert all(v.stop_id.startswith("virtual_") for v in virts)
    assert all(v.role == "virtual" for v in virts)
    # min-spacing invariant along the final order
    def hav_m(a, b):
        R = 6371000.0
        p1, p2 = math.radians(a[1]), math.radians(b[1])
        x = math.sin((p2 - p1) / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(
            math.radians(b[0] - a[0]) / 2) ** 2
        return 2 * R * math.asin(math.sqrt(x))
    prev = None
    for r in rows:
        if prev is not None and not r.is_real:
            assert hav_m((prev.lon, prev.lat), (r.lon, r.lat)) >= 150 - 1e-6
        prev = r


def test_virtual_names_from_street_map(extracted):
    _, stops = extracted
    virts = [r for r in stops.collect() if not r.is_real]
    # interpolated points landing exactly on a vertex inherit its street
    # name; others default (js:324)
    assert all(
        v.name in {"Jalan Satu", "Jalan Dua", "Jalan terdekat"} for v in virts
    )


def test_non_angkot_keeps_raw_stops(spark):
    stitched, stops = extract_route(spark, "900", mode="bus", fetch_fn=fake_fetch)
    rows = stops.orderBy("frac_idx").collect()
    assert [r.stop_id for r in rows] == ["201", "202"]
    assert all(r.is_real for r in rows)


def test_geojson_sink_roundtrip(extracted, tmp_path):
    stitched, stops = extracted
    dirs = write_route_geojson(stitched, stops, str(tmp_path))
    assert len(dirs) == 1
    with open(os.path.join(dirs[0], "ways.geojson")) as f:
        ways = json.load(f)
    assert ways["features"][0]["geometry"]["type"] == "LineString"
    assert len(ways["features"][0]["geometry"]["coordinates"]) == 5
    with open(os.path.join(dirs[0], "stops.geojson")) as f:
        sj = json.load(f)
    props = [ft["properties"] for ft in sj["features"]]
    assert {p["id"] for p in props} >= {"201", "202"}
    assert all("isReal" in p and "role" in p for p in props)
