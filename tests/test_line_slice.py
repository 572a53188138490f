"""Q5 line slicing (turf.lineSlice semantics, reference index.html:234-247):
projection endpoints, line-direction output, same-segment and clamped cases,
and the full Dijkstra → slice → FeatureCollection composition."""

from __future__ import annotations

import math

import pytest

from tegallega_spark.operators.graph import build_edges, dijkstra_local
from tegallega_spark.operators.spatial import line_slice, slice_path_geojson


@pytest.fixture(scope="module")
def flat_line(spark):
    # straight polyline along the equator: vertices at lon 0.00 .. 0.03
    return spark.createDataFrame(
        [("R1", i, 0.01 * i, 0.0) for i in range(4)],
        "relation_id string, vertex_idx int, lon double, lat double",
    )


def run_slice(spark, flat_line, rows):
    slices = spark.createDataFrame(
        rows,
        "slice_id int, relation_id string, start_lon double, start_lat double, "
        "stop_lon double, stop_lat double",
    )
    out = {}
    for r in line_slice(slices, flat_line).collect():
        out.setdefault(r["slice_id"], []).append((r["pt_seq"], r["lon"], r["lat"]))
    return {k: [(lon, lat) for _, lon, lat in sorted(v)] for k, v in out.items()}


def approx(seq, expected):
    assert len(seq) == len(expected), (seq, expected)
    for (alon, alat), (elon, elat) in zip(seq, expected):
        assert math.isclose(alon, elon, abs_tol=1e-12)
        assert math.isclose(alat, elat, abs_tol=1e-12)


def test_mid_segment_slice(spark, flat_line):
    # start projects into segment 0 at t=0.4, stop into segment 2 at t=0.5
    got = run_slice(spark, flat_line, [(0, "R1", 0.004, 0.001, 0.025, -0.002)])
    approx(got[0], [(0.004, 0.0), (0.01, 0.0), (0.02, 0.0), (0.025, 0.0)])


def test_reversed_arguments_follow_line_direction(spark, flat_line):
    # turf orders ends by segment index — output identical to the forward call
    got = run_slice(spark, flat_line, [(0, "R1", 0.025, -0.002, 0.004, 0.001)])
    approx(got[0], [(0.004, 0.0), (0.01, 0.0), (0.02, 0.0), (0.025, 0.0)])


def test_same_segment_two_points(spark, flat_line):
    got = run_slice(spark, flat_line, [(0, "R1", 0.004, 0.001, 0.007, -0.001)])
    approx(got[0], [(0.004, 0.0), (0.007, 0.0)])


def test_point_beyond_line_clamps_to_endpoint(spark, flat_line):
    got = run_slice(spark, flat_line, [(0, "R1", 0.015, 0.001, 0.05, 0.001)])
    approx(got[0], [(0.015, 0.0), (0.02, 0.0), (0.03, 0.0)])


def test_point_on_shared_vertex_duplicates_like_turf(spark, flat_line):
    # exactly on vertex 1: turf assigns segment 0 (first-win scan) and then
    # re-appends vertex 1 — the duplicate coordinate is turf-faithful
    got = run_slice(spark, flat_line, [(0, "R1", 0.01, 0.0005, 0.025, 0.0)])
    approx(got[0], [(0.01, 0.0), (0.01, 0.0), (0.02, 0.0), (0.025, 0.0)])


def test_many_slices_and_keys_at_once(spark, flat_line):
    other = spark.createDataFrame(
        [("R2", i, 0.0, 0.01 * i) for i in range(3)],
        "relation_id string, vertex_idx int, lon double, lat double",
    )
    lines = flat_line.unionByName(other)
    got = run_slice(
        spark,
        lines,
        [
            (0, "R1", 0.004, 0.001, 0.025, -0.002),
            (1, "R2", -0.001, 0.004, 0.001, 0.016),
        ],
    )
    approx(got[0], [(0.004, 0.0), (0.01, 0.0), (0.02, 0.0), (0.025, 0.0)])
    approx(got[1], [(0.0, 0.004), (0.0, 0.01), (0.0, 0.016)])


def test_dijkstra_to_feature_collection(spark):
    """index.html:211-252 end-to-end: route the graph, slice each hop from
    its route's polyline, assemble the rendered FeatureCollection."""
    stops = spark.createDataFrame(
        [
            ("s1", "Stop 1", 0.0, 0.000),
            ("s2", "Stop 2", 0.0, 0.010),
            ("s3", "Stop 3", 0.01, 0.010),
        ],
        "stop_id string, stop_name string, stop_lat double, stop_lon double",
    )
    stop_times = spark.createDataFrame(
        [("t1", "s1", 1), ("t1", "s2", 2), ("t2", "s2", 1), ("t2", "s3", 2)],
        "trip_id string, stop_id string, stop_sequence int",
    )
    trips = spark.createDataFrame(
        [("t1", "R1"), ("t2", "R2")], "trip_id string, route_id string"
    )
    # R1 runs along the equator with a midpoint vertex; R2 north from s2
    vertices = spark.createDataFrame(
        [("R1", 0, 0.0, 0.0), ("R1", 1, 0.005, 0.0), ("R1", 2, 0.01, 0.0),
         ("R2", 0, 0.01, 0.0), ("R2", 1, 0.01, 0.01)],
        "relation_id string, vertex_idx int, lon double, lat double",
    )
    edges = build_edges(stop_times, stops, trips)
    total, path, routes = dijkstra_local(edges, "s1", "s3")
    assert path == ["s1", "s2", "s3"] and routes == ["R1", "R2"]
    coords = stops.selectExpr("stop_id", "stop_lon as lon", "stop_lat as lat")
    fc = slice_path_geojson(path, routes, vertices, coords)
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2
    f1, f2 = fc["features"]
    assert f1["properties"] == {"route": "R1", "from": "s1", "to": "s2"}
    assert f1["geometry"]["coordinates"] == [[0.0, 0.0], [0.005, 0.0], [0.01, 0.0]]
    assert f2["geometry"]["coordinates"] == [[0.01, 0.0], [0.01, 0.01]]
