"""Extract pipeline: OSM relation → stitched ways + (angkot) virtual-stop
synthesis → per-route GeoJSON (SURVEY §3.1, reference update-routes.js).

The network boundary stays on the driver (sources/overpass.py); everything
after the fetch is DataFrames:

    members (ordered)         J2   ordered lookup join
      → stitch_ways           W8   applyInPandas stateful fold
      → project stops         J4   segment argmin, pure column math
      → virtual stops         W10  explode(sequence) + polyline lerp
      → drop-near-real        J5   distance-predicate anti join
      → re-project + sort     O1
      → min-spacing thinning  W9   applyInPandas stateful fold
      → GeoJSON sink          K2   file-per-route partition layout

Per-relation state never crosses a key boundary, so the whole chain scales
linearly with #relations.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from tegallega_spark.operators.spatial import (
    drop_near_real_arr,
    interpolate_virtual_stops_along_polyline,
    polyline_arrays,
    project_onto_segments,
)
from tegallega_spark.operators.stateful import stitch_ways, thin_stops
from tegallega_spark.session import attach_intermediates
from tegallega_spark.sources.overpass import (
    FetchFn,
    bundle_to_dataframes,
    default_fetch,
    fetch_relation_bundle,
)

MAX_DISTANCE_KM = 0.25  # js:282
MIN_DISTANCE_KM = 0.15  # js:283


def coord_name_map(way_vertices: DataFrame) -> DataFrame:
    """A7 (js:251-261): first-wins (lon,lat) → street name over way order.

    min_by over the (way_order, vertex_idx) struct instead of a
    row_number window: same first-wins winner, but the aggregate gets a
    map-side partial combine and skips the window's per-partition sort
    (r13 extract-compute pass)."""
    return way_vertices.groupBy("relation_id", "lon", "lat").agg(
        F.min_by("way_name", F.struct("way_order", "vertex_idx")).alias(
            "street_name"
        )
    )


def angkot_stops(
    real_stops: DataFrame, stitched: DataFrame, way_vertices: DataFrame
) -> DataFrame:
    """processAngkotStops (js:249-376): real stops + interpolated virtual
    stops, ordered along the route, min-spacing thinned.

    Returns (relation_id, stop_id, name, role, is_real, lon, lat, frac_idx)
    in final kept order (frac_idx ascending per relation).

    r13 (r12 verdict #3): mixed polyline forms, each picked by a 204.8 k
    sub-phase profile.  The interpolation lookups and the near-real
    filter run over the ARRAY form (polyline_arrays): element_at /
    F.exists scans with no vertex-row shuffle — measured at ~5.7 s and
    ~3.7 s where the row form's exchanges dominated the r12 profile.
    The two J4 PROJECTIONS stay on the ROW form (project_onto_segments):
    Spark evaluates higher-order-function lambdas interpreted, with a
    struct allocation per element — an F.aggregate segment scan measured
    80 s (real) + 308 s (all) at 204.8 k, vs the explode join + struct-min
    whose arithmetic is whole-stage-codegen'd.  Shuffle savings lose to
    interpreted compute once the segment count is the work; both forms
    are bit-identical (extract race + goldens assert it).
    """
    # the array frame is read by the interpolation + near-real filter —
    # persist and ride the handle out on the result (session pattern)
    poly = polyline_arrays(stitched, key="relation_id").persist()

    # J4: project real stops (by member order, ids may repeat)
    pts = real_stops.select(
        "relation_id", F.col("member_order").alias("pid"), "stop_id", "name",
        "role", "lon", "lat",
    )
    proj = project_onto_segments(
        pts.select("relation_id", "pid", "lon", "lat"),
        stitched,
        key="relation_id",
        point_id="pid",
    )
    # real is read THREE times in the fused plan (interpolation input,
    # near-real coordinate array, the final union) — without a persist
    # each consumer re-runs the J4 projection and the fetch/parse below
    # it (measured ~50 s of the 204.8 k fused wall).  Rides out on the
    # result with attach_intermediates like poly.
    real = pts.join(
        proj.select("relation_id", "pid", "frac_idx"), ["relation_id", "pid"]
    ).persist()

    # W10: virtual stops between consecutive real stops along the polyline
    virt = interpolate_virtual_stops_along_polyline(
        real.select("relation_id", F.col("pid").alias("member_order"), "lon", "lat", "frac_idx"),
        poly,
        key="relation_id",
        order_col="member_order",
        max_gap_km=MAX_DISTANCE_KM,
    )
    # J5: too close to ANY real stop of the relation (js:311-313)
    virt = drop_near_real_arr(
        virt, real.select("relation_id", "lon", "lat"),
        key="relation_id", max_dist_m=MIN_DISTANCE_KM * 1000,
    )
    # A7 lookup: virtual stop name = street of the exactly-matching vertex,
    # default 'Jalan terdekat' (js:324 — the exact-coordinate lookup only
    # hits when the interpolation parameter lands on a vertex)
    names = coord_name_map(way_vertices)
    virt = (
        virt.join(names, ["relation_id", "lon", "lat"], "left")
        .select(
            "relation_id",
            "stop_id",
            F.coalesce(F.col("street_name"), F.lit("Jalan terdekat")).alias("name"),
            F.lit("virtual").alias("role"),
            F.lit(False).alias("is_real"),
            "lon",
            "lat",
        )
    )

    # union + position by frac_idx (js:341-350).  The reference re-projects
    # EVERY stop here with the same pure projectPointToLineString it used
    # on the real stops before interpolation — same point, same polyline,
    # so the real stops' second projection is bit-for-bit the first one
    # (referential transparency; the race and goldens pin it).  Carry the
    # reals' frac_idx forward and project only the VIRTUAL stops — at
    # 204.8 k relations the all-stops re-projection was the single
    # largest compute phase (88 s of a 250 s barriered profile).
    w = Window.partitionBy("relation_id").orderBy("stop_id", "lon", "lat")
    virt = virt.withColumn("pid", F.row_number().over(w))
    proj_virt = project_onto_segments(
        virt.select("relation_id", "pid", "lon", "lat"),
        stitched,
        key="relation_id",
        point_id="pid",
    )
    positioned = real.select(
        "relation_id", "stop_id", "name", "role", F.lit(True).alias("is_real"),
        "lon", "lat", "frac_idx",
    ).unionByName(
        virt.join(
            proj_virt.select("relation_id", "pid", "frac_idx"),
            ["relation_id", "pid"],
        )
        .drop("pid")
        .select("relation_id", "stop_id", "name", "role", "is_real",
                "lon", "lat", "frac_idx")
    )

    # W9: min-spacing thinning against the last KEPT stop (js:352-373)
    return attach_intermediates(
        thin_stops(
            positioned.select(
                "relation_id", "stop_id", "name", "role", "lon", "lat",
                "frac_idx", "is_real",
            ),
            key="relation_id",
        ),
        poly,
        real,
    )


def extract_route(
    spark: SparkSession,
    relation_id: str,
    mode: str,
    fetch_fn: FetchFn = default_fetch,
) -> tuple[DataFrame, DataFrame]:
    """processRoute (js:379-474): returns (stitched way vertices, stops)."""
    bundle = fetch_relation_bundle(relation_id, fetch_fn)
    ways_df, nodes_df = bundle_to_dataframes(spark, relation_id, bundle)
    stitched = stitch_ways(ways_df, key="relation_id")
    if mode == "angkot":
        stops = angkot_stops(nodes_df, stitched, ways_df)
    else:
        stops = nodes_df.select(
            "relation_id", "stop_id", "name", "role",
            F.lit(True).alias("is_real"), "lon", "lat",
            F.col("member_order").cast("double").alias("frac_idx"),
        )
    return stitched, stops


def _write_relation_geojson(out_dir: str, ways_pdf, stops_pdf):
    """Per-relation file writer, executed ON EXECUTORS via cogrouped
    applyInPandas.  Writes {out_dir}/{relation_id}/{ways,stops}.geojson
    (the reference's exact file grammar) and returns a one-row frame with
    the written directory — metadata, not data, so the driver-side
    collect over the sink result is O(#relations) paths, never vertices."""
    import pandas as pd

    if ways_pdf.empty:
        # a relation with stops but no stitched ways gets no directory —
        # matches the driver-loop implementation this replaces (it
        # iterated the ways map and looked stops up)
        return pd.DataFrame({"relation_dir": pd.Series([], dtype="object")})
    rel = str(ways_pdf["relation_id"].iloc[0])
    ways_pdf = ways_pdf.sort_values("vertex_idx")
    coords = [
        [float(x), float(y)]
        for x, y in zip(ways_pdf["lon"].tolist(), ways_pdf["lat"].tolist())
    ]
    d = os.path.join(out_dir, rel)
    os.makedirs(d, exist_ok=True)
    ways_fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "LineString", "coordinates": coords},
                "properties": {"relationId": rel},
            }
        ],
    }
    with open(os.path.join(d, "ways.geojson"), "w") as f:
        json.dump(ways_fc, f, indent=2)
    stops_pdf = stops_pdf.sort_values("frac_idx", kind="stable")
    stops_fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Point",
                    "coordinates": [float(s.lon), float(s.lat)],
                },
                "properties": {
                    "id": str(s.stop_id),
                    "name": str(s.name),
                    "role": str(s.role),
                    "isReal": bool(s.is_real),
                    "mode": "bus",
                },
            }
            for s in stops_pdf.itertuples(index=False)
        ],
    }
    with open(os.path.join(d, "stops.geojson"), "w") as f:
        json.dump(stops_fc, f, indent=2)
    return pd.DataFrame({"relation_dir": [d]})


def write_route_geojson(
    stitched: DataFrame, stops: DataFrame, out_dir: str,
    return_paths: bool = False,
) -> int | list[str]:
    """K2 sink (js:413-417,462-465): pretty-printed ways.geojson +
    stops.geojson per relation directory.

    File-per-route IS the partition layout, and the files are written
    FROM EXECUTORS: a cogrouped applyInPandas over (stitched ⨝ stops by
    relation_id) gives each task the complete payload of its relations
    and nothing else, so the sink scales with #relations across the
    cluster — no driver collect of route geometry anywhere (the r10
    extract race measured the old driver-funnel version turning the
    throughput curve DOWN at 409.6 k relations; this is the fix).

    Returns the COUNT of directories written — the count() reduces on
    executors, so nothing per-relation ever crosses the driver (r11
    verdict #3: the previous contract collected one path string per
    relation, ~linear driver memory that would meet the stock 1 g
    maxResultSize around the 40 M-relation mark — the same funnel
    species the data path already eliminated, one layer up).  Tests and
    small presentation callers can opt back into the sorted path list
    with return_paths=True, documented as driver-linear.

    `out_dir` must be reachable from every executor — trivially true on
    local[N]; on a real cluster that means a shared filesystem mount or
    an object-store fuse path, which is the standard contract for any
    executor-side file sink."""
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_group(ways_pdf, stops_pdf):
        return _write_relation_geojson(out_dir, ways_pdf, stops_pdf)

    result = (
        stitched.groupBy("relation_id")
        .cogroup(stops.groupBy("relation_id"))
        .applyInPandas(write_group, schema="relation_dir string")
    )
    if return_paths:
        return sorted(r.relation_dir for r in result.collect())
    return result.count()
