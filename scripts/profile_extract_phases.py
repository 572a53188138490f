#!/usr/bin/env python
"""Sub-phase drill-down of the extract chain's compute phase (r12 verdict
#3: 65% of the distributed 204.8 k wall sits in stitch/interpolate/thin —
this script splits THAT phase into its operator sub-stages with
persist+count barriers so the next optimization targets the true hot spot,
not a guess).  Attribution only: barrier materialization makes the sum
exceed the fused wall; ratios are the finding.

Usage: python scripts/profile_extract_phases.py [N]   (default 25600)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.stress_extract import make_sandbox, make_shard_fetch  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_600

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from tegallega_spark.operators.spatial import (
        drop_near_real_arr,
        interpolate_virtual_stops_along_polyline,
        polyline_arrays,
        project_onto_segments,
    )
    from tegallega_spark.operators.stateful import stitch_ways, thin_stops
    from tegallega_spark.pipeline.extract import (
        MAX_DISTANCE_KM,
        MIN_DISTANCE_KM,
        coord_name_map,
        write_route_geojson,
    )
    from tegallega_spark.session import get_spark
    from tegallega_spark.sources.overpass import fetch_bundles_distributed

    spark = get_spark("extract-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    box, rids = make_sandbox(n)
    fetch = make_shard_fetch(os.path.join(box, "world"))

    phases: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        phases[name] = round(time.perf_counter() - t0, 2)
        return time.perf_counter()

    t0 = time.perf_counter()
    ways_df, nodes_df = fetch_bundles_distributed(
        spark, [str(r) for r in rids], fetch
    )
    ways_df, nodes_df = ways_df.persist(), nodes_df.persist()
    ways_df.count(), nodes_df.count()
    t0 = mark("fetch_parse", t0)

    stitched = stitch_ways(ways_df, key="relation_id").persist()
    stitched.count()
    t0 = mark("stitch_W8", t0)

    poly = polyline_arrays(stitched, key="relation_id").persist()
    poly.count()
    t0 = mark("polyline_arrays", t0)

    pts = nodes_df.select(
        "relation_id", F.col("member_order").alias("pid"), "stop_id", "name",
        "role", "lon", "lat",
    ).persist()
    proj = project_onto_segments(
        pts.select("relation_id", "pid", "lon", "lat"), stitched,
        key="relation_id", point_id="pid",
    )
    real = pts.join(
        proj.select("relation_id", "pid", "frac_idx"), ["relation_id", "pid"]
    ).persist()
    real.count()
    t0 = mark("project_real_J4", t0)

    virt = interpolate_virtual_stops_along_polyline(
        real.select("relation_id", F.col("pid").alias("member_order"),
                    "lon", "lat", "frac_idx"),
        poly, key="relation_id", order_col="member_order",
        max_gap_km=MAX_DISTANCE_KM,
    ).persist()
    virt.count()
    t0 = mark("interpolate_W10", t0)

    virt2 = drop_near_real_arr(
        virt, real.select("relation_id", "lon", "lat"),
        key="relation_id", max_dist_m=MIN_DISTANCE_KM * 1000,
    ).persist()
    virt2.count()
    t0 = mark("drop_near_real_J5", t0)

    names = coord_name_map(ways_df)
    virt3 = (
        virt2.join(names, ["relation_id", "lon", "lat"], "left")
        .select(
            "relation_id", "stop_id",
            F.coalesce(F.col("street_name"), F.lit("Jalan terdekat")).alias("name"),
            F.lit("virtual").alias("role"), F.lit(False).alias("is_real"),
            "lon", "lat",
        ).persist()
    )
    virt3.count()
    t0 = mark("name_lookup_A7", t0)

    allstops = real.select(
        "relation_id", "stop_id", "name", "role", F.lit(True).alias("is_real"),
        "lon", "lat",
    ).unionByName(virt3)
    w = Window.partitionBy("relation_id").orderBy("stop_id", "lon", "lat")
    allstops = allstops.withColumn("pid", F.row_number().over(w))
    proj_all = project_onto_segments(
        allstops.select("relation_id", "pid", "lon", "lat"), stitched,
        key="relation_id", point_id="pid",
    )
    positioned = allstops.join(
        proj_all.select("relation_id", "pid", "frac_idx"),
        ["relation_id", "pid"],
    ).drop("pid").persist()
    positioned.count()
    t0 = mark("project_all_J4b", t0)

    stops = thin_stops(
        positioned.select("relation_id", "stop_id", "name", "role", "lon",
                          "lat", "frac_idx", "is_real"),
        key="relation_id",
    ).persist()
    stops.count()
    t0 = mark("thin_W9", t0)

    spark_out = os.path.join(box, "spark-route-data-phase-profile")
    write_route_geojson(stitched, stops, spark_out)
    t0 = mark("geojson_sink_K2", t0)

    total = sum(phases.values())
    out = {"relations": n, "phases_s": phases,
           "sum_s": round(total, 2),
           "pct": {k: round(100 * v / total, 1) for k, v in phases.items()}}
    print(json.dumps(out, indent=2))
    # keep the sandbox (fixture-complete marker makes re-runs free);
    # remove only this profile's sink output
    shutil.rmtree(spark_out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
