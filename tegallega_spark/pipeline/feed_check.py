"""GTFS feed referential-integrity validation — the offline stand-in for
the OTP graph-build smoke (SURVEY §5.2; reference
.github/workflows/build-graph.yml:25-27 feeds the generated gtfs.zip to
OpenTripPlanner's `--build --save`).

OTP cannot run here: the container has no network and no vendored OTP
jar (the reference's otp-deploy/graph.obj is a 134-byte LFS pointer, not
a jar or a graph).  What OTP's GTFS loader would do first, though, is
public knowledge — the GTFS static spec's referential rules, which OTP
enforces at graph-build time (unknown stop/trip/route/service references
are load errors; see also the FIXTURES.md attempt log).  This module
implements those checks as Spark anti-joins over the WRITTEN feed files,
so the gtfs.zip we hand an external OTP is known-loadable before it
leaves the pipeline.

Scale design: every check is a left-anti join or a grouped count —
dimension sides (trips' distinct service_ids, routes, agency) are small
and broadcast; the fact side (stop_times, shapes) streams through one
hash join each, no collect anywhere.  On a 100 TB feed lake the same
plan validates each feed partition independently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tegallega_spark.sources.gtfs import read_gtfs_table

# HH:MM:SS with hours allowed past 24 (GTFS times are service-day
# offsets; the reference emits up to 28:xx:xx — functions/timecodec.py)
_TIME_RE = r"^\d{1,3}:[0-5]\d:[0-5]\d$"


def _anti_count(fact: DataFrame, dim: DataFrame, fact_col: str,
                dim_col: str) -> int:
    """Rows of `fact` whose fact_col has no match in dim.dim_col.
    Nulls/empties are not dangling references (optional fields)."""
    return (
        fact.filter(F.col(fact_col).isNotNull() & (F.col(fact_col) != ""))
        .join(
            dim.select(F.col(dim_col).alias(fact_col)).distinct(),
            fact_col,
            "left_anti",
        )
        .count()
    )


def validate_gtfs_feed(spark: SparkSession, feed_dir: str) -> dict[str, int]:
    """Counts of load-blocking defects per referential rule; an
    all-zeros dict means an OTP-style consumer can resolve every
    reference in the feed.  Keys are stable for test pinning."""
    t = {name: read_gtfs_table(spark, feed_dir, name)
         for name in ("agency", "routes", "trips", "stops", "stop_times",
                      "shapes", "calendar")
         if os.path.exists(os.path.join(feed_dir, f"{name}.txt"))}
    st, trips, stops = t["stop_times"], t["trips"], t["stops"]

    out = {
        # dangling references (OTP load errors)
        "stop_times_unknown_trip": _anti_count(st, trips, "trip_id", "trip_id"),
        "stop_times_unknown_stop": _anti_count(st, stops, "stop_id", "stop_id"),
        "trips_unknown_route": _anti_count(trips, t["routes"], "route_id", "route_id"),
        "trips_unknown_service": _anti_count(trips, t["calendar"], "service_id", "service_id"),
        "trips_unknown_shape": _anti_count(trips, t["shapes"], "shape_id", "shape_id"),
        "routes_unknown_agency": _anti_count(t["routes"], t["agency"], "agency_id", "agency_id"),
        # sequence integrity
        "stop_times_duplicate_sequence": (
            st.groupBy("trip_id", "stop_sequence").count()
            .filter(F.col("count") > 1).count()
        ),
        "shapes_duplicate_sequence": (
            t["shapes"].groupBy("shape_id", "shape_pt_sequence").count()
            .filter(F.col("count") > 1).count()
        ),
        "trips_without_stop_times": _anti_count(trips, st, "trip_id", "trip_id"),
        # field validity
        "stop_times_bad_time": st.filter(
            ~F.col("arrival_time").rlike(_TIME_RE)
            | ~F.col("departure_time").rlike(_TIME_RE)
        ).count(),
        "stop_times_departure_before_arrival": st.filter(
            F.split("departure_time", ":")[0].cast("int") * 3600
            + F.split("departure_time", ":")[1].cast("int") * 60
            + F.split("departure_time", ":")[2].cast("int")
            < F.split("arrival_time", ":")[0].cast("int") * 3600
            + F.split("arrival_time", ":")[1].cast("int") * 60
            + F.split("arrival_time", ":")[2].cast("int")
        ).count(),
        "stops_bad_coordinates": stops.filter(
            (F.col("stop_lat").cast("double").isNull())
            | (F.col("stop_lon").cast("double").isNull())
            | (F.abs(F.col("stop_lat").cast("double")) > 90.0)
            | (F.abs(F.col("stop_lon").cast("double")) > 180.0)
        ).count(),
    }
    return out
