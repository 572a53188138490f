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


# GTFS-required tables; calendar is special-cased (calendar.txt OR
# calendar_dates.txt satisfies the service-definition requirement), and
# shapes.txt is optional (trips.shape_id may legitimately be empty).
_REQUIRED = ("agency", "stops", "routes", "trips", "stop_times")


def validate_gtfs_feed(spark: SparkSession, feed_dir: str) -> dict[str, int]:
    """Counts of load-blocking defects per referential rule; an
    all-zeros dict means an OTP-style consumer can resolve every
    reference in the feed.  Keys are stable for test pinning.

    A structurally broken feed (required table missing) is itself a
    defect REPORT, not a crash: each absent required table yields a
    `missing_table_<name>` = 1 counter, and checks whose inputs are
    absent are skipped (their keys omitted) rather than KeyError-ing.
    Valid feeds that omit OPTIONAL files — shapes.txt, or calendar.txt
    replaced by calendar_dates.txt — still validate: shape references
    are checked against an empty dimension only when trips actually
    carry non-empty shape_ids, and service references resolve against
    the union of calendar and calendar_dates."""
    t = {name: read_gtfs_table(spark, feed_dir, name)
         for name in ("agency", "routes", "trips", "stops", "stop_times",
                      "shapes", "calendar", "calendar_dates")
         if os.path.exists(os.path.join(feed_dir, f"{name}.txt"))}

    out: dict[str, int] = {
        f"missing_table_{name}": int(name not in t) for name in _REQUIRED
    }
    out["missing_table_calendar"] = int(
        "calendar" not in t and "calendar_dates" not in t
    )

    def have(*names: str) -> bool:
        return all(n in t for n in names)

    # dangling references (OTP load errors)
    if have("stop_times", "trips"):
        out["stop_times_unknown_trip"] = _anti_count(
            t["stop_times"], t["trips"], "trip_id", "trip_id")
        out["trips_without_stop_times"] = _anti_count(
            t["trips"], t["stop_times"], "trip_id", "trip_id")
    if have("stop_times", "stops"):
        out["stop_times_unknown_stop"] = _anti_count(
            t["stop_times"], t["stops"], "stop_id", "stop_id")
    if have("trips", "routes"):
        out["trips_unknown_route"] = _anti_count(
            t["trips"], t["routes"], "route_id", "route_id")
    if "trips" in t and ("calendar" in t or "calendar_dates" in t):
        dims = [t[n].select("service_id")
                for n in ("calendar", "calendar_dates") if n in t]
        svc = dims[0] if len(dims) == 1 else dims[0].unionByName(dims[1])
        out["trips_unknown_service"] = _anti_count(
            t["trips"], svc, "service_id", "service_id")
    if "trips" in t and "shape_id" in t["trips"].columns:
        if "shapes" in t:
            out["trips_unknown_shape"] = _anti_count(
                t["trips"], t["shapes"], "shape_id", "shape_id")
        else:
            # shapes.txt absent is legal ONLY while no trip references a
            # shape: every non-empty shape_id is then a dangling ref
            out["trips_unknown_shape"] = (
                t["trips"].filter(
                    F.col("shape_id").isNotNull() & (F.col("shape_id") != "")
                ).count()
            )
    if have("routes", "agency"):
        out["routes_unknown_agency"] = _anti_count(
            t["routes"], t["agency"], "agency_id", "agency_id")

    # sequence integrity
    if "stop_times" in t:
        st = t["stop_times"]
        out["stop_times_duplicate_sequence"] = (
            st.groupBy("trip_id", "stop_sequence").count()
            .filter(F.col("count") > 1).count()
        )
        # field validity
        out["stop_times_bad_time"] = st.filter(
            ~F.col("arrival_time").rlike(_TIME_RE)
            | ~F.col("departure_time").rlike(_TIME_RE)
        ).count()
        # try_cast, not cast: a malformed time (already counted by
        # stop_times_bad_time) must NULL out of this comparison, not
        # ANSI-throw the whole validation
        out["stop_times_departure_before_arrival"] = st.filter(
            F.split("departure_time", ":")[0].try_cast("int") * 3600
            + F.split("departure_time", ":")[1].try_cast("int") * 60
            + F.split("departure_time", ":")[2].try_cast("int")
            < F.split("arrival_time", ":")[0].try_cast("int") * 3600
            + F.split("arrival_time", ":")[1].try_cast("int") * 60
            + F.split("arrival_time", ":")[2].try_cast("int")
        ).count()
    if "shapes" in t:
        out["shapes_duplicate_sequence"] = (
            t["shapes"].groupBy("shape_id", "shape_pt_sequence").count()
            .filter(F.col("count") > 1).count()
        )
    if "stops" in t:
        out["stops_bad_coordinates"] = t["stops"].filter(
            (F.col("stop_lat").try_cast("double").isNull())
            | (F.col("stop_lon").try_cast("double").isNull())
            | (F.abs(F.col("stop_lat").try_cast("double")) > 90.0)
            | (F.abs(F.col("stop_lon").try_cast("double")) > 180.0)
        ).count()
    return out
