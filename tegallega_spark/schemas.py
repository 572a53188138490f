"""Explicit StructTypes for every table in the pipeline (SURVEY.md §1).

The reference is stringly-typed CSV/JSON with conventions; these schemas make
the conventions explicit.  Notes carried over from the reference:

- IDs stay strings, never ints — schedule-CSV matching is string equality
  (reference: action-scripts/generate_gtfs.py:245).
- Times of day are integer seconds-since-service-day-start and may exceed
  24:00:00 (reference: generate_gtfs.py:295-306). Never TimestampType.
- GTFS column ORDER is part of the contract (OTP consumes positionally-
  headered CSVs; reference: generate_gtfs.py:465-475).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# routes.json nested document (reference: generate_gtfs.py:42-82)
# categories[] -> routeGroups[] -> routes[]
# ---------------------------------------------------------------------------

ROUTE_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("directionId", LongType()),
        # relationId is a STRING in the document (IDs are never ints —
        # SURVEY §1.2; schedule matching is string equality)
        StructField("relationId", StringType()),
        StructField("first_departure", StringType()),
        StructField("last_departure", StringType()),
        StructField("trips", StringType()),
    ]
)

ROUTE_GROUP_SCHEMA = StructType(
    [
        StructField("groupId", StringType()),
        StructField("name", StringType()),
        StructField("color", StringType()),
        StructField("type", StringType()),
        StructField("loop", StringType()),
        StructField("routes", ArrayType(ROUTE_SCHEMA)),
    ]
)

CATEGORY_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("agencyId", StringType()),
        StructField("mode", StringType()),
        StructField("agencyUrl", StringType()),
        StructField("agencyTimezone", StringType()),
        StructField("agencyLang", StringType()),
        StructField("routeGroups", ArrayType(ROUTE_GROUP_SCHEMA)),
    ]
)

ROUTES_JSON_SCHEMA = StructType(
    [StructField("categories", ArrayType(CATEGORY_SCHEMA))]
)

# Flattened route-catalog row (one per route-direction).
ROUTE_CATALOG_COLUMNS = [
    "agency_id",
    "agency_name",
    "agency_url",
    "agency_timezone",
    "agency_lang",
    "mode",
    "group_id",
    "group_name",
    "color",
    "group_type",
    "loop",
    "route_name",
    "direction_id",
    "relation_id",
    "first_departure",
    "last_departure",
    "trips",
]

# ---------------------------------------------------------------------------
# GeoJSON features (reference: generate_gtfs.py:93-159, update-routes.js)
# ---------------------------------------------------------------------------

GEOJSON_GEOMETRY_SCHEMA = StructType(
    [
        StructField("type", StringType()),
        # Point: [lon, lat]; LineString: [[lon,lat],...]; MultiLineString:
        # [[[lon,lat],...],...]. JSON scan keeps the raw string and each
        # reader casts with from_json to the shape it needs.
        StructField("coordinates", StringType()),
    ]
)

STOP_ROW_SCHEMA = StructType(
    [
        StructField("relation_id", StringType()),
        StructField("stop_id", StringType()),
        StructField("stop_name", StringType()),
        StructField("role", StringType()),
        StructField("is_real", BooleanType()),
        StructField("wheelchair", IntegerType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("ingest_order", LongType()),
    ]
)

SHAPE_VERTEX_SCHEMA = StructType(
    [
        StructField("relation_id", StringType()),
        StructField("feature_idx", IntegerType()),
        StructField("line_idx", IntegerType()),
        StructField("vertex_idx", IntegerType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Schedule matrix long form (reference: generate_gtfs.py:228-324)
# ---------------------------------------------------------------------------

SCHEDULE_LONG_SCHEMA = StructType(
    [
        StructField("relation_id", StringType()),
        StructField("trip_num", StringType()),
        StructField("col_pair_idx", IntegerType()),
        StructField("stop_id", StringType()),
        StructField("arrival", StringType()),
        StructField("departure", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# GTFS output tables: exact column names AND order (generate_gtfs.py:489-517)
# ---------------------------------------------------------------------------

GTFS_COLUMNS: dict[str, list[str]] = {
    "agency": [
        "agency_id",
        "agency_name",
        "agency_url",
        "agency_timezone",
        "agency_lang",
    ],
    "routes": [
        "route_id",
        "agency_id",
        "route_short_name",
        "route_long_name",
        "route_type",
        "route_color",
    ],
    "trips": [
        "route_id",
        "trip_id",
        "service_id",
        "trip_headsign",
        "direction_id",
        "shape_id",
        "block_id",
    ],
    "stops": [
        "stop_id",
        "stop_name",
        "stop_lat",
        "stop_lon",
        "location_type",
        "wheelchair_boarding",
    ],
    "stop_times": [
        "trip_id",
        "stop_id",
        "stop_sequence",
        "arrival_time",
        "departure_time",
        "pickup_type",
        "drop_off_type",
    ],
    "shapes": [
        "shape_id",
        "shape_pt_lon",
        "shape_pt_lat",
        "shape_pt_sequence",
        "shape_dist_traveled",
    ],
    "calendar": [
        "service_id",
        "monday",
        "tuesday",
        "wednesday",
        "thursday",
        "friday",
        "saturday",
        "sunday",
        "start_date",
        "end_date",
    ],
}
