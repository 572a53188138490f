"""GeoJSON sources: per-route stops/ways with directory-as-partition-key
(SURVEY S2, S3, W7).

Reference: generate_gtfs.py:86-186.  The directory name IS the relation id;
`input_file_name()` + regexp_extract recovers it, making one glob read
replace 126 per-file opens.  Missing dirs (S3) fall out naturally: the glob
simply doesn't see them; expected-vs-found recovery is a left_anti join
against the catalog.

Feature order (W7) is preserved via posexplode — the reference relies on
Python list order; here it's an explicit feature_idx sort key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_STOP_FEATURE = StructType(
    [
        StructField("type", StringType()),
        StructField(
            "geometry",
            StructType(
                [
                    StructField("type", StringType()),
                    StructField("coordinates", ArrayType(DoubleType())),
                ]
            ),
        ),
        StructField(
            "properties",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("name", StringType()),
                    StructField("role", StringType()),
                    StructField("isReal", BooleanType()),
                    StructField("wheelchair", StringType()),
                    StructField("mode", StringType()),
                ]
            ),
        ),
    ]
)

_STOPS_SCHEMA = StructType([StructField("features", ArrayType(_STOP_FEATURE))])


def _ways_schema(levels: int) -> StructType:
    coords: object = DoubleType()
    for _ in range(levels):
        coords = ArrayType(coords)
    feature = StructType(
        [
            StructField(
                "geometry",
                StructType(
                    [
                        StructField("type", StringType()),
                        StructField("coordinates", coords),
                    ]
                ),
            ),
        ]
    )
    return StructType([StructField("features", ArrayType(feature))])


def _relation_id() -> F.Column:
    return F.regexp_extract(F.input_file_name(), r"/([^/]+)/[a-z]+\.geojson$", 1)


def read_stops(spark: SparkSession, geojson_root: str) -> DataFrame:
    """All stops, one row per feature:
    (relation_id, feature_idx, stop_id, name, role, is_real, wheelchair,
     lon, lat).  stop_id falls back to null when the OSM id is absent —
    the caller decides synthesis (generate_gtfs.py:112)."""
    raw = (
        spark.read.option("multiLine", True)
        .schema(_STOPS_SCHEMA)
        .json(f"{geojson_root}/*/stops.geojson")
        .select(_relation_id().alias("relation_id"), "features")
    )
    feat = raw.select(
        "relation_id", F.posexplode("features").alias("feature_idx", "f")
    )
    return feat.select(
        "relation_id",
        "feature_idx",
        F.col("f.properties.id").alias("stop_id"),
        F.col("f.properties.name").alias("name"),
        F.col("f.properties.role").alias("role"),
        F.col("f.properties.isReal").alias("is_real"),
        F.col("f.properties.wheelchair").alias("wheelchair"),
        F.col("f.geometry.coordinates").getItem(0).alias("lon"),
        F.col("f.geometry.coordinates").getItem(1).alias("lat"),
    )


def read_way_vertices(spark: SparkSession, geojson_root: str) -> DataFrame:
    """Every polyline vertex in order:
    (relation_id, feature_idx, line_idx, vertex_idx, lon, lat).

    LineString and MultiLineString have different nesting depths, so the
    file content is parsed with `from_json` at both depths in ONE scan;
    a LineString normalizes to a one-line MultiLineString (wrap its
    depth-2 coordinates in an array), after which a single double-explode
    covers both shapes — no union, no second pass over the files, and one
    file listing total (W7: generate_gtfs.py:142-159 — flatten preserving
    feature and line order).
    """
    path = f"{geojson_root}/*/ways.geojson"

    # NB: .option("wholetext", ...) is silently ignored — the kwarg form is
    # the only one the text source honors
    raw = spark.read.text(path, wholetext=True).select(
        _relation_id().alias("relation_id"), "value"
    )

    # posexplode the depth-2 parse (its feature order defines feature_idx);
    # the aligned depth-3 parse rides along for MultiLineString lookup
    feat = raw.select(
        "relation_id",
        F.posexplode(F.from_json("value", _ways_schema(2)).getField("features")).alias(
            "feature_idx", "f2"
        ),
        F.from_json("value", _ways_schema(3)).getField("features").alias("f3"),
    )
    lines = F.when(
        F.col("f2.geometry.type") == "LineString",
        F.array(F.col("f2.geometry.coordinates")),
    ).when(
        F.col("f2.geometry.type") == "MultiLineString",
        # arrays are 1-indexed in element_at; features align by position
        F.element_at(F.col("f3"), F.col("feature_idx") + 1).getField("geometry")
        .getField("coordinates"),
    )
    both = (
        feat.select(
            "relation_id",
            "feature_idx",
            F.posexplode(lines).alias("line_idx", "line"),
        )
        # LineString wrapped itself: its single line is line_idx 0 already
        .select(
            "relation_id",
            "feature_idx",
            "line_idx",
            F.posexplode("line").alias("vertex_idx", "coord"),
        )
    )
    return both.select(
        "relation_id",
        "feature_idx",
        "line_idx",
        "vertex_idx",
        F.col("coord").getItem(0).alias("lon"),
        F.col("coord").getItem(1).alias("lat"),
    )
