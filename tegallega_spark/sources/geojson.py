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
    file content is parsed twice with `from_json` at the respective depth;
    the mismatching geometry parses to null and is filtered by
    geometry.type (W7: generate_gtfs.py:142-159 — flatten preserving
    feature and line order).  One wholetext read = one file listing — a
    glob read per schema would list the whole tree twice.
    """
    path = f"{geojson_root}/*/ways.geojson"

    # NB: .option("wholetext", ...) is silently ignored — the kwarg form is
    # the only one the text source honors
    raw = spark.read.text(path, wholetext=True).select(
        _relation_id().alias("relation_id"), "value"
    )

    line = (
        raw.select(
            "relation_id",
            F.from_json("value", _ways_schema(2)).alias("doc"),
        )
        .select("relation_id", F.posexplode("doc.features").alias("feature_idx", "f"))
        .filter(F.col("f.geometry.type") == "LineString")
        .select(
            "relation_id",
            "feature_idx",
            F.lit(0).alias("line_idx"),
            F.posexplode("f.geometry.coordinates").alias("vertex_idx", "coord"),
        )
    )
    multi = (
        raw.select(
            "relation_id",
            F.from_json("value", _ways_schema(3)).alias("doc"),
        )
        .select("relation_id", F.posexplode("doc.features").alias("feature_idx", "f"))
        .filter(F.col("f.geometry.type") == "MultiLineString")
        .select(
            "relation_id",
            "feature_idx",
            F.posexplode("f.geometry.coordinates").alias("line_idx", "line"),
        )
        .select(
            "relation_id",
            "feature_idx",
            "line_idx",
            F.posexplode("line").alias("vertex_idx", "coord"),
        )
    )
    both = line.unionByName(multi)
    return both.select(
        "relation_id",
        "feature_idx",
        "line_idx",
        "vertex_idx",
        F.col("coord").getItem(0).alias("lon"),
        F.col("coord").getItem(1).alias("lat"),
    )
