"""Unit tests for the scalar column-expression library (SURVEY §2.8)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from tegallega_spark.functions import (
    block_id_for,
    coords_equal,
    gtfs_time_to_seconds,
    haversine_km,
    haversine_m,
    hex_to_kml_color,
    hhmm_to_seconds,
    sanitize_filename,
    seconds_to_hhmmss,
    shape_id_for,
    trip_id_bus,
    trip_id_train,
    virtual_stop_id,
)


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).first()["v"]


def test_haversine_matches_reference_formula(spark):
    # Bandung → Jakarta ≈ 116-118 km
    km = one(spark, haversine_km(F.lit(107.6098), F.lit(-6.9147), F.lit(106.8456), F.lit(-6.2088)))
    m = one(spark, haversine_m(F.lit(107.6098), F.lit(-6.9147), F.lit(106.8456), F.lit(-6.2088)))
    assert 110 < km < 125
    assert math.isclose(m, km * 1000, rel_tol=1e-9)


def test_time_codecs(spark):
    assert one(spark, hhmm_to_seconds(F.lit("04:30"))) == 4 * 3600 + 30 * 60
    # GTFS >24h semantics (generate_gtfs.py:295-306)
    assert one(spark, gtfs_time_to_seconds(F.lit("25:10"))) == 25 * 3600 + 600
    assert one(spark, gtfs_time_to_seconds(F.lit("garbage"))) == 0
    assert one(spark, gtfs_time_to_seconds(F.lit("07:05:30"))) == 7 * 3600 + 5 * 60 + 30
    assert one(spark, seconds_to_hhmmss(F.lit(90000))) == "25:00:00"
    assert one(spark, seconds_to_hhmmss(F.lit(3661))) == "01:01:01"
    # banker's rounding like Python round() (generate_gtfs.py:34)
    assert one(spark, seconds_to_hhmmss(F.lit(0.5))) == "00:00:00"
    assert one(spark, seconds_to_hhmmss(F.lit(1.5))) == "00:00:02"


def test_id_grammar(spark):
    assert one(spark, shape_id_for(F.lit("123"))) == "shape_123"
    assert one(spark, trip_id_train(F.lit("KCI"), F.lit("B"), F.lit("380"))) == "t-KCIB380"
    assert one(spark, trip_id_bus(F.lit("TMB"), F.lit("K1"), F.lit(0), F.lit(7))) == "t-TMBK107"
    assert one(spark, block_id_for(F.lit("TMB"), F.lit("K1"), F.lit(7), F.lit(True))) == "TMBK17"
    assert one(spark, block_id_for(F.lit("TMB"), F.lit("K1"), F.lit(7), F.lit(False))) == ""
    assert (
        one(spark, virtual_stop_id(F.lit(107.60691), F.lit(-6.91891)))
        == "virtual_107.6069_-6.9189"
    )


def test_misc_string_functions(spark):
    assert one(spark, sanitize_filename(F.lit("K1: A→B/C"))) == "K1_ A_B_C"
    # '#rrggbb' → 'aabbggrr' (convert-geojson-kml.py:8-15)
    assert one(spark, hex_to_kml_color(F.lit("#2D398B"))) == "ff8b392d"
    assert one(spark, hex_to_kml_color(F.lit("#f00"))) == "ff0000ff"
    assert one(spark, coords_equal(F.lit(1.0), F.lit(2.0), F.lit(1.0 + 5e-7), F.lit(2.0)))
    assert not one(spark, coords_equal(F.lit(1.0), F.lit(2.0), F.lit(1.01), F.lit(2.0)))


def test_kml_sink(spark, tmp_path):
    from tegallega_spark.sources.kml import write_route_kml

    stitched = spark.createDataFrame(
        [("r1", 0, 107.6, -6.9), ("r1", 1, 107.61, -6.91)],
        "relation_id string, vertex_idx int, lon double, lat double",
    )
    stops = spark.createDataFrame(
        [("r1", "s1", "Halte <A>", 107.6, -6.9)],
        "relation_id string, stop_id string, name string, lon double, lat double",
    )
    files = write_route_kml(stitched, stops, {"r1": "#2D398B"}, str(tmp_path))
    content = open(files[0]).read()
    assert "<color>ff8b392d</color>" in content
    assert "107.6,-6.9,0 107.61,-6.91,0" in content
    assert "Halte &lt;A&gt;" in content  # XML-escaped


def test_shapefile_sink_gated(spark):
    from tegallega_spark.sources.kml import write_route_shapefile

    stitched = spark.createDataFrame(
        [("r1", 0, 0.0, 0.0)], "relation_id string, vertex_idx int, lon double, lat double"
    )
    with pytest.raises(NotImplementedError, match="geopandas"):
        write_route_shapefile(stitched, "/tmp/never.shp")
