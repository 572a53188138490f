"""OTP-substitute feed validation (r10/r11 verdict: the OTP 2.7.0
`--build` smoke cannot run offline — no network, no vendored jar, and
the reference's otp-deploy/graph.obj is a 134-byte LFS pointer).  What
OTP's GTFS loader enforces first is the GTFS static spec's referential
rules; pipeline/feed_check.py implements them as Spark anti-joins, and
this test runs them over the FULL feed our pipeline generates from the
reference's real inputs — so the gtfs.zip we'd hand OTP is known
resolvable before it leaves the repo.  See FIXTURES.md §OTP for the
acquisition attempt log."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tegallega_spark.pipeline.feed_check import validate_gtfs_feed  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="module")
def feed_dir(spark, tmp_path_factory):
    from tegallega_spark.pipeline.gtfs_build import build_gtfs
    from tegallega_spark.sources.gtfs import write_gtfs_feed

    out = str(tmp_path_factory.mktemp("feed"))
    write_gtfs_feed(build_gtfs(spark, REF), out)
    return out


def test_generated_feed_fully_resolvable(spark, feed_dir):
    """Every referential rule an OTP-style loader enforces must count
    zero violations on the feed built from the reference's real
    routes.json / geojson / schedule inputs."""
    report = validate_gtfs_feed(spark, feed_dir)
    bad = {k: v for k, v in report.items() if v != 0}
    assert not bad, f"feed has load-blocking defects: {bad}"


def test_validator_detects_planted_defects(spark, feed_dir, tmp_path):
    """The zeros above must be falsifiable: plant one defect per rule
    family in a copy of the feed and assert each counter fires."""
    import shutil

    broken = str(tmp_path / "broken")
    shutil.copytree(feed_dir, broken)
    with open(os.path.join(broken, "stop_times.txt"), "a") as f:
        # unknown trip + unknown stop + malformed time + dep < arr
        f.write("ghost_trip,ghost_stop,1,25:00:00,24:59:59,0,0\n")
    with open(os.path.join(broken, "trips.txt"), "a") as f:
        # unknown route/service/shape, and no stop_times rows
        f.write("ghost_route,ghost_trip2,ghost_service,X,0,ghost_shape,b1\n")
    with open(os.path.join(broken, "stops.txt"), "a") as f:
        f.write("polar_stop,Bad,91.0,200.0,0,\n")

    report = validate_gtfs_feed(spark, broken)
    assert report["stop_times_unknown_trip"] == 1
    assert report["stop_times_unknown_stop"] == 1
    assert report["trips_unknown_route"] == 1
    assert report["trips_unknown_service"] == 1
    assert report["trips_unknown_shape"] == 1
    assert report["trips_without_stop_times"] == 1
    assert report["stop_times_departure_before_arrival"] == 1
    assert report["stops_bad_coordinates"] == 1


def test_validator_detects_duplicate_sequences(spark, feed_dir, tmp_path):
    import shutil

    broken = str(tmp_path / "dup")
    shutil.copytree(feed_dir, broken)
    # duplicate an existing stop_times row (same trip_id+stop_sequence)
    # and an existing shapes row (same shape_id+shape_pt_sequence)
    for name in ("stop_times.txt", "shapes.txt"):
        p = os.path.join(broken, name)
        with open(p) as f:
            header, first = f.readline(), f.readline()
        with open(p, "a") as f:
            f.write(first)
    report = validate_gtfs_feed(spark, broken)
    assert report["stop_times_duplicate_sequence"] == 1
    assert report["shapes_duplicate_sequence"] == 1
