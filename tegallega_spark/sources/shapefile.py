"""K5: ESRI Shapefile sink — pure stdlib, no geopandas required.

Mirrors convert-geojson-shp.py: one directory per route (name sanitized the
same way as the reference's sanitize_filename), containing `route_lines.shp`
(LineString features) and `stops.shp` (Point features), each with the
attribute columns route_name / color / source ("Transport for Bandung",
convert-geojson-shp.py:47-51) and an EPSG:4326 .prj sidecar
(convert-geojson-shp.py:66,72).

The binary layout follows the public ESRI Shapefile Technical Description
(July 1998): a 100-byte big/little-endian mixed header, per-record
big-endian headers with little-endian geometry payloads, a .shx offset
index, and a dBASE III (.dbf) attribute table.  Writing it directly removes
the geopandas dependency the reference needs — the container has none, and
a sink that raises NotImplementedError is not a sink.

Presentation sinks are inherently driver-side small (one file set per
route, ~100s of routes); the collect here matches write_route_kml and the
reference's per-route file loop.  (The K2 GeoJSON sink this used to cite
is no longer a valid precedent: it writes from executors and returns a
count — see write_route_geojson.)
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame

SHAPE_POINT = 1
SHAPE_POLYLINE = 3

# ESRI WKT for EPSG:4326 / WGS84 — the exact string ESRI tools emit.
WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)

SOURCE_ATTR = "Transport for Bandung"  # convert-geojson-shp.py:50


def _bbox(points: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    return min(xs), min(ys), max(xs), max(ys)


def _point_record(xy: tuple[float, float]) -> bytes:
    return struct.pack("<idd", SHAPE_POINT, xy[0], xy[1])


def _polyline_record(points: list[tuple[float, float]]) -> bytes:
    xmin, ymin, xmax, ymax = _bbox(points)
    head = struct.pack(
        "<i4dii", SHAPE_POLYLINE, xmin, ymin, xmax, ymax, 1, len(points)
    ) + struct.pack("<i", 0)  # one part starting at point 0
    body = b"".join(struct.pack("<dd", x, y) for x, y in points)
    return head + body


def _main_header(shape_type: int, total_bytes: int, bbox) -> bytes:
    xmin, ymin, xmax, ymax = bbox
    return (
        struct.pack(">i", 9994)
        + b"\x00" * 20
        + struct.pack(">i", total_bytes // 2)  # length in 16-bit words
        + struct.pack("<ii", 1000, shape_type)
        + struct.pack("<4d", xmin, ymin, xmax, ymax)
        + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # Z/M ranges unused
    )


def _dbf_bytes(fields: list[tuple[str, int]], records: list[tuple]) -> bytes:
    """dBASE III memo-less table, all fields type 'C' (matches how
    GeoDataFrame.to_file stores string attributes)."""
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(ln for _, ln in fields)
    out = bytearray()
    out += struct.pack(
        "<B3BIHH", 0x03, 126, 1, 1, len(records), header_size, record_size
    )
    out += b"\x00" * 20
    for name, length in fields:
        out += struct.pack(
            "<11sc4xBB14x", name.encode("ascii")[:10], b"C", length, 0
        )
    out += b"\x0d"
    for rec in records:
        out += b" "  # not-deleted flag
        for (name, length), val in zip(fields, rec):
            s = ("" if val is None else str(val)).encode("latin-1", "replace")
            out += s[:length].ljust(length, b" ")
    out += b"\x1a"
    return bytes(out)


def write_shapefile(
    base_path: str,
    shape_type: int,
    geoms: list,
    fields: list[tuple[str, int]],
    records: list[tuple],
) -> str:
    """Write base_path{.shp,.shx,.dbf,.prj}.

    geoms: for SHAPE_POINT a list of (x, y); for SHAPE_POLYLINE a list of
    [(x, y), ...] vertex lists.  records: one attribute tuple per geometry,
    positionally matched to `fields` ((name, byte_length) pairs).
    """
    if len(geoms) != len(records):
        raise ValueError(f"{len(geoms)} geometries vs {len(records)} records")
    if not geoms:
        raise ValueError("shapefile must contain at least one shape")

    payloads = [
        _point_record(g) if shape_type == SHAPE_POINT else _polyline_record(g)
        for g in geoms
    ]
    all_pts = (
        list(geoms)
        if shape_type == SHAPE_POINT
        else [p for line in geoms for p in line]
    )
    bbox = _bbox(all_pts)

    shp = bytearray()
    shx = bytearray()
    offset = 100  # bytes; records start after the header
    for i, payload in enumerate(payloads):
        shp += struct.pack(">ii", i + 1, len(payload) // 2) + payload
        shx += struct.pack(">ii", offset // 2, len(payload) // 2)
        offset += 8 + len(payload)

    with open(base_path + ".shp", "wb") as f:
        f.write(_main_header(shape_type, 100 + len(shp), bbox) + shp)
    with open(base_path + ".shx", "wb") as f:
        f.write(_main_header(shape_type, 100 + len(shx), bbox) + shx)
    with open(base_path + ".dbf", "wb") as f:
        f.write(_dbf_bytes(fields, records))
    with open(base_path + ".prj", "w") as f:
        f.write(WGS84_PRJ)
    return base_path + ".shp"


def write_route_shapefiles(
    stitched: DataFrame,
    stops: DataFrame,
    route_meta: dict[str, tuple[str, str]],
    out_dir: str,
) -> list[str]:
    """Per-route shapefile sets mirroring convert-geojson-shp.py:58-73.

    route_meta: relation_id → (route_name, color) from routes.json.  Routes
    absent from the meta map are skipped, matching the reference's skip of
    routes without a geojson directory (:27-29).  Returns written .shp paths.
    """
    from tegallega_spark.functions.text import sanitize_filename_py

    lines: dict[str, list] = {}
    for r in stitched.orderBy("relation_id", "vertex_idx").collect():
        lines.setdefault(r.relation_id, []).append((r.lon, r.lat))
    stop_rows: dict[str, list] = {}
    for r in stops.collect():
        stop_rows.setdefault(r.relation_id, []).append(r)

    meta_fields = [("route_name", 80), ("color", 16), ("source", 32)]
    written = []
    for rel, coords in lines.items():
        if rel not in route_meta:
            continue
        route_name, color = route_meta[rel]
        route_dir = os.path.join(out_dir, sanitize_filename_py(route_name))
        os.makedirs(route_dir, exist_ok=True)
        meta = (route_name, color, SOURCE_ATTR)
        written.append(
            write_shapefile(
                os.path.join(route_dir, "route_lines"),
                SHAPE_POLYLINE,
                [coords],
                meta_fields,
                [meta],
            )
        )
        srows = stop_rows.get(rel, [])
        if srows:
            written.append(
                write_shapefile(
                    os.path.join(route_dir, "stops"),
                    SHAPE_POINT,
                    [(s.lon, s.lat) for s in srows],
                    [("name", 80)] + meta_fields,
                    [(s.name or s.stop_id,) + meta for s in srows],
                )
            )
    return written
