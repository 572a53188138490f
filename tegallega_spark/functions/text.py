"""Route-name string functions (reference convert-routes-json/convert.py:75-105,
convert-geojson-kml.py:5-15, convert-geojson-shp.py:6-7).

All regexp/substring column expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def simplify_name(col: Column) -> Column:
    """Strip '^(Commuter Line|Koridor \\d+:?)\\s*' prefix (convert.py:75-77)."""
    return F.regexp_replace(col, r"^(Commuter Line|Koridor \d+:?)\s*", "")


def detect_direction(col: Column) -> Column:
    """0 if '→' present (directional name) else null-direction marker 0/1
    heuristic (convert.py:79-82): names without an arrow are direction 1."""
    return F.when(F.instr(col, "→") > 0, F.lit(0)).otherwise(F.lit(1))


def extract_code(col: Column) -> Column:
    """Prefix before ':' → its last word (convert.py:84-89)."""
    prefix = F.split(col, ":").getItem(0)
    return F.element_at(F.split(F.trim(prefix), r"\s+"), -1)


def origin_dest_via(col: Column) -> tuple[Column, Column, Column]:
    """Split on '→': (origin, dest, via-clause) (convert.py:94-105)."""
    parts = F.split(col, "→")
    origin = F.trim(parts.getItem(0))
    rest = F.trim(F.coalesce(parts.getItem(1), F.lit("")))
    via = F.nullif(F.trim(F.regexp_extract(rest, r"via\s+(.*)$", 1)), F.lit(""))
    dest = F.trim(F.regexp_replace(rest, r"\s*via\s+.*$", ""))
    return origin, dest, via


def sanitize_filename(col: Column) -> Column:
    """Keep alnum/space/dash/underscore (convert-geojson-kml.py:5-6)."""
    return F.regexp_replace(col, r"[^A-Za-z0-9 _-]", "_")


def hex_to_kml_color(col: Column, alpha: str = "ff") -> Column:
    """'#rgb'/'#rrggbb' → 'aabbggrr' (convert-geojson-kml.py:8-15)."""
    c = F.regexp_replace(col, "^#", "")
    c6 = F.when(
        F.length(c) == 3,
        F.concat(
            F.substring(c, 1, 1), F.substring(c, 1, 1),
            F.substring(c, 2, 1), F.substring(c, 2, 1),
            F.substring(c, 3, 1), F.substring(c, 3, 1),
        ),
    ).otherwise(c)
    r, g, b = F.substring(c6, 1, 2), F.substring(c6, 3, 2), F.substring(c6, 5, 2)
    return F.lower(F.concat(F.lit(alpha), b, g, r))
