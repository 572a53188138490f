"""Identifier-formatting expressions (reference generate_gtfs.py:112,162,249,
252-254,413,416-418; update-routes.js:323).

ID grammar is part of the GTFS contract — goldens hash-match only if these
are byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def shape_id_for(relation_id: Column) -> Column:
    """'shape_{relationId}' (generate_gtfs.py:162)."""
    return F.concat(F.lit("shape_"), relation_id.cast("string"))


def trip_id_train(agency_id: Column, group_id: Column, trip_num: Column) -> Column:
    """'t-{agency}{group}{trip_num}' (generate_gtfs.py:249)."""
    return F.concat(F.lit("t-"), agency_id, group_id, trip_num.cast("string"))


def trip_id_bus(agency_id: Column, group_id: Column, direction_id: Column, n: Column) -> Column:
    """'t-{agency}{group}{dir}{n}' (generate_gtfs.py:413)."""
    return F.concat(
        F.lit("t-"), agency_id, group_id, direction_id.cast("string"), n.cast("string")
    )


def block_id_for(agency_id: Column, group_id: Column, n: Column, is_loop: Column) -> Column:
    """'{agency}{group}{n}' iff loop route else empty (generate_gtfs.py:252-254,416-418)."""
    return F.when(is_loop, F.concat(agency_id, group_id, n.cast("string"))).otherwise(F.lit(""))


def virtual_stop_id(lon: Column, lat: Column) -> Column:
    """'virtual_{lon:.4f}_{lat:.4f}' (update-routes.js:323)."""
    return F.format_string("virtual_%.4f_%.4f", lon, lat)
