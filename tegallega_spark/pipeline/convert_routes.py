"""Old-format → new-format route-catalog conversion (SURVEY §2: J6, J7,
A5, O2, F6-F9; reference convert-routes-json/convert.py).

Two grouping mechanisms, both DataFrame-native:
- code groups (A5): routes whose name carries a 'CODE:' prefix, grouped by
  (color, code), directions ordered arrow-first (O2, stable on document
  order);
- reverse-pair matching (J6): codeless routes pair with the route whose
  origin/dest mirror theirs and whose via-clause matches null-safely —
  a self theta-join with mutual-minimum selection standing in for the
  reference's greedy sequential scan (identical on 1:1 reverse-named data,
  which is the only shape the input contains).

Agency metadata enrichment (J7) joins a literal defaults DataFrame
(broadcast); the output is flat rows plus a to_nested_json assembler
(F15: to_json) for the document sink.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from tegallega_spark.functions.text import (
    detect_direction,
    extract_code,
    origin_dest_via,
    simplify_name,
)

# convert.py:6-71 — static agency dimension (a hand-kept lookup table)
AGENCY_METADATA = [
    ("Metro Jabar Trans", "MJT", "bus", "https://instagram.com/brt.metrojabartrans"),
    ("Trans Metro Bandung", "TMB", "bus", "https://uptangkutan-bandung.id/"),
    ("Bus Kota Damri", "Damri", "bus", "https://damri.co.id/"),
    ("Angkot Kota Bandung", "ABD", "angkot", "https://dishub.bandung.go.id/"),
    ("Angkot Kota Cimahi", "AC", "angkot", ""),
    ("Angkot Kabupaten Bandung Barat", "AKBB", "angkot", ""),
    ("Angkot Kabupaten Bandung", "AKB", "angkot", ""),
    ("Angkot Lintas Wilayah (AKDP)", "AKDP", "angkot", ""),
]

DEFAULT_DEPARTURES = ("04:00", "18:00", "85")  # convert.py:174-176


def read_old_routes(spark: SparkSession, path: str) -> DataFrame:
    """Old format: categories[].routes[]{name, relationId, color, type}."""
    raw = spark.read.option("multiLine", True).json(path)
    cats = raw.select(F.posexplode("categories").alias("cat_idx", "cat"))
    return (
        cats.filter(F.col("cat.routes").isNotNull())  # convert.py:147-148
        .select(
            "cat_idx",
            F.col("cat.name").alias("category_name"),
            F.posexplode("cat.routes").alias("rt_idx", "rt"),
        )
        .select(
            "cat_idx",
            "category_name",
            "rt_idx",
            F.col("rt.name").alias("name"),
            F.col("rt.relationId").alias("relation_id"),
            F.col("rt.color").alias("color"),
        )
    )


def enrich_agencies(routes: DataFrame, spark: SparkSession) -> DataFrame:
    """J7 (convert.py:150-161): left join the static metadata dim with
    per-column defaults; unknown agencies get name[:3].upper() ids."""
    dim = spark.createDataFrame(
        AGENCY_METADATA, "category_name string, agency_id string, mode string, agency_url string"
    )
    joined = routes.join(F.broadcast(dim), "category_name", "left")
    return (
        joined.withColumn(
            "agency_id",
            F.coalesce(F.col("agency_id"), F.upper(F.substring("category_name", 1, 3))),
        )
        .withColumn("mode", F.coalesce(F.col("mode"), F.lit("bus")))
        .withColumn("agency_url", F.coalesce(F.col("agency_url"), F.lit("")))
        .withColumn("agency_timezone", F.lit("Asia/Jakarta"))
        .withColumn("agency_lang", F.lit("id"))
        .withColumn("agency_name", F.col("category_name"))
    )


def convert_old_routes(spark: SparkSession, path: str) -> DataFrame:
    """Full conversion to flat new-format rows:
    (agency cols, group_id, group_name, color, group_type, loop,
     route_name, direction_id, relation_id, first/last departure, trips,
     cat_idx, grp_order, rt_order) — nested assembly in to_nested_json."""
    base = enrich_agencies(read_old_routes(spark, path), spark)
    origin, dest, via = origin_dest_via(F.col("name"))
    r = base.select(
        "*",
        extract_code(F.when(F.col("name").contains(":"), F.col("name"))).alias("code"),
        detect_direction(F.col("name")).alias("direction"),
        origin.alias("origin"),
        dest.alias("dest"),
        via.alias("via"),
    )

    # --- code groups (A5, convert.py:166-185) -----------------------------
    coded = r.filter(F.col("code").isNotNull())
    grp_w = Window.partitionBy("cat_idx", "color", "code").orderBy("direction", "rt_idx")
    code_groups = coded.withColumn("pos", F.row_number().over(grp_w) - 1).select(
        "cat_idx",
        "agency_name", "agency_id", "mode", "agency_url", "agency_timezone", "agency_lang",
        F.col("code").alias("group_id"),
        F.concat(F.col("agency_name"), F.lit(" "), F.col("code")).alias("group_name"),
        "color",
        simplify_name(F.col("name")).alias("route_name"),
        F.when(F.col("pos") == 0, 0).otherwise(1).alias("direction_id"),
        "relation_id",
        F.min("rt_idx").over(
            Window.partitionBy("cat_idx", "color", "code")
        ).alias("grp_order"),
        F.col("pos").alias("rt_order"),
    )

    # --- reverse-pair groups (J6, convert.py:107-139) ----------------------
    free = r.filter(
        F.col("code").isNull() & F.col("origin").isNotNull() & F.col("dest").isNotNull()
        & (F.col("origin") != "") & (F.col("dest") != "")
    )
    a = free.alias("a")
    b = free.alias("b")
    cand = a.join(
        b,
        (F.col("a.cat_idx") == F.col("b.cat_idx"))
        & (F.col("a.rt_idx") < F.col("b.rt_idx"))
        & (F.col("b.origin") == F.col("a.dest"))
        & (F.col("b.dest") == F.col("a.origin"))
        & (F.col("a.via").eqNullSafe(F.col("b.via"))),
    ).select(
        F.col("a.cat_idx").alias("cat_idx"),
        F.col("a.rt_idx").alias("i"),
        F.col("b.rt_idx").alias("j"),
    )
    # mutual minimum ≈ the reference's greedy ascending scan
    w_i = Window.partitionBy("cat_idx", "i")
    w_j = Window.partitionBy("cat_idx", "j")
    pairs = (
        cand.withColumn("min_j", F.min("j").over(w_i))
        .withColumn("min_i", F.min("i").over(w_j))
        .filter((F.col("j") == F.col("min_j")) & (F.col("i") == F.col("min_i")))
        .select("cat_idx", "i", "j")
    )
    ri = r.select(
        F.col("cat_idx"), F.col("rt_idx").alias("i"),
        F.col("name").alias("name_i"), F.col("relation_id").alias("rel_i"),
        F.col("color").alias("color_i"),
        "agency_name", "agency_id", "mode", "agency_url", "agency_timezone", "agency_lang",
    )
    rj = r.select(
        F.col("cat_idx"), F.col("rt_idx").alias("j"),
        F.col("name").alias("name_j"), F.col("relation_id").alias("rel_j"),
    )
    matched = pairs.join(ri, ["cat_idx", "i"]).join(rj, ["cat_idx", "j"])
    custom = matched.select(
        "cat_idx",
        "agency_name", "agency_id", "mode", "agency_url", "agency_timezone", "agency_lang",
        F.trim(F.col("name_i")).alias("group_id"),
        F.trim(F.col("name_i")).alias("group_name"),
        F.col("color_i").alias("color"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("direction_id"),
                    F.col("name_i").alias("raw_name"),
                    F.col("rel_i").alias("relation_id"),
                ),
                F.struct(
                    F.lit(1).alias("direction_id"),
                    F.col("name_j").alias("raw_name"),
                    F.col("rel_j").alias("relation_id"),
                ),
            )
        ).alias("m"),
        # reference emits ALL code groups before ANY custom group
        # (convert.py:166,187) — offset keeps that document order
        (F.col("i") + 1000000).alias("grp_order"),
    ).select(
        "cat_idx",
        "agency_name", "agency_id", "mode", "agency_url", "agency_timezone", "agency_lang",
        "group_id", "group_name", "color",
        simplify_name(F.col("m.raw_name")).alias("route_name"),
        F.col("m.direction_id").alias("direction_id"),
        F.col("m.relation_id").alias("relation_id"),
        "grp_order",
        F.col("m.direction_id").alias("rt_order"),
    )

    out = code_groups.unionByName(custom)
    first, last, trips = DEFAULT_DEPARTURES
    return (
        out.withColumn("group_type", F.lit("fixed"))
        .withColumn("loop", F.lit("no"))
        .withColumn("first_departure", F.lit(first))
        .withColumn("last_departure", F.lit(last))
        .withColumn("trips", F.lit(trips))
    )


def to_nested_json(rows: DataFrame) -> str:
    """Assemble the flat rows back into the nested new-format document
    (F15: collect_list + to_json).  Small catalog → driver-side string."""
    routes_arr = (
        rows.groupBy(
            "cat_idx", "agency_name", "agency_id", "mode", "agency_url",
            "agency_timezone", "agency_lang", "group_id", "group_name",
            "color", "group_type", "loop", "grp_order",
        )
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("rt_order", "route_name", "direction_id",
                             "relation_id", "first_departure", "last_departure", "trips")
                )
            ).alias("rts")
        )
        .withColumn(
            "routes",
            F.transform(
                "rts",
                lambda s: F.struct(
                    s["route_name"].alias("name"),
                    s["direction_id"].alias("directionId"),
                    s["relation_id"].alias("relationId"),
                    s["first_departure"].alias("first_departure"),
                    s["last_departure"].alias("last_departure"),
                    s["trips"].alias("trips"),
                ),
            ),
        )
    )
    groups = (
        routes_arr.groupBy(
            "cat_idx", "agency_name", "agency_id", "mode", "agency_url",
            "agency_timezone", "agency_lang",
        )
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "grp_order",
                        F.struct(
                            F.col("group_id").alias("groupId"),
                            F.col("group_name").alias("name"),
                            F.col("color").alias("color"),
                            F.col("group_type").alias("type"),
                            F.col("loop").alias("loop"),
                            F.col("routes").alias("routes"),
                        ).alias("g"),
                    )
                )
            ).alias("gs")
        )
        .withColumn("routeGroups", F.transform("gs", lambda x: x["g"]))
    )
    cats = groups.orderBy("cat_idx").select(
        F.to_json(
            F.struct(
                F.col("agency_name").alias("name"),
                F.col("agency_id").alias("agencyId"),
                F.col("mode").alias("mode"),
                F.col("agency_url").alias("agencyUrl"),
                F.col("agency_timezone").alias("agencyTimezone"),
                F.col("agency_lang").alias("agencyLang"),
                F.col("routeGroups").alias("routeGroups"),
            )
        ).alias("cat_json")
    )
    payload = ",".join(r.cat_json for r in cats.collect())
    return '{"categories":[' + payload + "]}"
