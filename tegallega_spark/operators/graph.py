"""Routing-graph operators (SURVEY §2.12 Q1-Q4).

Reference: index.html:95-190 — browser JS builds a stop graph (nodes =
stops, edges = consecutive stop pairs per route, haversine weight) and runs
Dijkstra with route labels + path reconstruction.

Spark shape:
- graph construction is DataFrames end-to-end: edges via lag over
  Window.partitionBy(trip).orderBy(stop_sequence) + haversine weight
  (Q1, index.html:116-141);
- nearest-node lookup is a broadcast argmin (Q3, index.html:145-150);
- weighted shortest path (Q4): two tiers, mirroring SURVEY §7 hard part 4 —
  * `dijkstra_local`: collect the (tiny, ≤ a few thousand stops) transit
    graph to the driver and run a heap Dijkstra — the honest idiomatic
    choice at this graph size (scipy isn't in the container; a binary-heap
    implementation is ~30 lines);
  * `shortest_paths_distributed`: Bellman-Ford-style iterative DataFrame
    relaxation with early termination — one shuffle per iteration, scales
    to graphs that don't fit a driver, converges in ≤ diameter iterations.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from tegallega_spark.functions.geo import haversine_km


# ---------------------------------------------------------------------------
# Q1: graph construction
# ---------------------------------------------------------------------------

def build_edges(
    stop_times: DataFrame,
    stops: DataFrame,
    trips: DataFrame,
) -> DataFrame:
    """Edges = consecutive stop pairs per trip, weight = haversine km,
    labeled with route_id (index.html:116-141).  Parallel edges from many
    trips collapse to the minimum-weight edge per (src, dst, route_id)."""
    st = stop_times.select("trip_id", "stop_id", "stop_sequence").join(
        trips.select("trip_id", "route_id"), "trip_id"
    )
    pos = stops.select(
        "stop_id",
        F.col("stop_lat").cast("double").alias("lat"),
        F.col("stop_lon").cast("double").alias("lon"),
    )
    st = st.join(pos, "stop_id")
    w = Window.partitionBy("trip_id").orderBy(F.col("stop_sequence").cast("int"))
    paired = (
        st.withColumn("dst", F.lead("stop_id").over(w))
        .withColumn("dlat", F.lead("lat").over(w))
        .withColumn("dlon", F.lead("lon").over(w))
        .filter(F.col("dst").isNotNull())
    )
    weighted = paired.select(
        F.col("stop_id").alias("src"),
        "dst",
        "route_id",
        haversine_km(F.col("lon"), F.col("lat"), F.col("dlon"), F.col("dlat")).alias(
            "weight_km"
        ),
    )
    return weighted.groupBy("src", "dst", "route_id").agg(
        F.min("weight_km").alias("weight_km")
    )


def build_vertices(stops: DataFrame) -> DataFrame:
    return stops.select(
        F.col("stop_id").alias("id"),
        F.col("stop_name").alias("name"),
        F.col("stop_lat").cast("double").alias("lat"),
        F.col("stop_lon").cast("double").alias("lon"),
    )


# ---------------------------------------------------------------------------
# Q3: nearest vertex to an arbitrary point — broadcast argmin
# ---------------------------------------------------------------------------

def nearest_vertex(vertices: DataFrame, lon: float, lat: float) -> str:
    row = (
        vertices.select(
            "id",
            haversine_km(F.col("lon"), F.col("lat"), F.lit(lon), F.lit(lat)).alias("d"),
        )
        .orderBy("d", "id")
        .first()
    )
    return row["id"] if row else None


# ---------------------------------------------------------------------------
# Q4a: driver-side Dijkstra (graph ≤ a few thousand nodes)
# ---------------------------------------------------------------------------

def dijkstra_local(
    edges: DataFrame, src: str, dst: str
) -> tuple[float, list[str], list[str]]:
    """Weighted shortest path with route labels + path reconstruction
    (index.html:152-190).  Returns (total_km, [stop path], [route per hop]);
    (inf, [], []) when unreachable."""
    adj: dict[str, list[tuple[str, float, str]]] = defaultdict(list)
    for r in edges.select("src", "dst", "weight_km", "route_id").collect():
        adj[r["src"]].append((r["dst"], float(r["weight_km"]), r["route_id"]))

    dist: dict[str, float] = {src: 0.0}
    prev: dict[str, tuple[str, str]] = {}
    heap: list[tuple[float, str]] = [(0.0, src)]
    seen: set[str] = set()
    while heap:
        d, u = heapq.heappop(heap)
        if u in seen:
            continue
        seen.add(u)
        if u == dst:
            break
        for v, w, route in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                prev[v] = (u, route)
                heapq.heappush(heap, (nd, v))
    if dst not in dist:
        return float("inf"), [], []
    path, routes = [dst], []
    while path[-1] != src:
        u, route = prev[path[-1]]
        routes.append(route)
        path.append(u)
    return dist[dst], path[::-1], routes[::-1]


# ---------------------------------------------------------------------------
# Q4b: distributed shortest paths — iterative DataFrame relaxation
# ---------------------------------------------------------------------------

def shortest_paths_distributed(
    edges: DataFrame, src: str, max_iterations: int = 50
) -> DataFrame:
    """Single-source shortest distances via Bellman-Ford rounds expressed as
    join+groupBy; stops early once no distance improves.

    Each round: frontier ⋈ edges → candidate distances → min per node →
    compare with current.  localCheckpoint per round truncates the lineage
    (otherwise the plan doubles every iteration).  At scale this is the
    standard Pregel-without-GraphFrames formulation: one shuffle per round,
    rounds ≤ graph diameter.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst", "weight_km").persist()
    dist = spark.createDataFrame([(src, 0.0)], "id string, dist double")
    for _ in range(max_iterations):
        candidates = (
            dist.join(e, dist.id == e.src)
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("weight_km")).alias("dist"))
            .unionByName(dist)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
        # converged when no node improved (anti-join on better rows is empty)
        improved = (
            candidates.alias("c")
            .join(dist.alias("d"), F.col("c.id") == F.col("d.id"), "left")
            .filter(
                F.col("d.dist").isNull() | (F.col("c.dist") < F.col("d.dist") - 1e-12)
            )
            .limit(1)
            .count()
        )
        dist = candidates
        if improved == 0:
            break
    e.unpersist()
    return dist
