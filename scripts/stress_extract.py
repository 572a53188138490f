#!/usr/bin/env python
"""Extract-chain scale race: the Spark stitch → project → interpolate →
thin pipeline (pipeline/extract.py) vs the reference's ACTUAL
update-routes.js, both running offline against the same synthetic
Overpass world, at N relations.

The transform half (generate_gtfs.py) has stress_gtfs.py; the extract
half had only goldens (the reference's committed geojson — one fixed
126-route world).  This race executes the reference JS itself (node,
axios/mkdirp stubbed to answer from a fixture file — the same
injected-fetch seam tests/test_extract.py uses on the Spark side) on a
FLEET of generated angkot relations, then runs the Spark chain BATCHED:
every relation's ways/nodes in two DataFrames, one keyed
stitch/project/interpolate/thin program over all of them — the shape a
fleet-scale deployment runs, vs the reference's sequential per-route
loop.

Output parity asserted per relation: the stitched way coordinate
sequence and the FINAL ORDERED stop list (id — including the
virtual_{lon}_{lat} grammar — name, role, isReal, coords) must be
identical (coords to 1e-9).

Usage: python scripts/stress_extract.py [N ...]   (default 50 200 800)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/tegallega_extract_stress"
REF_JS = "/root/reference/action-scripts/update-routes.js"

AXIOS_STUB = r"""
// offline axios: answers Overpass queries from the world fixture —
// the injected-fetch seam, mirrored on the Spark side by fetch_fn
const fs = require('fs');
const world = JSON.parse(fs.readFileSync(process.env.WORLD_JSON, 'utf-8'));
const relMap = new Map(world.relations.map(r => [String(r.id), r]));
const wayMap = new Map(world.ways.map(w => [String(w.id), w]));
const nodeMap = new Map(world.nodes.map(n => [String(n.id), n]));

function answer(query) {
  let m;
  if ((m = query.match(/^\[out:json\];relation\((\d+)\);out body;$/))) {
    const r = relMap.get(m[1]);
    return r ? [r] : [];
  }
  if ((m = query.match(/^\[out:json\];way\(id:([\d,]+)\);out geom;$/))) {
    return m[1].split(',').map(id => wayMap.get(id)).filter(Boolean);
  }
  if ((m = query.match(/^\[out:json\];node\(id:([\d,]+)\);out geom;$/))) {
    return m[1].split(',').map(id => nodeMap.get(id)).filter(Boolean);
  }
  throw new Error('unexpected overpass query: ' + query);
}

module.exports = {
  get: async (url) => {
    const q = decodeURIComponent(url.split('?data=')[1]);
    return { data: { elements: answer(q) } };
  },
};
"""

MKDIRP_STUB = r"""
const fs = require('fs');
module.exports = {
  mkdirp: async (p) => fs.mkdirSync(p, { recursive: true }),
};
"""


def make_world(n_rel: int, seed: int = 7) -> dict:
    """N angkot relations on disjoint latitude bands: 4-10 ways of 6-20
    vertices (~40-90 m spacing, some ways vertex-reversed so the stitch
    must flip them), 3-6 named stop nodes far enough apart that virtual
    synthesis fires, plus platform members the extractor must filter."""
    rng = np.random.default_rng(seed)
    relations, ways, nodes = [], [], []
    wid = 10_000
    nid = 500_000
    for i in range(n_rel):
        rid = 9_000 + i
        lat0 = (i % 500) * 0.05 + 0.001 * (i // 500)
        lon = 107.0
        members = []
        rel_vertices: list[tuple[float, float]] = []
        n_ways = int(rng.integers(4, 11))
        for w in range(n_ways):
            nv = int(rng.integers(6, 21))
            verts = []
            for _ in range(nv):
                verts.append((round(lon, 7), round(lat0 + float(rng.normal(0, 1e-5)), 7)))
                lon += float(rng.uniform(0.0004, 0.0009))
            # the next way starts at this way's end (shared endpoint)
            lon -= float(rng.uniform(0.0004, 0.0009))
            if rel_vertices:
                verts[0] = rel_vertices[-1]
            rel_vertices.extend(verts if not rel_vertices else verts[1:])
            geometry = [{"lon": x, "lat": y} for x, y in verts]
            if rng.random() < 0.35 and w > 0:  # reversed orientation
                geometry = geometry[::-1]
            wid += 1
            ways.append(
                {
                    "type": "way",
                    "id": wid,
                    "tags": {"name": f"Jalan {wid}"} if rng.random() < 0.8 else {},
                    "geometry": geometry,
                }
            )
            members.append({"type": "way", "ref": wid, "role": ""})
        n_stops = int(rng.integers(3, 7))
        stop_vidx = sorted(
            rng.choice(len(rel_vertices), size=n_stops, replace=False)
        )
        roles = ["stop", "stop_entry_only", "stop_exit_only"]
        for s, vi in enumerate(stop_vidx):
            x, y = rel_vertices[int(vi)]
            nid += 1
            nodes.append(
                {
                    "type": "node",
                    "id": nid,
                    "lon": x,
                    "lat": y,
                    "tags": {"name": f"Halte {nid}"},
                }
            )
            members.append(
                {"type": "node", "ref": nid,
                 "role": roles[int(rng.integers(0, len(roles)))]}
            )
        # a platform member the role filter must drop
        nid += 1
        nodes.append({"type": "node", "id": nid, "lon": 0.0, "lat": 0.0, "tags": {}})
        members.append({"type": "node", "ref": nid, "role": "platform"})
        relations.append({"type": "relation", "id": rid, "members": members})
    return {"relations": relations, "ways": ways, "nodes": nodes}


def make_sandbox(world: dict, n_rel: int) -> str:
    box = os.path.join(OUT, f"sandbox_{n_rel}")
    shutil.rmtree(box, ignore_errors=True)
    os.makedirs(os.path.join(box, "action-scripts"))
    os.makedirs(os.path.join(box, "node_modules", "axios"))
    os.makedirs(os.path.join(box, "node_modules", "mkdirp"))
    shutil.copy(REF_JS, os.path.join(box, "action-scripts", "update-routes.js"))
    with open(os.path.join(box, "node_modules", "axios", "index.js"), "w") as f:
        f.write(AXIOS_STUB)
    with open(os.path.join(box, "node_modules", "axios", "package.json"), "w") as f:
        json.dump({"name": "axios", "version": "0.0.0", "main": "index.js"}, f)
    with open(os.path.join(box, "node_modules", "mkdirp", "index.js"), "w") as f:
        f.write(MKDIRP_STUB)
    with open(os.path.join(box, "node_modules", "mkdirp", "package.json"), "w") as f:
        json.dump({"name": "mkdirp", "version": "0.0.0", "main": "index.js"}, f)
    routes = {
        "categories": [
            {
                "name": "Angkot",
                "agencyId": "race",
                "mode": "angkot",
                "routeGroups": [
                    {
                        "groupId": "g1",
                        "name": "G",
                        "color": "FF0000",
                        "type": 3,
                        "routes": [
                            {"name": f"R{r['id']}", "directionId": 0,
                             "relationId": r["id"]}
                            for r in world["relations"]
                        ],
                    }
                ],
            }
        ]
    }
    with open(os.path.join(box, "routes.json"), "w") as f:
        json.dump(routes, f)
    with open(os.path.join(box, "world.json"), "w") as f:
        json.dump(world, f)
    return box


def run_reference(box: str) -> float:
    env = dict(os.environ, WORLD_JSON=os.path.join(box, "world.json"))
    t0 = time.perf_counter()
    proc = subprocess.run(
        ["node", "action-scripts/update-routes.js"],
        cwd=box, env=env, capture_output=True, text=True, timeout=3600,
    )
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"reference failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    return dt


def parse_reference(box: str, world: dict) -> dict:
    out = {}
    for r in world["relations"]:
        rid = str(r["id"])
        d = os.path.join(box, "route-data", "geojson", rid)
        with open(os.path.join(d, "ways.geojson")) as f:
            wj = json.load(f)
        coords = [
            (round(x, 9), round(y, 9))
            for x, y in wj["features"][0]["geometry"]["coordinates"]
        ]
        with open(os.path.join(d, "stops.geojson")) as f:
            sj = json.load(f)
        stops = [
            (
                ft["properties"]["id"],
                ft["properties"]["name"],
                ft["properties"]["role"],
                bool(ft["properties"]["isReal"]),
                round(ft["geometry"]["coordinates"][0], 9),
                round(ft["geometry"]["coordinates"][1], 9),
            )
            for ft in sj["features"]
        ]
        out[rid] = (coords, stops)
    return out


def run_spark(spark, world: dict) -> tuple[float, dict]:
    """The batched fleet shape: all relations' bundles parsed driver-side
    (the fetch boundary, same work the JS does), then ONE keyed program
    over two DataFrames."""
    from tegallega_spark.operators.stateful import stitch_ways
    from tegallega_spark.pipeline.extract import angkot_stops
    from tegallega_spark.sources.overpass import (
        STOP_NODE_SCHEMA,
        WAY_VERTEX_SCHEMA,
        bundle_to_rows,
        fetch_relation_bundle,
        nodes_query,
        relation_query,
        ways_query,
    )

    rel_map = {str(r["id"]): r for r in world["relations"]}
    way_map = {str(w["id"]): w for w in world["ways"]}
    node_map = {str(n["id"]): n for n in world["nodes"]}
    import re

    def fetch(query: str):
        m = re.fullmatch(r"\[out:json\];relation\((\d+)\);out body;", query)
        if m:
            r = rel_map.get(m.group(1))
            return [r] if r else []
        m = re.fullmatch(r"\[out:json\];way\(id:([\d,]+)\);out geom;", query)
        if m:
            return [way_map[i] for i in m.group(1).split(",") if i in way_map]
        m = re.fullmatch(r"\[out:json\];node\(id:([\d,]+)\);out geom;", query)
        if m:
            return [node_map[i] for i in m.group(1).split(",") if i in node_map]
        raise AssertionError(f"unexpected query {query}")

    t0 = time.perf_counter()
    all_way_rows: list = []
    all_node_rows: list = []
    for rid in rel_map:
        bundle = fetch_relation_bundle(rid, fetch)
        wr, nr = bundle_to_rows(rid, bundle)
        all_way_rows.extend(wr)
        all_node_rows.extend(nr)
    # Arrow on both boundaries (r9): list-of-tuples createDataFrame and
    # row-iterator collect() both serialize row-at-a-time through py4j —
    # profiled as the DOMINANT per-relation cost past ~10 k relations
    # (~2 ms/relation against node's 0.77).  pandas→createDataFrame and
    # toPandas() ride Arrow batches; the query plan is unchanged.
    import pandas as pd

    way_cols = ["relation_id", "way_order", "way_id", "way_name",
                "vertex_idx", "lon", "lat"]
    node_cols = ["relation_id", "member_order", "stop_id", "name",
                 "role", "lon", "lat"]
    ways_df = spark.createDataFrame(
        pd.DataFrame(all_way_rows, columns=way_cols), WAY_VERTEX_SCHEMA
    )
    nodes_df = spark.createDataFrame(
        pd.DataFrame(all_node_rows, columns=node_cols), STOP_NODE_SCHEMA
    )
    stitched = stitch_ways(ways_df, key="relation_id").persist()
    stops = angkot_stops(nodes_df, stitched, ways_df)

    got: dict = {}
    spdf = stitched.orderBy("relation_id", "vertex_idx").toPandas()
    for r in spdf.itertuples(index=False):
        got.setdefault(r.relation_id, ([], []))[0].append(
            (round(r.lon, 9), round(r.lat, 9))
        )
    stdf = stops.orderBy("relation_id", "frac_idx").toPandas()
    for r in stdf.itertuples(index=False):
        got.setdefault(r.relation_id, ([], []))[1].append(
            (r.stop_id, r.name, r.role, bool(r.is_real),
             round(r.lon, 9), round(r.lat, 9))
        )
    dt = time.perf_counter() - t0
    stitched.unpersist()
    return dt, {k: (v[0], v[1]) for k, v in got.items()}


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50, 200, 800]
    os.makedirs(OUT, exist_ok=True)

    from tegallega_spark.session import get_spark

    spark = get_spark("extract-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    results = []
    for n in sizes:
        world = make_world(n)
        box = make_sandbox(world, n)
        ref_s = run_reference(box)
        ref = parse_reference(box, world)
        spark_s, got = run_spark(spark, world)

        assert set(got) == set(ref), (len(got), len(ref))
        n_stops = 0
        for rid in ref:
            assert got[rid][0] == ref[rid][0], f"rel {rid}: way coords differ"
            assert got[rid][1] == ref[rid][1], (
                f"rel {rid}: stops differ\nspark={got[rid][1]}\nref={ref[rid][1]}"
            )
            n_stops += len(ref[rid][1])
        results.append(
            {
                "relations": n,
                "stops_total": n_stops,
                "reference_s": round(ref_s, 2),
                "spark_s": round(spark_s, 2),
                "ratio": round(ref_s / spark_s, 2),
                "outputs": "identical",
            }
        )
        print(json.dumps(results[-1]), file=sys.stderr)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
