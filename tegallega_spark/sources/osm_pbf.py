"""OSM XML → PBF conversion + a parallel PBF source (SURVEY S8 —
`.github/workflows/osm-to-pbf.yml:18-20`, `osmium cat raw.osm -o raw.osm.pbf`).

The reference shells out to osmium for the conversion; here it is a native
operator.  Everything follows the PUBLIC OpenStreetMap PBF format spec
(wiki.openstreetmap.org/wiki/PBF_Format; fileformat.proto /
osmformat.proto) implemented on pure stdlib — a ~60-line protobuf
varint codec instead of a protobuf dependency:

- file framing: [4-byte big-endian len][BlobHeader][Blob] repeated; first
  blob `OSMHeader`, then `OSMData` blobs;
- Blob payloads zlib-compressed with `raw_size` recorded;
- PrimitiveBlock: per-block string table (index 0 = ""), granularity 100
  nanodegrees (OSM's native 1e-7 precision), DenseNodes with delta-coded
  ids/lats/lons and 0-terminated keys_vals, Ways with delta-coded refs,
  Relations with delta-coded memids + member-type enum.

Scale design: the WRITE is a single-pass stream (constant memory —
iterparse over the XML, one PrimitiveBlock per `block_size` entities), the
same shape as osmium's own single-node pipeline.  The READ is parallel:
blobs are independently decodable by construction, so `read_osm_pbf`
scans only the ~16-byte framing on the driver and fans blob decode out to
executors via mapInPandas — the property that makes planet-scale PBF a
splittable source.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# protobuf wire codec (stdlib)
# ---------------------------------------------------------------------------

def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field: int, wire: int) -> bytes:
    return _uvarint(field << 3 | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """length-delimited field"""
    return _tag(field, 2) + _uvarint(len(payload)) + payload


def _vint(field: int, value: int) -> bytes:
    return _tag(field, 0) + _uvarint(value)


def _packed(field: int, values: Iterable[int], zigzag: bool = False) -> bytes:
    payload = b"".join(
        _uvarint(_zigzag(v) if zigzag else v) for v in values
    )
    return _ld(field, payload) if payload else b""


def _delta(values: list[int]) -> list[int]:
    prev = 0
    out = []
    for v in values:
        out.append(v - prev)
        prev = v
    return out


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, int | bytes]]:
    """Walk a protobuf message: yields (field_no, wire_type, value) —
    varints as int, length-delimited as bytes."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_uvarint(buf, pos)
            yield field, wire, v
        elif wire == 2:
            n, pos = _read_uvarint(buf, pos)
            yield field, wire, buf[pos:pos + n]
            pos += n
        elif wire == 5:
            yield field, wire, struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wire == 1:
            yield field, wire, struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        else:  # pragma: no cover - groups don't occur in PBF
            raise ValueError(f"unsupported wire type {wire}")


def _unpack_varints(buf: bytes, zigzag: bool = False) -> list[int]:
    out, pos = [], 0
    while pos < len(buf):
        v, pos = _read_uvarint(buf, pos)
        out.append(_unzigzag(v) if zigzag else v)
    return out


# ---------------------------------------------------------------------------
# OSM XML streaming parse (constant memory)
# ---------------------------------------------------------------------------

Entity = tuple[str, dict]
_GRANULARITY = 100  # nanodegrees → 1e-7 deg, OSM native precision
_MEMBER_TYPES = {"node": 0, "way": 1, "relation": 2}
_MEMBER_NAMES = {v: k for k, v in _MEMBER_TYPES.items()}


def parse_osm_xml(path: str) -> Iterator[Entity]:
    """Stream (kind, entity) tuples from an .osm dump; `bounds` yields a
    ("bounds", {...}) first when present.  iterparse + clear keeps memory
    flat regardless of file size."""
    from xml.etree.ElementTree import iterparse

    for _, elem in iterparse(path, events=("end",)):
        if elem.tag == "bounds":
            yield "bounds", {k: float(elem.get(k)) for k in
                             ("minlat", "minlon", "maxlat", "maxlon")}
        elif elem.tag == "node":
            yield "node", {
                "id": int(elem.get("id")),
                "lat": float(elem.get("lat")),
                "lon": float(elem.get("lon")),
                "tags": {t.get("k"): t.get("v") for t in elem.findall("tag")},
            }
        elif elem.tag == "way":
            yield "way", {
                "id": int(elem.get("id")),
                "refs": [int(n.get("ref")) for n in elem.findall("nd")],
                "tags": {t.get("k"): t.get("v") for t in elem.findall("tag")},
            }
        elif elem.tag == "relation":
            yield "relation", {
                "id": int(elem.get("id")),
                "members": [
                    (m.get("type"), int(m.get("ref")), m.get("role") or "")
                    for m in elem.findall("member")
                ],
                "tags": {t.get("k"): t.get("v") for t in elem.findall("tag")},
            }
        else:
            continue
        elem.clear()


# ---------------------------------------------------------------------------
# PBF write
# ---------------------------------------------------------------------------

class _StringTable:
    def __init__(self) -> None:
        self._index: dict[str, int] = {"": 0}

    def add(self, s: str) -> int:
        return self._index.setdefault(s, len(self._index))

    def encode(self) -> bytes:
        strings = sorted(self._index, key=self._index.get)
        return b"".join(_ld(1, s.encode("utf-8")) for s in strings)


def _encode_dense_nodes(nodes: list[dict], st: _StringTable) -> bytes:
    # round(x * 1e7) == round(x*1e9 / granularity): no floor-negative bias
    ids = _delta([n["id"] for n in nodes])
    lats = _delta([round(n["lat"] * 1e7) for n in nodes])
    lons = _delta([round(n["lon"] * 1e7) for n in nodes])
    keys_vals: list[int] = []
    has_tags = any(n["tags"] for n in nodes)
    if has_tags:
        for n in nodes:
            for k, v in n["tags"].items():
                keys_vals.extend((st.add(k), st.add(v)))
            keys_vals.append(0)
    dense = _packed(1, ids, zigzag=True) + _packed(8, lats, zigzag=True) + \
        _packed(9, lons, zigzag=True)
    if has_tags:
        dense += _packed(10, keys_vals)
    return _ld(2, dense)  # PrimitiveGroup.dense


def _encode_ways(ways: list[dict], st: _StringTable) -> bytes:
    out = bytearray()
    for w in ways:
        msg = _vint(1, w["id"])
        msg += _packed(2, [st.add(k) for k in w["tags"]])
        msg += _packed(3, [st.add(v) for v in w["tags"].values()])
        msg += _packed(8, _delta(w["refs"]), zigzag=True)
        out += _ld(3, msg)  # PrimitiveGroup.ways
    return bytes(out)


def _encode_relations(rels: list[dict], st: _StringTable) -> bytes:
    out = bytearray()
    for r in rels:
        msg = _vint(1, r["id"])
        msg += _packed(2, [st.add(k) for k in r["tags"]])
        msg += _packed(3, [st.add(v) for v in r["tags"].values()])
        msg += _packed(8, [st.add(role) for _, _, role in r["members"]])
        msg += _packed(9, _delta([ref for _, ref, _ in r["members"]]), zigzag=True)
        msg += _packed(10, [_MEMBER_TYPES[t] for t, _, _ in r["members"]])
        out += _ld(4, msg)  # PrimitiveGroup.relations
    return bytes(out)


def _primitive_block(kind: str, batch: list[dict]) -> bytes:
    st = _StringTable()
    if kind == "node":
        group = _encode_dense_nodes(batch, st)
    elif kind == "way":
        group = _encode_ways(batch, st)
    else:
        group = _encode_relations(batch, st)
    return _ld(1, st.encode()) + _ld(2, group) + _vint(17, _GRANULARITY)


def _blob(block_type: str, payload: bytes, out) -> None:
    compressed = zlib.compress(payload)
    blob = _vint(2, len(payload)) + _ld(3, compressed)
    header = _ld(1, block_type.encode()) + _vint(3, len(blob))
    out.write(struct.pack(">I", len(header)))
    out.write(header)
    out.write(blob)


def _header_block(bounds: dict | None) -> bytes:
    msg = b""
    if bounds:
        nano = lambda x: _zigzag(round(x * 1e9))  # noqa: E731
        bbox = (_vint(1, nano(bounds["minlon"])) + _vint(2, nano(bounds["maxlon"]))
                + _vint(3, nano(bounds["maxlat"])) + _vint(4, nano(bounds["minlat"])))
        msg += _ld(1, bbox)
    msg += _ld(4, b"OsmSchema-V0.6") + _ld(4, b"DenseNodes")
    msg += _ld(16, b"tegallega_spark")
    return msg


def write_osm_pbf(
    entities: Iterable[Entity], out_path: str, block_size: int = 8000
) -> int:
    """Stream entities into a .osm.pbf; returns the number of entities.
    Entities must arrive nodes → ways → relations (OSM dump order, which
    parse_osm_xml preserves); a kind switch flushes the current block."""
    count = 0
    bounds: dict | None = None
    it = iter(entities)
    first: Entity | None = None
    for kind, payload in it:
        if kind == "bounds":
            bounds = payload
        else:
            first = (kind, payload)
            break
    with open(out_path, "wb") as out:
        _blob("OSMHeader", _header_block(bounds), out)
        batch: list[dict] = []
        batch_kind = ""

        def flush() -> None:
            if batch:
                _blob("OSMData", _primitive_block(batch_kind, batch), out)
                batch.clear()

        def feed(kind: str, payload: dict) -> None:
            nonlocal batch_kind, count
            if kind != batch_kind or len(batch) >= block_size:
                flush()
                batch_kind = kind
            batch.append(payload)
            count += 1

        if first:
            feed(*first)
        for kind, payload in it:
            if kind == "bounds":
                continue
            feed(kind, payload)
        flush()
    return count


def osm_xml_to_pbf(xml_path: str, pbf_path: str, block_size: int = 8000) -> int:
    """`osmium cat raw.osm -o raw.osm.pbf` (osm-to-pbf.yml:18-20)."""
    return write_osm_pbf(parse_osm_xml(xml_path), pbf_path, block_size)


# ---------------------------------------------------------------------------
# PBF read — blob scan on the driver, decode on executors
# ---------------------------------------------------------------------------

def scan_blob_offsets(path: str) -> list[tuple[str, int, int]]:
    """Read ONLY the framing: [(blob_type, payload_offset, payload_size)].
    O(#blobs) seeks, no decompression — the planner's side of the source."""
    out = []
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                return out
            hlen = struct.unpack(">I", raw)[0]
            header = f.read(hlen)
            btype, dsize = "", 0
            for field, _, val in _fields(header):
                if field == 1:
                    btype = val.decode()
                elif field == 3:
                    dsize = val
            out.append((btype, f.tell(), dsize))
            f.seek(dsize, 1)


def _decompress_blob(buf: bytes) -> bytes:
    raw, zdata = None, None
    for field, _, val in _fields(buf):
        if field == 1:
            raw = val
        elif field == 3:
            zdata = val
    return raw if raw is not None else zlib.decompress(zdata)


def decode_primitive_block(payload: bytes) -> Iterator[Entity]:
    block = _decompress_blob(payload)
    strings: list[str] = []
    granularity, lat_off, lon_off = 100, 0, 0
    groups: list[bytes] = []
    for field, _, val in _fields(block):
        if field == 1:
            strings = [s.decode("utf-8") for f2, _, s in _fields(val) if f2 == 1]
        elif field == 2:
            groups.append(val)
        elif field == 17:
            granularity = val
        elif field == 19:
            lat_off = _unzigzag(val) if val else 0
        elif field == 20:
            lon_off = _unzigzag(val) if val else 0
    coord = lambda off, g, v: 1e-9 * (off + g * v)  # noqa: E731
    for group in groups:
        for field, _, val in _fields(group):
            if field == 2:  # DenseNodes
                ids = lats = lons = []
                kv: list[int] = []
                for f2, _, v2 in _fields(val):
                    if f2 == 1:
                        ids = _unpack_varints(v2, zigzag=True)
                    elif f2 == 8:
                        lats = _unpack_varints(v2, zigzag=True)
                    elif f2 == 9:
                        lons = _unpack_varints(v2, zigzag=True)
                    elif f2 == 10:
                        kv = _unpack_varints(v2)
                cid = clat = clon = 0
                kvi = 0
                for i, (di, dlat, dlon) in enumerate(zip(ids, lats, lons)):
                    cid += di
                    clat += dlat
                    clon += dlon
                    tags = {}
                    if kv:
                        while kv[kvi] != 0:
                            tags[strings[kv[kvi]]] = strings[kv[kvi + 1]]
                            kvi += 2
                        kvi += 1
                    yield "node", {
                        "id": cid,
                        "lat": coord(lat_off, granularity, clat),
                        "lon": coord(lon_off, granularity, clon),
                        "tags": tags,
                    }
            elif field == 3:  # Way
                wid, keys, vals, refs = 0, [], [], []
                for f2, _, v2 in _fields(val):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _unpack_varints(v2)
                    elif f2 == 3:
                        vals = _unpack_varints(v2)
                    elif f2 == 8:
                        acc, refs = 0, []
                        for d in _unpack_varints(v2, zigzag=True):
                            acc += d
                            refs.append(acc)
                yield "way", {
                    "id": wid,
                    "refs": refs,
                    "tags": {strings[k]: strings[v] for k, v in zip(keys, vals)},
                }
            elif field == 4:  # Relation
                rid, keys, vals, roles, mids, mtypes = 0, [], [], [], [], []
                for f2, _, v2 in _fields(val):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _unpack_varints(v2)
                    elif f2 == 3:
                        vals = _unpack_varints(v2)
                    elif f2 == 8:
                        roles = _unpack_varints(v2)
                    elif f2 == 9:
                        acc, mids = 0, []
                        for d in _unpack_varints(v2, zigzag=True):
                            acc += d
                            mids.append(acc)
                    elif f2 == 10:
                        mtypes = _unpack_varints(v2)
                yield "relation", {
                    "id": rid,
                    "members": [
                        (_MEMBER_NAMES[t], ref, strings[r])
                        for t, ref, r in zip(mtypes, mids, roles)
                    ],
                    "tags": {strings[k]: strings[v] for k, v in zip(keys, vals)},
                }


def read_pbf(path: str) -> Iterator[Entity]:
    """Sequential full read (tests / small files)."""
    with open(path, "rb") as f:
        for btype, off, size in scan_blob_offsets(path):
            if btype != "OSMData":
                continue
            f.seek(off)
            yield from decode_primitive_block(f.read(size))


_ENTITY_SCHEMA = (
    "kind string, id long, lat double, lon double, refs array<long>, "
    "members array<struct<mtype:string,ref:long,role:string>>, "
    "tags map<string,string>"
)


def read_osm_pbf(spark: SparkSession, path: str) -> DataFrame:
    """Parallel PBF source: one task per OSMData blob.  The driver reads
    only the framing; executors decompress + decode their blobs through
    mapInPandas.  `path` must be executor-visible (shared FS), the same
    contract as any file source."""
    path = os.path.abspath(path)
    offsets = [
        (off, size) for btype, off, size in scan_blob_offsets(path)
        if btype == "OSMData"
    ]
    n = max(len(offsets), 1)
    odf = spark.createDataFrame(offsets or [(0, 0)], "off long, size long") \
        .repartition(min(n, spark.sparkContext.defaultParallelism))

    def decode(batches):
        import pandas as pd

        with open(path, "rb") as f:
            for pdf in batches:
                rows = []
                for off, size in zip(pdf["off"], pdf["size"]):
                    if size == 0:
                        continue
                    f.seek(int(off))
                    for kind, e in decode_primitive_block(f.read(int(size))):
                        members = e.get("members")
                        if members is not None:
                            members = [
                                {"mtype": t, "ref": ref, "role": role}
                                for t, ref, role in members
                            ]
                        rows.append(
                            (
                                kind,
                                e["id"],
                                e.get("lat"),
                                e.get("lon"),
                                e.get("refs"),
                                members,
                                e["tags"],
                            )
                        )
                yield pd.DataFrame(
                    rows,
                    columns=["kind", "id", "lat", "lon", "refs", "members", "tags"],
                )

    return odf.mapInPandas(decode, _ENTITY_SCHEMA)


def osm_entity_tables(entities: DataFrame) -> dict[str, DataFrame]:
    """Split the unified entity frame into typed nodes/ways/relations."""
    return {
        "nodes": entities.filter(F.col("kind") == "node").select("id", "lat", "lon", "tags"),
        "ways": entities.filter(F.col("kind") == "way").select("id", "refs", "tags"),
        "relations": entities.filter(F.col("kind") == "relation").select("id", "members", "tags"),
    }
