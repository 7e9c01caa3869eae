"""Minimal OSM PBF reader (the OSMFileReader .pbf path).

Public-format implementation of the OSM PBF container (see the OSM
wiki "PBF Format" spec, mirrored by osm4j-pbf which the reference
uses): a sequence of [4-byte big-endian length][BlobHeader][Blob]
frames; Blobs hold raw or zlib-compressed HeaderBlock/PrimitiveBlock
payloads; PrimitiveBlocks carry a string table plus primitive groups
of DenseNodes (delta-coded packed sint64 ids/lats/lons, interleaved
key/value index stream terminated by 0), Ways (delta-coded refs) and
Relations (delta-coded member ids with role/type streams). Coordinates
decode as 1e-9 * (offset + granularity * value).

Protobuf wire decoding is hand-rolled (varint / zigzag / length-
delimited) — no protobuf dependency. Same entity tuples as the XML and
JSON readers, so the three format paths cross-check entity-for-entity.
"""

from __future__ import annotations

import zlib


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    """Iterate (field_no, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _packed_varints(buf: bytes) -> list[int]:
    out = []
    i = 0
    while i < len(buf):
        v, i = _varint(buf, i)
        out.append(v)
    return out


def _delta_sint(vals: list[int]) -> list[int]:
    out = []
    acc = 0
    for v in vals:
        acc += _zigzag(v)
        out.append(acc)
    return out


def parse_osm_pbf(data: bytes):
    """-> (nodes, ways, relations) in the XML/JSON readers' shapes."""
    nodes, ways, relations = [], [], []
    i = 0
    while i + 4 <= len(data):
        ln = int.from_bytes(data[i:i + 4], "big")
        i += 4
        header = data[i:i + ln]
        i += ln
        htype = b""
        dsize = 0
        for f, _wt, v in _fields(header):
            if f == 1:
                htype = v
            elif f == 3:
                dsize = v
        blob = data[i:i + dsize]
        i += dsize
        payload = b""
        for f, _wt, v in _fields(blob):
            if f == 1:
                payload = v
            elif f == 3:
                payload = zlib.decompress(v)
            elif f in (4, 5, 6, 7):
                # lzma/lz4/zstd/obsolete codecs (fileformat.proto Blob):
                # fail loudly rather than silently contribute zero entities
                raise ValueError(f"Unsupported PBF blob codec (field {f})")
        if htype == b"OSMHeader":
            continue
        if htype != b"OSMData":
            raise ValueError(f"Unsupported blob type: {htype!r}")
        _parse_primitive_block(payload, nodes, ways, relations)
    return nodes, ways, relations


def _parse_primitive_block(buf: bytes, nodes, ways, relations):
    strings: list[str] = []
    groups: list[bytes] = []
    gran = 100
    lat_off = 0
    lon_off = 0
    for f, _wt, v in _fields(buf):
        if f == 1:  # stringtable
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    strings.append(v2.decode("utf-8"))
        elif f == 2:
            groups.append(v)
        elif f == 17:
            gran = v
        elif f == 19:
            lat_off = v
        elif f == 20:
            lon_off = v

    def coord(off, raw):
        return 1e-9 * (off + gran * raw)

    for g in groups:
        for f, _wt, v in _fields(g):
            if f == 2:  # DenseNodes
                ids = lats = lons = kv = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _delta_sint(_packed_varints(v2))
                    elif f2 == 8:
                        lats = _delta_sint(_packed_varints(v2))
                    elif f2 == 9:
                        lons = _delta_sint(_packed_varints(v2))
                    elif f2 == 10:
                        kv = _packed_varints(v2)
                tag_iter = iter(kv)
                for nid, la, lo in zip(ids, lats, lons):
                    tags = {}
                    for k in tag_iter:
                        if k == 0:
                            break
                        tags[strings[k]] = strings[next(tag_iter)]
                    nodes.append(
                        (nid, coord(lat_off, la), coord(lon_off, lo), tags)
                    )
            elif f == 1:  # plain Node
                nid = la = lo = 0
                keys = vals = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        nid = _zigzag(v2)
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        la = _zigzag(v2)
                    elif f2 == 9:
                        lo = _zigzag(v2)
                tags = {strings[k]: strings[x] for k, x in zip(keys, vals)}
                nodes.append((nid, coord(lat_off, la), coord(lon_off, lo), tags))
            elif f == 3:  # Way
                wid = 0
                keys = vals = refs = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        refs = _delta_sint(_packed_varints(v2))
                tags = {strings[k]: strings[x] for k, x in zip(keys, vals)}
                ways.append((wid, refs, tags))
            elif f == 4:  # Relation
                rid = 0
                keys = vals = roles = mids = mtypes = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        roles = _packed_varints(v2)
                    elif f2 == 9:
                        mids = _delta_sint(_packed_varints(v2))
                    elif f2 == 10:
                        mtypes = _packed_varints(v2)
                tags = {strings[k]: strings[x] for k, x in zip(keys, vals)}
                tname = {0: "node", 1: "way", 2: "relation"}
                members = [
                    (tname[t], m, strings[r])
                    for t, m, r in zip(mtypes, mids, roles)
                ]
                relations.append((rid, members, tags))


# -- minimal writer (synthesizes driver-contract test input) -----------

def _enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _enc_field(field: int, wt: int, payload) -> bytes:
    tag = _enc_varint(field << 3 | wt)
    if wt == 0:
        return tag + _enc_varint(payload)
    return tag + _enc_varint(len(payload)) + payload


def _enc_packed(vals) -> bytes:
    return b"".join(_enc_varint(v) for v in vals)


def _enc_delta_sint(vals) -> bytes:
    out = bytearray()
    prev = 0
    for v in vals:
        out += _enc_varint(_enc_zigzag(v - prev))
        prev = v
    return bytes(out)


def quantize(deg: float) -> int:
    """nanodegree/granularity-100 raw value (floor + 0.5 rounding)."""
    import math

    return int(math.floor(deg * 1e7 + 0.5))


def write_osm_pbf(path: str, nodes, ways, relations, *, compress: bool = True):
    """Write one OSMData blob with DenseNodes + ways + relations.
    Entities use the reader's tuple shapes; coordinates quantize to
    granularity-100 nanodegrees."""
    strings = [""]
    index: dict[str, int] = {"": 0}

    def sid(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    dense = bytearray()
    kv = []
    for _nid, _la, _lo, tags in nodes:
        for k, v in tags.items():
            kv += [sid(k), sid(v)]
        kv.append(0)
    dense += _enc_field(1, 2, _enc_delta_sint([n[0] for n in nodes]))
    dense += _enc_field(8, 2, _enc_delta_sint([quantize(n[1]) for n in nodes]))
    dense += _enc_field(9, 2, _enc_delta_sint([quantize(n[2]) for n in nodes]))
    dense += _enc_field(10, 2, _enc_packed(kv))
    group = bytearray(_enc_field(2, 2, bytes(dense)))
    for wid, refs, tags in ways:
        w = bytearray(_enc_field(1, 0, wid))
        w += _enc_field(2, 2, _enc_packed([sid(k) for k in tags]))
        w += _enc_field(3, 2, _enc_packed([sid(v) for v in tags.values()]))
        w += _enc_field(8, 2, _enc_delta_sint(refs))
        group += _enc_field(3, 2, bytes(w))
    tcode = {"node": 0, "way": 1, "relation": 2}
    for rid, members, tags in relations:
        r = bytearray(_enc_field(1, 0, rid))
        r += _enc_field(2, 2, _enc_packed([sid(k) for k in tags]))
        r += _enc_field(3, 2, _enc_packed([sid(v) for v in tags.values()]))
        r += _enc_field(8, 2, _enc_packed([sid(m[2]) for m in members]))
        r += _enc_field(9, 2, _enc_delta_sint([m[1] for m in members]))
        r += _enc_field(10, 2, _enc_packed([tcode[m[0]] for m in members]))
        group += _enc_field(4, 2, bytes(r))
    st = b"".join(
        _enc_field(1, 2, s.encode("utf-8")) for s in strings
    )
    block = (
        _enc_field(1, 2, st)
        + _enc_field(2, 2, bytes(group))
        + _enc_field(17, 0, 100)
    )
    if compress:
        blob = _enc_field(2, 0, len(block)) + _enc_field(3, 2, zlib.compress(block))
    else:
        blob = _enc_field(1, 2, block)
    header = _enc_field(1, 2, b"OSMData") + _enc_field(3, 0, len(blob))
    with open(path, "wb") as f:
        f.write(len(header).to_bytes(4, "big"))
        f.write(header)
        f.write(blob)


# -- driver-contract synthetic shards + Ray source ---------------------

def write_synth_pbf_shards(doc_ids, out_dir: str,
                           docs_per_shard: int = 256) -> list[str]:
    """Same synthetic entity model as the XML/JSON shards; alternating
    shards use zlib vs raw blobs (both reader paths)."""
    import os

    import numpy as np

    from . import synth

    os.makedirs(out_dir, exist_ok=True)
    doc_ids = np.sort(np.asarray(doc_ids, dtype=np.int64))
    paths = []
    for s, start in enumerate(range(0, len(doc_ids), docs_per_shard)):
        chunk = doc_ids[start:start + docs_per_shard]
        nodes, ways, relations = [], [], []
        for d in chunk:
            n = int(d % 3) + 1
            j = np.arange(n, dtype=np.int64)
            lat, lon = synth.mention_latlon(np.full(n, d), j)
            for k in range(n):
                nodes.append(
                    (int(d) * 4 + k, float(lat[k]), float(lon[k]),
                     {"source": "synth"})
                )
            ways.append(
                (int(d), [int(d) * 4 + k for k in range(n)],
                 {"highway": "path"})
            )
            if d % 11 == 0:
                members = [
                    ("node", int(d) * 4, "admin_centre"),
                    ("way", int(d), "outer"),
                    ("relation", int(d) - 11, "subarea"),
                ]
                if d % 33 == 0:
                    members.append(("node", int(d) * 4 + 9, "label"))
                relations.append((int(d), members, {"type": "multipolygon"}))
        p = os.path.join(out_dir, f"shard-{s:04d}.osm.pbf")
        write_osm_pbf(p, nodes, ways, relations, compress=(s % 2 == 0))
        paths.append(p)
    return paths


class OsmPbfParse:
    """Actor-pool stage: binary shard rows -> per-doc summary rows
    (same schema as the XML/JSON readers; lats are the PBF-quantized
    values)."""

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa

        from . import synth

        urls, nn, nw, nm, sl = [], [], [], [], []
        for buf in batch["bytes"].to_pylist():
            nodes, ways, relations = parse_osm_pbf(bytes(buf))
            per_doc: dict[int, list[int]] = {}
            for nid, lat, _lon, _t in nodes:
                d = nid // 4
                rec = per_doc.setdefault(d, [0, 0, 0, 0])
                rec[0] += 1
                rec[3] += int(np.floor(lat * 1e6 + 0.5))
            for wid, nids, _t in ways:
                per_doc.setdefault(wid, [0, 0, 0, 0])[1] += len(nids)
            for rid, members, _t in relations:
                per_doc.setdefault(rid, [0, 0, 0, 0])[2] += len(members)
            for d in sorted(per_doc):
                rec = per_doc[d]
                urls.append(f"{synth.URL_PREFIX}{d}")
                nn.append(rec[0])
                nw.append(rec[1])
                nm.append(rec[2])
                sl.append(rec[3])
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "n_nodes": pa.array(nn, type=pa.int64()),
                "n_way_refs": pa.array(nw, type=pa.int64()),
                "n_members": pa.array(nm, type=pa.int64()),
                "sum_lat_udeg": pa.array(sl, type=pa.int64()),
            }
        )


def read_osm_pbf_ds(paths: list[str]):
    import ray.data as rd

    ds = rd.read_binary_files(paths)
    return ds.map_batches(
        OsmPbfParse,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
        num_cpus=1,
    )
