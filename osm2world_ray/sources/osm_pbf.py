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
