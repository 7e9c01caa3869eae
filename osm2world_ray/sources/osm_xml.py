"""OSM XML (.osm) reader — the OSMFileReader fixture-format path.

Reference semantics: the test corpus is .osm XML read through osm4j
(``OSMFileReader``/osm4j-xml; fixtures ``mp_two_holes.osm`` etc.):
``<osm version="0.6">`` wrapping ``<node id lat lon>`` (with ``<tag
k v/>`` children), ``<way id>`` with ordered ``<nd ref/>`` refs, and
``<relation id>`` with ``<member type ref role/>`` rows; unknown
member types are invalid.

Same Ray shape and per-doc summary output as the JSON reader
(``sources/osm_json.py``) — the two dialect readers must agree row for
row, so the driver query shares the JSON query's oracle verbatim.
"""

from __future__ import annotations

import bz2
import gzip
import os
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from . import synth


def sniff_decompress(path: str, buf: bytes) -> bytes:
    """Filename-suffix compression sniffing, the
    ``CompressionMethod.fromFileName`` rule
    (``core-jvm/.../OSMStreamReader.java:55-66``): ``.gz`` -> gzip,
    ``.bz2`` -> bzip2, else raw. (The reference enum also names
    ``.pbf``, routed to ``sources/osm_pbf.py`` here; and its stream
    path actually *throws* NotImplementedException for gz/bz2 — we
    decode them.)

    Magic-byte guarded: Ray's ``read_binary_files`` (pyarrow
    ``compression='detect'``) already inflates by extension, so on
    that path the payload arrives decompressed — decode only when the
    codec magic is actually present."""
    buf = bytes(buf)
    if path.endswith(".gz") and buf[:2] == b"\x1f\x8b":
        return gzip.decompress(buf)
    if path.endswith(".bz2") and buf[:3] == b"BZh":
        return bz2.decompress(buf)
    return buf


def parse_osm_xml(text: str):
    """-> (nodes, ways, relations) with the same shapes and fault
    semantics as :func:`osm_json.parse_osm_json`."""
    root = ET.fromstring(text)
    if root.tag != "osm":
        raise ValueError(f"Unsupported root element: {root.tag}")
    if root.get("version") != "0.6":
        raise ValueError(f"Unsupported OSM XML version: {root.get('version')}")
    nodes, ways, relations = [], [], []
    for e in root:
        if e.get("action") == "delete":
            continue  # JOSM edit files: deleted elements are excluded
        tags = {t.get("k"): t.get("v") for t in e.findall("tag")}
        if e.tag == "node":
            nodes.append(
                (int(e.get("id")), float(e.get("lat")), float(e.get("lon")), tags)
            )
        elif e.tag == "way":
            ways.append(
                (int(e.get("id")), [int(nd.get("ref")) for nd in e.findall("nd")], tags)
            )
        elif e.tag == "relation":
            members = []
            for m in e.findall("member"):
                if m.get("type") not in ("node", "way", "relation"):
                    raise ValueError(
                        f"Invalid member type for r {e.get('id')}: {m.get('type')}"
                    )
                members.append((m.get("type"), int(m.get("ref")), m.get("role", "")))
            relations.append((int(e.get("id")), members, tags))
        elif e.tag in ("bounds", "note", "meta"):
            continue  # metadata elements are skipped, not errors
        else:
            raise ValueError(f"Unsupported OSM element type: {e.tag}")
    return nodes, ways, relations


def parse_osm_bounds(text: str):
    """-> (minlat, minlon, maxlat, maxlon) from the first <bounds>
    element, or None (the fileBoundary input of coastline assembly,
    OSMToMapDataConverter.java:66)."""
    root = ET.fromstring(text)
    b = root.find("bounds")
    if b is None:
        return None
    return (
        float(b.get("minlat")), float(b.get("minlon")),
        float(b.get("maxlat")), float(b.get("maxlon")),
    )


def write_synth_xml_shards(doc_ids: np.ndarray, out_dir: str,
                           docs_per_shard: int = 256,
                           compress_mix: bool = False) -> list[str]:
    """Same synthetic entity model as the JSON shards, as .osm XML.
    Floats are serialized with ``repr`` so they round-trip bit-exactly.
    With ``compress_mix``, every 3rd shard is gzipped (``.osm.gz``) and
    every 7th bzip2'd (``.osm.bz2``) to exercise the suffix-sniffing
    read path with the same logical content."""
    os.makedirs(out_dir, exist_ok=True)
    doc_ids = np.sort(np.asarray(doc_ids, dtype=np.int64))
    paths = []
    for s, start in enumerate(range(0, len(doc_ids), docs_per_shard)):
        chunk = doc_ids[start:start + docs_per_shard]
        lines = ['<?xml version="1.0" encoding="UTF-8"?>',
                 '<osm version="0.6" generator="synth">',
                 '  <bounds minlat="40" minlon="-10" maxlat="50" maxlon="10"/>']
        for d in chunk:
            n = int(d % 3) + 1
            j = np.arange(n, dtype=np.int64)
            lat, lon = synth.mention_latlon(np.full(n, d), j)
            for k in range(n):
                lines.append(
                    f'  <node id="{int(d) * 4 + k}" lat="{lat[k]!r}" '
                    f'lon="{lon[k]!r}"><tag k="source" v="synth"/></node>'
                )
            nds = "".join(f'<nd ref="{int(d) * 4 + k}"/>' for k in range(n))
            lines.append(
                f'  <way id="{int(d)}">{nds}<tag k="highway" v="path"/></way>'
            )
            if d % 11 == 0:
                ms = (
                    f'<member type="node" ref="{int(d) * 4}" role="admin_centre"/>'
                    f'<member type="way" ref="{int(d)}" role="outer"/>'
                    f'<member type="relation" ref="{int(d) - 11}" role="subarea"/>'
                )
                if d % 33 == 0:
                    ms += f'<member type="node" ref="{int(d) * 4 + 9}" role="label"/>'
                lines.append(
                    f'  <relation id="{int(d)}">{ms}'
                    '<tag k="type" v="multipolygon"/></relation>'
                )
        lines.append("</osm>")
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        p = os.path.join(out_dir, f"shard-{s:04d}.osm")
        if compress_mix and s % 7 == 1:
            p += ".bz2"
            payload = bz2.compress(payload)
        elif compress_mix and s % 3 == 1:
            p += ".gz"
            # mtime=0: deterministic bytes across runs
            payload = gzip.compress(payload, mtime=0)
        with open(p, "wb") as f:
            f.write(payload)
        paths.append(p)
    return paths


class OsmXmlParse:
    """Actor-pool stage: binary .osm shards -> per-doc summary rows
    (identical schema/content to the JSON reader's)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, nn, nw, nm, sl = [], [], [], [], []
        pth = (batch["path"].to_pylist() if "path" in batch.column_names
               else [""] * len(batch))
        for path, buf in zip(pth, batch["bytes"].to_pylist()):
            raw = sniff_decompress(path, buf)
            nodes, ways, relations = parse_osm_xml(raw.decode("utf-8"))
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


def read_osm_xml(paths: list[str]):
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(
        OsmXmlParse,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
        num_cpus=1,
    )
