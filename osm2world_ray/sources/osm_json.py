"""OSM JSON reader (OSM API / Overpass API dialects) as a Ray source.

Reference semantics (``JsonReader.java:24-120``): the document root is
``{"version": ..., "elements": [...]}``; numeric version attributes are
normalized to strings (Overpass emits ``0.6`` unquoted, the OSM API
quotes it, :108-117); any version other than "0.6" fails; elements
dispatch on ``type`` — node (id, lat, lon, tags), way (node id list),
relation (members with type/ref/role, invalid member types fail) —
and unsupported element types fail the read.

Ray shape: one JSON document per shard file; ``read_binary_files``
streams the shards and an actor-pool stage parses each (per-file work
is bounded by shard size — the Overpass HTTP fetch is scoped out as an
external service, the FORMAT is fully supported from local files).
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pyarrow as pa

from . import synth

_VERSION_RE = re.compile(r'"version"\s*:\s*([0-9]+\.?[0-9]*)')


def normalize_version(text: str) -> str:
    """Numeric version attributes -> strings (JsonReader.java:108-117)."""
    return _VERSION_RE.sub(lambda m: f'"version": "{m.group(1)}"', text)


def parse_osm_json(text: str):
    """-> (nodes, ways, relations) lists with reference fault
    semantics; raises ValueError like the reference's IOException."""
    root = json.loads(normalize_version(text))
    if root.get("version") != "0.6":
        raise ValueError(f"Unsupported OSM JSON version: {root.get('version')}")
    nodes, ways, relations = [], [], []
    for e in root.get("elements", []):
        etype = e.get("type")
        tags = e.get("tags") or {}
        if etype == "node":
            nodes.append((int(e["id"]), float(e["lat"]), float(e["lon"]), tags))
        elif etype == "way":
            ways.append((int(e["id"]), [int(n) for n in e["nodes"]], tags))
        elif etype == "relation":
            members = []
            for m in e.get("members", []):
                if m["type"] not in ("node", "way", "relation"):
                    raise ValueError(
                        f"Invalid member type for r {e['id']}: {m['type']}"
                    )
                members.append((m["type"], int(m["ref"]), m.get("role", "")))
            relations.append((int(e["id"]), members, tags))
        else:
            raise ValueError(f"Unsupported OSM element type: {etype}")
    return nodes, ways, relations


# -- deterministic synthetic shards (the driver-contract test input) --

def write_synth_shards(doc_ids: np.ndarray, out_dir: str,
                       docs_per_shard: int = 256) -> list[str]:
    """Write OSM JSON shards derived from the documents table: one
    node per mention, one way per doc (its mention polyline), one
    relation per doc%11 doc. Alternating shards carry a NUMERIC
    version attribute to exercise the normalization path."""
    os.makedirs(out_dir, exist_ok=True)
    doc_ids = np.sort(np.asarray(doc_ids, dtype=np.int64))
    paths = []
    for s, start in enumerate(range(0, len(doc_ids), docs_per_shard)):
        chunk = doc_ids[start:start + docs_per_shard]
        elements = []
        for d in chunk:
            n = int(d % 3) + 1
            j = np.arange(n, dtype=np.int64)
            lat, lon = synth.mention_latlon(np.full(n, d), j)
            for k in range(n):
                elements.append({
                    "type": "node",
                    "id": int(d) * 4 + k,
                    "lat": float(lat[k]),
                    "lon": float(lon[k]),
                    "tags": {"source": "synth"},
                })
            elements.append({
                "type": "way",
                "id": int(d),
                "nodes": [int(d) * 4 + k for k in range(n)],
                "tags": {"highway": "path"},
            })
            if d % 11 == 0:
                members = [
                    {"type": "node", "ref": int(d) * 4, "role": "admin_centre"},
                    {"type": "way", "ref": int(d), "role": "outer"},
                    {"type": "relation", "ref": int(d) - 11, "role": "subarea"},
                ]
                if d % 33 == 0:
                    members.append(
                        {"type": "node", "ref": int(d) * 4 + 9, "role": "label"}
                    )
                elements.append({
                    "type": "relation",
                    "id": int(d),
                    "members": members,
                    "tags": {"type": "multipolygon"},
                })
        doc = {"version": "0.6", "elements": elements, "generator": "synth"}
        text = json.dumps(doc)
        if s % 2 == 1:  # numeric version dialect (Overpass)
            text = text.replace('"version": "0.6"', '"version": 0.6', 1)
        p = os.path.join(out_dir, f"shard-{s:04d}.json")
        with open(p, "w") as f:
            f.write(text)
        paths.append(p)
    return paths


class OsmJsonParse:
    """Actor-pool stage: binary shard rows -> per-doc summary rows
    (url, n_nodes, n_way_refs, n_members, sum_lat_udeg)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, nn, nw, nm, sl = [], [], [], [], []
        for buf in batch["bytes"].to_pylist():
            nodes, ways, relations = parse_osm_json(buf.decode("utf-8"))
            per_doc: dict[int, list[int]] = {}
            for nid, lat, _lon, _t in nodes:
                d = nid // 4
                rec = per_doc.setdefault(d, [0, 0, 0, 0])
                rec[0] += 1
                rec[3] += int(np.floor(lat * 1e6 + 0.5))
            for wid, nids, _t in ways:
                rec = per_doc.setdefault(wid, [0, 0, 0, 0])
                rec[1] += len(nids)
            for rid, members, _t in relations:
                rec = per_doc.setdefault(rid, [0, 0, 0, 0])
                rec[2] += len(members)
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


def read_osm_json(paths: list[str]):
    import ray.data as rd

    ds = rd.read_binary_files(paths)
    return ds.map_batches(
        OsmJsonParse,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
        num_cpus=1,
    )
