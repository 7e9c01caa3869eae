"""Way-node reference resolution: the id->entity hash join with
missing-ref fault semantics.

Reference (``OSMToMapDataConverter.java:172-179,296-302,400-412``):
way node-refs resolve through a ``TLongObjectHashMap``; a missing ref
raises ``EntityNotFoundException`` -> the WHOLE way is skipped and the
error logged (the way never partially materializes).

Ray shape: refs and nodes co-locate via one bounded bucket key (hash
of the owning doc), then a vectorized per-bucket merge; ways with any
unresolved ref emit an error row instead of resolved rows. The "ways"
side table is synthesized from the pages (each page's way references
its mentions 0..n-1, plus a deliberately dangling ref 3 for
``doc_id % 23 == 0`` — the EntityNotFoundException path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources import synth
from .overlaps import bucket_groups, bucket_of

DANGLING_MOD = 23
DANGLING_REF = 3


def refs_from_mentions(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """Mention rows -> way-ref rows (url, ref): one ref per mention,
    plus the dangling ref for doc_id % 23 == 0 pages. ``n_buckets`` is
    the driver-resolved shuffle bucket count."""
    import pyarrow.compute as pc

    doc = pc.utf8_slice_codeunits(
        batch["url"], len(synth.URL_PREFIX), 99
    ).cast(pa.int64()).to_numpy()
    refs = batch["mention_idx"].to_numpy()
    urls = batch["url"]
    # dangling extra ref, once per qualifying url (attach to mention 0)
    extra = (doc % DANGLING_MOD == 0) & (refs == 0)
    extra_idx = np.nonzero(extra)[0]
    all_idx = np.concatenate([np.arange(len(doc)), extra_idx])
    all_refs = np.concatenate(
        [refs, np.full(len(extra_idx), DANGLING_REF, dtype=np.int64)]
    )
    out = batch.select(["url"]).take(pa.array(all_idx))
    return (
        out.append_column("ref", pa.array(all_refs))
        .append_column("doc_id", pa.array(np.concatenate([doc, doc[extra_idx]])))
        .append_column(
            "bucket",
            pa.array(bucket_of(np.concatenate([doc, doc[extra_idx]]), n_buckets)),
        )
    )


def _merge(group: pa.Table):
    """Bucket co-group (Arrow in): kind 0 = node rows (url,
    mention_idx, lat, lon), kind 1 = ref rows (url, ref). The hash
    join is a vectorized searchsorted on the (doc, idx) composite —
    no pandas merge (and none of its silent _x/_y suffix traps).
    Returns (resolved dict of numpy arrays, bad doc ids sorted)."""
    from .overlaps import col_np, doc_ids_of

    kind = col_np(group, "kind", np.int64)
    doc = doc_ids_of(group)
    nrows = np.nonzero(kind == 0)[0]
    rrows = np.nonzero(kind == 1)[0]
    # node lookup key: doc * 16 + mention_idx (mention_idx < 4)
    midx = col_np(group, "mention_idx", np.int64)
    nkey = doc[nrows] * 16 + midx[nrows]
    order = np.argsort(nkey)
    nkey = nkey[order]
    nsel = nrows[order]
    ref = col_np(group, "ref", np.int64)
    rkey = doc[rrows] * 16 + ref[rrows]
    pos = np.clip(np.searchsorted(nkey, rkey), 0, max(len(nkey) - 1, 0))
    hit = (nkey[pos] == rkey) if len(nkey) else np.zeros(len(rkey), bool)
    bad_docs = np.unique(doc[rrows[~hit]])
    keep = hit & ~np.isin(doc[rrows], bad_docs)
    src = nsel[pos[keep]]
    lat = col_np(group, "lat", np.float64)
    lon = col_np(group, "lon", np.float64)
    resolved = {
        "doc": doc[rrows[keep]],
        "ref": ref[rrows[keep]],
        "lat": lat[src],
        "lon": lon[src],
    }
    return resolved, bad_docs


def resolve_group(group: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    r, _bad = _merge(group)
    url = pc.binary_join_element_wise(
        synth.URL_PREFIX, pc.cast(pa.array(r["doc"]), pa.string()), ""
    )
    return pa.table(
        {
            "url": url,
            "ref_idx": pa.array(r["ref"]),
            "lat_udeg": pa.array(
                np.floor(r["lat"] * 1e6 + 0.5).astype(np.int64)
            ),
            "lon_udeg": pa.array(
                np.floor(r["lon"] * 1e6 + 0.5).astype(np.int64)
            ),
        }
    )


def resolve_errors_group(group: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    _resolved, bad = _merge(group)
    url = pc.binary_join_element_wise(
        synth.URL_PREFIX, pc.cast(pa.array(bad), pa.string()), ""
    )
    return pa.table(
        {
            "url": url,
            "error": pa.array(
                [f"missing node ref {DANGLING_REF}"] * len(bad), type=pa.string()
            ),
        }
    )


def _tagged_union(sf_dir: str):
    from ..pipelines import datasets
    from .overlaps import n_shuffle_buckets

    mentions = datasets.mentions_ds(sf_dir)
    nb = n_shuffle_buckets()  # driver-resolved, captured by the closures

    def node_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = pc.utf8_slice_codeunits(
            b["url"], len(synth.URL_PREFIX), 99
        ).cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "url": b["url"],
                "mention_idx": b["mention_idx"],
                "lat": b["lat"],
                "lon": b["lon"],
                "ref": pa.nulls(len(b), pa.int64()),
                "kind": pa.array(np.zeros(len(b), dtype=np.int64)),
                "bucket": pa.array(bucket_of(doc, nb)),
            }
        )

    def ref_rows(b: pa.Table) -> pa.Table:
        r = refs_from_mentions(b, n_buckets=nb)
        return pa.table(
            {
                "url": r["url"],
                "mention_idx": pa.nulls(len(r), pa.int64()),
                "lat": pa.nulls(len(r), pa.float64()),
                "lon": pa.nulls(len(r), pa.float64()),
                "ref": r["ref"],
                "kind": pa.array(np.ones(len(r), dtype=np.int64)),
                "bucket": r["bucket"],
            }
        )

    nodes = mentions.map_batches(node_rows, batch_format="pyarrow")
    refs = mentions.map_batches(ref_rows, batch_format="pyarrow")
    return nodes.union(refs)


REL_MOD = 11
REL_DANGLING_MOD = 33


def relation_members(batch: pa.Table) -> pa.Table:
    """documents batch -> typed relation-member rows. Docs with
    ``doc_id % 11 == 0`` declare a relation with members (node: own
    mention 0 / way: own way / relation: previous relation), plus a
    dangling node member for ``doc_id % 33 == 0`` — the
    incomplete-member path (OSMToMapDataConverter.java:307-383)."""
    doc = batch["doc_id"].to_numpy()
    rels = doc[doc % REL_MOD == 0]
    rows = []
    for d in rels.tolist():
        rows.append((d, 0, "node", d, 0, "admin_centre"))
        rows.append((d, 1, "way", d, -1, "outer"))
        rows.append((d, 2, "relation", d - REL_MOD, -1, "subarea"))
        if d % REL_DANGLING_MOD == 0:
            rows.append((d, 3, "node", d, 9, "label"))
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    return pa.table(
        {
            "rel_doc": pa.array(list(cols[0]), type=pa.int64()),
            "member_idx": pa.array(list(cols[1]), type=pa.int64()),
            "member_type": pa.array(list(cols[2]), type=pa.string()),
            "ref_doc": pa.array(list(cols[3]), type=pa.int64()),
            "ref_idx": pa.array(list(cols[4]), type=pa.int64()),
            "role": pa.array(list(cols[5]), type=pa.string()),
        }
    )


_REL_EMPTY = pa.schema(
    [
        ("url", pa.string()),
        ("member_idx", pa.int64()),
        ("member_type", pa.string()),
        ("role", pa.string()),
        ("resolved", pa.int64()),
    ]
).empty_table()


def resolve_relations_group(group: pa.Table) -> pa.Table:
    """Bucket co-group (Arrow in/out): kind 0 = node keys (doc, midx),
    kind 1 = way keys (doc), kind 2 = relation keys (doc), kind 3 =
    member rows keyed by ref_doc. Emits every member with its resolved
    flag (incomplete members are logged-but-kept, the reference keeps
    a relation while any member resolves). Lookups are sorted-array
    np.isin probes — no Python sets."""
    import pyarrow.compute as pc

    from .overlaps import col_np

    kind = col_np(group, "kind", np.int64)
    key_doc = col_np(group, "key_doc", np.int64)
    key_idx = col_np(group, "key_idx", np.int64)
    mrows = np.nonzero(kind == 3)[0]
    if len(mrows) == 0:
        return _REL_EMPTY
    node_arr = key_doc[kind == 0] * 16 + key_idx[kind == 0]
    way_arr = key_doc[kind == 1]
    rel_arr = key_doc[kind == 2]
    tbl = (
        group if isinstance(group, pa.Table)
        else pa.Table.from_pandas(group, preserve_index=False)
    )
    members = tbl.take(pa.array(mrows))
    mtype = members["member_type"]
    if isinstance(mtype, pa.ChunkedArray):
        mtype = mtype.combine_chunks()
    is_node = pc.equal(mtype, "node").to_numpy(zero_copy_only=False)
    is_way = pc.equal(mtype, "way").to_numpy(zero_copy_only=False)
    ref_doc = col_np(members, "ref_doc", np.int64)
    ref_idx = col_np(members, "ref_idx", np.int64)
    res = np.where(
        is_node,
        np.isin(ref_doc * 16 + ref_idx, node_arr),
        np.where(
            is_way,
            np.isin(ref_doc, way_arr),
            np.isin(ref_doc, rel_arr),
        ),
    ).astype(np.int64)
    url = pc.binary_join_element_wise(
        synth.URL_PREFIX,
        pc.cast(members["rel_doc"].combine_chunks(), pa.string()),
        "",
    )
    return pa.table(
        {
            "url": url,
            "member_idx": members["member_idx"].cast(pa.int64()),
            "member_type": mtype,
            "role": members["role"],
            "resolved": pa.array(res),
        }
    )


def resolve_relations(sf_dir: str):
    """3-way typed member resolution as one bucket co-group keyed on
    the referenced doc."""
    from ..pipelines import datasets

    from .overlaps import n_shuffle_buckets

    mentions = datasets.mentions_ds(sf_dir)
    docs = datasets.documents_ds(sf_dir, columns=["doc_id"])
    nb = n_shuffle_buckets()  # driver-resolved, captured by the closures

    def node_keys(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = pc.utf8_slice_codeunits(
            b["url"], len(synth.URL_PREFIX), 99
        ).cast(pa.int64()).to_numpy()
        return _keyrow(doc, b["mention_idx"].to_numpy(), 0)

    def way_keys(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy()
        return _keyrow(doc, np.full(len(doc), -1), 1)

    def rel_keys(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy()
        doc = doc[doc % REL_MOD == 0]
        return _keyrow(doc, np.full(len(doc), -1), 2)

    def member_rows(b: pa.Table) -> pa.Table:
        m = relation_members(b)
        return pa.table(
            {
                "key_doc": m["ref_doc"],
                "key_idx": m["ref_idx"],
                "kind": pa.array(np.full(len(m), 3, dtype=np.int64)),
                "rel_doc": m["rel_doc"],
                "member_idx": m["member_idx"],
                "member_type": m["member_type"],
                "ref_doc": m["ref_doc"],
                "ref_idx": m["ref_idx"],
                "role": m["role"],
                "bucket": pa.array(bucket_of(m["ref_doc"].to_numpy(), nb)),
            }
        )

    def _pad(t: pa.Table) -> pa.Table:
        n = len(t)
        return (
            t.append_column("rel_doc", pa.nulls(n, pa.int64()))
            .append_column("member_idx", pa.nulls(n, pa.int64()))
            .append_column("member_type", pa.nulls(n, pa.string()))
            .append_column("ref_doc", pa.nulls(n, pa.int64()))
            .append_column("ref_idx", pa.nulls(n, pa.int64()))
            .append_column("role", pa.nulls(n, pa.string()))
            .append_column("bucket", pa.array(bucket_of(t["key_doc"].to_numpy(), nb)))
        )

    nodes = mentions.map_batches(node_keys, batch_format="pyarrow").map_batches(
        _pad, batch_format="pyarrow"
    )
    ways = docs.map_batches(way_keys, batch_format="pyarrow").map_batches(
        _pad, batch_format="pyarrow"
    )
    rels = docs.map_batches(rel_keys, batch_format="pyarrow").map_batches(
        _pad, batch_format="pyarrow"
    )
    members = docs.map_batches(member_rows, batch_format="pyarrow")
    union = nodes.union(ways).union(rels).union(members)
    return bucket_groups(
        union, resolve_relations_group, batch_format="pyarrow"
    )


def _keyrow(doc: np.ndarray, idx: np.ndarray, kind: int) -> pa.Table:
    return pa.table(
        {
            "key_doc": pa.array(doc.astype(np.int64)),
            "key_idx": pa.array(np.asarray(idx, dtype=np.int64)),
            "kind": pa.array(np.full(len(doc), kind, dtype=np.int64)),
        }
    )


def resolve_ways(sf_dir: str):
    return bucket_groups(
        _tagged_union(sf_dir), resolve_group, batch_format="pyarrow"
    )


def resolve_way_errors(sf_dir: str):
    return bucket_groups(
        _tagged_union(sf_dir), resolve_errors_group, batch_format="pyarrow"
    )
