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


def refs_from_mentions(batch: pa.Table) -> pa.Table:
    """Mention rows -> way-ref rows (url, ref): one ref per mention,
    plus the dangling ref for doc_id % 23 == 0 pages."""
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
            pa.array(bucket_of(np.concatenate([doc, doc[extra_idx]]))),
        )
    )


def _merge(group: pd.DataFrame):
    """Bucket co-group: kind 0 = node rows (url, mention_idx, lat,
    lon), kind 1 = ref rows (url, ref). Returns (resolved, bad_urls)."""
    nodes = group[group["kind"] == 0]
    refs = group[group["kind"] == 1]
    m = refs[["url", "ref"]].merge(
        nodes[["url", "mention_idx", "lat", "lon"]],
        left_on=["url", "ref"],
        right_on=["url", "mention_idx"],
        how="left",
    )
    missing = m["mention_idx"].isna()
    bad_urls = set(m.loc[missing, "url"])
    resolved = m[~m["url"].isin(bad_urls)]
    return resolved, sorted(bad_urls)


def resolve_group(group: pd.DataFrame):
    from .overlaps import _df_to_arrow
    resolved, _bad = _merge(group)
    return _df_to_arrow(pd.DataFrame(
        {
            "url": resolved["url"].to_numpy(),
            "ref_idx": resolved["ref"].to_numpy(dtype=np.int64),
            "lat_udeg": np.floor(
                resolved["lat"].to_numpy(dtype=np.float64) * 1e6 + 0.5
            ).astype(np.int64),
            "lon_udeg": np.floor(
                resolved["lon"].to_numpy(dtype=np.float64) * 1e6 + 0.5
            ).astype(np.int64),
        }
    ))


def resolve_errors_group(group: pd.DataFrame):
    _resolved, bad = _merge(group)
    return pa.table(
        {
            "url": pa.array(list(bad), type=pa.string()),
            "error": pa.array(
                [f"missing node ref {DANGLING_REF}"] * len(bad), type=pa.string()
            ),
        }
    )


def _tagged_union(sf_dir: str):
    from ..pipelines import datasets

    mentions = datasets.mentions_ds(sf_dir)

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
                "bucket": pa.array(bucket_of(doc)),
            }
        )

    def ref_rows(b: pa.Table) -> pa.Table:
        r = refs_from_mentions(b)
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


def resolve_relations_group(group: pd.DataFrame) -> pd.DataFrame:
    """Bucket co-group: kind 0 = node keys (doc, midx), kind 1 = way
    keys (doc), kind 2 = relation keys (doc), kind 3 = member rows
    keyed by ref_doc. Emits every member with its resolved flag
    (incomplete members are logged-but-kept, the reference keeps a
    relation while any member resolves)."""
    nodes = group[group["kind"] == 0]
    ways = set(group.loc[group["kind"] == 1, "key_doc"].astype(np.int64))
    rels = set(group.loc[group["kind"] == 2, "key_doc"].astype(np.int64))
    node_keys = set(
        zip(
            nodes["key_doc"].astype(np.int64),
            nodes["key_idx"].astype(np.int64),
        )
    )
    members = group[group["kind"] == 3]
    if len(members) == 0:
        return pa.table(
            {
                "url": pa.array([], type=pa.string()),
                "member_idx": pa.array([], type=pa.int64()),
                "member_type": pa.array([], type=pa.string()),
                "role": pa.array([], type=pa.string()),
                "resolved": pa.array([], type=pa.int64()),
            }
        )
    mtype = members["member_type"].to_numpy()
    ref_doc = members["ref_doc"].to_numpy(dtype=np.int64)
    ref_idx = members["ref_idx"].to_numpy(dtype=np.int64)
    node_arr = np.array(
        sorted(d * 16 + i for d, i in node_keys), dtype=np.int64
    )
    way_arr = np.array(sorted(ways), dtype=np.int64)
    rel_arr = np.array(sorted(rels), dtype=np.int64)
    res = np.where(
        mtype == "node",
        np.isin(ref_doc * 16 + ref_idx, node_arr),
        np.where(
            mtype == "way",
            np.isin(ref_doc, way_arr),
            np.isin(ref_doc, rel_arr),
        ),
    ).astype(np.int64)
    from .overlaps import _df_to_arrow
    return _df_to_arrow(pd.DataFrame(
        {
            "url": synth.URL_PREFIX
            + members["rel_doc"].astype(np.int64).astype(str),
            "member_idx": members["member_idx"].astype(np.int64).to_numpy(),
            "member_type": members["member_type"].to_numpy(),
            "role": members["role"].to_numpy(),
            "resolved": np.array(res, dtype=np.int64),
        }
    ))


def resolve_relations(sf_dir: str):
    """3-way typed member resolution as one bucket co-group keyed on
    the referenced doc."""
    from ..pipelines import datasets

    mentions = datasets.mentions_ds(sf_dir)
    docs = datasets.documents_ds(sf_dir, columns=["doc_id"])

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
                "bucket": pa.array(bucket_of(m["ref_doc"].to_numpy())),
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
            .append_column("bucket", pa.array(bucket_of(t["key_doc"].to_numpy())))
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
        union, resolve_relations_group, batch_format="pandas"
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
        _tagged_union(sf_dir), resolve_group, batch_format="pandas"
    )


def resolve_way_errors(sf_dir: str):
    return bucket_groups(
        _tagged_union(sf_dir), resolve_errors_group, batch_format="pandas"
    )
