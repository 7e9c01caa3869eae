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
from .overlaps import bucket_of

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


def resolve_group(group: pd.DataFrame) -> pd.DataFrame:
    resolved, _bad = _merge(group)
    return pd.DataFrame(
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
    )


def resolve_errors_group(group: pd.DataFrame) -> pd.DataFrame:
    _resolved, bad = _merge(group)
    return pd.DataFrame(
        {
            "url": np.array(bad, dtype=object),
            "error": np.array(
                [f"missing node ref {DANGLING_REF}"] * len(bad), dtype=object
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


def resolve_ways(sf_dir: str):
    return _tagged_union(sf_dir).groupby("bucket").map_groups(
        resolve_group, batch_format="pandas"
    )


def resolve_way_errors(sf_dir: str):
    return _tagged_union(sf_dir).groupby("bucket").map_groups(
        resolve_errors_group, batch_format="pandas"
    )
