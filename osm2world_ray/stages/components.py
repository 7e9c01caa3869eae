"""Connected components over the overlap graph — the union-find
"stiff sets" analogue.

Reference: ``SimpleEleConstraintEnforcer`` (``SimpleEleConstraintEnforcer
.java:18-228``) unions connectors into equal-elevation StiffSets — an
in-memory union-find. Distributed shape: TWO-LEVEL CONTRACTION:

1. **local union-find per edge bucket** (one bounded-bucket shuffle):
   each partition unions its edges and emits (node, local_root).
2. **quotient graph to the driver**: a node seen in several buckets
   with different local roots proves those roots connected; the
   conflict edges between roots form the quotient graph, which is
   small when the partition key preserves locality. A driver-side
   union-find over the quotient (plus a broadcast remap) finishes.

Partitioning assumption (documented per the custom-operator rule):
the quotient holds one vertex per node whose edges span more than one
bucket. With the default hashed edge key that is O(nodes with >=2
edges) — fine up to ~10^8 quotient vertices on the driver; at 10^12
scale the edge bucket key must be SPATIALLY derived (the overlap
edges come from the cell self-join, so cell-keyed buckets contract
most components locally and the quotient stays boundary-sized), or
the contraction must recurse on the quotient instead of collecting
it.

An earlier iterative min-label-propagation version converged in
O(diameter) Ray pipelines; per-round fixed costs made it strictly
worse than this one-shuffle + tiny-driver-step design at every scale
we can measure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .overlaps import bucket_of


class UnionFind:
    """Path-halving union-by-smaller-root (min-label semantics)."""

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        while p.get(x, x) != x:
            p[x] = p.get(p[x], p[x])
            x = p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra


def local_roots(group: pd.DataFrame) -> pd.DataFrame:
    """One edge bucket -> (node, root) with root = min node reachable
    within this bucket's edges."""
    uf = UnionFind()
    for s, d in zip(
        group["src"].to_numpy(dtype=np.int64),
        group["dst"].to_numpy(dtype=np.int64),
    ):
        uf.union(int(s), int(d))
    nodes = np.unique(
        np.concatenate(
            [group["src"].to_numpy(dtype=np.int64),
             group["dst"].to_numpy(dtype=np.int64)]
        )
    )
    roots = np.array([uf.find(int(n)) for n in nodes], dtype=np.int64)
    return pd.DataFrame({"node": nodes, "root": roots})


def node_min_roots_and_conflicts(group: pd.DataFrame) -> pd.DataFrame:
    """Node-bucket pass: per node, its min local root (kind 0 rows) and
    one conflict edge per adjacent distinct BUCKET-DERIVED root pair
    (kind 1 rows) — the quotient-graph edges.

    Input includes self rows (node, node, is_self=1) so edge-less nodes
    label themselves, but self rows never generate conflicts: a node's
    bucket roots are already pairwise linked among themselves, and
    conflating the node id into the quotient would blow it up to
    O(edge-bearing nodes). With self rows excluded, quotient size =
    nodes whose edges span >1 bucket."""
    g = group.sort_values(["node", "root"], kind="mergesort")
    node = g["node"].to_numpy(dtype=np.int64)
    root = g["root"].to_numpy(dtype=np.int64)
    is_self = g["is_self"].to_numpy(dtype=np.int64)
    first = np.ones(len(node), dtype=bool)
    first[1:] = node[1:] != node[:-1]
    k0 = pd.DataFrame(
        {
            "node": node[first],
            "root": root[first],  # min root: sorted by (node, root)
            "ra": np.full(int(first.sum()), -1, dtype=np.int64),
            "rb": np.full(int(first.sum()), -1, dtype=np.int64),
            "kind": np.zeros(int(first.sum()), dtype=np.int64),
        }
    )
    same = node[1:] == node[:-1]
    differ = root[1:] != root[:-1]
    both_bucket = (is_self[1:] == 0) & (is_self[:-1] == 0)
    take = same & differ & both_bucket
    k1 = pd.DataFrame(
        {
            "node": node[1:][take],
            "root": np.full(int(take.sum()), -1, dtype=np.int64),
            "ra": root[:-1][take],
            "rb": root[1:][take],
            "kind": np.ones(int(take.sum()), dtype=np.int64),
        }
    )
    return pd.concat([k0, k1], ignore_index=True)


def connected_components(nodes_ds, edges_ds):
    """nodes: (node:int64); edges: (src, dst) one direction per pair.
    Returns a Dataset (node, label) with label = min node id in the
    component. Exactly TWO bucketed shuffles: edges -> local roots,
    then (node, root) -> per-node min + quotient conflicts; the tiny
    quotient union-find runs on the driver and the remap broadcasts
    back into a final map (no further shuffle — each node has exactly
    one row after the second pass)."""
    import ray

    def add_bucket(b: pa.Table) -> pa.Table:
        key = np.minimum(b["src"].to_numpy(), b["dst"].to_numpy())
        return b.append_column("bucket", pa.array(bucket_of(key)))

    edges = edges_ds.map_batches(add_bucket, batch_format="pyarrow")
    node_roots = edges.groupby("bucket").map_groups(
        local_roots, batch_format="pandas"
    )

    def root_key(b: pa.Table, self_flag: int) -> pa.Table:
        return b.append_column(
            "is_self", pa.array(np.full(len(b), self_flag, dtype=np.int64))
        ).append_column("bucket", pa.array(bucket_of(b["node"].to_numpy())))

    def bucket_rows(b: pa.Table) -> pa.Table:
        return root_key(b, 0)

    def self_rows(b: pa.Table) -> pa.Table:
        return root_key(pa.table({"node": b["node"], "root": b["node"]}), 1)

    all_roots = node_roots.map_batches(bucket_rows, batch_format="pyarrow").union(
        nodes_ds.map_batches(self_rows, batch_format="pyarrow")
    )
    mixed = all_roots.groupby("bucket").map_groups(
        node_min_roots_and_conflicts, batch_format="pandas"
    ).materialize()

    quotient = mixed.filter(expr="kind == 1").select_columns(["ra", "rb"]).to_pandas()
    uf = UnionFind()
    for a, b in zip(quotient["ra"], quotient["rb"]):
        uf.union(int(a), int(b))
    keys = np.array(sorted(uf.parent), dtype=np.int64)
    vals = np.array([uf.find(int(k)) for k in keys], dtype=np.int64)
    remap_ref = ray.put((keys, vals))

    def finalize(b: pa.Table) -> pa.Table:
        from ._util import resolve_ref

        keys_, vals_ = resolve_ref(remap_ref)
        root = b["root"].to_numpy()
        lab = root.copy()
        if len(keys_):
            pos = np.searchsorted(keys_, root)
            pos = np.clip(pos, 0, len(keys_) - 1)
            hit = keys_[pos] == root
            lab[hit] = vals_[pos[hit]]
        return pa.table({"node": b["node"], "label": pa.array(lab)})

    return (
        mixed.filter(expr="kind == 0")
        .select_columns(["node", "root"])
        .map_batches(finalize, batch_format="pyarrow")
    )
