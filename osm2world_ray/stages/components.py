"""Connected components over the overlap graph — the union-find
"stiff sets" analogue.

Reference: ``SimpleEleConstraintEnforcer`` (``SimpleEleConstraintEnforcer
.java:18-228``) unions connectors into equal-elevation StiffSets — an
in-memory union-find. Distributed shape: TWO-LEVEL CONTRACTION with a
RECURSIVE fallback:

1. **local components per edge bucket** (one bounded-bucket shuffle):
   each partition contracts its edges with a VECTORIZED
   hook-and-compress union-find (Shiloach–Vishkin style: min-label
   hooking via ``np.minimum.at`` + pointer-jumping compression,
   O(E log V) numpy ops, no per-edge Python) and emits (node,
   local_root).
2. **quotient graph**: a node seen in several buckets with different
   local roots proves those roots connected; the conflict edges
   between roots form the quotient. When the edge bucket key is
   SPATIALLY derived (pass ``bucket`` on the edges — the overlap
   self-join's cell already is one), most components contract inside
   one bucket and the quotient stays boundary-sized.
3. **finish**: a small quotient is solved on the driver and broadcast
   back; a quotient above ``max_driver_quotient`` RECURSES — the
   conflicts become the next level's edge set and the final labels
   come back via one more bounded-bucket join. Depth grows with
   log(contraction ratio), not data size, so 10^12-edge graphs never
   materialize anything driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .overlaps import bucket_groups, bucket_of, n_shuffle_buckets

#: quotients up to this many edges finish on the driver; larger ones
#: recurse (sandbox-scale threshold; production sets this to what one
#: driver comfortably holds, e.g. 10^7)
MAX_DRIVER_QUOTIENT = 1_000_000


def np_union_find(src: np.ndarray, dst: np.ndarray):
    """Vectorized min-label union-find over one bucket's edges.

    Returns (nodes, roots): the unique nodes and, per node, the
    smallest node id reachable in this edge set. Hook-and-compress:
    every round hooks each edge's larger current label to the smaller
    (conflicts resolved by ``np.minimum.at``), then compresses by
    pointer jumping; rounds are O(log V).
    """
    both = np.concatenate([src, dst])
    nodes, inv = np.unique(both, return_inverse=True)
    a = inv[: len(src)]
    b = inv[len(src):]
    parent = np.arange(len(nodes), dtype=np.int64)
    while True:
        ra, rb = parent[a], parent[b]
        ne = ra != rb
        if not ne.any():
            break
        lo = np.minimum(ra[ne], rb[ne])
        hi = np.maximum(ra[ne], rb[ne])
        np.minimum.at(parent, hi, lo)
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
    return nodes, nodes[parent]


def local_roots(group) -> pa.Table:
    """One edge bucket -> (node, root) with root = min node reachable
    within this bucket's edges (vectorized union-find). Arrow in/out
    (accepts a pandas frame for the pytest reference path)."""
    from .overlaps import col_np

    nodes, roots = np_union_find(
        col_np(group, "src", np.int64),
        col_np(group, "dst", np.int64),
    )
    return pa.table({"node": pa.array(nodes), "root": pa.array(roots)})


def node_min_roots_and_conflicts(group) -> pa.Table:
    """Node-bucket pass: per node, its min local root (kind 0 rows) and
    one conflict edge per adjacent distinct BUCKET-DERIVED root pair
    (kind 1 rows) — the quotient-graph edges.

    Input includes self rows (node, node, is_self=1) so edge-less nodes
    label themselves, but self rows never generate conflicts: a node's
    bucket roots are already pairwise linked among themselves, and
    conflating the node id into the quotient would blow it up to
    O(edge-bearing nodes). With self rows excluded, quotient size =
    nodes whose edges span >1 bucket."""
    from .overlaps import col_np

    node = col_np(group, "node", np.int64)
    root = col_np(group, "root", np.int64)
    is_self = col_np(group, "is_self", np.int64)
    # sort (node, is_self, root): bucket rows (is_self=0) contiguous
    # per node BEFORE the self row, so adjacent-pair conflict scan is
    # ROW-ORDER-INDEPENDENT (a self row with root == a bucket root
    # sorted between two bucket rows would silently swallow their
    # conflict edge — bit with the raw exchange's different concat
    # order; the min-root rule is unaffected: bucket roots <= node id
    # = the self root, so the first row per node is still the min)
    order = np.lexsort((root, is_self, node))
    node, root, is_self = node[order], root[order], is_self[order]
    first = np.ones(len(node), dtype=bool)
    first[1:] = node[1:] != node[:-1]
    same = node[1:] == node[:-1]
    differ = root[1:] != root[:-1]
    both_bucket = (is_self[1:] == 0) & (is_self[:-1] == 0)
    take = same & differ & both_bucket
    n0, n1 = int(first.sum()), int(take.sum())
    return pa.table(
        {
            "node": pa.array(np.concatenate((node[first], node[1:][take]))),
            # min root: sorted by (node, root)
            "root": pa.array(np.concatenate(
                (root[first], np.full(n1, -1, dtype=np.int64)))),
            "ra": pa.array(np.concatenate(
                (np.full(n0, -1, dtype=np.int64), root[:-1][take]))),
            "rb": pa.array(np.concatenate(
                (np.full(n0, -1, dtype=np.int64), root[1:][take]))),
            "kind": pa.array(np.concatenate(
                (np.zeros(n0, dtype=np.int64), np.ones(n1, dtype=np.int64)))),
        }
    )


def _remap_join(group) -> pa.Table:
    """Bucket co-group of (node, root, kind=0) rows and (root -> label,
    kind=2) mapping rows; applies the mapping (identity default)."""
    from .overlaps import col_np

    kind = col_np(group, "kind", np.int64)
    node = col_np(group, "node", np.int64)
    root = col_np(group, "root", np.int64)
    label = col_np(group, "label", np.int64)
    rows = np.nonzero(kind == 0)[0]
    if len(rows) == 0:
        return pa.table(
            {
                "node": pa.array([], type=pa.int64()),
                "label": pa.array([], type=pa.int64()),
            }
        )
    maps = np.nonzero(kind == 2)[0]
    keys, vals = root[maps], label[maps]
    order = np.argsort(keys)
    keys, vals = keys[order], vals[order]
    want = root[rows]
    lab = want.copy()
    if len(keys):
        pos = np.clip(np.searchsorted(keys, want), 0, len(keys) - 1)
        hit = keys[pos] == want
        lab[hit] = vals[pos[hit]]
    return pa.table({"node": pa.array(node[rows]), "label": pa.array(lab)})


def connected_components(nodes_ds, edges_ds, *, edges_have_bucket: bool = False,
                         depth: int = 0,
                         max_driver_quotient: int = MAX_DRIVER_QUOTIENT):
    """nodes: (node:int64) or None; edges: (src, dst[, bucket]) one
    direction per pair. Returns a Dataset (node, label), label = min
    node id in the component.

    With ``edges_have_bucket`` the edges carry a SPATIALLY-derived
    ``bucket`` key (e.g. the overlap cell that produced the edge) —
    locality keeps the quotient boundary-sized; the fallback is a hash
    of min(src, dst). ``nodes_ds=None`` skips the self rows (used by
    the recursion, where every node has an edge).
    """
    import ray

    nb = n_shuffle_buckets()  # driver-resolved, captured by every closure

    if not edges_have_bucket:
        def add_bucket(b: pa.Table) -> pa.Table:
            key = np.minimum(b["src"].to_numpy(), b["dst"].to_numpy())
            return b.append_column("bucket", pa.array(bucket_of(key, nb)))

        edges_ds = edges_ds.map_batches(add_bucket, batch_format="pyarrow")
    else:
        def rebucket(b: pa.Table) -> pa.Table:
            i = b.schema.get_field_index("bucket")
            return b.set_column(
                i, "bucket", pa.array(bucket_of(b["bucket"].to_numpy(), nb))
            )

        edges_ds = edges_ds.map_batches(rebucket, batch_format="pyarrow")

    node_roots = bucket_groups(
        edges_ds, local_roots, batch_format="pyarrow"
    )

    def root_key(b: pa.Table, self_flag: int) -> pa.Table:
        return b.append_column(
            "is_self", pa.array(np.full(len(b), self_flag, dtype=np.int64))
        ).append_column("bucket", pa.array(bucket_of(b["node"].to_numpy(), nb)))

    all_roots = node_roots.map_batches(
        lambda b: root_key(b, 0), batch_format="pyarrow"
    )
    if nodes_ds is not None:
        def self_rows(b: pa.Table) -> pa.Table:
            return root_key(pa.table({"node": b["node"], "root": b["node"]}), 1)

        all_roots = all_roots.union(
            nodes_ds.map_batches(self_rows, batch_format="pyarrow")
        )
    mixed = bucket_groups(
        all_roots, node_min_roots_and_conflicts, batch_format="pyarrow"
    ).materialize()

    quotient_ds = mixed.filter(expr="kind == 1").select_columns(["ra", "rb"])
    n_quotient = quotient_ds.count()
    kind0 = mixed.filter(expr="kind == 0").select_columns(["node", "root"])

    if n_quotient == 0:
        return kind0.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["root"]}),
            batch_format="pyarrow",
        )

    if n_quotient <= max_driver_quotient or depth >= 3:
        # small quotient: solve on the driver, broadcast the remap
        q = quotient_ds.to_pandas()
        keys, vals = np_union_find(
            q["ra"].to_numpy(dtype=np.int64), q["rb"].to_numpy(dtype=np.int64)
        )
        remap_ref = ray.put((keys, vals))

        def finalize(b: pa.Table) -> pa.Table:
            from ._util import resolve_ref

            keys_, vals_ = resolve_ref(remap_ref)
            root = b["root"].to_numpy()
            lab = root.copy()
            if len(keys_):
                pos = np.clip(np.searchsorted(keys_, root), 0, len(keys_) - 1)
                hit = keys_[pos] == root
                lab[hit] = vals_[pos[hit]]
            return pa.table({"node": b["node"], "label": pa.array(lab)})

        return kind0.map_batches(finalize, batch_format="pyarrow")

    # large quotient: RECURSIVE CONTRACTION — conflicts are the next
    # level's edges; its labels come back via one bounded-bucket join
    def as_edges(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["ra"], "dst": b["rb"]})

    rec = connected_components(
        None, quotient_ds.map_batches(as_edges, batch_format="pyarrow"),
        depth=depth + 1, max_driver_quotient=max_driver_quotient,
    )

    def map_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(np.zeros(len(b), dtype=np.int64)),
                "root": b["node"],
                "label": b["label"],
                "kind": pa.array(np.full(len(b), 2, dtype=np.int64)),
                "bucket": pa.array(bucket_of(b["node"].to_numpy(), nb)),
            }
        )

    def row_side(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": b["node"],
                "root": b["root"],
                "label": pa.array(np.zeros(len(b), dtype=np.int64)),
                "kind": pa.array(np.zeros(len(b), dtype=np.int64)),
                "bucket": pa.array(bucket_of(b["root"].to_numpy(), nb)),
            }
        )

    joined = kind0.map_batches(row_side, batch_format="pyarrow").union(
        rec.map_batches(map_rows, batch_format="pyarrow")
    )
    return bucket_groups(
        joined, _remap_join, batch_format="pyarrow"
    )
