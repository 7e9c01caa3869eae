"""Similarity search over embedding columns.

The engine-side analogue of the reference's nearest-feature lookups
(attachment join ``O2WConverterImpl.java:243-299``: candidate fetch ->
predicate filter -> min-distance selection), lifted to vector space
for training-data pipelines:

- ``BruteForceTopK``: exact cosine top-k — the broadcast small side is
  the QUERY matrix (``ray.put`` once, normalized float64), each batch
  does one matmul against it and keeps its local top-k (partial); a
  final single-partition combine merges partials. No shuffle: the
  candidate flow is map -> tree-combine, like every bounded-output
  aggregate here.
- ``LSHBucketTopK``: random-hyperplane LSH — the scale path. Planes
  are deterministic (seeded PCG64); a batch keeps only rows whose
  sign-bucket matches one of the query buckets (candidate filter),
  then scores those. Approximate by construction -> rows-only check.

Scores are computed in float64 and snapped to integer micro-units so
oracle comparisons never hash raw floats.
"""

from __future__ import annotations

from ._util import resolve_ref as _resolve

import numpy as np
import pyarrow as pa

DIM = 64
K = 5



def _embedding_matrix(batch: pa.Table) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy flatten)."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """embeddings batch -> per-batch top-k candidates per query.

    ``queries_ref``: broadcast (ray.put) pa.Table (vec_id, embedding).
    Emits (q_id, vec_id, cos) partials; combine with
    :func:`topk_finalize` after coalescing to one partition.
    """

    def __init__(self, queries_ref, *, k: int = K):
        q = _resolve(queries_ref)
        self.q_ids = q["vec_id"].to_numpy()
        self.Q = _normalize(_embedding_matrix(q))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy()
        emb = _normalize(_embedding_matrix(batch))
        scores = self.Q @ emb.T  # (nq, nb)
        out_q, out_v, out_c = [], [], []
        for qi, q_id in enumerate(self.q_ids):
            s = scores[qi]
            mask = vec_ids != q_id  # exclude self-match
            v = vec_ids[mask]
            sv = s[mask]
            # deterministic top-k: score desc, vec_id asc
            order = np.lexsort((v, -sv))[: self.k]
            out_q.append(np.full(len(order), q_id, dtype=np.int64))
            out_v.append(v[order])
            out_c.append(sv[order])
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos": pa.array(np.concatenate(out_c)),
            }
        )


def topk_finalize(batch: pa.Table, *, k: int = K) -> pa.Table:
    """Merge per-batch candidate partials -> global top-k with rank."""
    q = batch["q_id"].to_numpy()
    v = batch["vec_id"].to_numpy()
    c = batch["cos"].to_numpy()
    order = np.lexsort((v, -c, q))
    q, v, c = q[order], v[order], c[order]
    # rank within q: position since start of q's run
    starts = np.concatenate(([0], np.nonzero(q[1:] != q[:-1])[0] + 1))
    idx = np.arange(len(q), dtype=np.int64)
    run_start = np.repeat(starts, np.diff(np.concatenate((starts, [len(q)]))))
    rank = idx - run_start
    keep = rank < k
    return pa.table(
        {
            "q_id": pa.array(q[keep]),
            "rank": pa.array(rank[keep] + 1),
            "vec_id": pa.array(v[keep]),
            "cos_udeg": pa.array(np.floor(c[keep] * 1e6 + 0.5).astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# LSH-bucketed approximate variant
# ---------------------------------------------------------------------------

#: 2^N_PLANES buckets; size so expected bucket occupancy stays well
#: above k at the corpus sizes in play (tune up as the corpus grows)
N_PLANES = 6
_SEED = 1234


def _planes(dim: int = DIM, n: int = N_PLANES) -> np.ndarray:
    return np.random.default_rng(_SEED).standard_normal((n, dim))


def _buckets(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits.astype(np.int64) << np.arange(planes.shape[0], dtype=np.int64)).sum(
        axis=1
    )



def _emb_matrix(group) -> np.ndarray:
    """(n, d) float64 embedding matrix from either an Arrow list column
    (zero-copy flatten + reshape) or a pandas object column."""
    if isinstance(group, pa.Table):
        col = group["emb"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(col), -1)
    return np.stack(group["emb"].to_numpy()).astype(np.float64)


def make_blocked_cosine_pairs(n_blocks: int, threshold: float):
    """Per-bucket kernel for the EXACT cosine near-dup self-join over
    triangle-block-salted rows (``dedup.salted_block_rows`` on vec_id):
    each (blk_i, blk_j) run does one i-block x j-block matmul — the
    full-matrix broadcast of the naive exact join replaced by bounded
    block tasks (work is still O(n^2/ n_blocks^2) per task by
    construction; exactness is the point, the LSH variant is the
    sub-quadratic path)."""

    def kernel(group) -> pa.Table:
        from .overlaps import col_np

        empty = pa.table(
            {
                "vec_a": pa.array([], type=pa.int64()),
                "vec_b": pa.array([], type=pa.int64()),
                "cos_udeg": pa.array([], type=pa.int64()),
            }
        )
        if len(group) < 2:
            return empty
        vec = col_np(group, "vec_id", np.int64)
        bi = col_np(group, "blk_i", np.int64)
        bj = col_np(group, "blk_j", np.int64)
        emb = _normalize(_emb_matrix(group))
        order = np.lexsort((vec, bj, bi))
        vec, bi, bj, emb = vec[order], bi[order], bj[order], emb[order]
        change = np.ones(len(vec), dtype=bool)
        change[1:] = (bi[1:] != bi[:-1]) | (bj[1:] != bj[:-1])
        starts = np.nonzero(change)[0]
        ends = np.concatenate((starts[1:], [len(vec)]))
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            v = vec[s:e]
            m = emb[s:e]
            if bi[s] == bj[s]:
                sims = m @ m.T
                ii, jj = np.nonzero(
                    (sims >= threshold) & (v[:, None] < v[None, :])
                )
                a, b, c = v[ii], v[jj], sims[ii, jj]
            else:
                side_i = (v % n_blocks) == bi[s]
                mi, mj = m[side_i], m[~side_i]
                vi, vj = v[side_i], v[~side_i]
                sims = mi @ mj.T
                ii, jj = np.nonzero(sims >= threshold)
                a, b, c = vi[ii], vj[jj], sims[ii, jj]
                swap = a > b
                a, b = np.where(swap, b, a), np.where(swap, a, b)
            out_a.append(a)
            out_b.append(b)
            out_c.append(c)
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        c = np.concatenate(out_c)
        return pa.table(
            {
                "vec_a": pa.array(a),
                "vec_b": pa.array(b),
                "cos_udeg": pa.array(np.floor(c * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return kernel


def lsh_bucket_cosine_pairs(group, *, threshold: float) -> pa.Table:
    """Per-bucket kernel for the LSH-bucketed near-dup join: rows carry
    (vec_id, emb, lsh_bucket); pairs are scored only within an LSH
    bucket — the sub-quadratic scale path (each vector lives in exactly
    one bucket, so no cross-bucket dedup is needed)."""
    from .overlaps import col_np

    empty = pa.table(
        {
            "vec_a": pa.array([], type=pa.int64()),
            "vec_b": pa.array([], type=pa.int64()),
            "cos_udeg": pa.array([], type=pa.int64()),
        }
    )
    if len(group) < 2:
        return empty
    vec = col_np(group, "vec_id", np.int64)
    lb = col_np(group, "lsh_bucket", np.int64)
    emb = _normalize(_emb_matrix(group))
    order = np.lexsort((vec, lb))
    vec, lb, emb = vec[order], lb[order], emb[order]
    change = np.ones(len(vec), dtype=bool)
    change[1:] = lb[1:] != lb[:-1]
    starts = np.nonzero(change)[0]
    ends = np.concatenate((starts[1:], [len(vec)]))
    out_a, out_b, out_c = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        v = vec[s:e]
        m = emb[s:e]
        sims = m @ m.T
        ii, jj = np.nonzero((sims >= threshold) & (v[:, None] < v[None, :]))
        out_a.append(v[ii])
        out_b.append(v[jj])
        out_c.append(sims[ii, jj])
    if not out_a:
        return empty
    return pa.table(
        {
            "vec_a": pa.array(np.concatenate(out_a)),
            "vec_b": pa.array(np.concatenate(out_b)),
            "cos_udeg": pa.array(
                np.floor(np.concatenate(out_c) * 1e6 + 0.5).astype(np.int64)
            ),
        }
    )


class IVFTopK:
    """IVF-style approximate top-k: candidates pruned to the
    ``nprobe`` coarse cells nearest each query.

    The coarse quantizer here is the per-label mean embedding
    (centroids computed DISTRIBUTED by the caller: per-batch partial
    sums -> tree combine -> tiny centroid table, then broadcast). Each
    data batch assigns its rows to their nearest centroid and scores
    only rows whose cell is in a query's probe list — candidate
    pruning as a map, like the LSH variant; at persisted-index scale
    the cell id becomes the partition key of a bucketed index layout.
    """

    def __init__(self, queries_ref, centroids_ref, *, k: int = K,
                 nprobe: int = 4):
        q = _resolve(queries_ref)
        self.q_ids = q["vec_id"].to_numpy()
        self.Q = _normalize(_embedding_matrix(q))
        cents = _resolve(centroids_ref)  # (n_cells, d) float64
        self.cents = _normalize(cents)
        # probe list per query: nprobe nearest centroids by cosine
        sims = self.Q @ self.cents.T
        self.probes = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy()
        emb = _normalize(_embedding_matrix(batch))
        cell = np.argmax(emb @ self.cents.T, axis=1)
        out_q, out_v, out_c = [], [], []
        for qi, q_id in enumerate(self.q_ids):
            mask = np.isin(cell, self.probes[qi]) & (vec_ids != q_id)
            if not mask.any():
                continue
            v = vec_ids[mask]
            sv = emb[mask] @ self.Q[qi]
            order = np.lexsort((v, -sv))[: self.k]
            out_q.append(np.full(len(order), q_id, dtype=np.int64))
            out_v.append(v[order])
            out_c.append(sv[order])
        if not out_q:
            return pa.table(
                {
                    "q_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos": pa.array(np.concatenate(out_c)),
            }
        )


def label_centroids(ds) -> np.ndarray:
    """Distributed per-label mean embedding: per-batch partial
    (label -> sum, count), tree combine of the tiny partials, final
    division — the standard combiner path for a bounded key space."""

    def partial(b: pa.Table) -> pa.Table:
        emb = _embedding_matrix(b)
        lab = b["label"].to_numpy().astype(np.int64)
        u, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(u), emb.shape[1]))
        np.add.at(sums, inv, emb)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(u),
                "n": pa.array(counts),
                "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy().astype(np.int64)
        n = b["n"].to_numpy().astype(np.int64)
        sums = np.stack(
            [np.asarray(x, dtype=np.float64) for x in b["sum"].to_pylist()]
        )
        u, inv = np.unique(lab, return_inverse=True)
        out_s = np.zeros((len(u), sums.shape[1]))
        np.add.at(out_s, inv, sums)
        out_n = np.zeros(len(u), dtype=np.int64)
        np.add.at(out_n, inv, n)
        return pa.table(
            {
                "label": pa.array(u),
                "n": pa.array(out_n),
                "sum": pa.array(list(out_s), type=pa.list_(pa.float64())),
            }
        )

    final = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    final = final.sort_values("label")
    sums = np.stack([np.asarray(x) for x in final["sum"]])
    return sums / final["n"].to_numpy()[:, None]


class LSHBucketTopK:
    """Approximate cosine top-k: only same-LSH-bucket candidates scored.

    At cluster scale the bucket id doubles as the hash-shuffle key for
    building a persisted bucketed index; here the query-bucket set is
    broadcast and each batch filters itself — a candidate *pruning*
    map, no shuffle.
    """

    def __init__(self, queries_ref, *, k: int = K):
        q = _resolve(queries_ref)
        self.q_ids = q["vec_id"].to_numpy()
        self.Q = _normalize(_embedding_matrix(q))
        self.planes = _planes()
        self.q_buckets = _buckets(self.Q, self.planes)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy()
        emb = _normalize(_embedding_matrix(batch))
        b = _buckets(emb, self.planes)
        out_q, out_v, out_c = [], [], []
        for qi, q_id in enumerate(self.q_ids):
            mask = (b == self.q_buckets[qi]) & (vec_ids != q_id)
            if not mask.any():
                continue
            v = vec_ids[mask]
            sv = emb[mask] @ self.Q[qi]
            order = np.lexsort((v, -sv))[: self.k]
            out_q.append(np.full(len(order), q_id, dtype=np.int64))
            out_v.append(v[order])
            out_c.append(sv[order])
        if not out_q:
            return pa.table(
                {
                    "q_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos": pa.array(np.concatenate(out_c)),
            }
        )
