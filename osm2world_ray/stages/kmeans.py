"""Distributed k-means (Lloyd) over the embedding column.

The iterative-training op of the large-scale pipeline family: each
iteration is ONE streaming pass — a ``map_batches`` stage computes
per-batch partial (sum_vec, count) statistics against the broadcast
centroids (vectorized (B,K) distance matrix per batch), the partials
(K rows per batch) tree-reduce to the driver, and the driver updates
the K x D centroid matrix for the next pass. Nothing but the K x D
matrix and K-row partials ever leaves the workers, so the shape holds
at any corpus size; the embedding table is materialized once and
re-read per iteration (the standard Lloyd access pattern).

Determinism contract (the DuckDB oracle mirrors it exactly):
- init: the embeddings of the K smallest vec_ids, in vec_id order;
- assignment: argmin of squared L2, ties to the smallest cluster idx;
- update: arithmetic mean of assigned vectors; empty clusters keep
  their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _embedding_matrix

K_DEFAULT = 4
ITERS_DEFAULT = 3


def _assign(emb: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(B,D) x (K,D) -> per-row nearest centroid (ties: smallest k)."""
    d2 = ((emb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def _batch_embeddings(batch: pa.Table) -> np.ndarray:
    # zero-copy Arrow flatten (the per-iteration hot path; the
    # to_pylist() form cost a Python object per float)
    return _embedding_matrix(batch)


def kmeans_fit(embeddings_ds, *, k: int = K_DEFAULT,
               iters: int = ITERS_DEFAULT):
    """-> (assignments Dataset (vec_id, cluster), centroids (K,D))."""
    import ray

    ds = embeddings_ds.materialize()

    # deterministic init: K smallest vec_ids — per-batch partial top-K
    # + a K*n_blocks driver reduce (no global sort shuffle)
    def topk_partial(batch: pa.Table, *, _k=k) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        take = np.argsort(ids, kind="stable")[:_k]
        return batch.select(["vec_id", "embedding"]).take(pa.array(take))

    parts = pa.concat_tables(
        ray.get(ds.map_batches(topk_partial, batch_format="pyarrow").to_arrow_refs())
    )
    order = np.argsort(parts["vec_id"].to_numpy(), kind="stable")[:k]
    cents = np.asarray(
        parts.take(pa.array(order))["embedding"].to_pylist(), dtype=np.float64
    )

    # `iters` assignment passes total: iters-1 update cycles + the
    # final labelled assignment below
    for _ in range(iters - 1):
        ref = ray.put(cents)

        def partial(batch: pa.Table, *, _ref=ref, _k=k) -> pa.Table:
            c = ray.get(_ref)
            emb = _batch_embeddings(batch)
            a = _assign(emb, c)
            sums = np.zeros((_k, emb.shape[1]))
            np.add.at(sums, a, emb)
            counts = np.bincount(a, minlength=_k).astype(np.int64)
            return pa.table(
                {
                    "k": pa.array(np.arange(_k, dtype=np.int64)),
                    "count": pa.array(counts),
                    "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
                }
            )

        refs = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        parts = pa.concat_tables(ray.get(refs))
        kk = parts["k"].to_numpy()
        cnt = parts["count"].to_numpy()
        sums = np.asarray(parts["sum"].to_pylist(), dtype=np.float64)
        tot = np.zeros_like(cents)
        n = np.zeros(k, dtype=np.int64)
        np.add.at(tot, kk, sums)
        np.add.at(n, kk, cnt)
        nonempty = n > 0
        cents[nonempty] = tot[nonempty] / n[nonempty, None]
        # snap means to a 2^-20 grid: block order is not deterministic,
        # so raw float sums differ in the last bits run-to-run; the
        # snap absorbs that noise and the oracle applies the same snap
        cents = np.floor(cents * (1 << 20) + 0.5) / (1 << 20)

    ref = ray.put(cents)

    def final_assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        a = _assign(_batch_embeddings(batch), c)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return ds.map_batches(final_assign, batch_format="pyarrow"), cents
