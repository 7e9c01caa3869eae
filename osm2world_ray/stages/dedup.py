"""Deduplication operators for training-data pipelines.

Beyond the reference's exact-dedup precedents (probe-result HashSet
dedup ``SpatialIndex.java:30-43``, area/way anti-join
``OSMToMapDataConverter.java:292-303``), this module adds the
large-scale text-dedup family a 100 TB web corpus needs:

- exact: content-hash -> hash-partitioned groupby -> first-per-group
- MinHash + LSH banding: shingle -> minhash sig -> band explode ->
  groupby(bucket of (band, band_hash)) -> candidate pairs with
  FIRST-MATCHING-BAND ownership (the min-corner ownership dedup of
  ``stages/overlaps.py`` lifted to signature space: a pair is emitted
  only by the first band on which the two signatures agree — no
  second shuffle, no repartition(1)) -> exact-Jaccard verification via
  BUCKETED SHUFFLE-JOINS of candidate pairs back to the per-doc
  shingle-hash sets (no corpus broadcast; two bounded-bucket joins,
  one per pair side).
- SimHash: 64-bit token-weight fingerprint + banded Hamming-distance
  join (pigeonhole: distance <= k-1 guarantees one of k bands equal).
- charset-Jaccard similarity join with TRIANGLE-BLOCK SALTING of hot
  groups: rows are reduced to 256-bit char bitmaps BEFORE the fan-out,
  each group's pair space is tiled into (i, j) block pairs so no
  single task ever holds a skewed group's full O(n^2).

All hashing uses the 31-bit polynomial family
(:mod:`osm2world_ray.functions.polyhash`) — vectorized over byte
matrices in numpy and bit-identically expressible in DuckDB SQL, so
every query here has a real oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import polyhash as ph

N_PERM = ph.N_PERM
N_BANDS = ph.N_BANDS
ROWS_PER_BAND = ph.ROWS_PER_BAND


def md5_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append the md5 hex digest of a string column (exact-dedup key;
    matches DuckDB's md5() for the oracle)."""
    texts = batch[col].to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("md5", pa.array(digests, type=pa.string()))


# ---------------------------------------------------------------------------
# scalar reference helpers (pytest oracles; the stages are vectorized)
# ---------------------------------------------------------------------------

def _scalar_hash(s: str) -> int:
    h = 0
    for byte in s.encode("utf-8"):
        h = (h * ph.B + byte) % ph.P
    return h


def token_ngrams(text: str, n: int = 3) -> set[str]:
    """Shingle strings (single-space split, string_split(' ')
    semantics; < n tokens -> the whole token list joined)."""
    toks = text.split(" ")
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def shingle_hash_set(text: str, n: int = 3) -> set[int]:
    return {_scalar_hash(g) for g in token_ngrams(text, n)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """Reference (row-at-a-time) MinHash signature."""
    hs = np.array(sorted(shingle_hash_set(text, n)), dtype=np.int64)
    return ((ph.PERM_A[None, :] * hs[:, None] + ph.PERM_B[None, :]) % ph.P).min(
        axis=0
    )


def simhash64(text: str) -> int:
    """Reference 64-bit SimHash (unsigned int)."""
    toks = text.split(" ")
    hs = np.array([_scalar_hash(t) for t in toks], dtype=np.int64)
    G = (ph.SIM_C[None, :] * hs[:, None] + ph.SIM_D[None, :]) % ph.P
    bits = (G >> np.int64(30)) & np.int64(1)
    maj = bits.sum(axis=0) * 2 > len(toks)
    return int(
        (maj.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            dtype=np.uint64
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHashStage:
    """documents batch -> LSH band rows
    (doc_id, band, band_hash, bhs: list<int64>[8]).

    Fully vectorized: tokenization via pyarrow split, polynomial token
    hashes over a byte matrix, shingle hashes by hash composition,
    per-doc distinct + signature mins via reduceat. Each band row
    carries the doc's full 8-band hash vector ``bhs`` so the candidate
    stage can apply first-matching-band ownership without any lookup.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        n = len(batch)
        doc_off, tok_h, tok_lens = ph.split_tokens(batch["text"])
        sh_doc, sh_h = ph.shingle_hashes(doc_off, tok_h, tok_lens)
        du, hu = ph.distinct_per_doc(sh_doc, sh_h)
        sigs = ph.minhash_sigs(du, hu, n)
        bh = ph.band_hashes(sigs)  # (n, 8)
        bhs_vals = pa.array(np.repeat(bh, N_BANDS, axis=0).reshape(-1))
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, N_BANDS)),
                "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int64), n)),
                "band_hash": pa.array(bh.reshape(-1)),
                "bhs": pa.FixedSizeListArray.from_arrays(bhs_vals, N_BANDS),
            }
        )


_EMPTY_PAIRS = pa.table(
    {
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64()),
    }
)


def lsh_candidate_pairs(group) -> pa.Table:
    """Bucket of LSH band rows -> ordered candidate pairs, deduped by
    FIRST-MATCHING-BAND ownership: the pair (a, b) is emitted only from
    the band with the smallest index on which bhs_a == bhs_b. Each pair
    therefore leaves exactly one bucket — the cross-band dedup needs no
    extra shuffle (ownership-point precedent:
    ``stages/overlaps.py`` min-corner rule; ``SpatialIndex.java:30-43``).

    Arrow-in/Arrow-out (schema-stable empties); accepts a pandas frame
    too for the pytest reference path.
    """
    from .overlaps import _within_group_pairs, col_np

    empty = _EMPTY_PAIRS
    if len(group) < 2:
        return empty
    band = col_np(group, "band", np.int64)
    bh = col_np(group, "band_hash", np.int64)
    doc = col_np(group, "doc_id", np.int64)
    if isinstance(group, pa.Table):
        bhs = (
            group["bhs"].combine_chunks().flatten()
            .to_numpy().reshape(len(group), N_BANDS)
        )
    else:
        bhs = np.stack(group["bhs"].to_numpy())  # (n, 8)
    order = np.lexsort((doc, bh, band))
    band, bh, doc, bhs = band[order], bh[order], doc[order], bhs[order]
    key_change = np.ones(len(doc), dtype=bool)
    key_change[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    sizes = np.diff(np.concatenate((np.nonzero(key_change)[0], [len(doc)])))
    ii, jj = _within_group_pairs(sizes)
    if len(ii) == 0:
        return empty
    eq = bhs[ii] == bhs[jj]  # (npairs, 8); band[ii] column is True
    first_match = eq.argmax(axis=1)
    keep = (first_match == band[ii]) & (doc[ii] != doc[jj])
    ii, jj = ii[keep], jj[keep]
    a, b = doc[ii], doc[jj]
    swap = a > b
    a, b = np.where(swap, b, a), np.where(swap, a, b)
    return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})


class ShingleHashes:
    """documents batch -> (doc_id, sh: list<int64>) with the sorted
    DISTINCT shingle-hash set per doc — the join side of the
    verification shuffle (far cheaper to ship than the raw text)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        doc_off, tok_h, tok_lens = ph.split_tokens(batch["text"])
        sh_doc, sh_h = ph.shingle_hashes(doc_off, tok_h, tok_lens)
        du, hu = ph.distinct_per_doc(sh_doc, sh_h)
        counts = np.bincount(du, minlength=n)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sh": pa.ListArray.from_arrays(pa.array(offsets), pa.array(hu)),
            }
        )


def attach_shingles(group, side: str, out_col: str) -> pa.Table:
    """One bucket of (candidate-pair rows, kind=0) + (shingle rows,
    kind=1) co-shuffled on ``bucket_of(pair[side]) == bucket_of(doc_id)``
    -> pair rows with ``out_col`` = that side's shingle list. This is
    the scale-safe replacement for broadcasting the corpus: each bucket
    sees only its own docs' shingle sets.

    Arrow-native: the shingle sets stay a ``list<int64>`` column end to
    end — the lookup is a searchsorted into the bucket's shingle rows
    plus one Arrow ``take`` on the list column (unmatched sides get an
    empty-list sentinel row, never a null schema)."""
    from .overlaps import col_np

    if not isinstance(group, pa.Table):
        group = pa.Table.from_pandas(group, preserve_index=False)
    group = group.combine_chunks()
    kind = col_np(group, "kind", np.int64)
    pair_idx = np.nonzero(kind == 0)[0]
    sh_idx = np.nonzero(kind == 1)[0]
    keep_cols = [c for c in group.column_names
                 if c not in ("kind", "bucket", "sh")]
    pairs = group.select(keep_cols).take(pa.array(pair_idx))
    sh_col = group["sh"].combine_chunks()
    if len(pair_idx) == 0:
        return pairs.append_column(out_col, pa.array([], type=sh_col.type))
    # shingle rows carry their doc id in doc_a
    sh_docs = col_np(group, "doc_a", np.int64)[sh_idx]
    order = np.argsort(sh_docs)
    sh_sorted = sh_docs[order]
    want = col_np(group, side, np.int64)[pair_idx]
    pos = np.searchsorted(sh_sorted, want)
    pos = np.clip(pos, 0, max(len(sh_sorted) - 1, 0))
    found = sh_sorted[pos] == want if len(sh_sorted) else np.zeros(
        len(want), dtype=bool)
    src = sh_idx[order][pos] if len(sh_sorted) else np.zeros(
        len(want), dtype=np.int64)
    # empty-list sentinel appended at index len(group)
    ext = pa.concat_arrays(
        [sh_col, pa.array([[]], type=sh_col.type)]
    )
    src = np.where(found, src, len(group))
    return pairs.append_column(out_col, ext.take(pa.array(src)))


def verify_pairs(group, *, threshold: float) -> pa.Table:
    """Pair rows carrying both shingle lists -> exact Jaccard filter
    (over the distinct shingle-hash sets, matching the SQL oracle).

    Vectorized set intersection: each side's lists hold sorted DISTINCT
    31-bit hashes, so packing ``(pair_row << 31) | hash`` for both
    sides and counting duplicate keys in one sort gives every pair's
    intersection size with no per-row Python."""
    import pyarrow.compute as pc

    from .overlaps import col_np

    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard_mil": pa.array([], type=pa.int64()),
        }
    )
    if len(group) == 0:
        return empty
    if not isinstance(group, pa.Table):
        group = pa.Table.from_pandas(group, preserve_index=False)
    a = group["a_sh"].combine_chunks()
    b = group["b_sh"].combine_chunks()
    na = pc.list_value_length(a).fill_null(0).to_numpy().astype(np.int64)
    nb = pc.list_value_length(b).fill_null(0).to_numpy().astype(np.int64)
    rows = np.nonzero((na > 0) & (nb > 0))[0]
    if len(rows) == 0:
        return empty
    take = pa.array(rows)
    fa = a.take(take).flatten().to_numpy().astype(np.int64)
    fb = b.take(take).flatten().to_numpy().astype(np.int64)
    na, nb = na[rows], nb[rows]
    m = len(rows)
    ra = np.repeat(np.arange(m, dtype=np.int64), na)
    rb = np.repeat(np.arange(m, dtype=np.int64), nb)
    keys = np.concatenate(((ra << 31) | fa, (rb << 31) | fb))
    keys.sort()
    dup = keys[1:][keys[1:] == keys[:-1]]
    inter = np.bincount((dup >> 31), minlength=m)
    union = na + nb - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    keep = jac >= threshold
    return pa.table(
        {
            "doc_a": pa.array(col_np(group, "doc_a", np.int64)[rows][keep]),
            "doc_b": pa.array(col_np(group, "doc_b", np.int64)[rows][keep]),
            "jaccard_mil": pa.array(
                np.floor(jac[keep] * 1000 + 0.5).astype(np.int64)
            ),
        }
    )


# ---------------------------------------------------------------------------
# SimHash + banded Hamming join
# ---------------------------------------------------------------------------

class SimHashStage:
    """documents batch -> (doc_id, simhash int64), vectorized."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_off, tok_h, _tok_lens = ph.split_tokens(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(ph.simhash64(doc_off, tok_h)),
            }
        )


#: Hamming-join banding: k bands of 64/k bits find every pair with
#: distance <= k-1 (pigeonhole). 8 bands -> threshold 7.
HAM_BANDS = 8
HAM_BITS = 64 // HAM_BANDS
HAM_THRESHOLD = HAM_BANDS - 1

_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.int64).view(np.uint64)) ^ (b.astype(np.int64).view(np.uint64))
    return _POPCNT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def simhash_band_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) -> one row per Hamming band with the band's
    bit-slice as the key; the full fingerprint rides along (8 bytes)."""
    doc = batch["doc_id"].to_numpy()
    sim = batch["simhash"].to_numpy()
    u = sim.view(np.uint64)
    n = len(doc)
    bands = np.arange(HAM_BANDS, dtype=np.uint64)
    keys = ((u[:, None] >> (bands[None, :] * HAM_BITS))
            & np.uint64((1 << HAM_BITS) - 1)).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc, HAM_BANDS)),
            "simhash": pa.array(np.repeat(sim, HAM_BANDS)),
            "band": pa.array(np.tile(np.arange(HAM_BANDS, dtype=np.int64), n)),
            "band_key": pa.array(keys.reshape(-1)),
        }
    )


def hamming_candidate_pairs(group,
                            threshold: int = HAM_THRESHOLD) -> pa.Table:
    """Bucket of simhash band rows -> pairs with Hamming distance <=
    threshold, deduped by first-matching-band ownership (same rule as
    the MinHash candidates — the band slices of the two fingerprints
    decide the owner, derivable in-bucket). Arrow in/out."""
    from .overlaps import _within_group_pairs, col_np

    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "hamming": pa.array([], type=pa.int64()),
        }
    )
    if len(group) < 2:
        return empty
    band = col_np(group, "band", np.int64)
    key = col_np(group, "band_key", np.int64)
    doc = col_np(group, "doc_id", np.int64)
    sim = col_np(group, "simhash", np.int64)
    order = np.lexsort((doc, key, band))
    band, key, doc, sim = band[order], key[order], doc[order], sim[order]
    key_change = np.ones(len(doc), dtype=bool)
    key_change[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    sizes = np.diff(np.concatenate((np.nonzero(key_change)[0], [len(doc)])))
    ii, jj = _within_group_pairs(sizes)
    if len(ii) == 0:
        return empty
    keep = doc[ii] != doc[jj]
    ii, jj = ii[keep], jj[keep]
    ham = hamming64(sim[ii], sim[jj])
    keep = ham <= threshold
    ii, jj, ham = ii[keep], jj[keep], ham[keep]
    if len(ii) == 0:
        return empty
    # first band where the two fingerprints' slices agree
    ua = sim[ii].view(np.uint64)
    ub = sim[jj].view(np.uint64)
    bands = np.arange(HAM_BANDS, dtype=np.uint64)
    mask = np.uint64((1 << HAM_BITS) - 1)
    slice_eq = (
        ((ua[:, None] >> (bands[None, :] * HAM_BITS)) & mask)
        == ((ub[:, None] >> (bands[None, :] * HAM_BITS)) & mask)
    )
    keep = slice_eq.argmax(axis=1) == band[ii]
    ii, jj, ham = ii[keep], jj[keep], ham[keep]
    a, b = doc[ii], doc[jj]
    swap = a > b
    a, b = np.where(swap, b, a), np.where(swap, a, b)
    return pa.table(
        {"doc_a": pa.array(a), "doc_b": pa.array(b), "hamming": pa.array(ham)}
    )


# ---------------------------------------------------------------------------
# charset-Jaccard similarity join with triangle-block salting
# ---------------------------------------------------------------------------

def char_bitmaps(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """(n, 4) uint64 bitmap of each text's distinct BYTES (ASCII corpus:
    DuckDB jaccard() character-set semantics). Rows reduce to 32 bytes
    BEFORE any shuffle — the salted fan-out replicates bitmaps, never
    texts."""
    off, data = ph._string_bytes(texts)
    n = len(off) - 1
    bm = np.zeros((n, 256), dtype=bool)
    row = np.repeat(np.arange(n, dtype=np.int64), off[1:] - off[:-1])
    bm[row, data.astype(np.int64)] = True
    packed = np.packbits(bm.reshape(n, 4, 64), axis=-1, bitorder="little")
    return packed.reshape(n, 32).view(np.uint64).reshape(n, 4)


_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.int64)


def _pop_rows(words: np.ndarray) -> np.ndarray:
    """popcount over (npairs, 4) uint64 -> int64[npairs]."""
    v16 = words.view(np.uint16).reshape(len(words), -1)
    return _POP16[v16].sum(axis=1)


def salted_block_rows(batch: pa.Table, *, n_blocks: int,
                      key_col: str = "doc_id") -> pa.Table:
    """Triangle-block fan-out for exact self-joins: row in block
    v = key % n_blocks is shipped to every group (i, j) with i <= j and
    v in {i, j}. Group (i, j) holds blocks i and j and emits i-block x
    j-block pairs (i == j: within-block). No task ever sees more than
    2/n_blocks of a group — the skew bound. Replication factor =
    n_blocks per row, so reduce rows to their join payload (char
    bitmaps, normalized embeddings) BEFORE fanning out.
    """
    doc = batch[key_col].to_numpy()
    n = len(doc)
    v = (doc % n_blocks).astype(np.int64)
    # targets for row with block v: (i=v, j=v..n_blocks-1) and (i=0..v-1, j=v)
    reps = np.full(n, n_blocks, dtype=np.int64)
    idx = np.repeat(np.arange(n, dtype=np.int64), reps)
    k = np.arange(len(idx), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(reps)[:-1])), reps
    )
    vv = v[idx]
    i = np.where(k <= vv, k, vv)
    j = np.where(k <= vv, vv, k)
    out = batch.take(pa.array(idx))
    return (
        out.append_column("blk_i", pa.array(i))
        .append_column("blk_j", pa.array(j))
    )


def make_salted_jaccard_pairs(n_blocks: int, threshold: float = 0.5):
    """Returns the per-bucket kernel bound to the fan-out's n_blocks
    (Arrow in/out; the source strings are factorized to int codes for
    the grouping sort — only equality matters)."""

    def kernel(group) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "jaccard_mil": pa.array([], type=pa.int64()),
            }
        )
        if len(group) < 2:
            return empty
        from .overlaps import _within_group_pairs, col_np

        if isinstance(group, pa.Table):
            src_raw = np.asarray(group["source"].to_pylist(), dtype=object)
        else:
            src_raw = group["source"].to_numpy()
        _, src = np.unique(src_raw, return_inverse=True)
        bi = col_np(group, "blk_i", np.int64)
        bj = col_np(group, "blk_j", np.int64)
        doc = col_np(group, "doc_id", np.int64)
        order = np.lexsort((doc, bj, bi, src))
        src, bi, bj, doc = src[order], bi[order], bj[order], doc[order]
        bm = np.stack(
            [col_np(group, f"bm{w}", np.uint64) for w in range(4)], axis=1
        )[order]
        key_change = np.ones(len(doc), dtype=bool)
        key_change[1:] = (
            (src[1:] != src[:-1]) | (bi[1:] != bi[:-1]) | (bj[1:] != bj[:-1])
        )

        sizes = np.diff(np.concatenate((np.nonzero(key_change)[0], [len(doc)])))
        ii, jj = _within_group_pairs(sizes)
        if len(ii) == 0:
            return empty
        row_blk = doc % n_blocks
        cross = bi[ii] != bj[ii]
        opposite = row_blk[ii] != row_blk[jj]
        keep = (~cross) | opposite
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return empty
        inter = _pop_rows(bm[ii] & bm[jj])
        union = np.maximum(_pop_rows(bm[ii] | bm[jj]), 1)
        jac = inter.astype(np.float64) / union.astype(np.float64)
        keep = jac >= threshold
        ii, jj, jac = ii[keep], jj[keep], jac[keep]
        a, b = doc[ii], doc[jj]
        swap = a > b
        a, b = np.where(swap, b, a), np.where(swap, a, b)
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "jaccard_mil": pa.array(
                    np.floor(jac * 1000 + 0.5).astype(np.int64)
                ),
            }
        )

    return kernel


def charset_jaccard_pairs(group: pd.DataFrame, *, threshold: float = 0.5
                          ) -> pd.DataFrame:
    """Unsalted per-group kernel (kept as the pytest reference; the
    registered query uses the salted triangle-block path)."""
    empty = pd.DataFrame(
        {
            "doc_a": pd.Series(dtype=np.int64),
            "doc_b": pd.Series(dtype=np.int64),
            "jaccard_mil": pd.Series(dtype=np.int64),
        }
    )
    n = len(group)
    if n < 2:
        return empty
    doc = group["doc_id"].to_numpy(dtype=np.int64)
    order = np.argsort(doc, kind="stable")
    doc = doc[order]
    texts = group["text"].to_numpy()[order]
    bm = char_bitmaps(pa.array(list(texts)))
    ii, jj = np.triu_indices(n, k=1)
    inter = _pop_rows(bm[ii] & bm[jj])
    union = np.maximum(_pop_rows(bm[ii] | bm[jj]), 1)
    jac = inter.astype(np.float64) / union.astype(np.float64)
    keep = jac >= threshold
    return pd.DataFrame(
        {
            "doc_a": doc[ii[keep]],
            "doc_b": doc[jj[keep]],
            "jaccard_mil": np.floor(jac[keep] * 1000 + 0.5).astype(np.int64),
        }
    )


# ---------------------------------------------------------------------------
# plain-function forms of the stateless signature stages
# ---------------------------------------------------------------------------
# MinHashStage / ShingleHashes / SimHashStage hold NO per-actor state
# (no model, no compiled pattern — everything lives in module-level
# polyhash constants), so they belong in TASK-pool map_batches, not
# actor pools: a stateless actor pool pays spin-up per query and, at
# small cpu counts, can hold every CPU while the exchange tasks that
# feed it starve (observed as an intermittent full-suite deadlock at
# num_cpus=4: three idle pools x min-1 actor + sort tasks with nothing
# left to schedule on). Actor pools remain the right shape for stages
# with real per-actor state (extractors' compiled regexes, Delaunay
# builds, SRTM caches).

_MINHASH_STAGE = MinHashStage()
_SHINGLE_STAGE = ShingleHashes()
_SIMHASH_STAGE = SimHashStage()


def minhash_band_rows_batch(batch: pa.Table) -> pa.Table:
    return _MINHASH_STAGE(batch)


def shingle_hashes_batch(batch: pa.Table) -> pa.Table:
    return _SHINGLE_STAGE(batch)


def simhash_batch(batch: pa.Table) -> pa.Table:
    return _SIMHASH_STAGE(batch)


def passage_partials(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """documents batch -> partial (h, n_docs, bucket) rows for the
    corpus-wide duplicate-passage inventory: per-doc DISTINCT trigram
    shingle hashes (ShingleHashes — a document is one row, so (doc, h)
    pairs never straddle batches and partial doc-counts sum exactly),
    pre-aggregated per batch with one bincount over the dictionary-free
    int64 hash domain via np.unique."""
    import numpy as np

    from .overlaps import bucket_of

    t = shingle_hashes_batch(batch)
    sh = t["sh"]
    if isinstance(sh, pa.ChunkedArray):
        sh = sh.combine_chunks()
    flat = sh.flatten().to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return pa.table(
            {
                "h": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int64()),
            }
        )
    hu, counts = np.unique(flat, return_counts=True)
    return pa.table(
        {
            "h": pa.array(hu),
            "n_docs": pa.array(counts.astype(np.int64)),
            "bucket": pa.array(bucket_of(hu, n_buckets)),
        }
    )


def passage_rollup_group(group) -> pa.Table:
    """Bucket of partial passage rows -> (shingle_hash, n_docs) totals
    restricted to shingles shared by >= 2 documents (the duplicate
    inventory; unique passages never leave the reduce task)."""
    import pyarrow.compute as pc

    t = group if isinstance(group, pa.Table) else pa.Table.from_pandas(
        group, preserve_index=False
    )
    agg = t.select(["h", "n_docs"]).group_by(["h"]).aggregate(
        [("n_docs", "sum")]
    )
    agg = agg.rename_columns(["shingle_hash", "n_docs"])
    return agg.filter(pc.greater_equal(agg["n_docs"], pa.scalar(2)))
