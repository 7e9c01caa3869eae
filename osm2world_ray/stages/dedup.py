"""Deduplication operators for training-data pipelines.

Beyond the reference's exact-dedup precedents (probe-result HashSet
dedup ``SpatialIndex.java:30-43``, area/way anti-join
``OSMToMapDataConverter.java:292-303``), this module adds the
large-scale text-dedup family a 100 TB web corpus needs:

- exact: content-hash -> hash-partitioned groupby -> first-per-group
- MinHash + LSH banding: shingle -> minhash sig -> band explode ->
  groupby(band, band_hash) -> candidate pairs -> Jaccard verify
- SimHash: 64-bit token-weight fingerprint (Hamming near-dup key)
- n-gram Jaccard verification kernel

All per-batch work is vectorized or bounded-loop Python over
pre-tokenized arrays; signatures/hashes use deterministic integer
mixing (splitmix-style), no external hash libs.
"""

from __future__ import annotations

import hashlib

from ._util import resolve_ref as _resolve

import numpy as np
import pandas as pd
import pyarrow as pa

_MASK64 = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


def md5_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append the md5 hex digest of a string column (exact-dedup key;
    matches DuckDB's md5() for the oracle)."""
    texts = batch[col].to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("md5", pa.array(digests, type=pa.string()))


def token_ngrams(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Stable uint64 hashes of token n-grams (blake2b-seeded)."""
    grams = token_ngrams(text, n)
    if not grams:
        return np.zeros(1, dtype=np.uint64)
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
            for g in grams
        ],
        dtype=np.uint64,
    )


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """64-permutation MinHash signature via one-mix-per-permutation:
    sig[p] = min over shingles of splitmix64(h ^ seed_p)."""
    h = _shingle_hashes(text, n)
    seeds = _splitmix64(np.arange(1, N_PERM + 1, dtype=np.uint64))
    mixed = _splitmix64((h[:, None] ^ seeds[None, :]).astype(np.uint64))
    return mixed.min(axis=0)


class MinHashStage:
    """documents batch -> LSH band rows (doc_id, band, band_hash).

    One row per (doc, band); near-duplicate candidates are doc pairs
    sharing a (band, band_hash) bucket — found by the downstream
    ``groupby(["band", "band_hash"])`` shuffle.
    """

    def __init__(self, ngram: int = 3):
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        sigs = np.stack([minhash_signature(t, self.ngram) for t in texts])
        bands = sigs.reshape(len(texts), N_BANDS, ROWS_PER_BAND)
        # hash each band's row-group to one uint64
        band_hash = bands[..., 0]
        for i in range(1, ROWS_PER_BAND):
            band_hash = _splitmix64(band_hash ^ bands[..., i])
        out_doc = np.repeat(doc_ids, N_BANDS)
        out_band = np.tile(np.arange(N_BANDS, dtype=np.int64), len(texts))
        return pa.table(
            {
                "doc_id": pa.array(out_doc),
                "band": pa.array(out_band),
                "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64)),
            }
        )


def bucket_candidate_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Hash-bucket of LSH band rows -> ordered candidate pairs.

    ``group`` holds every (band, band_hash) bucket hashed into one
    bounded shuffle bucket; within-bucket pair generation is the
    vectorized cumsum machinery shared with the spatial self-join
    (``overlaps._within_group_pairs``). Pairs may repeat across bands
    — dedup downstream (after verification) with a small unique pass.
    """
    from .overlaps import _within_group_pairs

    empty = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                          "doc_b": pd.Series(dtype=np.int64)})
    if len(group) < 2:
        return empty
    band = group["band"].to_numpy(dtype=np.int64)
    bh = group["band_hash"].to_numpy(dtype=np.int64)
    doc = group["doc_id"].to_numpy(dtype=np.int64)
    order = np.lexsort((doc, bh, band))
    band, bh, doc = band[order], bh[order], doc[order]
    key_change = np.ones(len(doc), dtype=bool)
    key_change[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    sizes = np.diff(np.concatenate((np.nonzero(key_change)[0], [len(doc)])))
    ii, jj = _within_group_pairs(sizes)
    if len(ii) == 0:
        return empty
    a, b = doc[ii], doc[jj]
    swap = a > b
    a, b = np.where(swap, b, a), np.where(swap, a, b)
    keep = a != b
    return pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep]})


class JaccardVerify:
    """Candidate pairs + broadcast text lookup -> verified pairs with
    exact n-gram Jaccard >= threshold."""

    def __init__(self, texts_ref, *, threshold: float = 0.8, ngram: int = 3):
        t = _resolve(texts_ref)
        self.texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        self.threshold = threshold
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        keep, jacc = [], []
        for x, y in zip(a, b):
            j = jaccard(
                token_ngrams(self.texts[int(x)], self.ngram),
                token_ngrams(self.texts[int(y)], self.ngram),
            )
            keep.append(j >= self.threshold)
            jacc.append(j)
        mask = pa.array(keep)
        out = batch.filter(mask)
        jacc_mil = np.floor(np.asarray(jacc, dtype=np.float64) * 1000 + 0.5).astype(np.int64)
        return out.append_column(
            "jaccard_mil", pa.array(jacc_mil[np.asarray(keep)])
        )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unit weights)."""
    toks = text.split()
    if not toks:
        return 0
    hs = np.array(
        [
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in toks
        ],
        dtype=np.uint64,
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    counts = bits.sum(axis=0)
    vec = (counts * 2) > len(toks)
    return int(np.packbits(vec[::-1]).view(">u8")[0])


class SimHashStage:
    """documents batch -> (doc_id, simhash int64)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sh = np.array([simhash64(t) for t in texts], dtype=np.uint64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(sh.view(np.int64)),
            }
        )



# ---------------------------------------------------------------------------
# character-set Jaccard similarity join (DuckDB jaccard() semantics)
# ---------------------------------------------------------------------------

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def charset_jaccard_pairs(group: pd.DataFrame, *, threshold: float = 0.5
                          ) -> pd.DataFrame:
    """All doc pairs in the group with character-set Jaccard >=
    threshold (DuckDB ``jaccard()`` semantics: case-sensitive distinct
    characters, |A∩B| / |A∪B|).

    Vectorization: each text's character set becomes a fixed-width
    bitmap over the group's alphabet; pairwise intersect/union are
    AND/OR + popcount over uint64 words — O(n^2 * words) numpy ops, no
    per-pair Python. Group = one partition of a bounded shuffle key
    (here: the ``source`` column), the same discipline as the spatial
    pairwise joins.
    """
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
    sets = [frozenset(t) for t in texts]
    alphabet = sorted(set().union(*sets))
    pos = {c: i for i, c in enumerate(alphabet)}
    words = (len(alphabet) + 63) // 64
    bm = np.zeros((n, words), dtype=np.uint64)
    for i, s in enumerate(sets):
        for c in s:
            p = pos[c]
            bm[i, p >> 6] |= np.uint64(1) << np.uint64(p & 63)

    ii, jj = np.triu_indices(n, k=1)
    inter_bits = bm[ii] & bm[jj]
    union_bits = bm[ii] | bm[jj]
    inter = _POP[inter_bits.view(np.uint8)].reshape(len(ii), -1).sum(axis=1)
    union = _POP[union_bits.view(np.uint8)].reshape(len(ii), -1).sum(axis=1)
    union = np.maximum(union, 1)
    jacc = inter.astype(np.float64) / union.astype(np.float64)
    keep = jacc >= threshold
    return pd.DataFrame(
        {
            "doc_a": doc[ii[keep]],
            "doc_b": doc[jj[keep]],
            "jaccard_mil": np.floor(jacc[keep] * 1000 + 0.5).astype(np.int64),
        }
    )
