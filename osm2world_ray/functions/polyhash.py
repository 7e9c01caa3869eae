"""Shared 31-bit polynomial hash family: vectorized numpy kernels with
exact DuckDB SQL mirrors.

Round-1 used blake2b/hashlib per shingle/token — correct but (a) the
dominant per-row Python cost at corpus scale and (b) inexpressible in
SQL, leaving MinHash/SimHash/fingerprint queries without oracles. This
family replaces it:

- ``H(s) = sum_i byte_i * B^(L-i) mod P`` over UTF-8 bytes, with
  ``P = 2^31 - 1`` (Mersenne prime) and ``B = 131``. All intermediate
  products fit int64 (< 2^62), so numpy uint-free int64 arithmetic and
  DuckDB BIGINT arithmetic are bit-identical.
- affine permutations ``perm_j(h) = (a_j * h + b_j) mod P`` for MinHash
  signatures and SimHash bit hashes (64 each, constants derived from
  splitmix64 and embedded as SQL literals).
- band fold ``bh = fold_r (bh * B2 + sig_r) mod P``.

The polynomial is compositional — ``H(s||t) = (H(s)*B^len(t) + H(t))
mod P`` — so shingle hashes are computed from token hashes without
materializing shingle strings (the vectorization the per-shingle
hashlib path could never reach).

Reference precedents: deterministic seeded hashing as a determinism
device (``GeometryUtil.java:745-758`` seeds by element id); TagSet's
sorted-array canonical form (``TagSet.java:28``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

P = 2147483647  # 2^31 - 1, prime
B = 131  # byte base
B2 = 1000003  # band-fold base
SPACE = 32  # ord(' ')

#: longest string the SQL mirror can hash (powers table size)
MAX_LEN = 768

_BP = np.ones(MAX_LEN + 1, dtype=np.int64)
for _k in range(1, MAX_LEN + 1):
    _BP[_k] = (_BP[_k - 1] * B) % P

N_PERM = 64
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS


def _splitmix(x: int) -> int:
    m = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & m
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m
    return x ^ (x >> 31)


PERM_A = np.array([_splitmix(j + 1) % (P - 1) + 1 for j in range(N_PERM)], np.int64)
PERM_B = np.array([_splitmix(j + 101) % P for j in range(N_PERM)], np.int64)
SIM_C = np.array([_splitmix(j + 201) % (P - 1) + 1 for j in range(N_PERM)], np.int64)
SIM_D = np.array([_splitmix(j + 301) % P for j in range(N_PERM)], np.int64)
#: band fold as a sum of per-row coefficients: B2^(ROWS_PER_BAND-1-r)
BAND_C = np.array(
    [pow(B2, ROWS_PER_BAND - 1 - r, P) for r in range(ROWS_PER_BAND)], np.int64
)


# ---------------------------------------------------------------------------
# arrow string plumbing
# ---------------------------------------------------------------------------

def _string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """StringArray -> (byte offsets int64[n+1], data uint8[...])."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buffers = arr.buffers()
    off = np.frombuffer(buffers[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return off, data


def split_tokens(texts: pa.Array | pa.ChunkedArray):
    """Single-space tokenization (string_split(text, ' ') semantics) ->
    (doc_offsets int64[ndoc+1] into the token arrays,
     token_hashes int64[ntok], token_lens int64[ntok])."""
    import pyarrow.compute as pc

    lst = pc.split_pattern(texts, " ")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    doc_off = lst.offsets.to_numpy().astype(np.int64)
    doc_off = doc_off - doc_off[0]
    flat = lst.values
    tok_off, data = _string_bytes(flat)
    lens = tok_off[1:] - tok_off[:-1]
    h = _hash_ranges(data, tok_off[:-1], lens)
    return doc_off, h, lens


def _hash_ranges(data: np.ndarray, starts: np.ndarray, lens: np.ndarray
                 ) -> np.ndarray:
    """Vectorized polynomial hash of byte ranges: loop over character
    POSITIONS (bounded by the longest range), each step vectorized."""
    n = len(starts)
    h = np.zeros(n, dtype=np.int64)
    if n == 0 or len(data) == 0:
        return h
    maxlen = int(lens.max()) if n else 0
    for c in range(maxlen):
        m = lens > c
        if not m.any():
            break
        idx = starts[m] + c
        h[m] = (h[m] * B + data[idx]) % P
    return h


def head_hash(texts: pa.Array | pa.ChunkedArray, n_chars: int = 64) -> np.ndarray:
    """Polynomial hash of the first ``n_chars`` characters (ASCII corpus:
    chars == bytes)."""
    off, data = _string_bytes(texts)
    lens = np.minimum(off[1:] - off[:-1], n_chars)
    return _hash_ranges(data, off[:-1], lens)


# ---------------------------------------------------------------------------
# shingles, MinHash, SimHash
# ---------------------------------------------------------------------------

def shingle_hashes(doc_off: np.ndarray, tok_h: np.ndarray, tok_lens: np.ndarray,
                   n: int = 3):
    """Token 3-gram shingle hashes per doc (hash of
    ``tok_i || ' ' || tok_{i+1} || ' ' || tok_{i+2}`` via composition;
    docs with fewer than n tokens yield ONE shingle = all tokens
    joined). Returns (shingle_doc_idx int64[nsh], hashes int64[nsh])."""
    ntoks = doc_off[1:] - doc_off[:-1]
    ndoc = len(ntoks)
    long = ntoks >= n
    nsh = np.where(long, ntoks - (n - 1), 1)

    out_doc = np.repeat(np.arange(ndoc, dtype=np.int64), nsh)
    out_h = np.empty(int(nsh.sum()), dtype=np.int64)

    # positions of each output shingle's first token
    sh_starts = np.concatenate(([0], np.cumsum(nsh)[:-1]))
    local = np.arange(len(out_doc), dtype=np.int64) - np.repeat(sh_starts, nsh)
    t0 = doc_off[:-1][out_doc] + local

    if long.any():
        lm = long[out_doc]
        t = t0[lm]
        h = tok_h[t]
        for k in range(1, n):
            h = (h * B + SPACE) % P
            h = (h * _BP[tok_lens[t + k]] + tok_h[t + k]) % P
        out_h[lm] = h
    if (~long).any():
        for d in np.nonzero(~long)[0]:
            s, e = int(doc_off[d]), int(doc_off[d + 1])
            h = np.int64(0)
            for k in range(s, e):
                if k > s:
                    h = (h * B + SPACE) % P
                h = (h * _BP[tok_lens[k]] + tok_h[k]) % P
            out_h[sh_starts[d]] = h
    return out_doc, out_h


def distinct_per_doc(doc_idx: np.ndarray, h: np.ndarray):
    """Distinct (doc, hash) pairs, sorted. Returns (doc_idx_u, h_u,
    counts_per_doc int64[ndoc]) with ndoc = max(doc_idx)+1 implied by
    the caller's batch size."""
    key = doc_idx * np.int64(1 << 31) + h
    u = np.unique(key)
    return u >> np.int64(31), u & np.int64((1 << 31) - 1)


def minhash_sigs(doc_idx_u: np.ndarray, h_u: np.ndarray, ndoc: int) -> np.ndarray:
    """(ndoc, 64) MinHash signature matrix: sig[d, j] = min over d's
    distinct shingle hashes of (a_j * h + b_j) mod P."""
    M = (PERM_A[None, :] * h_u[:, None] + PERM_B[None, :]) % P
    counts = np.bincount(doc_idx_u, minlength=ndoc)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    # every doc has >= 1 shingle (split(' ') of a string is non-empty)
    return np.minimum.reduceat(M, starts, axis=0)


def band_hashes(sigs: np.ndarray) -> np.ndarray:
    """(ndoc, 64) signatures -> (ndoc, 8) band hashes (B2 fold)."""
    bands = sigs.reshape(len(sigs), N_BANDS, ROWS_PER_BAND)
    bh = np.zeros((len(sigs), N_BANDS), dtype=np.int64)
    for r in range(ROWS_PER_BAND):
        bh = (bh * B2 + bands[..., r]) % P
    return bh


def simhash64(doc_off: np.ndarray, tok_h: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc over ALL tokens (with multiplicity):
    bit j set iff a majority of tokens have bit 30 of
    (c_j * H(tok) + d_j) mod P set."""
    G = (SIM_C[None, :] * tok_h[:, None] + SIM_D[None, :]) % P
    bits = (G >> np.int64(30)) & np.int64(1)
    starts = doc_off[:-1]
    counts = (doc_off[1:] - doc_off[:-1])[:, None]
    sums = np.add.reduceat(bits, starts, axis=0)
    maj = (sums * 2) > counts
    packed = (maj.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return packed.view(np.int64)


# ---------------------------------------------------------------------------
# SQL mirrors (DuckDB)
# ---------------------------------------------------------------------------

#: CTE providing the powers table; include once per oracle query
SQL_BP_CTE = (
    "bp AS (SELECT ["
    + ",".join(str(int(v)) for v in _BP)
    + "]::BIGINT[] AS v)"
)


def sql_hash(e: str) -> str:
    """SQL for H(e) — ``e`` must be a simple column reference; the
    query must have ``bp`` (SQL_BP_CTE) in scope."""
    return (
        f"CAST(coalesce(list_sum(list_transform(range(1, length({e})+1), "
        f"i -> ascii({e}[i]) * bp.v[length({e})-i+1])), 0) % {P} AS BIGINT)"
    )


def sql_perm_values() -> str:
    """VALUES rows (j, a, b, c, d) of the 64 affine constants."""
    return ", ".join(
        f"({j}, {int(PERM_A[j])}, {int(PERM_B[j])}, "
        f"{int(SIM_C[j])}, {int(SIM_D[j])})"
        for j in range(N_PERM)
    )


def sql_band_coeff_case(r_expr: str) -> str:
    """CASE mapping band-row index (j % 8) -> B2^(7-r) mod P."""
    arms = " ".join(
        f"WHEN {r} THEN {int(BAND_C[r])}" for r in range(ROWS_PER_BAND)
    )
    return f"CASE {r_expr} {arms} END"


#: shingle list for a ``tk`` (string list) column: 3-gram joins, or the
#: whole token list joined when shorter than 3 tokens
SQL_SHINGLES = (
    "CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')] "
    "ELSE list_transform(range(1, len(tk)-1), "
    "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END"
)
