"""Polyhash family: vectorized numpy kernels vs scalar reference vs
DuckDB SQL mirrors (the contract that makes MinHash/SimHash/fingerprint
queries oracle-checkable)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from osm2world_ray.functions import polyhash as ph
from osm2world_ray.stages import dedup as dd

TEXTS = [
    "hello world foo bar",
    "a b",
    "single",
    "x y z",
    "repeat repeat repeat repeat",
    "the quick brown fox jumps over the lazy dog",
]


def _naive_hash(s: str) -> int:
    h = 0
    for byte in s.encode():
        h = (h * ph.B + byte) % ph.P
    return h


def test_token_and_shingle_hashes_match_scalar():
    arr = pa.array(TEXTS)
    doc_off, tok_h, tok_lens = ph.split_tokens(arr)
    flat = [w for t in TEXTS for w in t.split(" ")]
    assert tok_h.tolist() == [_naive_hash(w) for w in flat]

    sh_doc, sh_h = ph.shingle_hashes(doc_off, tok_h, tok_lens)
    exp = []
    for d, t in enumerate(TEXTS):
        tk = t.split(" ")
        if len(tk) < 3:
            exp.append((d, _naive_hash(" ".join(tk))))
        else:
            exp.extend(
                (d, _naive_hash(" ".join(tk[i : i + 3])))
                for i in range(len(tk) - 2)
            )
    assert list(zip(sh_doc.tolist(), sh_h.tolist())) == exp


def test_minhash_band_simhash_match_scalar_reference():
    arr = pa.array(TEXTS)
    doc_off, tok_h, tok_lens = ph.split_tokens(arr)
    sh_doc, sh_h = ph.shingle_hashes(doc_off, tok_h, tok_lens)
    du, hu = ph.distinct_per_doc(sh_doc, sh_h)
    sigs = ph.minhash_sigs(du, hu, len(TEXTS))
    for d, t in enumerate(TEXTS):
        assert np.array_equal(sigs[d], dd.minhash_signature(t))
    sims = ph.simhash64(doc_off, tok_h)
    for d, t in enumerate(TEXTS):
        assert np.uint64(sims[d].astype(np.uint64)) == np.uint64(dd.simhash64(t))


def test_sql_mirror_band_hashes():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
        + ") t(doc_id, text)"
    )
    q = f"""
    WITH {ph.SQL_BP_CTE},
    toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
    sh AS (SELECT doc_id, unnest({ph.SQL_SHINGLES}) AS s FROM toks),
    hashes AS (SELECT DISTINCT doc_id, {ph.sql_hash('s')} AS h FROM sh, bp),
    perm AS (SELECT * FROM (VALUES {ph.sql_perm_values()}) p(j,a,b,c,d)),
    sig AS (SELECT doc_id, j, min((a*h+b) % {ph.P}) AS sig
            FROM hashes, perm GROUP BY doc_id, j),
    bands AS (SELECT doc_id, j // 8 AS band,
      sum((sig * {ph.sql_band_coeff_case('j % 8')}) % {ph.P}) % {ph.P} AS bh
      FROM sig GROUP BY doc_id, j // 8)
    SELECT doc_id, band, bh FROM bands ORDER BY doc_id, band
    """
    arr = pa.array(TEXTS)
    doc_off, tok_h, tok_lens = ph.split_tokens(arr)
    sh_doc, sh_h = ph.shingle_hashes(doc_off, tok_h, tok_lens)
    du, hu = ph.distinct_per_doc(sh_doc, sh_h)
    bh = ph.band_hashes(ph.minhash_sigs(du, hu, len(TEXTS)))
    for doc_id, band, v in con.sql(q).fetchall():
        assert bh[doc_id, band] == v


def test_lsh_first_band_ownership_dedup():
    """A pair agreeing on several bands must be emitted exactly once
    (from the first agreeing band), no matter how buckets split."""
    sig = np.arange(64, dtype=np.int64) % ph.P
    bh = ph.band_hashes(np.stack([sig, sig, sig + 1]))
    rows = []
    for d in range(3):
        for band in range(8):
            rows.append(
                {
                    "doc_id": d,
                    "band": band,
                    "band_hash": bh[d, band],
                    "bhs": bh[d],
                }
            )
    g = pd.DataFrame(rows)
    out = dd.lsh_candidate_pairs(g).to_pandas()
    pairs = list(zip(out["doc_a"], out["doc_b"]))
    assert pairs.count((0, 1)) == 1  # agree on all 8 bands -> once
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_hamming_band_join_finds_close_pairs():
    sims = np.array([0x0F0F0F0F0F0F0F0F, 0x0F0F0F0F0F0F0F0B,
                     -0x123456789ABCDEF], dtype=np.int64)
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "simhash": pa.array(sims)})
    bands = dd.simhash_band_rows(t).to_pandas()
    out = dd.hamming_candidate_pairs(bands).to_pandas()
    assert list(zip(out["doc_a"], out["doc_b"], out["hamming"])) == [(1, 2, 1)]


def test_salted_jaccard_equals_unsalted_kernel():
    rng = np.random.default_rng(3)
    texts = [
        "".join(rng.choice(list("abcdefgh "), size=30)) for _ in range(40)
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(40, dtype=np.int64), "text": texts,
         "source": ["s"] * 40}
    )
    exp = dd.charset_jaccard_pairs(df, threshold=0.5)
    exp = exp.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    bm = dd.char_bitmaps(pa.array(texts))
    base = pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy()),
            "source": pa.array(df["source"]),
            **{f"bm{w}": pa.array(bm[:, w]) for w in range(4)},
        }
    )
    n_blocks = 3
    fanned = dd.salted_block_rows(base, n_blocks=n_blocks).to_pandas()
    kern = dd.make_salted_jaccard_pairs(n_blocks)
    got = (
        kern(fanned).to_pandas()
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_head_hash_truncation():
    long = "z" * 200
    arr = pa.array([long, "short"])
    hh = ph.head_hash(arr)
    assert hh[0] == _naive_hash(long[:64])
    assert hh[1] == _naive_hash("short")
