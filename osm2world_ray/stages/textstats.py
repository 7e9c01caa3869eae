"""Text analysis stages: language id, quality scoring, token counting,
document fingerprinting.

The ValueParseUtil-style rule: kernels never throw on malformed input —
they emit nulls/defaults (``ValueParseUtil.java`` returns null on parse
failure; ``FaultTolerantIterationUtil.java:17-55`` skips bad elements).

All scores are emitted as integer units (counts, per-mille ratios) so
oracle comparisons never hash floats.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD = re.compile(r"[A-Za-z]+")

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "un", "una", "que"},
}


def _split_tokens(texts: pa.Array, *, whitespace_runs: bool = False):
    """tokens -> (flat token array, per-row index, per-row count).

    Single-space split (DuckDB ``string_split`` semantics, keeps empty
    tokens) by default; ``whitespace_runs`` mirrors Python's bare
    ``str.split()`` (runs of whitespace — empty tokens at the edges are
    harmless to is_in/equality consumers). Vectorized via Arrow's C++
    split: no Python touches a token.
    """
    import pyarrow.compute as pc

    if whitespace_runs:
        toks = pc.split_pattern_regex(texts, r"\s+")
    else:
        toks = pc.split_pattern(texts, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    idx = np.repeat(np.arange(len(toks), dtype=np.int64), lengths)
    return toks.flatten(), idx, lengths.astype(np.int64)


class QualityScore:
    """documents batch -> integer quality signals per doc:
    n_tokens (single-space split, DuckDB string_split semantics),
    n_chars, stopword_count (en profile), n_words_regex (BPE-ish
    ``[a-z]+|[0-9]+`` token count). Fully vectorized: Arrow C++
    split/is_in/count_substring_regex kernels + one bincount — no
    per-row Python."""

    def __init__(self):
        self.stop = pa.array(sorted(_LANG_STOPWORDS["en"]))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        texts = pa.array(batch["text"].to_numpy(), type=pa.string())
        flat, idx, n_tokens = _split_tokens(texts)
        hit = pc.is_in(flat, value_set=self.stop).to_numpy(
            zero_copy_only=False
        )
        stop_n = np.bincount(
            idx[hit], minlength=len(texts)
        ).astype(np.int64)
        n_words = pc.count_substring_regex(
            texts, "[a-z]+|[0-9]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_tokens": n_tokens,
                "n_chars": pc.utf8_length(texts)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "stopword_count": stop_n,
                "n_words_regex": n_words,
            }
        )


#: dict order = tie-break priority (first strict max wins, all-zero -> und)
_LANG_ORDER = list(_LANG_STOPWORDS)


class LangId:
    """documents batch -> heuristic language guess by DISTINCT
    stopword-profile hits (ties -> 'und'). Vectorized: one Arrow split,
    then per profile-word presence bincounts (a bounded 40-word loop
    over vector kernels, never over rows)."""

    def __init__(self):
        self.profiles = {
            k: sorted(v) for k, v in _LANG_STOPWORDS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        texts = pa.array(batch["text"].to_numpy(), type=pa.string())
        flat, idx, _ = _split_tokens(
            pc.utf8_lower(texts), whitespace_runs=True
        )
        n = len(texts)
        counts = np.zeros((len(self.profiles), n), dtype=np.int64)
        for li, lang in enumerate(_LANG_ORDER):
            for w in self.profiles[lang]:
                m = pc.equal(flat, w).to_numpy(zero_copy_only=False)
                # distinct-word hit: presence, not token count
                counts[li] += np.bincount(idx[m], minlength=n) > 0
        best = counts.argmax(axis=0)  # first max = dict-order tie-break
        guess = np.array(_LANG_ORDER, dtype=object)[best]
        guess[counts.max(axis=0) == 0] = "und"
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "lang_guess": pd.Series(guess, dtype=object),
            }
        )


class Fingerprint:
    """documents batch -> (doc_id, md5 hex, head_hash int64).

    md5 matches DuckDB's md5(); head_hash is the 31-bit polynomial
    rolling hash of the first 64 chars (the shingle-pipeline
    primitive, :mod:`osm2world_ray.functions.polyhash`) — vectorized
    over the byte matrix and bit-identical to the SQL oracle's
    char-sum formula.

    Arrow-native: md5 is inherently per-row, but the loop runs over
    zero-copy memoryview slices of the Arrow string column's single
    utf-8 data buffer — no per-row str decode/encode, no Series.map
    dispatch.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import polyhash as ph

        texts = batch["text"].combine_chunks()
        hh = ph.head_hash(texts)
        # [validity, offsets, data]; offsets are relative to arr.offset
        bufs = texts.buffers()
        width = np.int64 if pa.types.is_large_string(texts.type) else np.int32
        offs = np.frombuffer(bufs[1], dtype=width)[
            texts.offset:texts.offset + len(texts) + 1
        ]
        mv = memoryview(bufs[2])
        md5s = [
            hashlib.md5(mv[s:e]).hexdigest()
            for s, e in zip(offs[:-1].tolist(), offs[1:].tolist())
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "md5": pa.array(md5s, type=pa.string()),
                "head_hash": hh,
            }
        )
