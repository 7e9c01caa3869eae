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


class QualityScore:
    """documents batch -> integer quality signals per doc:
    n_tokens (single-space split, DuckDB string_split semantics),
    n_chars, stopword_count (en profile), n_words_regex (BPE-ish
    ``[a-z]+|[0-9]+`` token count; compiled once per actor)."""

    def __init__(self):
        self.stop = _LANG_STOPWORDS["en"]
        self.word_re = re.compile(r"[a-z]+|[0-9]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        toks = texts.str.split(" ")
        n_tokens = toks.map(len).astype(np.int64)
        n_chars = texts.str.len().astype(np.int64)
        stop = self.stop
        stop_n = toks.map(lambda ws: sum(1 for w in ws if w in stop)).astype(np.int64)
        wre = self.word_re
        n_words = texts.map(lambda t: len(wre.findall(t))).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_tokens": n_tokens,
                "n_chars": n_chars,
                "stopword_count": stop_n,
                "n_words_regex": n_words,
            }
        )


class LangId:
    """documents batch -> heuristic language guess by stopword-profile
    hit counts (ties -> 'und'); rows-only check (no SQL oracle)."""

    def __init__(self):
        self.profiles = {k: v for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def guess(text: str) -> str:
            ws = set(text.lower().split())
            best, best_n = "und", 0
            for lang, prof in self.profiles.items():
                n = len(ws & prof)
                if n > best_n:
                    best, best_n = lang, n
            return best

        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "lang_guess": batch["text"].map(guess),
            }
        )


class Fingerprint:
    """documents batch -> (doc_id, md5 hex, head_hash int64).

    md5 matches DuckDB's md5(); head_hash is the 31-bit polynomial
    rolling hash of the first 64 chars (the shingle-pipeline
    primitive, :mod:`osm2world_ray.functions.polyhash`) — vectorized
    over the byte matrix and bit-identical to the SQL oracle's
    char-sum formula.
    """

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        from ..functions import polyhash as ph

        texts = batch["text"]
        md5s = texts.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
        hh = ph.head_hash(pa.array(texts.to_numpy(), type=pa.string()))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "md5": md5s,
                "head_hash": hh,
            }
        )
