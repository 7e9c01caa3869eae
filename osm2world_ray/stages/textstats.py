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


#: BPE-ish pre-tokenizer over ASCII classes — the GPT-2 pattern shape
#: restricted to what BOTH RE2 (the DuckDB oracle) and a byte-class run
#: scan express identically: an optional leading SPACE glued to a
#: letter/digit/punct run, whitespace runs otherwise. (RE2 has no
#: lookahead, so the trailing-space refinement of the original pattern
#: is deliberately absent on both sides.)
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\t\n\f\r ]+|[\t\n\f\r ]+"

#: byte classes: 0 other, 1 letter, 2 digit, 3 whitespace (RE2 \s set)
_BPE_CLS = np.zeros(256, dtype=np.int8)
_BPE_CLS[ord("A"):ord("Z") + 1] = 1
_BPE_CLS[ord("a"):ord("z") + 1] = 1
_BPE_CLS[ord("0"):ord("9") + 1] = 2
_BPE_CLS[[9, 10, 12, 13, 32]] = 3


def bpe_token_counts(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row count of :data:`BPE_PATTERN` matches, with NO per-row
    regex: token count == class-run count adjusted for the leftmost-
    first absorption rule. A run of bytes of one class is one match,
    except a single literal-space run immediately followed (same row)
    by a letter/digit/punct run — the ``' ?'`` prefix absorbs it into
    the next match. Multi-byte UTF-8 chars are >=0x80 bytes, class
    "other" — byte runs and RE2 character runs coincide."""
    from ..functions import polyhash as ph

    off, data = ph._string_bytes(texts)
    n = len(off) - 1
    base = off[0]
    off = off - base
    data = data[base:base + off[-1]]
    if len(data) == 0:
        return np.zeros(n, dtype=np.int64)
    cls = _BPE_CLS[data]
    start = np.ones(len(data), dtype=bool)
    start[1:] = cls[1:] != cls[:-1]
    row_starts = off[1:-1]
    start[row_starts[row_starts < len(data)]] = True
    pos = np.nonzero(start)[0]
    run_len = np.diff(np.concatenate((pos, [len(data)])))
    run_cls = cls[pos]
    # row of each run via searchsorted into row offsets
    run_row = np.searchsorted(off, pos, side="right") - 1
    absorbed = np.zeros(len(pos), dtype=bool)
    if len(pos) > 1:
        same_row = run_row[:-1] == run_row[1:]
        absorbed[:-1] = (
            (run_cls[:-1] == 3)
            & (run_len[:-1] == 1)
            & (data[pos[:-1]] == 32)
            & same_row
            & (run_cls[1:] != 3)
        )
    counts = np.bincount(run_row, minlength=n)
    counts -= np.bincount(run_row[absorbed], minlength=n)
    return counts.astype(np.int64)


def token_count_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, n_ws, n_bpe): whitespace token count
    (``string_split(text, ' ')`` semantics: spaces+1) and the BPE-ish
    subword count — both from one pass over the raw byte buffer."""
    from ..functions import polyhash as ph

    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    off, data = ph._string_bytes(texts)
    base = off[0]
    off = off - base
    data = data[base:base + off[-1]]
    n = len(off) - 1
    is_sp = (data == 32).astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(is_sp)))
    n_ws = (cum[off[1:]] - cum[off[:-1]]) + 1
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws": pa.array(n_ws.astype(np.int64)),
            "n_bpe": pa.array(bpe_token_counts(texts)),
        }
    )


def _texts_and_ids(batch):
    """(texts, doc_id) as Arrow arrays from either a pandas frame or an
    Arrow table — the kernels are Arrow-native; pandas callers pay one
    conversion here, Arrow callers none."""
    if isinstance(batch, pa.Table):
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        doc_id = batch["doc_id"].cast(pa.int64())
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        return texts, doc_id
    return (
        pa.array(batch["text"].to_numpy(), type=pa.string()),
        pa.array(batch["doc_id"].to_numpy(dtype=np.int64)),
    )


class QualityScore:
    """documents batch -> integer quality signals per doc:
    n_tokens (single-space split, DuckDB string_split semantics),
    n_chars, stopword_count (en profile), n_words_regex (BPE-ish
    ``[a-z]+|[0-9]+`` token count). Fully vectorized: Arrow C++
    split/is_in/count_substring_regex kernels + one bincount — no
    per-row Python. Arrow in/out (pandas frames accepted)."""

    def __init__(self):
        self.stop = pa.array(sorted(_LANG_STOPWORDS["en"]))

    def __call__(self, batch) -> pa.Table:
        import pyarrow.compute as pc

        texts, doc_id = _texts_and_ids(batch)
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
        return pa.table(
            {
                "doc_id": doc_id,
                "n_tokens": pa.array(np.asarray(n_tokens, dtype=np.int64)),
                "n_chars": pc.utf8_length(texts).cast(pa.int64()),
                "stopword_count": pa.array(stop_n),
                "n_words_regex": pa.array(n_words),
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

    def __call__(self, batch) -> pa.Table:
        import pyarrow.compute as pc

        texts, doc_id = _texts_and_ids(batch)
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
        return pa.table(
            {
                "doc_id": doc_id,
                "lang_guess": pa.array(guess.astype(str), type=pa.string()),
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


# plain-function forms: these stages hold only module-constant state
# (stopword arrays), so they run as fused task-pool map_batches, not
# actor pools (see stages/dedup.py tail note: stateless pools cost
# spin-up, block fusion, and can deadlock small-cpu sessions)
_QUALITY_STAGE = QualityScore()
_LANGID_STAGE = LangId()
_FINGERPRINT_STAGE = Fingerprint()


def quality_score_batch(batch):
    return _QUALITY_STAGE(batch)


def lang_id_batch(batch):
    return _LANGID_STAGE(batch)


def fingerprint_batch(batch):
    return _FINGERPRINT_STAGE(batch)


_CF_EMPTY = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("stopword_count", pa.int64()),
    ]
).empty_table()


def corpus_filter_batch(batch: pa.Table, *, min_tokens: int,
                        min_stop: int) -> pa.Table:
    """End-to-end curation chain as ONE fused Arrow task: language gate
    -> quality gates (minimum token count + stopword floor, the
    C4-style heuristics). Dropped rows never leave the worker — no
    shuffle, no actor pool (the chain holds no per-actor state)."""
    import pyarrow.compute as pc

    b = batch.filter(pc.equal(batch["lang"], "en"))
    if len(b) == 0:
        return _CF_EMPTY
    s = _QUALITY_STAGE(b)
    ok = pc.and_(
        pc.greater_equal(s["n_tokens"], pa.scalar(min_tokens, pa.int64())),
        pc.greater_equal(s["stopword_count"], pa.scalar(min_stop, pa.int64())),
    )
    return s.select(["doc_id", "n_tokens", "stopword_count"]).filter(ok)


# ---------------------------------------------------------------------------
# PII scrubbing (RE2-vectorized masking with full-output verification)
# ---------------------------------------------------------------------------

#: RE2 patterns evaluated by Arrow's C++ regex kernels AND DuckDB's
#: regexp functions (both RE2) — identical match semantics by
#: construction, no Python `re` in the hot path
PII_EMAIL_PAT = r"[a-z0-9]+@example\.com"
PII_PHONE_PAT = r"\+1-555-[0-9]{4}"


def pii_augment_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, text2) with deterministic synthetic
    PII appended (emails for doc%3==0, phones for doc%5==0) — the synth
    side of the scrub oracle, mirrored verbatim in SQL string concat.
    Suffix construction is O(rows) tiny strings; the join back onto the
    text column is Arrow C++."""
    import pyarrow.compute as pc

    doc = batch["doc_id"].to_numpy()
    email = [
        f" contact{d}@example.com" if d % 3 == 0 else "" for d in doc.tolist()
    ]
    phone = [
        f" call +1-555-{d % 10000:04d}" if d % 5 == 0 else ""
        for d in doc.tolist()
    ]
    text2 = pc.binary_join_element_wise(
        batch["text"].combine_chunks().cast(pa.string()),
        pa.array(email, type=pa.string()),
        pa.array(phone, type=pa.string()),
        "",
    )
    return pa.table({"doc_id": batch["doc_id"], "text2": text2})


def pii_scrub_batch(batch: pa.Table, *, text_col: str = "text2") -> pa.Table:
    """(doc_id, text2) -> (doc_id, n_emails, n_phones, masked_len,
    masked_md5): count and mask email/phone PII with Arrow's RE2
    kernels (count_substring_regex / replace_substring_regex — fully
    vectorized, no per-row Python regex), then fingerprint the masked
    text with md5 so the oracle verifies the ENTIRE masked output, not
    just the counts. md5 is inherently per-row but runs over the
    decoded buffer views only (same pattern as fingerprint_batch)."""
    import pyarrow.compute as pc

    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    n_emails = pc.count_substring_regex(t, PII_EMAIL_PAT).cast(pa.int64())
    masked = pc.replace_substring_regex(
        t, PII_EMAIL_PAT, replacement="[EMAIL]"
    )
    n_phones = pc.count_substring_regex(
        masked, PII_PHONE_PAT
    ).cast(pa.int64())
    masked = pc.replace_substring_regex(
        masked, PII_PHONE_PAT, replacement="[PHONE]"
    )
    buf = masked.buffers()
    width = np.int64 if pa.types.is_large_string(masked.type) else np.int32
    offs = np.frombuffer(buf[1], dtype=width)[
        masked.offset:masked.offset + len(masked) + 1
    ]
    mv = memoryview(buf[2]) if buf[2] is not None else memoryview(b"")
    md5s = [
        hashlib.md5(mv[s:e]).hexdigest()
        for s, e in zip(offs[:-1].tolist(), offs[1:].tolist())
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_emails": n_emails,
            "n_phones": n_phones,
            "masked_len": pc.binary_length(masked).cast(pa.int64()),
            "masked_md5": pa.array(md5s, type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# within-document repetition stats (Gopher-style quality filter)
# ---------------------------------------------------------------------------

def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> per-doc n-gram repetition counts: the
    duplicate-n-gram fraction family of quality filters (Rae et al.
    2021 "Scaling Language Models" §A1.2 repetition filters; C4-style
    heuristics). A document whose 2/3-grams are mostly repeats is
    boilerplate or a crawler trap.

    Vectorized end-to-end: tokens come from the Arrow C++ split
    (single-space semantics — matches SQL ``string_split``), string
    identity goes through ``dictionary_encode`` (C++ hash, exact, no
    collisions), and per-doc distinct n-gram counts are one lexsort +
    run-boundary scan over integer codes. No Python touches a token.

    Outputs are integers: ``dup_k`` = occurrences beyond the first of
    each distinct k-gram; permille ratios are integer-floored.
    """
    import pyarrow.compute as pc

    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, ridx, counts = _split_tokens(texts)
    codes_arr = pc.dictionary_encode(flat)
    if isinstance(codes_arr, pa.ChunkedArray):
        codes_arr = codes_arr.combine_chunks()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(batch)

    def dup_counts(k: int) -> tuple[np.ndarray, np.ndarray]:
        """(n_kgrams, dup_kgrams) per row."""
        n_k = np.maximum(counts - (k - 1), 0)
        if len(codes) < k:
            return n_k, np.zeros(n, dtype=np.int64)
        same = np.ones(len(codes) - (k - 1), dtype=bool)
        for j in range(1, k):
            same &= ridx[j:len(codes) - (k - 1) + j] == ridx[:len(codes) - (k - 1)]
        d = ridx[: len(codes) - (k - 1)][same]
        cols = [codes[j: len(codes) - (k - 1) + j][same] for j in range(k)]
        order = np.lexsort(tuple(reversed(cols)) + (d,))
        d = d[order]
        cols = [c[order] for c in cols]
        new = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            boundary = d[1:] != d[:-1]
            for c in cols:
                boundary |= c[1:] != c[:-1]
            new[1:] = boundary
        distinct = np.bincount(d[new], minlength=n)
        return n_k, n_k - distinct

    n2, dup2 = dup_counts(2)
    n3, dup3 = dup_counts(3)
    pm2 = np.where(n2 > 0, 1000 * dup2 // np.maximum(n2, 1), 0)
    pm3 = np.where(n3 > 0, 1000 * dup3 // np.maximum(n3, 1), 0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(counts),
            "n_2grams": pa.array(n2),
            "dup_2grams": pa.array(dup2),
            "dup_2gram_permille": pa.array(pm2.astype(np.int64)),
            "n_3grams": pa.array(n3),
            "dup_3grams": pa.array(dup3),
            "dup_3gram_permille": pa.array(pm3.astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# corpus vocabulary statistics (inverted-index rollup, unbounded keys)
# ---------------------------------------------------------------------------

def vocab_partials(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """(doc_id, text) batch -> partial (token, df, tf, bucket) rows:
    the map side of an inverted-index/document-frequency build over an
    UNBOUNDED key space (the vocabulary). Fully vectorized: Arrow C++
    split + dictionary_encode collapse the batch to its per-batch
    vocabulary, numpy bincounts produce tf and per-(token, doc)
    deduped df. Because a document is ONE row, (token, doc) pairs
    never straddle batches, so summing partial dfs is exact. Tokens
    are bucketed by their polynomial head hash with the DRIVER-resolved
    count (fn_kwargs) — partial rows per bucket are O(vocab_in_bucket x
    map_tasks) regardless of corpus size."""
    import pyarrow.compute as pc

    from ..functions.polyhash import head_hash
    from .overlaps import bucket_of

    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, ridx, _ = _split_tokens(texts)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    tf = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
    key = (codes << np.int64(32)) | ridx  # ridx < 2^32 per batch
    uniq = np.unique(key)
    df = np.bincount(uniq >> np.int64(32),
                     minlength=len(vocab)).astype(np.int64)
    return pa.table(
        {
            "token": vocab,
            "df": pa.array(df),
            "tf": pa.array(tf),
            "bucket": pa.array(bucket_of(head_hash(vocab), n_buckets)),
        }
    )


def vocab_rollup_group(group) -> pa.Table:
    """Bucket of partial vocab rows -> (token, df, tf) totals (pyarrow
    C++ group_by; tolerant of multi-token groups and singletons)."""
    t = group if isinstance(group, pa.Table) else pa.Table.from_pandas(
        group, preserve_index=False
    )
    agg = t.select(["token", "df", "tf"]).group_by(["token"]).aggregate(
        [("df", "sum"), ("tf", "sum")]
    )
    return agg.rename_columns(["token", "df", "tf"])
