"""Deterministic stratified sampling over a document corpus.

Training-data curation op: keep a per-stratum fraction of documents,
chosen by a deterministic multiplicative hash of the document id — the
same document is kept or dropped on every run, on every cluster size,
with no coordination (no shuffle, no RNG state). This is the
map-only, scale-free shape: each batch filters independently.

The hash is SQL-mirrorable (``(doc_id * 2654435761) % 2**31``) so the
sampled set has an exact DuckDB oracle — unlike ``Dataset.random_sample``,
whose membership depends on task seeding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: Knuth multiplicative-hash constant; modulus 2**31 keeps the product
#: within int64 for doc_ids < 2**32 (replica ids included)
SAMPLE_MULT = 2654435761
SAMPLE_MOD = 2**31

#: per-language keep rates in permille; unlisted languages fall back to
#: DEFAULT_PERMILLE (the usual curation shape: keep all high-resource
#: head languages, downsample the rest)
RATE_PERMILLE = {"en": 1000, "de": 500, "es": 250, "zh": 125}
DEFAULT_PERMILLE = 100


def sample_hash(doc_id: np.ndarray) -> np.ndarray:
    return (doc_id.astype(np.int64) * SAMPLE_MULT) % SAMPLE_MOD


def stratified_sample_batch(batch: pa.Table, *, rates=None,
                            default: int = DEFAULT_PERMILLE,
                            strat_col: str = "lang") -> pa.Table:
    """Filter a documents batch to its deterministic stratified sample.

    Vectorized: one equality mask per stratum (strata counts are small
    — languages, sources), one hash pass, one Arrow filter.
    """
    rates = RATE_PERMILLE if rates is None else rates
    doc = batch["doc_id"].to_numpy()
    strat = np.asarray(batch[strat_col].to_numpy(zero_copy_only=False))
    rate = np.full(len(doc), default, dtype=np.int64)
    for key, r in rates.items():
        rate[strat == key] = r
    keep = (sample_hash(doc) % 1000) < rate
    return batch.filter(pa.array(keep))


def sample_rate_sql(strat_col: str = "lang", *, rates=None,
                    default: int = DEFAULT_PERMILLE) -> str:
    """The oracle-side CASE expression for the same rate table."""
    rates = RATE_PERMILLE if rates is None else rates
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in rates.items()
    )
    return f"CASE {strat_col} {whens} ELSE {default} END"
