"""BPE-ish token counting: the byte-class run scan must agree with a
real regex engine on the exact BPE_PATTERN — fuzzed, plus the absorption
edge cases (single space vs whitespace runs, tabs, row boundaries,
UTF-8 multibyte)."""

import random
import re

import numpy as np
import pyarrow as pa

from osm2world_ray.stages.textstats import (
    BPE_PATTERN,
    bpe_token_counts,
    token_count_batch,
)

_RX = re.compile(BPE_PATTERN)

EDGE_CASES = [
    "",
    "ab cd",
    "ab  cd",       # double space: \s+ eats both, no absorption
    "ab ",          # trailing single space: its own \s+ match
    " ab",          # leading single space absorbed
    "a1b2",         # class alternation letter/digit
    " !!",          # space absorbed into punct run
    "a !b",
    "\t a",         # tab is never absorbed (literal-space rule)
    "a\n b",
    "über café",    # UTF-8 multibyte -> other-class byte runs
    " ",
    "  ",
]


def test_edge_cases():
    got = bpe_token_counts(pa.array(EDGE_CASES))
    want = [len(_RX.findall(s)) for s in EDGE_CASES]
    assert got.tolist() == want


def test_fuzz_vs_re():
    rng = random.Random(42)
    cases = [
        "".join(rng.choice("ab1 .!\t\né") for _ in range(rng.randrange(0, 40)))
        for _ in range(800)
    ]
    got = bpe_token_counts(pa.array(cases))
    want = np.array([len(_RX.findall(s)) for s in cases])
    assert (got == want).all()


def test_token_count_batch_schema_and_ws():
    texts = ["a b  c", "", " x"]
    out = token_count_batch(
        pa.table({"doc_id": pa.array([1, 2, 3]), "text": pa.array(texts)})
    )
    assert out.column_names == ["doc_id", "n_ws", "n_bpe"]
    # string_split(' ') semantics: spaces + 1, empties included
    assert out["n_ws"].to_pylist() == [s.count(" ") + 1 for s in texts]
    assert out["n_bpe"].to_pylist() == [len(_RX.findall(s)) for s in texts]


def test_sliced_chunked_input():
    arr = pa.chunked_array([["xx yy"], ["", " z", "1 2 3"]])
    got = bpe_token_counts(arr)
    want = [len(_RX.findall(s)) for s in arr.to_pylist()]
    assert got.tolist() == want
