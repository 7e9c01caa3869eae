"""Log compaction semantics (ConversionLog.java:43-54 +
O2WConverterImpl.java:478-489)."""

import numpy as np
import pandas as pd

from osm2world_ray.functions.logcompact import head_tail_truncate, suppress_consecutive


def test_suppress_consecutive():
    df = pd.DataFrame(
        {
            "level": ["E", "E", "E", "W", "E", "E"],
            "message": ["a", "a", "a", "a", "a", "b"],
            "element": [1, 1, 1, 1, 1, 1],
        }
    )
    out = suppress_consecutive(df)
    assert list(out["message"]) == ["a", "a", "a", "b"]
    assert list(out["level"]) == ["E", "W", "E", "E"]
    assert list(out["n_suppressed"]) == [2, 0, 0, 0]


def test_suppress_non_consecutive_kept():
    df = pd.DataFrame(
        {"level": ["E", "W", "E"], "message": ["a", "b", "a"], "element": [1, 1, 1]}
    )
    assert len(suppress_consecutive(df)) == 3


def test_suppress_empty():
    df = pd.DataFrame({"level": [], "message": [], "element": []})
    assert len(suppress_consecutive(df)) == 0


def test_head_tail_truncate():
    df = pd.DataFrame({"i": np.arange(250)})
    out = head_tail_truncate(df, max_entries=100)
    # first maxLogEntries/2 and last ceil(maxLogEntries/2)
    assert list(out["i"][:50]) == list(range(50))
    assert list(out["i"][50:]) == list(range(200, 250))
    # odd max: head 50, tail 51 (floor/ceil split)
    out2 = head_tail_truncate(df, max_entries=101)
    assert len(out2) == 101
    assert list(out2["i"][:50]) == list(range(50))
    assert list(out2["i"][50:]) == list(range(199, 250))
    # no-op under the limit
    assert len(head_tail_truncate(df.head(80), max_entries=100)) == 80
