"""The Arrow-kernel extractors must reproduce the compiled-regex row
kernels byte-for-byte — including malformed spans (skipped without
consuming a mention index), tagged/untagged mixes, and pages missing
article tags."""

import re

import numpy as np
import pyarrow as pa

from osm2world_ray.stages.extract import (
    MentionExtractor,
    SegmentExtractor,
    TextExtractor,
)

_SPAN = re.compile(
    r'<span class="geo" data-kind="(\d+)" data-lat="([^"]+)" data-lon="([^"]+)"'
    r'(?: data-tags="([^"]*)")?></span>'
)
_ART = re.compile(r"<article>(.*?)</article>", re.S)


def _span(kind, lat, lon, tags=None):
    t = "" if tags is None else f' data-tags="{tags}"'
    return (
        f'<span class="geo" data-kind="{kind}" data-lat="{lat}"'
        f' data-lon="{lon}"{t}></span>'
    )


_PAGES = [
    "<html><article>plain text</article>" + _span(3, "40.5", "-3.25") + "</html>",
    # two mentions, one tagged (empty tags value is legal)
    "<article>a</article>"
    + _span(1, "1.5", "2.5", "k=v;x=y")
    + _span(2, "-1.25", "7.125", ""),
    # malformed candidates the regex rejects: bad kind, missing lon,
    # unterminated span — interleaved with a valid one
    '<span class="geo" data-kind="x9" data-lat="1" data-lon="2"></span>'
    '<span class="geo" data-kind="5" data-lat="3"></span>'
    + _span(7, "8.5", "9.5")
    + '<span class="geo" data-kind="5" data-lat="3" data-lon="4">'
    + "<article>b</article>",
    # no mentions, no article
    "<html>nothing here</html>",
    # article tags out of order: close before open, none after
    "</article><article>tail",
    # close before AND after the open
    "</article><article>mid</article>x" + _span(4, "0.5", "0.75"),
    "",
]


def _batch():
    n = len(_PAGES)
    return pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(n)]),
            "html": pa.array(_PAGES),
            "lang": pa.array(["en"] * n),
        }
    )


def test_mentions_match_regex_reference():
    out = MentionExtractor()(_batch()).to_pandas()
    exp = []
    for i, h in enumerate(_PAGES):
        for j, m in enumerate(_SPAN.finditer(h)):
            exp.append(
                (
                    f"u{i}", j, float(m.group(2)), float(m.group(3)),
                    int(m.group(1)),
                    "" if m.group(4) is None else m.group(4),
                )
            )
    got = list(
        zip(out.url, out.mention_idx, out.lat, out.lon, out.kind, out.tags)
    )
    assert got == exp
    # bit-exact float parse
    assert all(np.float64(g[2]) == e[2] for g, e in zip(got, exp))


def test_segments_match_regex_reference():
    out = SegmentExtractor()(_batch()).to_pandas()
    exp = []
    for i, h in enumerate(_PAGES):
        pts = [
            (float(m.group(3)), float(m.group(2)))
            for m in _SPAN.finditer(h)
        ]
        for j in range(len(pts) - 1):
            exp.append((f"u{i}", j, pts[j][0], pts[j][1], pts[j + 1][0], pts[j + 1][1]))
    got = list(zip(out.url, out.seg_idx, out.x1, out.y1, out.x2, out.y2))
    assert got == exp


def test_text_matches_regex_reference():
    out = TextExtractor()(_batch()).to_pandas()
    for i, h in enumerate(_PAGES):
        m = _ART.search(h)
        if m is None:
            assert out.text[i] is None
            assert out.error[i] == "no <article> element"
        else:
            assert out.text[i] == m.group(1)
            assert out.error[i] is None
