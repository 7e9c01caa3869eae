"""HTML extraction: the stateful WARC/HTML-extractor actor pool.

The analogue of the reference's entity->TagSet parsing
(``OSMToMapDataConverter.java:387-398``) over the pages table: a
callable class whose compiled extractors are built ONCE per actor in
``__init__`` (the reference's precedent for build-once state:
``TerrainInterpolator.java:11-20``), applied per Arrow batch in
``__call__``. Per-row invariant (BASELINE.json): the extracted ``text``
must be byte-identical per ``url``.

Per-row fault tolerance mirrors ``FaultTolerantIterationUtil.java:17-55``:
a malformed page yields an error row (``error`` column set) instead of
failing the block.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_ARTICLE = re.compile(rb"<article>(.*?)</article>", re.S)
_GEO_SPAN = re.compile(
    rb'<span class="geo" data-kind="(\d+)" data-lat="([^"]+)" data-lon="([^"]+)"'
    rb'(?: data-tags="([^"]*)")?></span>'
)


class TextExtractor:
    """pages -> (url, text, lang): byte-identical text re-derivation."""

    def __init__(self):
        self.article = _ARTICLE

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        texts: list[str | None] = []
        errors: list[str | None] = []
        for h in htmls:
            m = self.article.search(h)
            if m is None:
                texts.append(None)
                errors.append("no <article> element")
            else:
                texts.append(m.group(1).decode("utf-8"))
                errors.append(None)
        return pa.table(
            {
                "url": batch["url"],
                "text": pa.array(texts, type=pa.string()),
                "lang": batch["lang"],
                "error": pa.array(errors, type=pa.string()),
            }
        )


class MentionExtractor:
    """pages -> one row per geo mention:
    (url, mention_idx, lat, lon, kind, lang).

    Coordinates are recovered from the shortest-roundtrip decimal
    serialization, so the float64 bits equal the synthesis formula's —
    the determinism contract the oracle relies on.
    """

    def __init__(self):
        self.span = _GEO_SPAN

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        urls = batch["url"].to_pylist()
        langs = batch["lang"].to_pylist()
        out_url: list[str] = []
        out_idx: list[int] = []
        out_lat: list[float] = []
        out_lon: list[float] = []
        out_kind: list[int] = []
        out_lang: list[str] = []
        out_tags: list[str] = []
        for u, h, lg in zip(urls, htmls, langs):
            for idx, m in enumerate(self.span.finditer(h)):
                out_url.append(u)
                out_idx.append(idx)
                out_kind.append(int(m.group(1)))
                out_lat.append(float(m.group(2)))
                out_lon.append(float(m.group(3)))
                out_lang.append(lg)
                t = m.group(4)
                out_tags.append("" if t is None else t.decode("utf-8"))
        return pa.table(
            {
                "url": pa.array(out_url, type=pa.string()),
                "mention_idx": pa.array(out_idx, type=pa.int64()),
                "lat": pa.array(np.asarray(out_lat, dtype=np.float64)),
                "lon": pa.array(np.asarray(out_lon, dtype=np.float64)),
                "kind": pa.array(out_kind, type=pa.int64()),
                "lang": pa.array(out_lang, type=pa.string()),
                "tags": pa.array(out_tags, type=pa.string()),
            }
        )


class SegmentExtractor:
    """pages -> one row per consecutive-mention segment:
    (url, seg_idx, x1, y1, x2, y2) with x=lon, y=lat.

    The way-segment analogue (``MapData.java:47``: ways eagerly split
    into 2-node ``MapWaySegment`` edges): a page's ordered mentions form
    a polyline; segment j connects mention j to j+1. All mentions of a
    page live in one HTML row, so this needs no shuffle.
    """

    def __init__(self):
        self.span = _GEO_SPAN

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        urls = batch["url"].to_pylist()
        out_url, out_idx = [], []
        out_x1, out_y1, out_x2, out_y2 = [], [], [], []
        for u, h in zip(urls, htmls):
            pts = [
                (float(m.group(3)), float(m.group(2)))
                for m in self.span.finditer(h)
            ]
            for j in range(len(pts) - 1):
                out_url.append(u)
                out_idx.append(j)
                out_x1.append(pts[j][0])
                out_y1.append(pts[j][1])
                out_x2.append(pts[j + 1][0])
                out_y2.append(pts[j + 1][1])
        return pa.table(
            {
                "url": pa.array(out_url, type=pa.string()),
                "seg_idx": pa.array(out_idx, type=pa.int64()),
                "x1": pa.array(np.asarray(out_x1, dtype=np.float64)),
                "y1": pa.array(np.asarray(out_y1, dtype=np.float64)),
                "x2": pa.array(np.asarray(out_x2, dtype=np.float64)),
                "y2": pa.array(np.asarray(out_y2, dtype=np.float64)),
            }
        )


def extract_mentions(pages_ds, *, concurrency: int | tuple[int, int] = (1, 32),
                     batch_size: int | None = None):
    """pages Dataset -> mentions Dataset via the actor pool."""
    return pages_ds.map_batches(
        MentionExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def extract_text(pages_ds, *, concurrency: int | tuple[int, int] = (1, 32),
                 batch_size: int | None = None):
    """pages Dataset -> (url, text, lang, error) Dataset."""
    return pages_ds.map_batches(
        TextExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
