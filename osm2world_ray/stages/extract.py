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
    """pages -> (url, text, lang): byte-identical text re-derivation.

    Vectorized equivalent of the non-greedy ``<article>(.*?)</article>``
    search: two bounded Arrow splits (text = everything between the
    FIRST ``<article>`` and the first ``</article>`` after it); pages
    missing either tag get an error row (the per-row fault-tolerance
    convention)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        html = batch["html"]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        if html.type in (pa.binary(), pa.large_binary()):
            html = pc.cast(html, pa.string())
        p1 = pc.split_pattern(html, "<article>", max_splits=1)
        has_open = pc.list_value_length(p1).to_numpy(
            zero_copy_only=False
        ) == 2
        n = len(batch)
        texts = np.full(n, None, dtype=object)
        errors = np.full(n, None, dtype=object)
        oi = np.flatnonzero(has_open)
        if len(oi):
            if isinstance(p1, pa.ChunkedArray):
                p1 = p1.combine_chunks()
            off1 = p1.offsets.to_numpy()
            rest = p1.values.take(pa.array(off1[:-1][oi] + 1))
            p2 = pc.split_pattern(rest, "</article>", max_splits=1)
            if isinstance(p2, pa.ChunkedArray):
                p2 = p2.combine_chunks()
            has_close = pc.list_value_length(p2).to_numpy(
                zero_copy_only=False
            ) == 2
            ci = np.flatnonzero(has_close)
            off2 = p2.offsets.to_numpy()
            body = p2.values.take(pa.array(off2[:-1][ci])).to_numpy(
                zero_copy_only=False
            )
            texts[oi[ci]] = body
        errors[texts == None] = "no <article> element"  # noqa: E711
        return pa.table(
            {
                "url": batch["url"],
                "text": pa.array(texts, type=pa.string()),
                "lang": batch["lang"],
                "error": pa.array(errors, type=pa.string()),
            }
        )


#: the literal head of every geo span — the regex anchors here, so a
#: split on it enumerates exactly the regex's candidate positions (the
#: marker contains '"', which data-tags values cannot, so no marker can
#:  hide inside an attribute)
_MARK = '<span class="geo" data-kind="'


def _mention_fields(html_col, n_pages: int):
    """Vectorized finditer: Arrow C++ split kernels enumerate and
    validate every geo span, byte-equivalent to the compiled regex on
    any input (invalid candidates are skipped without consuming a
    mention index, like a failed regex match at that position).

    Returns (page_idx, mention_idx, kind, lat, lon, tags) numpy/Arrow
    arrays; floats are cast by Arrow's correctly-rounded parser, so
    bits equal Python float() on the same decimal strings.
    """
    import pyarrow.compute as pc

    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    parts = pc.split_pattern(html_col, _MARK)
    lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    total = int(lengths.sum())
    pidx_all = np.repeat(np.arange(n_pages, dtype=np.int64), lengths)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
    cand_sel = pos > 0  # element 0 is the pre-marker prefix
    flat = parts.flatten()
    cand_idx = np.flatnonzero(cand_sel)
    cand = flat.take(pa.array(cand_idx))
    pidx_c = pidx_all[cand_idx]
    # fields between '"' delimiters:
    # KIND " data-lat= " LAT " data-lon= " LON " [ data-tags= " TAGS "] ></span>...
    sub = pc.split_pattern(cand, '"', max_splits=8)
    if isinstance(sub, pa.ChunkedArray):
        sub = sub.combine_chunks()
    off = sub.offsets.to_numpy()
    cnt = np.diff(off)
    vals = sub.values
    has6 = cnt >= 6
    s6 = np.flatnonzero(has6)
    if len(s6) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, np.empty(0), np.empty(0), pa.array([], pa.string())
    base = off[:-1][s6]

    def fld(i):
        return vals.take(pa.array(base + i))

    kind_s, d1, lat_s, d3, lon_s, t5 = (fld(i) for i in range(6))
    valid = (
        pc.equal(d1, " data-lat=").to_numpy(zero_copy_only=False)
        & pc.equal(d3, " data-lon=").to_numpy(zero_copy_only=False)
        & pc.match_substring_regex(kind_s, r"^[0-9]+$").to_numpy(
            zero_copy_only=False
        )
        & (pc.utf8_length(lat_s).to_numpy(zero_copy_only=False) > 0)
        & (pc.utf8_length(lon_s).to_numpy(zero_copy_only=False) > 0)
    )
    no_tags = pc.starts_with(t5, "></span>").to_numpy(zero_copy_only=False)
    tagged = pc.equal(t5, " data-tags=").to_numpy(zero_copy_only=False) & (
        cnt[s6] >= 8
    )
    t7ok = np.zeros(len(s6), dtype=bool)
    tg = np.flatnonzero(tagged)
    if len(tg):
        t7 = vals.take(pa.array(base[tg] + 7))
        t7ok[tg] = pc.starts_with(t7, "></span>").to_numpy(
            zero_copy_only=False
        )
    valid &= no_tags | (tagged & t7ok)
    v = np.flatnonzero(valid)
    if len(v) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, np.empty(0), np.empty(0), pa.array([], pa.string())
    import pyarrow.compute as _pc

    kind = _pc.cast(kind_s.take(pa.array(v)), pa.int64()).to_numpy()
    lat = _pc.cast(lat_s.take(pa.array(v)), pa.float64()).to_numpy()
    lon = _pc.cast(lon_s.take(pa.array(v)), pa.float64()).to_numpy()
    vtagged = tagged[v] & t7ok[v]
    tags_np = np.full(len(v), "", dtype=object)
    vt = np.flatnonzero(vtagged)
    if len(vt):
        tags_np[vt] = vals.take(pa.array(base[v[vt]] + 6)).to_numpy(
            zero_copy_only=False
        )
    pidx_v = pidx_c[s6][v]
    # mention index = per-page enumeration of VALID matches (pidx is
    # nondecreasing by construction)
    midx = np.arange(len(v), dtype=np.int64) - np.searchsorted(
        pidx_v, pidx_v
    )
    return pidx_v, midx, kind, lat, lon, pa.array(tags_np, type=pa.string())


class MentionExtractor:
    """pages -> one row per geo mention:
    (url, mention_idx, lat, lon, kind, lang).

    Coordinates are recovered from the shortest-roundtrip decimal
    serialization, so the float64 bits equal the synthesis formula's —
    the determinism contract the oracle relies on. Fully vectorized
    (Arrow split/validate/cast kernels; the compiled-regex row kernel
    remains in the tests as the semantic reference).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch["html"]
        import pyarrow.compute as pc

        if html.type in (pa.binary(), pa.large_binary()):
            html = pc.cast(html, pa.string())
        pidx, midx, kind, lat, lon, tags = _mention_fields(html, len(batch))
        take = pa.array(pidx)
        return pa.table(
            {
                "url": batch["url"].take(take),
                "mention_idx": pa.array(midx),
                "lat": pa.array(lat),
                "lon": pa.array(lon),
                "kind": pa.array(kind),
                "lang": batch["lang"].take(take),
                "tags": tags,
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        html = batch["html"]
        if html.type in (pa.binary(), pa.large_binary()):
            html = pc.cast(html, pa.string())
        pidx, midx, _kind, lat, lon, _tags = _mention_fields(
            html, len(batch)
        )
        same = np.flatnonzero(pidx[1:] == pidx[:-1]) if len(pidx) else \
            np.empty(0, dtype=np.int64)
        take = pa.array(pidx[same]) if len(same) else pa.array(
            [], type=pa.int64()
        )
        return pa.table(
            {
                "url": batch["url"].take(take),
                "seg_idx": pa.array(midx[same]),
                "x1": pa.array(lon[same]),
                "y1": pa.array(lat[same]),
                "x2": pa.array(lon[same + 1]),
                "y2": pa.array(lat[same + 1]),
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
