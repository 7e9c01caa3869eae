"""Pages source: Common-Crawl-style web pages derived from ``documents``.

Produces the exact ``input_hint`` shape ``(url:string,
warc_ts:timestamp[us], html:binary, text:string, lang:string)`` as a
``map_batches`` transform over the ``documents`` table. The HTML embeds
the document text in an ``<article>`` element and each geo mention as a
``<span class="geo" data-lat=... data-lon=...>`` — coordinates come from
:mod:`osm2world_ray.sources.synth` and are serialized with shortest
round-trip ``repr`` so the downstream extractor recovers the exact
float64 bits.

Downstream, the engine must *parse the HTML* (stages/extract.py) — the
synthesis formulas are only reused by the DuckDB oracle and tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import synth


def synth_pages(batch: pa.Table) -> pa.Table:
    """documents batch (doc_id, text, lang) -> pages batch.

    Deterministic per doc_id; string assembly is per-row Python (this is
    a source-synthesis stage, not an engine hot path).
    """
    doc_id = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()

    n = synth.n_mentions(doc_id)
    total = int(n.sum())
    rep_doc = np.repeat(doc_id, n)
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, n)
    lat, lon = synth.mention_latlon(rep_doc, j)
    kind = synth.mention_kind(rep_doc, j)

    htmls: list[bytes] = []
    pos = 0
    for i, d in enumerate(doc_id.tolist()):
        spans = []
        for _ in range(int(n[i])):
            spans.append(
                f'<span class="geo" data-kind="{kind[pos]}" '
                f'data-lat="{lat[pos]!r}" data-lon="{lon[pos]!r}"></span>'
            )
            pos += 1
        html = (
            f"<html><head><title>Doc {d}</title><meta charset=\"utf-8\"></head>"
            f"<body><article>{texts[i]}</article>{''.join(spans)}</body></html>"
        )
        htmls.append(html.encode("utf-8"))

    urls = [f"{synth.URL_PREFIX}{d}" for d in doc_id.tolist()]
    warc_ts = pa.array(
        (np.datetime64("2024-01-01T00:00:00", "us") + doc_id.astype("timedelta64[s]")),
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": warc_ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def read_pages(sf_dir: str, *, drop_text: bool = True, repeat: int = 1):
    """``documents.parquet`` -> lazy pages Dataset.

    ``drop_text`` removes the ground-truth ``text`` column so pipelines
    must re-derive it from ``html`` (the byte-identity invariant).
    ``repeat`` replicates each document with distinct synthetic doc_ids
    (``doc_id + r * 10**7``) — used only by the benchmark to scale input
    volume deterministically.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    if repeat > 1:
        def _replicate(batch: pa.Table, reps: int = repeat) -> pa.Table:
            tables = []
            for r in range(reps):
                t = batch.set_column(
                    batch.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.compute.add(batch["doc_id"], r * 10_000_000),
                )
                tables.append(t)
            return pa.concat_tables(tables)

        ds = ds.map_batches(_replicate, batch_format="pyarrow")
    ds = ds.map_batches(synth_pages, batch_format="pyarrow")
    if drop_text:
        ds = ds.select_columns(["url", "warc_ts", "html", "lang"])
    return ds
