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
    tagv = synth.mention_tag_variant(rep_doc, j)

    htmls: list[bytes] = []
    pos = 0
    for i, d in enumerate(doc_id.tolist()):
        spans = []
        for _ in range(int(n[i])):
            # repr(float(...)): plain-Python shortest round-trip repr —
            # np.float64.__repr__ becomes 'np.float64(…)' under numpy 2
            spans.append(
                f'<span class="geo" data-kind="{kind[pos]}" '
                f'data-lat="{repr(float(lat[pos]))}" '
                f'data-lon="{repr(float(lon[pos]))}" '
                f'data-tags="{synth.TAG_VARIANTS[tagv[pos]]}"></span>'
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


def read_pages(sf_dir: str, *, drop_text: bool = True, repeat: int = 1,
               num_blocks: int = 32):
    """``documents.parquet`` -> lazy pages Dataset.

    ``drop_text`` removes the ground-truth ``text`` column so pipelines
    must re-derive it from ``html`` (the byte-identity invariant).
    ``repeat`` replicates each document with distinct synthetic doc_ids
    (``doc_id + r * 10**7``) — used only by the benchmark to scale input
    volume deterministically.

    ``num_blocks``: the sandbox input is ONE small parquet file, which
    reads as a single block — every downstream ``map_batches`` would
    then run serially no matter how many CPUs the cluster has. A cheap
    ``repartition`` right after the (tiny) read restores block
    parallelism. At real scale the input is thousands of files and
    this is unnecessary (pass ``None``); the equivalent knob there is
    file/row-group splitting at the read.
    """
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    if repeat > 1:
        # Replicate as INDEPENDENT read tasks (one per replica) instead
        # of replicating inside batches + repartitioning: no all-to-all
        # barrier, and task parallelism scales with the replicated
        # volume. This mirrors the real-scale shape where the input is
        # thousands of files, each its own read task.
        def _read_replica(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            out = []
            for r in batch["id"].to_pylist():
                t = pq.read_table(path, columns=["doc_id", "text", "lang"])
                out.append(
                    t.set_column(
                        t.schema.get_field_index("doc_id"),
                        "doc_id",
                        pa.compute.add(t["doc_id"], r * 10_000_000),
                    )
                )
            return pa.concat_tables(out)

        # bundle replicas into ~num_blocks read tasks: task count (and
        # thus driver scheduling load) stays fixed as repeat grows;
        # per-task work grows instead. Over-partitioning into hundreds
        # of ~100ms tasks makes the single-threaded scheduler the
        # bottleneck long before the CPUs saturate.
        ds = rd.range(
            repeat, override_num_blocks=min(repeat, max(num_blocks, 64))
        ).map_batches(_read_replica, batch_format="pyarrow")
    else:
        # Ray auto-splits even a single-file read into ~parallelism
        # blocks (ReadParquet->SplitBlocks), so no repartition barrier
        # is needed here
        ds = rd.read_parquet(path, columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(synth_pages, batch_format="pyarrow")
    if drop_text:
        ds = ds.select_columns(["url", "warc_ts", "html", "lang"])
    return ds
