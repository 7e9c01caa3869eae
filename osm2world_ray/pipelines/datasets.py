"""Shared lazy dataset builders used by queries, bench and tests.

All builders return *lazy* ``ray.data.Dataset`` pipelines — nothing
materializes until the caller consumes. They never call ``ray.init``
(driver contract).
"""

from __future__ import annotations

from ..sources.pages import read_pages
from ..stages.extract import extract_mentions, extract_text


def pages_ds(sf_dir: str, *, repeat: int = 1):
    return read_pages(sf_dir, drop_text=True, repeat=repeat)


def mentions_ds(sf_dir: str, *, repeat: int = 1,
                concurrency: int | tuple[int, int] = (1, 32)):
    """pages -> extracted mentions (url, mention_idx, lat, lon, kind, lang)."""
    return extract_mentions(pages_ds(sf_dir, repeat=repeat), concurrency=concurrency)


def texts_ds(sf_dir: str, *, repeat: int = 1,
             concurrency: int | tuple[int, int] = (1, 32)):
    """pages -> re-extracted text (url, text, lang, error)."""
    return extract_text(pages_ds(sf_dir, repeat=repeat), concurrency=concurrency)


def documents_ds(sf_dir: str, *, columns: list[str] | None = None):
    """Raw documents table (column-pruned read; Ray auto-splits the
    single file into ~parallelism blocks, no repartition needed)."""
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def events_ds(sf_dir: str):
    """Events table (event_id, ts, user_id, event_type, value, props)."""
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet")


def embeddings_ds(sf_dir: str):
    """Embeddings table (vec_id, embedding: list<float>, label)."""
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")
