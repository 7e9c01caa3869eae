"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages — the
same shape as the reference's raster handling (``SRTMData.java:26-90``:
opaque .hgt tiles + lazy per-worker decode). The actual codec libraries
(PIL/ffmpeg/torchvision) are NOT in this container, so the decode body
is a STUB: ``_fake_decode`` derives deterministic dimensions from the
payload bytes. Every piece of Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and oracle-tested;
swapping ``_fake_decode`` for a real decoder is a one-function change
(guarded by an import-try in ``ImageDecode.__init__``).

Memory discipline: payload batches are WIDE — callers pass a small
``batch_size`` (``MM_BATCH_SIZE``) so batch x concurrency fits the
worker heap, and metadata-only columns flow onward (payloads dropped
as early as possible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: small batches for wide binary rows (images/audio): ~batch_size x
#: payload_size x concurrency must fit the worker heap
MM_BATCH_SIZE = 256

FRAME_BYTES = 256
FRAME_STRIDE = 4
RESIZE_TARGET = 224


def _payload_lengths(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc

    return pc.binary_length(col).to_numpy().astype(np.int64)


def _first_bytes(col) -> np.ndarray:
    """First byte of each binary payload (0 for empty), zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    lens = offs[1:] - offs[:-1]
    first = np.zeros(len(lens), dtype=np.int64)
    nz = lens > 0
    first[nz] = buf[offs[:-1][nz]]
    return first


class ImageDecode:
    """(id, payload: binary) -> (id, width, height, channels, n_bytes).

    Real decoder loaded once per actor in ``__init__`` when available;
    otherwise the deterministic stub: width = 64 + n_bytes % 64,
    height = 64 + first_byte % 64, channels = 3.
    """

    def __init__(self, id_col: str = "doc_id", payload_col: str = "payload"):
        self.id_col = id_col
        self.payload_col = payload_col
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            self.real = True
        except ImportError:
            self.real = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:  # pragma: no cover
            raise NotImplementedError(
                "real image decode: iterate payloads through PIL here"
            )
        col = batch[self.payload_col]
        n_bytes = _payload_lengths(col)
        first = _first_bytes(col)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "width": pa.array(64 + n_bytes % 64),
                "height": pa.array(64 + first % 64),
                "channels": pa.array(np.full(len(batch), 3, dtype=np.int64)),
                "n_bytes": pa.array(n_bytes),
            }
        )


def resize_plan(batch: pa.Table, *, target: int = RESIZE_TARGET) -> pa.Table:
    """Decoded dims -> resize plan (fit longest side to ``target``,
    integer milli-scale). Pure-metadata stage; the pixel resample would
    run in the same batch walk."""
    w = batch["width"].to_numpy()
    h = batch["height"].to_numpy()
    longest = np.maximum(w, h)
    scale_mil = (np.int64(target) * 1000) // longest
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "width": batch["width"],
            "height": batch["height"],
            "out_w": pa.array((w * scale_mil) // 1000),
            "out_h": pa.array((h * scale_mil) // 1000),
            "scale_mil": pa.array(scale_mil),
        }
    )


def frame_sample(batch: pa.Table, *, frame_bytes: int = FRAME_BYTES,
                 stride: int = FRAME_STRIDE,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> pa.Table:
    """Treat each payload as a fixed-frame-size "video"; emit every
    ``stride``-th frame's (index, byte length) — the frame-sampling
    fan-out shape (row -> k frame rows, vectorized repeat/cumsum)."""
    if len(batch) == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "frame_idx": pa.array([], type=pa.int64()),
                "frame_len": pa.array([], type=pa.int64()),
            }
        )
    n_bytes = _payload_lengths(batch[payload_col])
    n_frames = (n_bytes + frame_bytes - 1) // frame_bytes
    n_sampled = (n_frames + stride - 1) // stride
    row_idx = np.repeat(np.arange(len(n_bytes), dtype=np.int64), n_sampled)
    starts = np.concatenate(([0], np.cumsum(n_sampled)[:-1]))
    local = np.arange(int(n_sampled.sum()), dtype=np.int64) - np.repeat(
        starts, n_sampled
    )
    frame_idx = local * stride
    remaining = n_bytes[row_idx] - frame_idx * frame_bytes
    frame_len = np.minimum(remaining, frame_bytes)
    ids = batch[id_col].take(pa.array(row_idx))
    return pa.table(
        {
            id_col: ids,
            "frame_idx": pa.array(frame_idx),
            "frame_len": pa.array(frame_len),
        }
    )
