"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages — the
same shape as the reference's raster handling (``SRTMData.java:26-90``:
opaque .hgt tiles + lazy per-worker decode). Image decode is REAL: the
pure-stdlib PNG codec in :mod:`osm2world_ray.functions.png` (PIL/ffmpeg
are absent in this container, but PNG is zlib + unfilter, both in the
stdlib). Audio/video codecs remain out of scope; the frame-sampling
stage treats payloads as opaque fixed-size frames.

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


def synth_png_payloads(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, payload: binary) with REAL encoded
    PNGs: dims/channels/pixels are closed-form in doc_id so the decode
    output has an exact SQL oracle. width = 8 + doc%9,
    height = 8 + (doc*3)%7, channels 1/3/4 by doc%3, pixel value
    (x*7 + y*13 + doc*11 + ch*29) % 256."""
    from ..functions.png import encode_png

    doc = batch["doc_id"].to_numpy().astype(np.int64)
    payloads = []
    for d in doc:
        w = 8 + int(d) % 9
        h = 8 + (int(d) * 3) % 7
        c = (1, 3, 4)[int(d) % 3]
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)
        ch = np.arange(c, dtype=np.int64)
        px = (
            x[None, :, None] * 7 + y[:, None, None] * 13
            + int(d) * 11 + ch[None, None, :] * 29
        ) % 256
        payloads.append(encode_png(px.astype(np.uint8)))
    return pa.table(
        {
            "doc_id": pa.array(doc),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def synth_jpeg_payloads(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, payload: binary) with REAL encoded
    baseline JPEGs (functions/jpeg.py). Flat 8x8 blocks whose DC
    coefficients are exact quant-step multiples, so the lossy pipeline
    round-trips bit-exactly and decode has a closed-form SQL oracle:
    blocks_w = 1 + doc%4, blocks_h = 1 + (doc*3)%4, greyscale, block
    value 2*((bx*7 + by*13 + doc*11) % 128)."""
    from ..functions.jpeg import encode_flat_jpeg

    doc = batch["doc_id"].to_numpy().astype(np.int64)
    payloads = []
    for d in doc:
        bw = 1 + int(d) % 4
        bh = 1 + (int(d) * 3) % 4
        bx = np.arange(bw, dtype=np.int64)
        by = np.arange(bh, dtype=np.int64)
        vals = 2 * ((bx[None, :] * 7 + by[:, None] * 13 + int(d) * 11) % 128)
        payloads.append(encode_flat_jpeg(vals))
    return pa.table(
        {
            "doc_id": pa.array(doc),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def _decode_jpeg_meta(data: bytes):
    """functions.jpeg.decode_jpeg -> the (w, h, c, pixels) contract
    ImageDecode expects."""
    from ..functions.jpeg import decode_jpeg

    px = decode_jpeg(data)
    if px.ndim == 2:
        return px.shape[1], px.shape[0], 1, px
    return px.shape[1], px.shape[0], px.shape[2], px


class ImageDecode:
    """(id, payload: binary) -> (id, width, height, channels, n_bytes,
    pix_sum, error).

    REAL decode: the pure-stdlib PNG decoder
    (:mod:`osm2world_ray.functions.png` — zlib inflate, IHDR parse,
    scanline unfilter), instantiated once per actor. ``n_bytes`` is the
    decoded pixel-buffer size (w*h*c) and ``pix_sum`` the sum of all
    pixel bytes — both oracle-expressible for synthetic images.
    Undecodable payloads become error rows (zeros, error=1) per the
    engine's per-row fault-tolerance rule, never task failures.
    """

    def __init__(self, id_col: str = "doc_id", payload_col: str = "payload",
                 codec: str = "png"):
        from ..functions.png import decode_png

        self.id_col = id_col
        self.payload_col = payload_col
        self.decode = _decode_jpeg_meta if codec == "jpeg" else decode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(batch)
        w = np.zeros(n, dtype=np.int64)
        h = np.zeros(n, dtype=np.int64)
        c = np.zeros(n, dtype=np.int64)
        ps = np.zeros(n, dtype=np.int64)
        err = np.zeros(n, dtype=np.int64)
        for i in range(n):
            try:
                wi, hi, ci, px = self.decode(col[i].as_py())
            except Exception:  # ValueError / zlib.error / struct.error
                err[i] = 1
                continue
            w[i], h[i], c[i] = wi, hi, ci
            ps[i] = int(px.sum(dtype=np.int64))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "width": pa.array(w),
                "height": pa.array(h),
                "channels": pa.array(c),
                "n_bytes": pa.array(w * h * c),
                "pix_sum": pa.array(ps),
                "error": pa.array(err),
            }
        )


class ImageResize:
    """(id, payload) -> REAL nearest-neighbor resample: decode the PNG,
    fit the longest side to ``target`` (integer milli-scale, the
    :func:`resize_plan` rule), gather resampled pixels with the floor
    index map ``src = (dst * src_dim) // dst_dim``, and emit the
    resampled buffer's dims + pixel sum. The index map is exactly
    SQL-expressible, so synthetic closed-form images have a real
    oracle. Decode+resample run in one per-payload walk (PNG decode is
    inherently per-payload); everything per-pixel is numpy."""

    def __init__(self, *, target: int = RESIZE_TARGET,
                 id_col: str = "doc_id", payload_col: str = "payload"):
        from ..functions.png import decode_png

        self.target = target
        self.id_col = id_col
        self.payload_col = payload_col
        self.decode = decode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(batch)
        ow = np.zeros(n, dtype=np.int64)
        oh = np.zeros(n, dtype=np.int64)
        ps = np.zeros(n, dtype=np.int64)
        err = np.zeros(n, dtype=np.int64)
        t = self.target
        for i in range(n):
            try:
                w, h, _c, px = self.decode(col[i].as_py())  # px: (h, w, c)
            except Exception:
                err[i] = 1
                continue
            scale_mil = (t * 1000) // max(w, h)
            out_w = (w * scale_mil) // 1000
            out_h = (h * scale_mil) // 1000
            sx = (np.arange(out_w, dtype=np.int64) * w) // out_w
            sy = (np.arange(out_h, dtype=np.int64) * h) // out_h
            res = px[sy][:, sx, :]
            ow[i], oh[i] = out_w, out_h
            ps[i] = int(res.sum(dtype=np.int64))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "out_w": pa.array(ow),
                "out_h": pa.array(oh),
                "out_pix_sum": pa.array(ps),
                "error": pa.array(err),
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
