"""Pure-stdlib PNG codec + real decode stage."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from osm2world_ray.functions.png import _SIG, _chunk, decode_png, encode_png


@pytest.mark.parametrize("shape", [(5, 4), (9, 7, 3), (3, 3, 4), (8, 2, 2)])
def test_roundtrip(shape):
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=shape).astype(np.uint8)
    w, h, c, out = decode_png(encode_png(px))
    exp = px if px.ndim == 3 else px[:, :, None]
    assert (w, h, c) == (exp.shape[1], exp.shape[0], exp.shape[2])
    assert np.array_equal(out, exp)


def test_all_filter_types():
    """Decode a hand-filtered image using every filter (0-4)."""
    rng = np.random.RandomState(3)
    h, w, c = 6, 5, 3
    px = rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)
    flat = px.reshape(h, w * c).astype(np.int64)
    rows, prev = [], np.zeros(w * c, dtype=np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4, 2]):
        cur = flat[y]
        a = np.concatenate(([0] * c, cur[:-c]))
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - a) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = (cur - (a + prev) // 2) % 256
        else:
            cc = np.concatenate(([0] * c, prev[:-c]))
            pa_, pb = abs(prev - cc), abs(a - cc)
            pc2 = abs(a + prev - 2 * cc)
            pred = np.where((pa_ <= pb) & (pa_ <= pc2), a,
                            np.where(pb <= pc2, prev, cc))
            enc = (cur - pred) % 256
        rows.append(np.concatenate(([f], enc)).astype(np.uint8))
        prev = cur
    raw = np.concatenate(rows).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(data)[3], px)


def test_decode_rejections():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # 16-bit depth unsupported
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)


def test_decode_stage_real_and_error_rows():
    from osm2world_ray.stages.multimodal import ImageDecode, synth_png_payloads

    batch = pa.table({"doc_id": pa.array([0, 1, 2, 5], type=pa.int64())})
    payloads = synth_png_payloads(batch)
    out = ImageDecode()(payloads)
    for i, d in enumerate([0, 1, 2, 5]):
        w, h, c = 8 + d % 9, 8 + (d * 3) % 7, (1, 3, 4)[d % 3]
        assert out["width"][i].as_py() == w
        assert out["height"][i].as_py() == h
        assert out["channels"][i].as_py() == c
        assert out["n_bytes"][i].as_py() == w * h * c
        assert out["error"][i].as_py() == 0
        x, y, ch = np.meshgrid(np.arange(w), np.arange(h), np.arange(c),
                               indexing="xy")
        exp = int(((x * 7 + y * 13 + d * 11 + ch * 29) % 256).sum())
        assert out["pix_sum"][i].as_py() == exp
    # corrupt payload -> error row, not a throw
    bad = pa.table({"doc_id": pa.array([9], type=pa.int64()),
                    "payload": pa.array([b"garbage"], type=pa.binary())})
    out = ImageDecode()(bad)
    assert out["error"][0].as_py() == 1 and out["pix_sum"][0].as_py() == 0


def test_image_resize_nearest_neighbor():
    """ImageResize = decode + floor-index-map gather + sum, checked
    against a direct numpy resample of the same synthetic image."""
    import pyarrow as pa

    from osm2world_ray.functions.png import encode_png
    from osm2world_ray.stages.multimodal import ImageResize

    w, h, c, t = 10, 7, 3, 16
    px = ((np.arange(w)[None, :, None] * 7 + np.arange(h)[:, None, None] * 13
           + np.arange(c)[None, None, :] * 29) % 256).astype(np.uint8)
    payload = encode_png(px)
    out = ImageResize(target=t)(
        pa.table({"doc_id": pa.array([1]), "payload": pa.array([payload], type=pa.binary())})
    )
    scale = (t * 1000) // max(w, h)
    out_w, out_h = (w * scale) // 1000, (h * scale) // 1000
    sx = (np.arange(out_w) * w) // out_w
    sy = (np.arange(out_h) * h) // out_h
    want = int(px[sy][:, sx, :].sum(dtype=np.int64))
    assert out["out_w"].to_pylist() == [out_w]
    assert out["out_h"].to_pylist() == [out_h]
    assert out["out_pix_sum"].to_pylist() == [want]
    assert out["error"].to_pylist() == [0]


def test_image_resize_error_row():
    import pyarrow as pa

    from osm2world_ray.stages.multimodal import ImageResize

    out = ImageResize()(
        pa.table({"doc_id": pa.array([7]),
                  "payload": pa.array([b"not a png"], type=pa.binary())})
    )
    assert out["error"].to_pylist() == [1]
    assert out["out_pix_sum"].to_pylist() == [0]
