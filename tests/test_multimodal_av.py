"""Real audio (WAV via stdlib wave) and video (YUV4MPEG2) decode stages.

Kernel-level tests — no Ray session needed; the Ray plumbing is covered
by the mm_y4m_frames / mm_audio_features oracle queries.
"""
import io
import wave

import numpy as np
import pyarrow as pa
import pytest

from osm2world_ray.stages.multimodal import (
    _parse_y4m,
    audio_features,
    synth_wav_payloads,
    synth_y4m_payloads,
    y4m_frame_sample,
)


def _doc_batch(n=20):
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})


# --- Y4M container -------------------------------------------------------

def test_y4m_roundtrip_geometry():
    out = y4m_frame_sample(synth_y4m_payloads(_doc_batch()))
    df = out.to_pandas()
    assert (df["error"] == 0).all()
    for d, g in df.groupby("doc_id"):
        w = 4 + 2 * (d % 5)
        h = 4 + 2 * ((d * 3) % 4)
        nf = 2 + d % 5
        assert (g["width"] == w).all() and (g["height"] == h).all()
        assert sorted(g["frame_idx"]) == list(range(0, nf, 2))


def test_y4m_plane_sums_closed_form():
    out = y4m_frame_sample(synth_y4m_payloads(_doc_batch())).to_pandas()
    for row in out.itertuples():
        d, f, w, h = row.doc_id, row.frame_idx, row.width, row.height
        sub = 2 if d % 2 == 0 else 1
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        assert row.y_sum == ((x * 7 + y * 13 + f * 19 + d * 11) % 256).sum()
        cx = np.arange(w // sub)[None, :]
        cy = np.arange(h // sub)[:, None]
        assert row.u_sum == ((cx * 5 + cy * 3 + f * 19 + d * 11 + 71) % 256).sum()
        assert row.v_sum == ((cx * 3 + cy * 11 + f * 19 + d * 11 + 143) % 256).sum()


def test_y4m_parser_header_tags():
    # C absent -> 420jpeg default; frame params after FRAME are skipped
    data = (b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1\n"
            + b"FRAME Ixyz\n" + bytes(16) + bytes(4) + bytes(4))
    w, h, (dx, dy), frames = _parse_y4m(data)
    assert (w, h, dx, dy) == (4, 4, 2, 2)
    assert len(frames) == 1 and len(frames[0][0]) == 16


@pytest.mark.parametrize("payload", [
    b"not a video",
    b"YUV4MPEG2 W4 H4 C444\n" + b"FRAME\n" + bytes(10),  # truncated
    b"YUV4MPEG2 W4 H4 C999\n",                           # bad colorspace
    b"YUV4MPEG2 C444\n",                                 # missing W/H
    b"YUV4MPEG2 W4 H4 C444\n" + b"JUNK\n" + bytes(48),   # bad marker
])
def test_y4m_malformed_becomes_error_row(payload):
    batch = pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "payload": pa.array([payload], type=pa.binary()),
    })
    out = y4m_frame_sample(batch).to_pandas()
    assert len(out) == 1 and out.loc[0, "error"] == 1


def test_y4m_stride_one_keeps_all_frames():
    batch = _doc_batch(6)
    out = y4m_frame_sample(synth_y4m_payloads(batch), stride=1).to_pandas()
    for d, g in out.groupby("doc_id"):
        assert len(g) == 2 + d % 5


# --- WAV audio -----------------------------------------------------------

def test_wav_payloads_are_real_riff():
    payloads = synth_wav_payloads(_doc_batch(5))
    for i in range(5):
        raw = payloads["payload"][i].as_py()
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        with wave.open(io.BytesIO(raw), "rb") as wf:
            assert wf.getframerate() == 8000
            assert wf.getnframes() == 64 + i % 97


def test_wav_features_closed_form():
    out = audio_features(synth_wav_payloads(_doc_batch())).to_pandas()
    assert (out["error"] == 0).all()
    for row in out.itertuples():
        d = row.doc_id
        n = 64 + d % 97
        i = np.arange(n, dtype=np.int64)
        s = ((i * 37 + d * 101 + 17) % 4001) - 2000
        assert row.n_samples == n
        assert row.sum_abs == np.abs(s).sum()
        assert row.sum_sq == (s * s).sum()
        assert row.peak == np.abs(s).max()
        assert row.zero_crossings == (s[:-1] * s[1:] < 0).sum()


def test_wav_malformed_and_unsupported_become_error_rows():
    # stereo clip -> unsupported; garbage -> wave.Error
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(bytes(8))
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array([buf.getvalue(), b"garbage"], type=pa.binary()),
    })
    out = audio_features(batch).to_pandas()
    assert list(out["error"]) == [1, 1]
