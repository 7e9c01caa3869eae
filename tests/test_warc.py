"""WARC/1.0 pack + parse round trip and malformed-input handling."""
import datetime

import numpy as np
import pyarrow as pa
import pytest

from osm2world_ray.sources.warc import (
    pack_warc_batch,
    parse_warc,
    warc_records_batch,
)


def _pages(n=3):
    ts = [datetime.datetime(2024, 1, 1, 0, 0, i) for i in range(n)]
    return pa.table({
        "url": pa.array([f"https://ex.com/{i}" for i in range(n)]),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": pa.array(
            [f"<html><body>doc {i} &amp; more</body></html>".encode()
             for i in range(n)], type=pa.binary()),
    })


def test_warc_roundtrip():
    blob = pack_warc_batch(_pages())["warc"][0].as_py()
    assert blob.startswith(b"WARC/1.0\r\n")
    recs = parse_warc(blob)  # warcinfo skipped
    assert [u for u, _ in recs] == [f"https://ex.com/{i}" for i in range(3)]
    for i, (_, body) in enumerate(recs):
        assert body == f"<html><body>doc {i} &amp; more</body></html>".encode()


def test_warc_binary_safe_payload():
    # html containing CRLF CRLF must not break Content-Length framing
    pages = _pages(1).set_column(
        2, "html", pa.array([b"<a>\r\n\r\nWARC/1.0\r\n\r\n</a>"],
                            type=pa.binary()))
    recs = parse_warc(pack_warc_batch(pages)["warc"][0].as_py())
    assert recs[0][1] == b"<a>\r\n\r\nWARC/1.0\r\n\r\n</a>"


@pytest.mark.parametrize("blob", [
    b"NOT A WARC",
    b"WARC/1.0\r\nContent-Length: 10\r\n\r\nshort",          # truncated
    b"WARC/1.0\r\nContent-Length: 2\r\n\r\nokXX",            # bad terminator
])
def test_warc_malformed_error_row(blob):
    batch = pa.table({"warc": pa.array([blob], type=pa.binary())})
    out = warc_records_batch(batch).to_pandas()
    assert len(out) == 1 and out.loc[0, "error"] == 1


def test_warc_records_batch_flattens():
    b1 = pack_warc_batch(_pages(2))
    b2 = pack_warc_batch(_pages(3))
    batch = pa.concat_tables([b1, b2])
    out = warc_records_batch(batch).to_pandas()
    assert len(out) == 5 and (out["error"] == 0).all()


def test_warc_gz_multimember_roundtrip():
    from osm2world_ray.sources.warc import (
        pack_warc_gz_batch,
        parse_warc_gz,
    )
    pages = _pages(4)
    gz = pack_warc_gz_batch(pages)["warc"][0].as_py()
    # one gzip member per record: warcinfo + 4 responses
    assert gz.count(b"\x1f\x8b\x08") == 5
    recs = parse_warc_gz(gz)
    assert recs == parse_warc(pack_warc_batch(pages)["warc"][0].as_py())
    # deterministic bytes (mtime=0)
    assert gz == pack_warc_gz_batch(pages)["warc"][0].as_py()


def test_warc_gz_malformed():
    from osm2world_ray.sources.warc import warc_gz_records_batch
    batch = pa.table({"warc": pa.array([b"plainly not gzip"],
                                       type=pa.binary())})
    out = warc_gz_records_batch(batch).to_pandas()
    assert len(out) == 1 and out.loc[0, "error"] == 1
