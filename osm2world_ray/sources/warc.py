"""WARC/1.0 web-archive source: pack + REAL record parsing.

Completes the webtext ingestion story (reference analogue:
``OSMFileReader.java`` / ``OSMStreamReader`` — a container format
parsed into entity rows). A WARC file is a sequence of records:

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...            (record headers)
    \\r\\n
    <Content-Length bytes of block>      (for responses: an HTTP
    \\r\\n\\r\\n                          message with its own headers)

:func:`parse_warc` is a real parser — version line, record headers,
``Content-Length``-framed block, HTTP head/body split, non-response
records (warcinfo etc.) skipped — and works on any standards-shaped
WARC bytes, not just our synth. :func:`pack_warc_batch` builds valid
WARC bytes from a pages batch (warcinfo + one response record per
page, deterministic ``WARC-Date`` from ``warc_ts``), so the
pack→parse→extract round trip has the byte-identity oracle: the text
re-extracted from WARC-wrapped HTML must equal the ground-truth
``documents.text`` column exactly.

Per-payload walks are inherent to container parsing (same shape as the
PNG/JPEG/Y4M decoders); everything per-record is O(record).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def pack_warc_batch(batch: pa.Table) -> pa.Table:
    """pages batch (url, warc_ts, html) -> one (warc: binary) row:
    a valid WARC/1.0 file with a leading warcinfo record and one
    ``WARC-Type: response`` record per page whose block is an HTTP/1.1
    response carrying the html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    ts = batch["warc_ts"].to_pylist()

    def record(rtype: str, headers: list[tuple[str, str]], block: bytes) -> bytes:
        head = [b"WARC/1.0", f"WARC-Type: {rtype}".encode()]
        head += [f"{k}: {v}".encode() for k, v in headers]
        head.append(f"Content-Length: {len(block)}".encode())
        return _CRLF.join(head) + _CRLF + _CRLF + block + _CRLF + _CRLF

    out = [record(
        "warcinfo",
        [("Content-Type", "application/warc-fields")],
        b"software: osm2world_ray-synth\r\n",
    )]
    for url, html, t in zip(urls, htmls, ts):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode() + html
        )
        out.append(record(
            "response",
            [
                ("WARC-Target-URI", url),
                ("WARC-Date", t.strftime("%Y-%m-%dT%H:%M:%SZ")),
                ("Content-Type", "application/http;msgtype=response"),
            ],
            http,
        ))
    return pa.table({"warc": pa.array([b"".join(out)], type=pa.binary())})


def parse_warc(data: bytes) -> list[tuple[str, bytes]]:
    """WARC bytes -> [(target_uri, http_body)] for response records.
    Raises ValueError on malformed framing."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        eol = data.index(_CRLF, pos)
        if data[pos:eol] != b"WARC/1.0":
            raise ValueError(f"bad WARC version line at {pos}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.index(_CRLF, pos)
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.strip().decode().lower()] = v.strip().decode()
        length = int(headers["content-length"])
        block = data[pos:pos + length]
        if len(block) != length:
            raise ValueError("truncated WARC block")
        pos += length
        if data[pos:pos + 4] != _CRLF + _CRLF:
            raise ValueError("missing record terminator")
        pos += 4
        if headers.get("warc-type") == "response":
            head, _, body = block.partition(_CRLF + _CRLF)
            if not head.startswith(b"HTTP/"):
                raise ValueError("response block is not an HTTP message")
            out.append((headers["warc-target-uri"], body))
    return out


def warc_records_batch(batch: pa.Table) -> pa.Table:
    """(warc: binary) batch -> (url, html) record rows. Malformed
    archives yield a single error row (url='', error=1) per the
    per-row fault-tolerance rule."""
    urls: list[str] = []
    htmls: list[bytes] = []
    errs: list[int] = []
    col = batch["warc"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for i in range(len(batch)):
        try:
            for url, body in parse_warc(col[i].as_py()):
                urls.append(url)
                htmls.append(body)
                errs.append(0)
        except Exception:  # ValueError / KeyError / IndexError
            urls.append("")
            htmls.append(b"")
            errs.append(1)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "html": pa.array(htmls, type=pa.binary()),
            "error": pa.array(np.asarray(errs, dtype=np.int64)),
        }
    )


def pack_warc_gz_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> (warc: binary) with REAL .warc.gz framing: each
    record is its own gzip MEMBER and the members are concatenated —
    the standard layout (ISO 28500 annex; it lets a reader seek to a
    record and decompress just that member). Deterministic bytes:
    mtime=0, no filename field."""
    import gzip
    import io

    raw = pack_warc_batch(batch)["warc"][0].as_py()
    # split the uncompressed stream back into records (each ends with
    # the \r\n\r\n terminator after its Content-Length block) by
    # re-parsing the framing, then gzip each record separately
    out = []
    pos = 0
    while pos < len(raw):
        start = pos
        eol = raw.index(_CRLF, pos)
        pos = eol + 2
        length = None
        while True:
            eol = raw.index(_CRLF, pos)
            line = raw[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                length = int(v)
        pos += length + 4
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(raw[start:pos])
        out.append(buf.getvalue())
    return pa.table({"warc": pa.array([b"".join(out)], type=pa.binary())})


def parse_warc_gz(data: bytes) -> list[tuple[str, bytes]]:
    """Multi-member .warc.gz bytes -> response records. The stdlib
    GzipFile transparently concatenates members, and record framing is
    self-delimiting, so decompress-then-parse is exact."""
    import gzip
    import io

    if data[:2] != b"\x1f\x8b":
        raise ValueError("not gzip data")
    return parse_warc(gzip.GzipFile(fileobj=io.BytesIO(data)).read())


def warc_gz_records_batch(batch: pa.Table) -> pa.Table:
    """(warc: binary, gzipped) batch -> (url, html, error) record rows."""
    urls: list[str] = []
    htmls: list[bytes] = []
    errs: list[int] = []
    col = batch["warc"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for i in range(len(batch)):
        try:
            for url, body in parse_warc_gz(col[i].as_py()):
                urls.append(url)
                htmls.append(body)
                errs.append(0)
        except Exception:  # ValueError / OSError / KeyError
            urls.append("")
            htmls.append(b"")
            errs.append(1)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "html": pa.array(htmls, type=pa.binary()),
            "error": pa.array(np.asarray(errs, dtype=np.int64)),
        }
    )
