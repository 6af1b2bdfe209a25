"""Deterministic WARC writers for fixtures/tests: plain and per-record-gzip
(the ISO 28500 / CommonCrawl member-per-record layout)."""

from __future__ import annotations

import gzip
import io


def record(
    warc_type: str,
    body: bytes,
    uri: str | None = None,
    rec_id: str = "<urn:uuid:0>",
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "text/plain",
) -> bytes:
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + rec_id.encode(),
        b"WARC-Date: " + date.encode(),
    ]
    if uri is not None:
        lines.append(b"WARC-Target-URI: " + uri.encode())
    lines.append(b"Content-Type: " + content_type.encode())
    lines.append(b"Content-Length: " + str(len(body)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"


def http_response(
    body: bytes,
    status: int = 200,
    ctype: str = "text/html",
    chunked: bool = False,
) -> bytes:
    if chunked:
        # Transfer-Encoding: chunked — the raw on-the-wire form a crawler
        # records; body split into two size-prefixed chunks + terminator
        head = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            "Transfer-Encoding: chunked\r\n\r\n"
        ).encode()
        mid = max(1, len(body) // 2) if body else 0
        enc = b""
        for part in (body[:mid], body[mid:]):
            if part:
                enc += f"{len(part):x}\r\n".encode() + part + b"\r\n"
        enc += b"0\r\n\r\n"
        return head + enc
    head = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def response_record(
    uri: str,
    html: bytes,
    rec_id: str,
    status: int = 200,
    ctype: str = "text/html",
    chunked: bool = False,
    **kw,
) -> bytes:
    return record(
        "response",
        http_response(html, status=status, ctype=ctype, chunked=chunked),
        uri=uri,
        rec_id=rec_id,
        content_type="application/http; msgtype=response",
        **kw,
    )


def write_warc(path: str, records: list[bytes], gzipped: bool = False) -> None:
    with open(path, "wb") as f:
        for rec in records:
            if gzipped:
                # one gzip member per record (mtime pinned for determinism)
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                f.write(buf.getvalue())
            else:
                f.write(rec)
