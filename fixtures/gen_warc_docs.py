"""Generate the WARC correctness fixture (driver row ``ex_warc_docs``).

Writes:

- ``fixtures/data/docs_fixture.warc.gz`` — a per-record-gzip WARC (the
  CommonCrawl layout, so the driver row exercises the gzip member walk):
  warcinfo + request records + HTTP 200/404 responses over deterministic
  HTML pages.
- ``fixtures/data/warc_docs.parquet`` — the EXPECTED extracted documents
  (url, text). The expected text is assembled from the same plain-text
  pieces the HTML was built from — NOT by running the repo's extractor —
  so the driver's hash-compare proves the whole chain independently:
  gzip member chunking → record framing → HTTP head split → UTF-8 decode
  → HTML→text (tags, blocks, entities, whitespace) → the 200-only bridge
  filter (the 404 page, the request records and the warcinfo record must
  all be absent from the result).

Run:  python fixtures/gen_warc_docs.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from fixtures import warcgen as wg

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
WARC_PATH = os.path.join(DATA_DIR, "docs_fixture.warc.gz")
PARQUET_PATH = os.path.join(DATA_DIR, "warc_docs.parquet")


def _enc(plain: str) -> str:
    """Plain text → HTML body text (the inverse of entity decoding)."""
    return (
        plain.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _page(title: str, paras: list[tuple[str, str]]) -> tuple[bytes, str]:
    """Build (html_bytes, expected_text) from pre-paired pieces.

    ``paras`` is a list of (html_fragment, expected_plain) pairs so edge
    cases (inline tags, &nbsp;, empty paragraphs) carry their own ground
    truth; the common case uses ``_enc(plain)`` as the fragment."""
    html = (
        "<html><head><script>var x = '<p>not text</p>';</script>"
        "<style>body { color: red; }</style></head><body>"
        f"<h1>{_enc(title)}</h1>"
    )
    for frag, _ in paras:
        html += f"<p>{frag}</p>"
    html += "<!-- nav boilerplate --></body></html>"
    parts = [title] + [exp for _, exp in paras]
    expected = "\n".join(p for p in parts if p)
    return html.encode("utf-8"), expected


def build() -> tuple[list[bytes], list[dict]]:
    records: list[bytes] = [wg.record("warcinfo", b"software: fixture\r\n")]
    expected: list[dict] = []
    for i in range(40):
        url = f"https://fixture.example/{i:03d}"
        title = f"Page {i} title"
        paras: list[tuple[str, str]] = []
        p0 = f"Alpha beta {i} & gamma < delta > epsilon."
        paras.append((_enc(p0), p0))
        if i % 4 == 0:
            # double-decode trap: the page DISPLAYS the literal '&lt;b&gt;'
            p1 = f"Escaped markup &lt;b&gt; stays literal in doc {i}."
            paras.append((_enc(p1), p1))
        if i % 4 == 1:
            # inline tags inside a paragraph collapse to spaces
            paras.append(
                (f"mid <b>bold {i}</b> and <i>italic</i> end",
                 f"mid bold {i} and italic end")
            )
        if i % 4 == 2:
            # &nbsp; decodes to a plain space; UTF-8 survives the decode
            paras.append(
                (f"café&nbsp;nºive {i} — über",
                 f"café nºive {i} — über")
            )
        if i % 4 == 3:
            paras.append(("", ""))  # empty paragraph: no blank line
            p3 = f'Quoted &quot;text&#39;s&quot; and &apos;more&apos; {i}'
            paras.append((p3, f"Quoted \"text's\" and 'more' {i}"))
        for j in range(2 + i % 3):
            pj = f"Common paragraph {j} of page {i}: " + "word " * (8 + j) + "tail."
            paras.append((_enc(pj), pj))
        html, text = _page(title, paras)
        status = 404 if i % 10 == 9 else 200
        records.append(
            wg.response_record(
                url, html, rec_id=f"<urn:uuid:doc-{i}>", status=status,
                date=f"2026-01-{1 + i % 28:02d}T00:00:00Z",
            )
        )
        records.append(
            wg.record(
                "request",
                f"GET /{i:03d} HTTP/1.1\r\nHost: fixture.example\r\n".encode(),
                uri=url,
                rec_id=f"<urn:uuid:req-{i}>",
                content_type="application/http; msgtype=request",
            )
        )
        if status == 200:
            expected.append({"url": url, "text": text})
    # one 200 response with an EMPTY payload: kept by the bridge, text ''
    records.append(
        wg.response_record(
            "https://fixture.example/empty", b"", rec_id="<urn:uuid:empty>"
        )
    )
    expected.append({"url": "https://fixture.example/empty", "text": ""})
    # Transfer-Encoding: chunked response — the raw on-the-wire form a
    # crawler records; the reader must dechunk or the hex size lines and
    # chunk CRLFs corrupt the extracted text
    ck_text = "Chunked body survives dechunking across a chunk boundary."
    ck_html, ck_exp = _page("Chunked page", [(_enc(ck_text), ck_text)])
    records.append(
        wg.response_record(
            "https://fixture.example/chunked", ck_html,
            rec_id="<urn:uuid:chunked>", chunked=True,
        )
    )
    expected.append({"url": "https://fixture.example/chunked", "text": ck_exp})
    # ISO-8859-1 page with a declared charset: single-byte accents must
    # decode via the Latin-1 map, not mojibake through UTF-8-replacement
    l1_text = "Tést pagé: ¡Latin-1 bytes décodés!"  # all chars in latin-1
    l1_parts = [f"<h1>{_enc('Latin page')}</h1>", f"<p>{_enc(l1_text)}</p>"]
    l1_html = (
        "<html><body>" + "".join(l1_parts) + "</body></html>"
    ).encode("iso-8859-1")
    records.append(
        wg.response_record(
            "https://fixture.example/latin1", l1_html,
            rec_id="<urn:uuid:latin1>",
            ctype="text/html; charset=ISO-8859-1",
        )
    )
    expected.append(
        {"url": "https://fixture.example/latin1",
         "text": "Latin page\n" + l1_text}
    )
    return records, expected


MAIN_PARQUET_PATH = os.path.join(DATA_DIR, "warc_main.parquet")


def _main_page(i: int) -> tuple[bytes, str, str]:
    """A crawl-shaped page with chrome: nav, article, teaser, link-farm
    sidebar, footer. Returns (html, expected_full_text, expected_main) —
    the FULL expectation follows html_to_text's rules (every block's
    text, chrome included), the MAIN expectation keeps only the blocks
    html_main_text_py's spec classifies as content: the headline (7
    words ≥ the 5-word floor), the plain paragraph, and the paragraph
    with one inline link (link density 2/15). The nav/footer drop as
    semantic chrome, the all-link sidebar div fails the density test
    (7/7), the 2-word teaser fails the word floor."""
    head = f"Main article {i} headline with several words"
    p1 = (f"First real paragraph of article {i} has enough plain words "
          "& passes the floor.")
    p2a = "Second paragraph keeps an inline"
    link_txt = "reference link"
    p2b = f"and still reads as content for page {i}."
    html = (
        "<html><head><script>var n = 1;</script></head><body>"
        '<nav><ul><li><a href="/">Home</a></li>'
        '<li><a href="/about">About us</a></li>'
        '<li><a href="/contact">Contact</a></li></ul></nav>'
        f"<h1>{_enc(head)}</h1>"
        f"<p>{_enc(p1)}</p>"
        f'<p>{_enc(p2a)} <a href="/ref">{link_txt}</a> {_enc(p2b)}</p>'
        "<p>Read more</p>"
        '<div><a href="/r1">Related post one</a> '
        '<a href="/r2">Other related post two</a></div>'
        "<footer><p>Copyright 2026 Fixture Example. "
        "All rights reserved.</p></footer>"
        "</body></html>"
    )
    p2 = f"{p2a} {link_txt} {p2b}"
    full = "\n".join([
        "Home", "About us", "Contact", head, p1, p2, "Read more",
        "Related post one Other related post two",
        "Copyright 2026 Fixture Example. All rights reserved.",
    ])
    main = "\n".join([head, p1, p2])
    return html.encode("utf-8"), full, main


def build_main() -> tuple[list[bytes], list[dict], list[dict]]:
    """Chrome-carrying pages for the 'main' branch (r11, VERDICT r10 #5).
    Returns (records, expected_full_rows, expected_main_rows); page 5 is
    a 404 — absent from BOTH expectations, re-pinning the 200-only
    contract in main mode."""
    records: list[bytes] = []
    full_rows: list[dict] = []
    main_rows: list[dict] = []
    for i in range(6):
        url = f"https://fixture.example/main/{i:02d}"
        html, full, main = _main_page(i)
        status = 404 if i == 5 else 200
        records.append(
            wg.response_record(
                url, html, rec_id=f"<urn:uuid:main-{i}>", status=status,
                date=f"2026-03-{1 + i:02d}T00:00:00Z",
            )
        )
        if status == 200:
            full_rows.append({"url": url, "text": full})
            main_rows.append({"url": url, "text": main})
    return records, full_rows, main_rows


WET_PATH = os.path.join(DATA_DIR, "wet_fixture.warc.gz")
WET_PARQUET_PATH = os.path.join(DATA_DIR, "wet_docs.parquet")
JSONL_PATH = os.path.join(DATA_DIR, "docs_fixture.jsonl.gz")


def build_wet() -> tuple[list[bytes], list[dict]]:
    """The WET twin (CommonCrawl ``*.wet.gz``): conversion records whose
    payload IS the page text, UTF-8 — the expected text is the literal
    payload string (ground truth by construction, the bridge must only
    filter record types and decode bytes faithfully)."""
    records: list[bytes] = [wg.record("warcinfo", b"software: wet-fixture\r\n")]
    expected: list[dict] = []
    for i in range(25):
        url = f"https://fixture.example/wet/{i:03d}"
        text = f"WET page {i}.\n" + " ".join(
            f"tok{i}x{j}" for j in range(10 + i % 5)
        )
        if i % 5 == 2:
            text += "\nünïcode — survives § the pipe."
        if i % 5 == 4:
            text += "\r\nCRLF line kept verbatim."
        records.append(
            wg.record(
                "conversion",
                text.encode("utf-8"),
                uri=url,
                rec_id=f"<urn:uuid:wet-{i}>",
                content_type="text/plain",
                date=f"2026-02-{1 + i % 28:02d}T00:00:00Z",
            )
        )
        expected.append({"url": url, "text": text})
        if i % 7 == 0:
            # interleaved metadata record (the WAT kind) must NOT surface
            records.append(
                wg.record(
                    "metadata",
                    b'{"links": 0}',
                    uri=url,
                    rec_id=f"<urn:uuid:wet-meta-{i}>",
                    content_type="application/json",
                )
            )
    return records, expected


def _write_expected(path: str, expected: list[dict]) -> None:
    expected.sort(key=lambda r: r["url"])
    table = pa.table(
        {
            "url": pa.array([r["url"] for r in expected], pa.string()),
            "text": pa.array([r["text"] for r in expected], pa.string()),
        }
    )
    pq.write_table(table, path, compression="snappy")


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    records, expected = build()
    m_records, m_full, m_main = build_main()
    records.extend(m_records)
    expected.extend(m_full)  # 'docs' mode sees the chrome text too
    wg.write_warc(WARC_PATH, records, gzipped=True)
    _write_expected(PARQUET_PATH, expected)
    _write_expected(MAIN_PARQUET_PATH, m_main)
    print(f"wrote {WARC_PATH} ({os.path.getsize(WARC_PATH)} bytes), "
          f"{PARQUET_PATH} ({len(expected)} docs), "
          f"{MAIN_PARQUET_PATH} ({len(m_main)} docs)")
    wet_records, wet_expected = build_wet()
    wg.write_warc(WET_PATH, wet_records, gzipped=True)
    _write_expected(WET_PARQUET_PATH, wet_expected)
    print(f"wrote {WET_PATH} ({os.path.getsize(WET_PATH)} bytes), "
          f"{WET_PARQUET_PATH} ({len(wet_expected)} docs)")
    # the JSONL twin of the WET corpus (same url/text rows, the Dolma-ish
    # dump layout): the driver's 'jsonl' branch reads it through the
    # repo's source while the oracle parses the SAME bytes with DuckDB's
    # own JSON reader — a cross-engine parse of one file
    import gzip
    import io
    import json

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        for r in wet_expected:
            gz.write(
                (json.dumps({"url": r["url"], "text": r["text"]},
                            ensure_ascii=False) + "\n").encode("utf-8")
            )
    with open(JSONL_PATH, "wb") as f:
        f.write(buf.getvalue())
    print(f"wrote {JSONL_PATH} ({os.path.getsize(JSONL_PATH)} bytes)")


if __name__ == "__main__":
    main()
