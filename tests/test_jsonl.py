"""JSONL corpus source (sources/jsonl.py): schema contract, deterministic
ids, corrupt-line accounting, gzip handling, pipeline composition."""

from __future__ import annotations

import gzip
import json
import os

from pcap_converter_spark.sources.jsonl import read_jsonl_docs


def _write(path: str, rows: list, gz: bool = False) -> None:
    data = "\n".join(json.dumps(r) if isinstance(r, dict) else r for r in rows)
    if gz:
        with gzip.open(path, "wt", encoding="utf-8") as f:
            f.write(data)
    else:
        with open(path, "w", encoding="utf-8") as f:
            f.write(data)


def test_jsonl_basic_and_gzip_parity(spark, tmp_path):
    rows = [
        {"text": f"document {i} body", "url": f"https://j.org/{i}", "extra": i}
        for i in range(20)
    ]
    plain = str(tmp_path / "a.jsonl")
    gz = str(tmp_path / "a.jsonl.gz")
    _write(plain, rows)
    _write(gz, rows, gz=True)
    a = read_jsonl_docs(spark, plain).orderBy("url").collect()
    b = read_jsonl_docs(spark, gz).orderBy("url").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert len(a) == 20 and all(r["errors"] == 0 for r in a)
    assert a[0]["text"] == "document 0 body"


def test_jsonl_deterministic_ids_and_id_field(spark, tmp_path):
    rows = [
        {"text": "same body", "url": "https://j.org/x", "id": 7},
        {"text": "other body", "url": "https://j.org/y", "id": "7"},
    ]
    p = str(tmp_path / "b.jsonl")
    _write(p, rows)
    by_content = read_jsonl_docs(spark, p).collect()
    again = read_jsonl_docs(spark, p).collect()
    assert sorted(r["doc_id"] for r in by_content) == sorted(
        r["doc_id"] for r in again
    )  # re-ingestion stable
    by_id = read_jsonl_docs(spark, p, id_field="id").collect()
    # numeric 7 and string "7" normalize to the SAME id (stringified)
    assert by_id[0]["doc_id"] == by_id[1]["doc_id"]


def test_jsonl_corrupt_lines_counted_not_dropped(spark, tmp_path):
    rows = [
        {"text": "good one", "url": "https://j.org/1"},
        "{this is not json",
        {"text": "good two", "url": "https://j.org/2"},
    ]
    p = str(tmp_path / "c.jsonl")
    _write(p, rows)
    out = read_jsonl_docs(spark, p).collect()
    assert len(out) == 3
    assert sum(r["errors"] for r in out) == 1
    bad = [r for r in out if r["errors"] == 1][0]
    assert bad["text"] is None


def test_jsonl_glob_and_curation_composition(spark, tmp_path):
    """Multi-file glob feeds the curation operators directly — the
    acquisition contract all three sources share."""
    from pcap_converter_spark.operators import dedup

    for i in range(3):
        _write(
            str(tmp_path / f"part-{i}.jsonl.gz"),
            [{"text": f"shared duplicate body {j % 2}", "url": f"https://j.org/{i}/{j}"}
             for j in range(4)],
            gz=True,
        )
    docs = read_jsonl_docs(spark, str(tmp_path / "part-*.jsonl.gz"))
    assert docs.count() == 12
    groups = dedup.exact_duplicates(docs).collect()
    # two distinct texts, each duplicated 6x
    assert sorted(g["dup_count"] for g in groups) == [6, 6]


def test_jsonl_write_read_roundtrip(spark, tmp_path):
    """write_jsonl_docs → read_jsonl_docs is lossless for the documents
    contract, including non-ASCII text, across gzip part files."""
    from pcap_converter_spark.sources.jsonl import write_jsonl_docs

    rows = [
        (1, "https://j.org/a", "plain body"),
        (2, "https://j.org/b", "café — naïve 中文 body"),
        (3, None, "no url"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    out = str(tmp_path / "export")
    write_jsonl_docs(df, out)
    import glob

    assert glob.glob(out + "/part-*.json.gz")  # gzip part files
    back = read_jsonl_docs(spark, out + "/part-*.json.gz", id_field="doc_id")
    key = lambda p: (p[0] or "", p[1])  # noqa: E731 — None url sorts first
    got = sorted(((r["url"], r["text"]) for r in back.collect()), key=key)
    assert got == sorted(((u, t) for _, u, t in rows), key=key)
    assert all(r["errors"] == 0 for r in back.collect())
