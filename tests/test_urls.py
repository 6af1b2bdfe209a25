"""URL normalization (functions/urls.py): canonicalization spec cases and
URL-level dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from pcap_converter_spark.functions import urls as U

CASES = [
    # (input, canonical)
    ("https://example.com/a/b", "https://example.com/a/b"),
    ("HTTPS://Example.COM/a/b", "https://example.com/a/b"),
    ("https://user:pw@example.com/a", "https://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com//a///b//", "https://example.com/a/b"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/p?b=2&a=1", "https://example.com/p?a=1&b=2"),
    ("https://example.com/p?utm_source=x&a=1&fbclid=z", "https://example.com/p?a=1"),
    ("https://example.com/p?utm_source=x", "https://example.com/p"),
    ("https://example.com/p#frag", "https://example.com/p"),
    ("https://example.com/p?a=1#frag", "https://example.com/p?a=1"),
    ("  https://example.com/p  ", "https://example.com/p"),
    ("no-scheme/relative/path", "no-scheme/relative/path"),
]


def test_canonical_url_spec_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], ["i", "u"])
    got = {
        r["i"]: r["c"]
        for r in df.select("i", U.canonical_url(F.col("u")).alias("c")).collect()
    }
    for i, (inp, want) in enumerate(CASES):
        assert got[i] == want, (inp, got[i], want)


def test_url_host_and_domain(spark):
    df = spark.createDataFrame(
        [("https://User@a.B.Example.com:8443/x?q=1",), ("plain",)], ["u"]
    )
    rows = df.select(
        U.url_host(F.col("u")).alias("h"), U.url_domain(F.col("u")).alias("d")
    ).collect()
    assert rows[0]["h"] == "a.b.example.com"
    assert rows[0]["d"] == "example.com"
    assert rows[1]["h"] == "" and rows[1]["d"] == ""


def test_dedup_by_url_collapses_variants(spark):
    rows = [
        (1, "https://example.com/page?b=2&a=1"),
        (2, "HTTPS://EXAMPLE.com:443//page/?a=1&b=2&utm_source=tw"),
        (3, "https://example.com/page#section"),
        (4, "https://example.com/other"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = {r["doc_id"]: (r["canonical_url"], r["keep_url"])
           for r in U.dedup_by_url(df).collect()}
    # 1 and 2 share a canonical key (query canon), 3 differs (no params)
    assert out[1][0] == out[2][0] == "https://example.com/page?a=1&b=2"
    assert out[3][0] == "https://example.com/page"
    assert out[1][1] is True and out[2][1] is False
    assert out[3][1] is True and out[4][1] is True


def test_cap_per_domain(spark):
    rows = [(i, f"https://sub{i % 2}.big.org/p/{i}") for i in range(10)]
    rows += [(100 + i, f"https://small{i}.net/") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = U.cap_per_domain(df, cap=4)
    kept = {r["doc_id"] for r in out.filter("keep_domain_cap").collect()}
    # big.org (both subdomains) capped to its 4 lowest ids
    assert kept == {0, 1, 2, 3, 100, 101, 102}
    doms = {r["doc_id"]: r["domain"] for r in out.collect()}
    assert doms[0] == "big.org" and doms[100] == "small0.net"
    # layout-invariant: same keeps after a repartition
    kept2 = {r["doc_id"]
             for r in U.cap_per_domain(df.repartition(7), cap=4)
             .filter("keep_domain_cap").collect()}
    assert kept2 == kept
