"""Link-graph operators (operators/graph.py): edge extraction from
outlink metadata and distributed PageRank vs an exact NumPy replay."""

from __future__ import annotations

import numpy as np
import pytest

from pcap_converter_spark.operators.graph import link_edges, pagerank


def _np_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in edges:
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        c = np.zeros(n)
        for a, b in edges:
            c[idx[b]] += r[idx[a]] / out[idx[a]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (c + dangling / n)
    return {u: r[idx[u]] for u in nodes}


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),            # d links in, nothing links to d
    ("e", "a"),            # e is dangling-adjacent
    ("c", "f"),            # f has NO outlinks → dangling node
]


def test_pagerank_matches_numpy_replay(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    handles = []
    got = {r["node"]: r["rank"]
           for r in pagerank(e, iters=12, handles=handles).collect()}
    exp = _np_pagerank(EDGES, iters=12)
    assert set(got) == set(exp)
    for u in exp:
        assert got[u] == pytest.approx(exp[u], rel=1e-9), u
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    # authority ordering: c (3 in-links incl. from the hub) outranks d
    assert got["c"] > got["d"]
    for h in handles:
        h.unpersist()


def test_link_edges_canonicalizes_and_dedups(spark):
    rows = [
        ("https://a.org/x", ["https://B.org/p#frag", "https://b.org/p",
                             "https://a.org/x", "", None]),
        ("https://c.org/", ["https://a.org/x?utm_source=z"]),
    ]
    df = spark.createDataFrame(rows, "url string, links array<string>")
    got = sorted(map(tuple, link_edges(df).collect()))
    assert got == [
        ("https://a.org/x", "https://b.org/p"),
        ("https://c.org/", "https://a.org/x"),
    ]


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank(e, iters=3).count() == 0


def test_wat_to_pagerank_composes(spark, tmp_path):
    """WAT metadata records → typed links → edges → ranks, end to end."""
    import json

    from fixtures import warcgen as wg
    from pcap_converter_spark.sources.warc import read_warc, wat_metadata

    recs = [wg.record("warcinfo", b"software: wat\r\n")]
    pages = {
        "https://h.org/hub": ["https://h.org/a", "https://h.org/b"],
        "https://h.org/a": ["https://h.org/b"],
        "https://h.org/b": ["https://h.org/hub"],
    }
    for i, (u, links) in enumerate(pages.items()):
        recs.append(wg.record(
            "metadata", json.dumps({"links": links}).encode(), uri=u,
            rec_id=f"<urn:uuid:w{i}>", content_type="application/json",
        ))
    p = str(tmp_path / "links.wat.gz")
    wg.write_warc(p, recs, gzipped=True)
    meta = wat_metadata(read_warc(spark, p), schema="links array<string>")
    edges = link_edges(meta.select("url", "meta.links"))
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=8).collect()}
    exp = _np_pagerank(
        [(u, v) for u, ls in pages.items() for v in ls], iters=8
    )
    for u in exp:
        assert ranks[u] == pytest.approx(exp[u], rel=1e-9)
