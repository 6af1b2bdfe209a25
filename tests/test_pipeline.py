"""End-to-end curation pipeline: each stage of curate() must drop exactly
the documents designed to trip it, with funnel-semantics flags (a doc
dropped at stage k has NULL flags for stages > k)."""

from __future__ import annotations

import pytest

from pcap_converter_spark.operators.pipeline import curate

BASE = (
    "the quick brown fox jumps over the lazy dog and runs with great "
    "speed through the forest and fields today"
)

DOCS = [
    (0, BASE + " alpha beta gamma delta"),          # keeper
    (1, BASE + " alpha beta gamma delta"),          # exact dup of 0
    (2, BASE + " alpha beta gamma epsilon"),        # near dup of 0
    (3, "tiny doc"),                                # quality: too short
    (4, "a calm night settled over the harbor and the small boats "
        "rocked gently while the old keeper watched the light turn"),
    (5, "the friendly guard spoke zeta eta theta iota kappa words and "
        "the crowd listened with care every day for many hours"),  # decon hit
]

BENCH = [(100, "zeta eta theta iota kappa lambda special sequence marker")]


@pytest.fixture(scope="module")
def curated(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in curate(docs, bench).collect()}
    assert len(rows) == len(DOCS)
    return rows


def test_curate_funnel_flags(curated):
    r = curated
    assert r[3]["keep_quality"] is False
    assert r[3]["keep_exact"] is None          # never reached stage 2
    assert r[1]["keep_quality"] and r[1]["keep_exact"] is False
    assert r[1]["keep_neardup"] is None
    assert r[2]["keep_exact"] and r[2]["keep_neardup"] is False
    assert r[5]["keep_neardup"] and r[5]["keep_decon"] is False
    assert {d for d, row in r.items() if row["kept"]} == {0, 4}


def test_curate_packs_only_survivors(curated):
    for d, row in curated.items():
        if row["kept"]:
            assert row["pack_shard"] is not None
            assert row["pack_bin"] is not None and row["pack_offset"] is not None
        else:
            assert row["pack_shard"] is None


def test_curate_without_benchmark(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in curate(docs).collect()}
    # no decontamination stage: doc 5 survives, decon flag is all-true
    assert rows[5]["kept"] is True
    assert {d for d, row in rows.items() if row["kept"]} == {0, 4, 5}
