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


def test_curation_report_matches_flags(spark):
    from pcap_converter_spark.operators.pipeline import curation_report

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    flags = curate(docs, bench)
    rep = {r["stage"]: r for r in curation_report(flags).collect()}
    assert set(rep) == {"quality", "exact", "neardup", "decon", "kept"}
    # fixture funnel: 6 in -> 5 pass quality -> 4 pass exact -> 3 pass
    # near-dup -> 2 pass decon
    assert (rep["quality"]["n_entered"], rep["quality"]["n_kept"]) == (6, 5)
    assert (rep["exact"]["n_entered"], rep["exact"]["n_kept"]) == (5, 4)
    assert (rep["neardup"]["n_entered"], rep["neardup"]["n_kept"]) == (4, 3)
    assert (rep["decon"]["n_entered"], rep["decon"]["n_kept"]) == (3, 2)
    assert (rep["kept"]["n_entered"], rep["kept"]["n_kept"]) == (2, 2)
    for r in rep.values():
        assert r["n_dropped"] == r["n_entered"] - r["n_kept"]


def test_write_kept_materializes_pack_layout(spark, tmp_path):
    from pcap_converter_spark.operators.pipeline import write_kept

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    flags = curate(docs, bench)
    out = str(tmp_path / "kept")
    back = write_kept(flags, docs, out)
    rows = {r["doc_id"]: r for r in back.collect()}
    assert set(rows) == {0, 4}  # exactly the kept docs, with their text
    assert all(r["text"] for r in rows.values())
    # directory layout IS the shard assignment
    import os

    shards = sorted(
        d for d in os.listdir(out) if d.startswith("pack_shard=")
    )
    assert shards, "expected pack_shard=N partition directories"
    assert {f"pack_shard={r['pack_shard']}" for r in rows.values()} == set(
        shards
    )


def test_curate_funnel_invariants_random_corpus(spark):
    """Structural invariants of the funnel on a seeded random corpus
    (beyond the hand-built fixture): flag nullability follows the funnel
    (a stage's flag is non-NULL exactly when the doc reached that stage),
    kept == conjunction of all four, pack positions exist exactly for
    kept docs, and within each shard the (bin, offset) sequence is the
    running token sum in doc_id order."""
    import random

    rng = random.Random(47)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(80):
        if i % 11 == 3:
            text = "tiny"  # quality drop
        elif i % 13 == 5 and docs:
            text = docs[-1][1]  # exact dup of predecessor
        else:
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(25, 60)))
        docs.append((i, text))
    bench = [(1000, docs[7][1])]  # benchmark shares doc 7's grams
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    bdf = spark.createDataFrame(bench, ["doc_id", "text"])
    rows = {r["doc_id"]: r.asDict() for r in curate(df, bdf).collect()}
    assert set(rows) == {i for i, _ in docs}

    chain = ["keep_quality", "keep_exact", "keep_neardup", "keep_decon"]
    for r in rows.values():
        # funnel nullability: flag k+1 is present iff flag k is True
        for up, down in zip(chain, chain[1:]):
            if r[up] is True:
                assert r[down] is not None, r
            else:
                assert r[down] is None, r
        assert r["kept"] == all(r[c] is True for c in chain)
        for c in ("pack_shard", "pack_bin", "pack_offset"):
            assert (r[c] is not None) == r["kept"], r

    # pack layout: running token sums per shard in doc_id order
    kept = sorted(
        (d for d, r in rows.items() if r["kept"]),
    )
    ntok = {d: len(t.split()) for d, t in docs}
    starts: dict = {}
    for d in kept:
        r = rows[d]
        sh = r["pack_shard"]
        expect = starts.get(sh, 0)
        assert r["pack_bin"] * 256 + r["pack_offset"] == expect, (d, r)
        starts[sh] = expect + ntok[d]
