"""Unigram LM perplexity filter (operators/lm.py): natural text must score
lower log-perplexity than gibberish under a model trained on natural
reference text; scoring matches an exact Python reference."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pcap_converter_spark.operators.lm import perplexity_score, unigram_model

REF = [
    (i, "the quick brown fox jumps over the lazy dog and the cat sleeps")
    for i in range(20)
] + [
    (100 + i, "a small model of natural text is enough for a ranking test")
    for i in range(20)
]


def test_perplexity_ranks_natural_below_gibberish(spark):
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    model = unigram_model(ref, vocab_size=1000)
    targets = spark.createDataFrame(
        [
            (1, "the quick cat sleeps over the lazy dog"),
            (2, "zxqv wklp fjord qqback vexing glyphs zzz"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["log_ppl"]
           for r in perplexity_score(targets, model).collect()}
    assert got[1] < got[2]  # natural text scores lower log-perplexity
    assert got[2] > 5.0  # OOV floor genuinely penalizes


def test_perplexity_matches_python_reference(spark):
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    model = unigram_model(ref, vocab_size=5)  # tiny vocab: exercises OOV
    rows = {r["term"]: r["logp"] for r in model.collect()}
    # python twin: counts over the reference, top-5 by (n desc, term)
    from collections import Counter

    c = Counter(w for _, t in REF for w in t.lower().split())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    total = sum(n for _, n in top)
    denom = total + 5 + 1
    for term, n in top:
        assert math.isclose(rows[term], math.log((n + 1) / denom), rel_tol=1e-12)
    assert math.isclose(rows[None], math.log(1.0 / denom), rel_tol=1e-12)

    text = "the quick unknownword fox"
    target = spark.createDataFrame([(9, text)], ["doc_id", "text"])
    got = perplexity_score(target, model).collect()[0]
    logp = {t: rows[t] for t, _ in top}
    expect = -sum(logp.get(w, rows[None]) for w in text.split()) / 4
    assert math.isclose(got["log_ppl"], expect, rel_tol=1e-12)
    assert got["n_tokens"] == 4


def test_perplexity_filter_composes_with_curation(spark):
    """The CCNet move: keep the low-perplexity head of a mixed corpus."""
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    model = unigram_model(ref, vocab_size=1000)
    mixed = spark.createDataFrame(
        [(i, "the quick brown fox and the lazy dog") for i in range(10)]
        + [(50 + i, "qqzv xkcd wvut glorp zzyx mmbr hhfw qpzt") for i in range(10)],
        ["doc_id", "text"],
    )
    scored = perplexity_score(mixed, model)
    thresh = scored.approxQuantile("log_ppl", [0.5], 0.0)[0]
    kept = scored.filter(F.col("log_ppl") <= thresh)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == set(range(10))  # exactly the natural half survives


def test_bigram_perplexity_matches_python_reference(spark):
    """Interpolated-bigram scoring == an exact Python replay (counts, MLE
    conditionals, budget cut, OOV floor, λ-mix)."""
    from collections import Counter

    from pcap_converter_spark.operators.lm import (
        bigram_model,
        bigram_perplexity,
    )

    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    uni, bi = bigram_model(ref, vocab_size=5, bigram_size=8)
    targets = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "dog lazy the over jumps fox brown quick the"),  # reversed
            (3, "zz"),  # single token → no transitions → absent
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["log_ppl"], r["n_trans"])
           for r in bigram_perplexity(targets, uni, bi, lam=0.7).collect()}

    # python twin
    c1 = Counter(w for _, t in REF for w in t.lower().split())
    top = sorted(c1.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    total = sum(n for _, n in top)
    denom = total + 5 + 1
    p_uni = {t: (n + 1) / denom for t, n in top}
    oov = 1.0 / denom
    pairs = Counter()
    ctx = Counter()
    for _, t in REF:
        ws = t.lower().split()
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] += 1
            ctx[a] += 1
    top_pairs = sorted(
        pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:8]
    p_bi = {p: n / ctx[p[0]] for p, n in top_pairs}

    def py_score(text):
        ws = text.lower().split()
        lps = []
        for a, b in zip(ws, ws[1:]):
            p = 0.7 * p_bi.get((a, b), 0.0) + 0.3 * p_uni.get(b, oov)
            lps.append(math.log(p))
        return (-sum(lps) / len(lps), len(lps)) if lps else None

    for d, text in [(1, "the quick brown fox jumps over the lazy dog"),
                    (2, "dog lazy the over jumps fox brown quick the")]:
        exp = py_score(text)
        assert got[d][1] == exp[1]
        assert math.isclose(got[d][0], exp[0], rel_tol=1e-9), d
    assert 3 not in got  # no transitions → no row
    # in-order text must beat its reversal under a bigram model even
    # though both have identical unigram stats
    assert got[1][0] < got[2][0]


def test_perplexity_buckets_head_middle_tail(spark):
    """Exact-quantile buckets on a known score spread: lowest third →
    head, highest → tail; NULL scores bucket NULL; >2 cuts name q0..qN."""
    from pcap_converter_spark.operators.lm import perplexity_buckets

    rows = [(i, float(i)) for i in range(1, 10)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, log_ppl double")
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(df, relative_error=0.0).collect()
    }
    assert got[1] == got[2] == got[3] == "head"
    assert got[5] == "middle"
    assert got[8] == got[9] == "tail"
    assert got[99] is None
    q4 = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(
            df, cuts=(0.25, 0.5, 0.75), relative_error=0.0
        ).collect()
    }
    assert q4[1] == "q0" and q4[9] == "q3" and q4[99] is None


def test_perplexity_buckets_exact_rank_cuts_and_empty_frame(spark):
    """relative_error=0: cuts are the elements at rank ceil(p*n) —
    selection, not interpolation (review: percentile_cont drifted 1 ulp
    across engines on ties) — and an empty frame degrades like the
    sketch path instead of crashing."""
    from pyspark.sql import functions as F

    from pcap_converter_spark.operators.lm import perplexity_buckets

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 1, 3, 2, 4, 3])],
        ["doc_id", "log_ppl"],
    )
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(df, relative_error=0.0).collect()
    }
    # sorted scores [1,2,3,3,4,5], n=6: c1 = rank ceil(6/3)=2 -> 2.0,
    # c2 = rank ceil(12/3)=4 -> 3.0
    assert got == {1: "head", 3: "head", 2: "middle", 5: "middle",
                   0: "tail", 4: "tail"}
    empty = spark.createDataFrame([], "doc_id long, log_ppl double")
    assert perplexity_buckets(empty, relative_error=0.0).count() == 0
    nulls = spark.createDataFrame([(0, None)], "doc_id long, log_ppl double")
    row = perplexity_buckets(nulls, relative_error=0.0).collect()[0]
    assert row["ppl_bucket"] is None  # NULL scores bucket as NULL
