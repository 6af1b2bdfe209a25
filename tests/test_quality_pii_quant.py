"""Tests for the Gopher-style quality operators, PII detect/redact, passage
dedup, and int8-quantized similarity — each against an independent pure-
Python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pcap_converter_spark.functions import text as TX
from pcap_converter_spark.operators import dedup, quality, similarity


# ---------------------------------------------------------------------------
# repetition / quality
# ---------------------------------------------------------------------------

DOCS = [
    (0, "the cat sat on the mat the cat sat again"),
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "spam spam spam spam spam spam"),
    (3, ""),
    (4, "one"),
]


def _py_rep(text: str, n: int = 2):
    ws = [w for w in text.lower().split() if w]
    if len(ws) < n:
        grams = [" ".join(ws)]
    else:
        grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    total = len(grams)
    distinct = len(set(grams))
    top = max(grams.count(g) for g in set(grams))
    return round(1.0 - distinct / total, 4), round(top / total, 4)


def test_repetition_stats_matches_python(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dup_ngram_frac"], r["top_ngram_frac"])
        for r in quality.repetition_stats(df).collect()
    }
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        assert got[doc_id] == pytest.approx(_py_rep(text)), (doc_id, text)


def test_repetition_stats_per_row_edges(spark):
    """The r16 shuffle-free rewrite (array_sort + fold instead of
    explode → two grouped shuffles) must keep the exact old contract on
    the rows the fold's accumulator could plausibly mishandle: a doc
    whose ONLY gram is the empty string (empty / NULL text — the
    token_ngrams short-doc contract wraps zero words as one '' gram,
    which collides with the fold's '' sentinel), a doc that is one
    repeated gram (run spans the whole array), and a doc whose top run
    sits at the END of the sorted array (the final accumulator state is
    the answer)."""
    rows = [
        (0, ""),            # one '' gram: (0.0, 1.0)
        (1, None),          # NULL text == empty text here
        (2, "go go go go"), # all grams equal: run == len
        (3, "a b z z z"),   # top run last in sorted order
        (4, "one"),         # short doc: whole text is the single gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dup_ngram_frac"], r["top_ngram_frac"])
        for r in quality.repetition_stats(df).collect()
    }
    assert set(got) == {d for d, _ in rows}
    for doc_id, text in rows:
        assert got[doc_id] == pytest.approx(_py_rep(text or "")), (
            doc_id, text,
        )
    # and the plan is genuinely shuffle-free: no Exchange anywhere
    plan = quality.repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_mean_word_len(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["m"]
        for r in df.select(
            "doc_id", quality.mean_word_len(F.col("text")).alias("m")
        ).collect()
    }
    for doc_id, text in DOCS:
        ws = [w for w in text.split() if w]
        exp = sum(len(w) for w in ws) / len(ws) if ws else 0.0
        assert got[doc_id] == pytest.approx(exp)


def test_gopher_keep_rules(spark):
    # 25 natural-ish words with stopwords, low punctuation → keep
    good = "the quick brown fox jumps over the lazy dog and then runs far " \
           "away into the green field while the sun sets over the hills"
    # heavy repetition → drop
    bad_rep = "buy now " * 40
    # too short → drop
    bad_short = "the cat"
    df = spark.createDataFrame(
        [(0, good), (1, bad_rep.strip()), (2, bad_short)], ["doc_id", "text"]
    )
    rep = quality.repetition_stats(df)
    out = {
        r["doc_id"]: r["keep"]
        for r in df.join(rep, "doc_id")
        .select(
            "doc_id",
            quality.gopher_keep(
                TX.token_count(F.col("text")),
                quality.mean_word_len(F.col("text")),
                TX.punct_ratio(F.col("text")),
                F.size(
                    F.filter(
                        TX.words(F.lower(F.col("text"))),
                        lambda w: w.isin(*TX.LANG_STOPWORDS["en"]),
                    )
                ),
                F.col("dup_ngram_frac"),
            ).alias("keep"),
        )
        .collect()
    }
    assert out == {0: True, 1: False, 2: False}


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

def test_pii_counts_and_redaction(spark):
    rows = [
        (0, "mail me at a.b+c@ex-1.org or root@sub.domain.co today"),
        (1, "server 10.0.300.7 then 192.168.1.1 and not 1.2.3"),
        (2, "call +1-555-0142 or +49-123-4567 now"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = df.select(
        "i",
        TX.pii_count(F.col("t"), TX.PII_EMAIL_RE).alias("e"),
        TX.pii_count(F.col("t"), TX.PII_IPV4_RE).alias("ip"),
        TX.pii_count(F.col("t"), TX.PII_PHONE_RE).alias("ph"),
        TX.pii_redact(F.col("t")).alias("red"),
    ).collect()
    by_i = {r["i"]: r for r in got}
    assert (by_i[0]["e"], by_i[0]["ip"], by_i[0]["ph"]) == (2, 0, 0)
    # 10.0.300.7 still matches \d{1,3} groups (300 → '300' is 3 digits)
    assert (by_i[1]["e"], by_i[1]["ip"], by_i[1]["ph"]) == (0, 2, 0)
    assert (by_i[2]["e"], by_i[2]["ip"], by_i[2]["ph"]) == (0, 0, 2)
    assert (by_i[3]["e"], by_i[3]["ip"], by_i[3]["ph"]) == (0, 0, 0)
    assert by_i[0]["red"] == "mail me at <EMAIL> or <EMAIL> today"
    assert by_i[2]["red"] == "call <PHONE> or <PHONE> now"
    assert by_i[3]["red"] == rows[3][1]


# ---------------------------------------------------------------------------
# passage dedup
# ---------------------------------------------------------------------------

def test_passage_duplicates(spark):
    shared = "lorem ipsum dolor sit"  # one full 4-word passage
    rows = [
        (0, shared + " unique tail zero aa"),
        (1, shared + " other words here bb"),
        (2, "completely different content four"),
        (3, shared + " " + shared),  # shared passage twice in ONE doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.passage_duplicates(df, passage_words=4).collect()
    assert len(out) == 1
    grp = out[0]
    assert grp["dup_count"] == 4
    assert grp["doc_ids"] == [0, 1, 3, 3]


def test_passage_empty_and_short_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "one two"), (2, "one two")], ["doc_id", "text"]
    )
    out = dedup.passage_duplicates(df, passage_words=4).collect()
    assert len(out) == 1  # "one two" == "one two"; empties don't group with it
    assert out[0]["doc_ids"] == [1, 2]


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------

def _py_quant(v):
    amax = max(abs(float(x)) for x in v) if v else 0.0
    if amax == 0.0:
        return [0] * len(v)
    s = amax / 127.0
    return [int(math.trunc(float(x) / s)) for x in v]


def test_quantize_int8_matches_python(spark):
    vecs = [
        (0, [1.0, -2.5, 0.25, 127.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [-0.003, 0.001, 0.002, -0.0005]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    _, qvec = similarity.quantize_int8(F.col("embedding"))
    got = {r["vec_id"]: r["q"] for r in df.select("vec_id", qvec.alias("q")).collect()}
    for vid, v in vecs:
        assert got[vid] == _py_quant(v), (vid, v)
        assert all(-127 <= x <= 127 for x in got[vid])


def test_quantized_topk_close_to_exact(spark, sf_dir):
    from pcap_converter_spark.io.loader import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in row[0]]
    exact = {
        r["vec_id"]: r["cos_sim"]
        for r in similarity.cosine_topk(emb, qv, k=10).collect()
    }
    quant = {
        r["vec_id"]: r["cos_sim"]
        for r in similarity.quantized_topk(emb, qv, k=10).collect()
    }
    # int8 quantization error on cosine is < ~1e-2 at dim 64
    overlap = set(exact) & set(quant)
    assert len(overlap) >= 7
    for vid in overlap:
        assert abs(exact[vid] - quant[vid]) < 0.02


# ---------------------------------------------------------------------------
# packing + vocab
# ---------------------------------------------------------------------------

def test_pack_documents(spark):
    from pcap_converter_spark.operators.packing import pack_documents

    rows = [(i, 100) for i in range(10)]  # 100 tokens each
    df = spark.createDataFrame(rows, ["doc_id", "nt"])
    out = {
        r["doc_id"]: (r["pack_shard"], r["pack_bin"], r["pack_offset"])
        for r in pack_documents(df, "nt", budget=256, n_shards=2).collect()
    }
    # shard 0 = docs 0,2,4,6,8; running starts 0,100,200,300,400
    assert out[0] == (0, 0, 0)
    assert out[2] == (0, 0, 100)
    assert out[4] == (0, 0, 200)
    assert out[6] == (0, 1, 44)   # 300 // 256, 300 % 256
    assert out[8] == (0, 1, 144)
    # shard 1 mirrors
    assert out[1] == (1, 0, 0)
    assert out[9] == (1, 1, 144)


def test_vocab_build_and_encode(spark):
    from pcap_converter_spark.operators.vocab import build_vocab, encode_column

    docs = [
        (0, "b b b a a c"),
        (1, "a a rare"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    vocab = build_vocab(df, size=2)
    # counts: a=4, b=3, c=1, rare=1 → vocab [a→1, b→2]
    assert vocab == [("a", 1), ("b", 2)]
    got = {
        r["doc_id"]: r["ids"]
        for r in df.select(
            "doc_id", encode_column(F.col("text"), vocab).alias("ids")
        ).collect()
    }
    assert got[0] == [2, 2, 2, 1, 1, 0]
    assert got[1] == [1, 1, 0]


def _py_line_rep(text: str, sep: str = "\n"):
    import re

    lines = [ln.strip() for ln in re.split(sep, text)]
    lines = [ln for ln in lines if ln]
    if not lines:
        return None
    from collections import Counter

    c = Counter(lines)
    total, distinct = len(lines), len(c)
    dup_chars = sum(len(ln) * k for ln, k in c.items() if k > 1)
    total_chars = sum(len(ln) * k for ln, k in c.items())
    return (round(1.0 - distinct / total, 4), round(dup_chars / total_chars, 4))


def test_line_repetition_stats_matches_python(spark):
    docs = [
        (1, "unique one\nunique two\nunique three"),
        (2, "nav item\ncontent here\nnav item\nmore content\nnav item"),
        (3, "same\nsame\nsame"),
        (4, "  \n\n   "),  # nothing usable → absent
        (5, "long repeated banner line here\nx\nlong repeated banner line here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dup_line_frac"], r["dup_line_char_frac"])
        for r in quality.line_repetition_stats(df).collect()
    }
    expected = {d: _py_line_rep(t) for d, t in docs if _py_line_rep(t)}
    assert set(got) == set(expected)
    for d in expected:
        assert got[d] == pytest.approx(expected[d]), d
    # the char-weighted signal separates doc 5 (long line repeated) from a
    # count-only view: 2 of 3 occurrences dup, but ~98% of chars dup
    assert got[5][1] > got[5][0]


def test_line_repetition_paragraph_granularity(spark):
    text = "para one is here\n\npara two differs\n\npara one is here"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = quality.line_repetition_stats(df, sep="\n\n").collect()[0]
    assert r["dup_line_frac"] == pytest.approx(round(1 - 2 / 3, 4))


def test_line_repetition_sep_is_literal_not_regex(spark):
    """sep containing regex metacharacters splits on the literal string
    (Pattern.quote), not per-character (ADVICE r5)."""
    df = spark.createDataFrame(
        [(1, "alpha beta|alpha beta|gamma")], ["doc_id", "text"]
    )
    r = quality.line_repetition_stats(df, sep="|").collect()[0]
    # 3 lines, 2 distinct → dup fraction 1/3 (an unquoted '|' regex would
    # split every character apart)
    assert r["dup_line_frac"] == pytest.approx(round(1 - 2 / 3, 4))
    df2 = spark.createDataFrame([(1, "x.y.x")], ["doc_id", "text"])
    r2 = quality.line_repetition_stats(df2, sep=".").collect()[0]
    assert r2["dup_line_frac"] == pytest.approx(round(1 - 2 / 3, 4))


def _py_pack_streams(docs, budget, n_shards, pad_id=0):
    """Python replay: concat per shard in doc_id order, cut every budget,
    pad the tail; spans = (doc, start, end) per bin."""
    out = {}
    shards = {}
    for doc_id, ids in sorted(docs):
        if ids:
            shards.setdefault(doc_id % n_shards, []).append((doc_id, ids))
    for sh, docs_in in shards.items():
        stream, owners = [], []
        for doc_id, ids in docs_in:
            stream.extend(ids)
            owners.extend([doc_id] * len(ids))
        n_bins = (len(stream) + budget - 1) // budget
        for b in range(n_bins):
            chunk = stream[b * budget : (b + 1) * budget]
            own = owners[b * budget : (b + 1) * budget]
            spans = []
            i = 0
            while i < len(own):
                j = i
                while j < len(own) and own[j] == own[i]:
                    j += 1
                spans.append((own[i], i, j))
                i = j
            chunk = chunk + [pad_id] * (budget - len(chunk))
            out[(sh, b)] = (chunk, spans)
    return out


def test_materialize_packed_matches_python_replay(spark):
    """materialize_packed == the sequential concat-and-cut replay: exact
    input_ids (incl. padding) and doc-span boundaries, with documents
    straddling multiple bins."""
    import random

    from pcap_converter_spark.operators.packing import materialize_packed

    rng = random.Random(8)
    docs = [
        (i, [rng.randrange(1, 50) for _ in range(rng.randrange(1, 40))])
        for i in range(30)
    ] + [(100, [7] * 70), (101, [])]  # a 3-bin straddler and an empty doc
    df = spark.createDataFrame(docs, "doc_id long, ids array<int>")
    got = {
        (r["pack_shard"], r["pack_bin"]): (
            list(r["input_ids"]),
            [(s["doc_id"], s["start"], s["end"]) for s in r["doc_spans"]],
        )
        for r in materialize_packed(
            df, "ids", budget=32, n_shards=4
        ).collect()
    }
    exp = _py_pack_streams(docs, budget=32, n_shards=4)
    assert got == exp
    assert all(len(v[0]) == 32 for v in got.values())


def test_materialize_packed_composes_with_vocab(spark):
    from pcap_converter_spark.operators.packing import materialize_packed
    from pcap_converter_spark.operators.vocab import (
        build_vocab,
        encode_column,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "the cat sat on the mat " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    vocab = build_vocab(df, size=5)
    enc = df.select("doc_id", encode_column(F.col("text"), vocab).alias("ids"))
    seqs = materialize_packed(enc, "ids", budget=16, n_shards=2)
    rows = seqs.collect()
    assert rows and all(len(r["input_ids"]) == 16 for r in rows)
    total = sum(
        s["end"] - s["start"] for r in rows for s in r["doc_spans"]
    )
    assert total == sum(6 * (i + 1) for i in range(6))  # every token placed


def test_chunk_table_overlap_and_tiling(spark):
    """chunk_table: stride < size gives overlapping windows covering every
    word; default stride == passage-style tiling."""
    from pcap_converter_spark.operators.dedup import chunk_table

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r["chunk_id"]: r["chunk"]
           for r in chunk_table(df, size_words=4, stride_words=2).collect()}
    # windows start at 0,2,4,6 — ceil((10-4)/2)=3 strides + the first
    assert got == {
        0: "w0 w1 w2 w3", 1: "w2 w3 w4 w5",
        2: "w4 w5 w6 w7", 3: "w6 w7 w8 w9",
    }
    tiled = {r["chunk_id"]: r["chunk"]
             for r in chunk_table(df, size_words=4).collect()}
    assert tiled == {0: "w0 w1 w2 w3", 1: "w4 w5 w6 w7", 2: "w8 w9"}
    # short doc: one (possibly partial) chunk
    short = spark.createDataFrame([(2, "a b")], "doc_id long, text string")
    assert [r["chunk"] for r in
            chunk_table(short, size_words=4, stride_words=2).collect()] == ["a b"]
    # zero-token docs emit NO chunks (ADVICE r5: downstream encoders must
    # never receive an empty-string chunk)
    empty = spark.createDataFrame(
        [(3, ""), (4, "   "), (5, "word")], "doc_id long, text string"
    )
    rows = chunk_table(empty, size_words=4).collect()
    assert [(r["doc_id"], r["chunk"]) for r in rows] == [(5, "word")]


def test_compression_ratio_separates_boilerplate(spark):
    import zlib

    df = spark.createDataFrame(
        [
            (1, "menu home login " * 50),                      # template
            (2, "the quick brown fox jumps over the lazy dog and then "
                "discusses seventeen unrelated topics at length today"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["compression_ratio"]
           for r in quality.compression_ratio(df).collect()}
    assert got[1] < 0.1 < got[2]
    assert got[3] == 0.0
    b = ("menu home login " * 50).encode()
    assert got[1] == round(len(zlib.compress(b, 6)) / len(b), 4)


def _py_bestfit(docs, budget):
    """Python replay of best-fit-decreasing: (residual, bin) kept sorted,
    leftmost residual >= nt wins (smallest residual, then lowest bin)."""
    import bisect

    residuals, n_bins, out = [], 0, {}
    for d, nt in sorted(docs, key=lambda x: (-x[1], x[0])):
        nt_eff = min(nt, budget)
        i = bisect.bisect_left(residuals, (nt_eff, -1))
        if i == len(residuals):
            b, off, res = n_bins, 0, budget - nt_eff
            n_bins += 1
        else:
            r, b = residuals.pop(i)
            off, res = budget - r, r - nt_eff
        if res > 0:
            bisect.insort(residuals, (res, b))
        out[d] = (b, off, nt > budget)
    return out


def test_pack_bestfit_matches_replay_and_invariants(spark):
    """Best-fit-decreasing no-split packing: exact Python replay per
    shard, no document straddles a bin, bins never exceed budget, and
    it uses no more bins than a naive sequential next-fit would."""
    from pcap_converter_spark.operators.packing import pack_documents_bestfit

    rows = [(i, 1 + (i * 37) % 200) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    got = {
        r["doc_id"]: (r["pack_shard"], r["pack_bin"], r["pack_offset"],
                      r["truncated"])
        for r in pack_documents_bestfit(
            df, "n_tokens", budget=256, n_shards=4
        ).collect()
    }
    assert len(got) == 120
    toks = dict(rows)
    for shard in range(4):
        docs = [(d, n) for d, n in rows if d % 4 == shard]
        exp = _py_bestfit(docs, 256)
        for d, n in docs:
            s, b, off, tr = got[d]
            assert s == shard
            assert (b, off, tr) == exp[d], d
    # invariants: within a (shard, bin), occupied ranges are disjoint and
    # the load fits the budget
    from collections import defaultdict

    bins = defaultdict(list)
    for d, (s, b, off, tr) in got.items():
        bins[(s, b)].append((off, off + min(toks[d], 256)))
    for k, spans in bins.items():
        spans.sort()
        assert spans[-1][1] <= 256, k
        for (a1, e1), (a2, _) in zip(spans, spans[1:]):
            assert e1 <= a2, k
    # bin economy: per shard, best-fit-decreasing uses no more bins than
    # a naive sequential (id-order) next-fit replay
    for shard in range(4):
        docs = [(d, min(n, 256)) for d, n in rows if d % 4 == shard]
        nf_bins, load = 1, 0
        for _, n in sorted(docs):
            if load + n > 256:
                nf_bins, load = nf_bins + 1, 0
            load += n
        bf_bins = len({got[d][1] for d, _ in docs})
        assert bf_bins <= nf_bins, shard
    # a doc longer than the budget is flagged and sits alone at offset 0
    big = spark.createDataFrame(
        [(0, 300), (4, 100)], "doc_id long, n_tokens int"
    )
    bg = {
        r["doc_id"]: r
        for r in pack_documents_bestfit(
            big, "n_tokens", budget=256, n_shards=4
        ).collect()
    }
    assert bg[0]["truncated"] and bg[0]["pack_offset"] == 0
    assert not bg[4]["truncated"]


# ---------------------------------------------------------------------------
# C4 line-level page cleaning
# ---------------------------------------------------------------------------

C4_DOCS = [
    # rule 2 (no terminal punct), rule 3 (short), rule 1 (exact repeat)
    (0, "alpha beta gamma delta epsilon one.\n"
        "no terminal punctuation on this line\n"
        "too short!\n"
        "zeta eta theta iota kappa two!\n"
        "lambda mu nu xi omicron three?\n"
        "alpha beta gamma delta epsilon one."),
    # rule 4: javascript boilerplate (terminal punct + enough words)
    (1, "please enable javascript to view this content.\n"
        "first real sentence with plenty of words here.\n"
        "second real sentence with plenty of words here!\n"
        'third real sentence "with a quote ending"'),
    # gate 5a: lorem ipsum anywhere on the page
    (2, "perfectly fine sentence number one right here.\n"
        "perfectly fine sentence number two right here.\n"
        "perfectly fine sentence number three right here.\n"
        "Lorem Ipsum dolor sit amet consectetur adipiscing."),
    # gate 5b: curly brace anywhere on the page
    (3, "perfectly fine sentence number one right here.\n"
        "perfectly fine sentence number two right here.\n"
        "if (broken) { return; }\n"
        "perfectly fine sentence number three right here."),
    # gate 6: only two lines survive the rules
    (4, "only surviving line number one is right here.\n"
        "only surviving line number two is right here.\n"
        "dropped for no punct\nalso dropped"),
    # whitespace trimming feeds both the dedup and the punct test
    (5, "   padded line with five whole words.   \n"
        "padded line with five whole words.\n"
        "second kept line with many words too!\n"
        "third kept line with many words too?"),
    (6, ""),
    # CRLF page: the LINE_WS trim removes the trailing \r, so the
    # terminal-punct rule sees the real last character (plain trim()
    # would empty every Windows-newline page — review-caught)
    (7, "crlf line with five whole words one.\r\n"
        "crlf line with five whole words two.\r\n"
        "crlf line with five whole words three.\r"),
    # tab-padded duplicate of a space-padded line must still dedup
    (8, "\t padded line with five whole words. \t\n"
        "padded line with five whole words.\n"
        "second kept line with many words too!\n"
        "third kept line with many words too?"),
    (9, None),  # NULL text passes through as (NULL, 0)
]


def _py_c4(text: str, min_words: int = 5, min_lines: int = 3):
    # exact-semantics mirror — LINE_WS trim and Java-\s split(limit=-1)
    # word count; the canonical copy lives in tests/test_fuzz_textclean
    # (_py_c4_mirror) and a divergence between the two is itself a bug
    import re

    from pcap_converter_spark.operators.dedup import LINE_WS

    lines = [ln.strip(LINE_WS) for ln in text.split("\n")]
    kept, seen = [], set()
    for ln in lines:
        if ln in seen:
            continue
        seen.add(ln)
        if (
            ln[-1:] in (".", "!", "?", '"')
            and len(re.split("[ \t\x0b\f\r]+", ln)) >= min_words
            and "javascript" not in ln.lower()
        ):
            kept.append(ln)
    gated = (
        len(kept) >= min_lines
        and "lorem ipsum" not in text.lower()
        and "{" not in text
    )
    clean = "\n".join(kept) if gated else ""
    return clean, len(lines) - (len(kept) if gated else 0)


def test_c4_line_clean_matches_python_reference(spark):
    df = spark.createDataFrame(C4_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in quality.c4_line_clean(df).collect()
    }
    assert set(got) == {d for d, _ in C4_DOCS}
    for doc_id, text in C4_DOCS:
        if text is None:
            assert got[doc_id] == (None, 0), f"doc {doc_id}"
        else:
            assert got[doc_id] == _py_c4(text), f"doc {doc_id}"
    # rule-by-rule spot pins (so a regression names its rule):
    assert got[0][0].count("alpha beta") == 1          # keep-first dedup
    assert "javascript" not in got[1][0]               # rule 4
    assert got[1][0].endswith('"')                     # quote terminal kept
    assert got[2] == ("", 4) and got[3] == ("", 4)     # page gates
    assert got[4] == ("", 4)                           # min_lines gate
    assert got[5][0].startswith("padded line")         # trimmed + deduped
    assert got[6] == ("", 1)                           # empty page
    assert got[7][0].count("crlf line") == 3           # CRLF trimmed
    assert "\r" not in got[7][0]
    assert got[8][0].startswith("padded line")         # tab-pad deduped
    assert got[8][1] == 1


def test_c4_line_clean_is_shuffle_free(spark):
    df = spark.createDataFrame(C4_DOCS, ["doc_id", "text"])
    plan = quality.c4_line_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
