"""BPE tokenizer training: the Sennrich merge loop against the paper's
worked example, determinism/tie-break pins, the distributed corpus pass
vs a Python Counter, and the Arrow-batched encoder vs the scalar spec."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from pcap_converter_spark.operators import bpe


def test_merge_loop_matches_sennrich_example():
    """The worked example from the BPE paper (low/lower/newest/widest
    with counts 5/2/6/3): the first merges must be (e,s), (es,t),
    (est,</w>), then l+o from 'low'/'lower'."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe(None, n_merges=4, word_counts=wc)
    assert merges == [
        ("e", "s"),       # 9 occurrences (newest + widest)
        ("es", "t"),      # 9
        ("est", "</w>"),  # 9
        ("l", "o"),       # 7 (low + lower)
    ]


def test_tie_break_is_lexicographic():
    """Equal-count pairs merge in (pair ASC) order — pinned so two
    engines (or two runs) learn identical tokenizers."""
    # "ab" and "cd" both occur exactly twice, no other repeated pair
    wc = [("ab", 2), ("cd", 2)]
    merges = bpe.train_bpe(None, n_merges=2, word_counts=wc)
    # counts: (a,b)=2, (b,</w>)=2, (c,d)=2, (d,</w>)=2 → lexicographic
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", "</w>")


def test_stops_when_no_pair_repeats():
    wc = [("xy", 1)]  # every pair occurs once
    assert bpe.train_bpe(None, n_merges=10, word_counts=wc) == []


def test_detailed_counts_match_sennrich_example():
    """train_bpe_detailed returns each round's winning weighted pair
    count (what the 'bpe_train' driver rows hash); the pairs must equal
    train_bpe's and the counts the paper's worked arithmetic."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    detail = bpe.train_bpe_detailed(wc, n_merges=4)
    assert [(a, b) for a, b, _ in detail] == bpe.train_bpe(
        None, n_merges=4, word_counts=wc
    )
    assert [c for _, _, c in detail] == [9, 9, 9, 7]


def test_word_frequencies_matches_counter(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "The   cat\tran"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dict(bpe.word_frequencies(df, max_words=100))
    exp = Counter(
        w for _, t in rows for w in t.lower().split() if w
    )
    assert got == dict(exp)
    # the max_words cap keeps (count DESC, word ASC) order
    assert bpe.word_frequencies(df, max_words=2) == [("the", 3), ("cat", 2)]


def test_encode_matches_scalar_spec_and_round_trips(spark):
    corpus = [
        (i, " ".join(["lowest", "newer", "wider", "low"][: 1 + i % 4]))
        for i in range(40)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = bpe.train_bpe(df, n_merges=12, max_words=1000)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out = {
        r["doc_id"]: list(r["toks"])
        for r in df.select(
            "doc_id", bpe.encode_bpe(F.col("text"), merges).alias("toks")
        ).collect()
    }
    for doc_id, text in corpus:
        exp = []
        for w in text.lower().split():
            exp.extend(bpe.segment_word(w, ranks))
        assert out[doc_id] == exp, doc_id
        # lossless: concatenating symbols reproduces the words
        joined = "".join(exp).replace(bpe.END, " ").strip()
        assert joined == " ".join(text.lower().split())


def test_training_on_dataframe_equals_word_counts_path(spark):
    rows = [(i, "banana bandana ban") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via_df = bpe.train_bpe(df, n_merges=6)
    via_wc = bpe.train_bpe(
        None, n_merges=6, word_counts=bpe.word_frequencies(df)
    )
    assert via_df == via_wc


def test_fuzz_bpe_roundtrip_and_determinism():
    """Property (no Spark needed — the merge loop and encoder are pure):
    for random word-count tables, training is deterministic, encoding any
    word is lossless (symbols concatenate back to word + END), and every
    learned merge concatenates two symbols that co-occurred."""
    import random

    rng = random.Random(13)
    alphabet = "abcde"
    for _ in range(25):
        wc = [
            (
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))),
                rng.randint(1, 20),
            )
            for _ in range(rng.randint(1, 30))
        ]
        m1 = bpe.train_bpe(None, n_merges=15, word_counts=wc)
        m2 = bpe.train_bpe(None, n_merges=15, word_counts=list(wc))
        assert m1 == m2  # deterministic
        ranks = {tuple(p): i for i, p in enumerate(m1)}
        for w, _ in wc:
            syms = bpe.segment_word(w, ranks)
            assert "".join(syms) == w + bpe.END  # lossless
        # greedy property: rank-0 merge is fully applied — its pair can
        # never remain adjacent in any segmentation
        if m1:
            a, b = m1[0]
            for w, _ in wc:
                syms = bpe.segment_word(w, ranks)
                assert (a, b) not in list(zip(syms, syms[1:])), (w, syms)


def test_sequential_replay_equals_rank_greedy():
    """The driver oracle replays BPE segmentation as a sequential replace
    chain (each merge applied left-to-right in TRAINING order over
    marker-wrapped symbols) — pin that this equals the rank-greedy
    ``segment_word`` encoder for merges learned in that order, which is
    what makes the ex_text_all 'bpe_seg' hash comparison meaningful."""
    import random

    B, E = "␂", "␃"

    def wrap(s: str) -> str:
        return B + s + E

    def seq_replay(word: str, merges) -> list[str]:
        s = "".join(wrap(c) for c in word) + wrap(bpe.END)
        for a, b in merges:
            s = s.replace(wrap(a) + wrap(b), wrap(a + b))
        return s[1:-1].split(E + B)

    rng = random.Random(11)
    alpha = "abcdef"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        for _ in range(3000)
    ]
    counts = Counter(words)
    merges = bpe.train_bpe(
        None,
        n_merges=50,
        word_counts=sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])),
    )
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in set(words):
        assert seq_replay(w, merges) == bpe.segment_word(w, ranks), w
