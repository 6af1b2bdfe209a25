"""Byte-pair-encoding tokenizer TRAINING on a corpus — the step between
"count a vocabulary" (vocab.py) and "pack token ids" (packing.py) that an
LLM data pipeline runs once per tokenizer revision.

The algorithm (Sennrich et al. 2016, arXiv:1508.07909 — the public BPE
formulation every modern tokenizer descends from) splits into two parts
with very different scale shapes, and the implementation keeps them
separate on purpose:

- **Corpus pass** (``word_frequencies``): ONE distributed aggregation —
  token explosion → (word, count) — optionally budget-capped to the
  ``max_words`` most frequent words (ties by word; the standard practice:
  the pair statistics of the long tail are noise, and the cap makes the
  table a bounded artifact like a vocabulary or IVF centroids). This is
  the only part that touches the 100 TB corpus, and it is the same
  map-side-combining count every other corpus-text operator uses.
- **Merge loop** (``train_bpe``): iterates over the BOUNDED
  word-frequency table driver-side. Each round counts adjacent symbol
  pairs weighted by word count, merges the most frequent pair
  (deterministic tie-break: highest count, then lexicographically
  smallest pair) into every word, and records it. O(n_merges · Σ|word|)
  over ≤ max_words entries — milliseconds-to-seconds at any corpus size,
  because the corpus size stopped mattering after the aggregation.
  (Production trainers update pair counts incrementally instead of
  recounting; the recount keeps this implementation an executable spec —
  the shapes that matter at scale are the corpus pass and the encode.)

- **Encode** (``encode_bpe``): applies the learned merges to a text
  column as an Arrow-batched pandas UDF — per-word BPE segmentation is
  an inherently sequential rank-greedy loop (the documented
  Python-exception category), but it is a pure projection (no join, no
  shuffle) and an LRU cache per worker collapses the Zipf-distributed
  word stream to one segmentation per distinct word per batch stream.
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401 — resolves pandas_udf type hints

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints at runtime
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pcap_converter_spark.functions.text import words

END = "</w>"  # end-of-word marker so merges never cross word boundaries


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 100_000,
    tf: DataFrame | None = None,
) -> list[tuple[str, int]]:
    """The bounded (word, count) table BPE trains on: top-``max_words``
    lowercased whitespace words by (count DESC, word ASC). Pass a
    precomputed ``tfidf.term_frequencies`` table via ``tf`` to share the
    token explosion with other corpus operators."""
    if tf is not None:
        counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
        counts = counts.select(F.col("term").alias("w"), "c")
    else:
        counts = (
            df.select(F.explode(words(F.lower(F.col(text_col)))).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    top = (
        counts.orderBy(F.col("c").desc(), F.col("w")).limit(max_words)
        .collect()
    )
    return [(r["w"], int(r["c"])) for r in top]


def train_bpe(
    df: DataFrame | None,
    n_merges: int = 100,
    text_col: str = "text",
    max_words: int = 100_000,
    word_counts: list[tuple[str, int]] | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus (or from a
    pre-collected ``word_counts`` table). Returns the ordered merge list
    [(left, right), ...] — rank i = merge i, the artifact an encoder
    needs. Deterministic: the merged pair each round is the (count DESC,
    pair ASC) winner; stops early when no pair occurs twice."""
    if word_counts is None:
        if df is None:
            raise ValueError("need df or word_counts")
        word_counts = word_frequencies(df, text_col, max_words)
    return [(a, b) for a, b, _ in train_bpe_detailed(word_counts, n_merges)]


def train_bpe_detailed(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """``train_bpe`` plus each round's winning weighted pair count:
    [(left, right, count), ...]. The count is the pre-merge occurrence
    total the argmax saw that round — emitting it makes a training-replay
    hash prove the argmax VALUE, not just the chosen pair (the
    'bpe_train' driver rows)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        syms = tuple(list(w) + [END])
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break  # every remaining pair is unique: nothing left to learn
        pair = best[0]
        merges.append((pair[0], pair[1], int(best[1])))
        merged = pair[0] + pair[1]
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + c
        vocab = nxt
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges rank-greedily to one word (the reference scalar
    encoder; ``encode_bpe`` vectorizes it). Always terminates: each merge
    shortens the symbol list."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_bpe(
    text: Column, merges: list[tuple[str, str]], cache_size: int = 65_536
) -> Column:
    """Text column → array<string> of BPE symbols under the learned
    merges, as one Arrow-batched pandas UDF in the ITERATOR form — the
    LRU cache over distinct words is built once per task and survives
    across Arrow batches (the scalar form would rebuild it per ~10k-row
    batch, re-segmenting the Zipf head every time). On Zipf-distributed
    text most stream words are cache hits, so the sequential merge loop
    runs roughly once per distinct word, not once per occurrence."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import functools

        from pcap_converter_spark.functions.text import ws_tokens

        @functools.lru_cache(maxsize=cache_size)
        def seg(word: str) -> tuple[str, ...]:
            return tuple(segment_word(word, ranks))

        for texts in batches:
            out = []
            for t in texts:
                toks: list[str] = []
                # ws_tokens, NOT str.split(): training's word_frequencies
                # splits with Java \s+ (ASCII), while str.split() also
                # breaks on Unicode whitespace (U+00A0 is ubiquitous in
                # web text) — a word containing U+00A0 is ONE trained
                # word but would be TWO at encode time, diverging from
                # the learned merge statistics
                for w in ws_tokens((t or "").lower()):
                    toks.extend(seg(w))
                out.append(toks)
            yield pd.Series(out)

    return enc(text)
