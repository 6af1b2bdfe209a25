"""Vocabulary building + dictionary encoding — the tokenizer-fitting step
of a training-data pipeline, engine-side.

``build_vocab`` is a corpus-level aggregation (term → count → rank);
``encode_column`` maps every document's tokens to vocabulary ids via a
plan-literal map — the vocabulary is bounded (a tokenizer vocab is 2⁵–2¹⁷
entries), so it ships to executors as a broadcast literal and encoding is
a pure projection over the scan: no join, no shuffle, no Python. At 100 TB
the term-count aggregation is the only shuffle, and it combines map-side.

Determinism: ranking is (count DESC, term ASC); id 0 is reserved for OOV.
The DuckDB oracle reproduces both the ranking and the encoding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pcap_converter_spark.functions.text import words


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    size: int = 16,
    tf: DataFrame | None = None,
) -> list[tuple[str, int]]:
    """Top-``size`` lowercased whitespace terms by (count DESC, term ASC),
    as [(term, id)] with ids 1..size (0 = OOV). The result is driver-side
    by design — a vocabulary is a bounded artifact (like IVF centroids),
    collected once and baked into the encoding plan as a literal. Pass a
    precomputed ``tfidf.term_frequencies`` table via ``tf`` to share the
    token explosion with other corpus operators."""
    if tf is not None:
        counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    else:
        counts = (
            df.select(F.explode(words(F.lower(F.col(text_col)))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    top = counts.orderBy(F.col("c").desc(), F.col("term")).limit(size).collect()
    return [(r["term"], i + 1) for i, r in enumerate(top)]


def encode_tokens(ws: Column, vocab: list[tuple[str, int]]) -> Column:
    """Map each element of a token-array column to its vocabulary id
    (OOV → 0) via a plan-literal map — projection-only, scan-speed."""
    m = F.create_map(
        *[x for term, vid in vocab for x in (F.lit(term), F.lit(vid))]
    )
    return F.transform(
        ws, lambda w: F.coalesce(F.try_element_at(m, w), F.lit(0))
    )


def encode_column(text: Column, vocab: list[tuple[str, int]]) -> Column:
    """Map each token of ``text`` to its vocabulary id (OOV → 0) via a
    plan-literal map — projection-only, scan-speed."""
    return encode_tokens(words(F.lower(text)), vocab)
