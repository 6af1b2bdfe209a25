"""Deterministic document embeddings via the feature-hashing trick —
the engine-side featurizer that wires the text tables into the vector
operators (ANN ladder, SemDeDup, embedding near-dup) without an external
model.

A neural encoder is a model-serving concern, not an engine concern: at
100 TB you run it as a separate inference fleet and land vectors next to
the documents. What the ENGINE owes the pipeline is (a) the plumbing —
(doc_id, array<float>) with a pinned dimension, partition-friendly,
deterministic across reruns — and (b) a baseline featurizer good enough
for structural work (near-dup candidate generation, clustering,
retrieval smoke tests). The hashing trick (Weinberger et al. 2009) is
that baseline: token w adds ±1 (sign from one hash bit) at index
h(w) mod dim, vectors L2-normalized. Every ingredient is the repo's
portable md5-low32 hash, so the whole embedding has exact Python AND
DuckDB twins — unlike a model, this featurizer can be hash-checked.

Scale shape: one token explosion → one (doc, index) hash-aggregation →
one per-doc map assembly. The only shuffle is keyed by doc id, partial
aggregation map-side; no Python, no UDF, no model broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcap_converter_spark.functions.text import word_hash32, words


def hashed_embeddings(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
    tf: DataFrame | None = None,
) -> DataFrame:
    """(id_col, embedding array<float>) — the hashing-trick featurizer.

    index = md5low32(token) mod dim; sign = ±1 from the next hash bit;
    each occurrence contributes sign·1. ``normalize=True`` (default)
    L2-normalizes, which is what cosine-based consumers (semdedup, the
    ANN ladder) assume. Documents with no tokens are ABSENT from the
    result (a zero vector has no direction) — left-join if every doc
    needs a row. Deterministic across engines, reruns and partition
    layouts by construction.

    Pass a precomputed ``tfidf.term_frequencies`` table via ``tf`` to
    share the token explosion with the other corpus-text operators (the
    standard contract): each (doc, term, tf) row contributes tf·sign at
    the term's index — identical cells, one corpus scan fewer."""
    if dim <= 0:
        raise ValueError("dim must be positive")
    if tf is not None:
        h = word_hash32(F.col("term"))
        src = tf.select(
            F.col("doc").alias(id_col),
            F.pmod(h, F.lit(dim)).cast("int").alias("i"),
            (
                F.col("tf")
                * (
                    F.lit(1.0)
                    - F.lit(2.0)
                    * F.pmod(F.floor(h / F.lit(dim)), F.lit(2))
                )
            ).alias("s"),
        )
    else:
        toks = df.select(
            F.col(id_col),
            F.explode(words(F.lower(F.col(text_col)))).alias("w"),
        )
        h = word_hash32(F.col("w"))
        src = toks.select(
            F.col(id_col),
            F.pmod(h, F.lit(dim)).cast("int").alias("i"),
            (
                F.lit(1.0)
                - F.lit(2.0) * F.pmod(F.floor(h / F.lit(dim)), F.lit(2))
            ).alias("s"),
        )
    cells = src.groupBy(id_col, "i").agg(F.sum("s").alias("v"))
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("i"), F.col("v")))
    )
    assembled = cells.groupBy(id_col).agg(m.alias("_m"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("_m"), i.cast("int")), F.lit(0.0)
        ),
    )
    out = assembled.select(F.col(id_col), vec.alias("_v"))
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        out = out.select(
            F.col(id_col),
            F.when(
                nrm > 0, F.transform(F.col("_v"), lambda x: x / nrm)
            ).otherwise(F.col("_v")).alias("_v"),
        )
    return out.select(
        F.col(id_col), F.col("_v").cast("array<float>").alias("embedding")
    )
