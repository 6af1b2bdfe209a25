"""End-to-end corpus curation: the standard LLM preprocessing chain as ONE
lazily-composed DataFrame transformation.

``curate(docs, benchmark)`` runs, in pipeline order:

1. quality gate   — Gopher-style keep/drop (operators/quality.py)
2. exact dedup    — keep the lowest doc_id of each sha256 group
3. near dedup     — MinHash-LSH pairs → connected components → keep each
                    component's lowest id (operators/dedup.py)
4. decontaminate  — drop docs sharing any k-gram with the benchmark set
5. pack           — (shard, bin, offset) positions over the survivors

Each stage BOUNDARY is persisted (and appended to ``handles`` for caller
cleanup): the funnel's flags join references every stage's output twice —
once to filter the next stage's input, once in the final flag assembly —
and each near-dup/decon stage references its predecessor several more
times internally. Without materialized boundaries Spark re-derives the
full upstream lineage per reference; measured at 100k docs, the unpersisted
composition ran ~30× slower than the sum of its stages (457 s vs ~15 s) —
persisting the boundary frames (ids + flags + token counts; only the
quality boundary carries text, because the dedup stages still need it) is
what makes composition cost additive. The result carries
per-stage drop flags so a curation report is one aggregation —
``df.groupBy()`` over the booleans — instead of five jobs. Stage order
follows the standard pipeline economics: the quality gate is a pure
projection (run it first, it shrinks everything downstream), exact dedup
shuffles 32-byte digests, near-dup buckets only the quality+exact
survivors, and decontamination broadcasts the benchmark gram set.

At 100 TB each stage keeps its documented scale shape — this wrapper adds
composition and the drop-flag bookkeeping, no new shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcap_converter_spark.functions import text as TX
from pcap_converter_spark.operators import dedup
from pcap_converter_spark.operators.packing import pack_documents
from pcap_converter_spark.operators.quality import (
    gopher_keep,
    mean_word_len,
    repetition_stats,
)


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    max_shingle_df: int = 8,
    decon_k: int = 5,
    pack_budget: int = 256,
    handles: list | None = None,
) -> DataFrame:
    """Returns one row per input document:
    (doc_id, keep_quality, keep_exact, keep_neardup, keep_decon, kept,
    pack_shard, pack_bin, pack_offset) — pack_* are NULL for dropped docs.

    A doc is ``kept`` iff it survives every stage; each ``keep_*`` flag is
    computed on the docs that reached that stage, so the flags read as a
    funnel (a quality-dropped doc has NULL downstream flags).

    Internally persisted boundary frames are appended to ``handles`` when
    given (unpersist after materializing the result); without ``handles``
    they stay cached for the session."""
    own_handles: list = handles if handles is not None else []

    def _stage(df: DataFrame) -> DataFrame:
        df = df.persist()
        own_handles.append(df)
        return df

    did, t = F.col(id_col), F.col(text_col)

    # stage 1: quality — pure projection + the 2-gram repetition aggregate
    ws = TX.words(F.lower(t))
    stats = docs.select(
        did,
        t,
        TX.token_count(t).alias("_nt"),
        mean_word_len(t).alias("_mwl"),
        TX.punct_ratio(t).alias("_pr"),
        TX.stopword_hits_t(ws, "en").alias("_sh"),
    ).join(repetition_stats(docs, text_col=text_col, id_col=id_col), id_col)
    quality = _stage(stats.select(
        did,
        t,
        gopher_keep(
            F.col("_nt"), F.col("_mwl"), F.col("_pr"), F.col("_sh"),
            F.col("dup_ngram_frac"),
        ).alias("keep_quality"),
        F.col("_nt").alias("_tokens"),
    ))
    q_docs = quality.filter("keep_quality")

    # stage 2: exact dedup — keep the lowest id of each digest group
    digests = q_docs.select(
        did, F.sha2(t.cast("binary"), 256).alias("_digest")
    )
    exact_keep = digests.groupBy("_digest").agg(F.min(id_col).alias("_keep"))
    exact = _stage(digests.join(exact_keep, "_digest").select(
        did, (did == F.col("_keep")).alias("keep_exact")
    ))
    e_docs = q_docs.join(exact, id_col).filter("keep_exact")

    # stage 3: near dedup — LSH pairs on the survivors, CC keep-lowest-id
    pairs = dedup.ngram_jaccard_pairs(
        e_docs,
        text_col=text_col,
        id_col=id_col,
        threshold=jaccard_threshold,
        max_shingle_df=max_shingle_df,
        handles=own_handles,
    )
    groups = dedup.duplicate_groups(pairs, e_docs, id_col=id_col,
                                    handles=own_handles)
    near = _stage(groups.select(
        F.col("doc").alias(id_col), (F.col("doc") == F.col("root")).alias("keep_neardup")
    ))
    n_docs = _stage(e_docs.join(near, id_col).filter("keep_neardup"))

    # stage 4: decontamination — drop docs overlapping the benchmark
    if benchmark is not None:
        leaked = (
            dedup.decontaminate(
                n_docs, benchmark, text_col=text_col, id_col=id_col, k=decon_k
            )
            .select(F.explode("doc_ids").alias(id_col))
            .distinct()
            .withColumn("_leaked", F.lit(True))
        )
        decon = _stage(n_docs.join(leaked, id_col, "left").select(
            did, F.coalesce(~F.col("_leaked"), F.lit(True)).alias("keep_decon")
        ))
    else:
        decon = _stage(n_docs.select(did, F.lit(True).alias("keep_decon")))
    survivors = n_docs.join(decon.filter("keep_decon"), id_col).select(
        did, F.col("_tokens")
    )

    # stage 5: packing positions over the survivors
    packed = pack_documents(survivors, "_tokens", id_col=id_col,
                            budget=pack_budget)

    flags = (
        docs.select(did)
        .join(quality.select(id_col, "keep_quality"), id_col, "left")
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .join(decon, id_col, "left")
        .join(packed, id_col, "left")
    )
    return flags.select(
        did,
        "keep_quality",
        "keep_exact",
        "keep_neardup",
        "keep_decon",
        F.coalesce(
            F.col("keep_quality")
            & F.col("keep_exact")
            & F.col("keep_neardup")
            & F.col("keep_decon"),
            F.lit(False),
        ).alias("kept"),
        "pack_shard",
        "pack_bin",
        "pack_offset",
    )
