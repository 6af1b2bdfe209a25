"""Sequence packing — assigning documents to fixed token-budget training
bins, the step between a deduplicated corpus and a dataloader.

The classic formulation: concatenate documents in a deterministic order and
cut every ``budget`` tokens; a document's bin is the cut its first token
falls into. Done globally this is a total order (one giant sort); done the
scalable way the corpus is first split into ``n_shards`` independent
streams and packed per shard — which is exactly what a multi-host loader
wants anyway (one shard per data-parallel rank).

Shape: one shuffle (by shard), one window (per-shard running token sum).
No joins, no Python. Deterministic: shard = doc_id mod n_shards and
within-shard order = doc_id, so the DuckDB oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    budget: int = 256,
    n_shards: int = 16,
) -> DataFrame:
    """Assign each document a (shard, bin, offset) packing position.

    - ``pack_shard``  : doc_id mod n_shards — the independent packing stream.
    - ``pack_bin``    : running-token-sum div budget — which fixed-size
      training sequence the document STARTS in (documents may straddle a
      boundary; the loader continues them into the next bin, standard
      concat-and-cut packing).
    - ``pack_offset`` : running-token-sum mod budget — the start position
      inside that bin.
    """
    shard = (F.col(id_col) % n_shards).alias("pack_shard")
    w = (
        Window.partitionBy(F.col(id_col) % n_shards)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.select(
        F.col(id_col),
        shard,
        (start / budget).cast("long").alias("pack_bin"),
        (start % budget).alias("pack_offset"),
    )


def materialize_packed(
    df: DataFrame,
    ids_col: str,
    id_col: str = "doc_id",
    budget: int = 256,
    n_shards: int = 16,
    pad_id: int = 0,
) -> DataFrame:
    """The TENSOR-READY form of concat-and-cut packing: one row per
    training sequence — (pack_shard, pack_bin, input_ids, doc_spans) —
    from documents carrying a token-ID array column (encode with
    ``vocab.encode_column`` or any tokenizer upstream).

    Each shard's documents concatenate in doc_id order and cut every
    ``budget`` tokens; a straddling document contributes a fragment to
    every bin it crosses. ``input_ids`` is exactly ``budget`` long (each
    shard's final bin right-pads with ``pad_id``); ``doc_spans`` records
    (doc_id, start, end) per contributing document — the attention-mask /
    loss-boundary information a dataloader needs to stop attention at
    document edges.

    Shape: the ``pack_documents`` window (one shuffle by shard) to place
    each document, an explode into the 1 + ⌊(offset+n−1)/budget⌋ bins it
    touches, then ONE (shard, bin) aggregation whose per-group payload is
    bounded by ``budget`` tokens — no group can exceed one sequence, so
    the collect is safe at any corpus size. Deterministic end to end."""
    d = df.select(
        F.col(id_col),
        F.col(ids_col).alias("_ids"),
        F.size(ids_col).alias("_nt"),
    ).filter(F.col("_nt") > 0)
    pos = pack_documents(d, "_nt", id_col=id_col, budget=budget,
                         n_shards=n_shards)
    placed = d.join(pos, id_col).select(
        F.col(id_col),
        "_ids",
        "_nt",
        "pack_shard",
        (F.col("pack_bin") * budget + F.col("pack_offset")).alias("_start"),
    )
    first_bin = (F.col("_start") / budget).cast("long")
    last_bin = ((F.col("_start") + F.col("_nt") - 1) / budget).cast("long")
    frags = placed.select(
        id_col,
        "_ids",
        "_nt",
        "pack_shard",
        "_start",
        F.explode(F.sequence(first_bin, last_bin)).alias("pack_bin"),
    ).select(
        id_col,
        "pack_shard",
        "pack_bin",
        # the slice of this doc's ids that lands in this bin, and where
        # in the bin it starts
        F.greatest(
            F.lit(0), F.col("pack_bin") * budget - F.col("_start")
        ).alias("_lo"),
        F.least(
            F.col("_nt"),
            (F.col("pack_bin") + 1) * budget - F.col("_start"),
        ).alias("_hi"),
        F.col("_start"),
        F.col("_ids"),
    ).select(
        id_col,
        "pack_shard",
        "pack_bin",
        (F.col("_start") + F.col("_lo") - F.col("pack_bin") * budget)
        .cast("int").alias("_boff"),
        F.slice(
            "_ids", F.col("_lo").cast("int") + 1,
            (F.col("_hi") - F.col("_lo")).cast("int"),
        ).alias("_frag"),
    )
    grouped = frags.groupBy("pack_shard", "pack_bin").agg(
        F.array_sort(
            F.collect_list(F.struct("_boff", F.col("_frag"), F.col(id_col)))
        ).alias("_parts")
    )
    ids = F.flatten(F.transform("_parts", lambda p: p["_frag"]))
    padded = F.when(
        F.size(ids) < budget,
        F.concat(
            ids,
            F.array_repeat(F.lit(pad_id), F.lit(budget) - F.size(ids)),
        ),
    ).otherwise(ids)
    spans = F.transform(
        "_parts",
        lambda p: F.struct(
            p[id_col].alias(id_col),
            p["_boff"].alias("start"),
            (p["_boff"] + F.size(p["_frag"])).alias("end"),
        ),
    )
    return grouped.select(
        "pack_shard",
        "pack_bin",
        padded.alias("input_ids"),
        spans.alias("doc_spans"),
    )
