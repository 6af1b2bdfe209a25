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


def pack_documents_bestfit(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    budget: int = 256,
    n_shards: int = 16,
) -> DataFrame:
    """NO-SPLIT packing: every document lands WHOLE in exactly one bin —
    the form loaders need when an example cannot straddle sequences (SFT
    conversations, contrastive pairs, any loss that cannot mask across a
    cut). Concat-and-cut (``pack_documents``) wastes zero tokens but
    splits documents; this trades some padding for intactness, using
    BEST-FIT-DECREASING per shard — sort by length descending, place
    each doc into the open bin with the least residual capacity that
    still fits (the classic bin-packing heuristic, ≤ 11/9·OPT + 1 bins).

    Returns (id, pack_shard, pack_bin, pack_offset, truncated):
    ``truncated`` marks documents longer than ``budget``, which occupy a
    bin alone and must be cut (or routed to a long-context stream) by
    the caller. Documents with NULL or non-positive token counts are
    ABSENT from the result (the ``materialize_packed`` convention —
    there is nothing to place); left-join if every doc needs a row.
    Deterministic end to end: shard = id mod n_shards, placement order =
    (tokens DESC, id ASC), ties between equal-residual bins break to the
    lowest bin id.

    Scale shape: one shuffle keyed by shard, then a per-shard sequential
    loop inside ``applyInPandas`` — bisect finds each doc's bin in
    O(log B) over the B open-bin residuals, but the Python list's
    pop/insort shifts are O(B), so the loop is O(d·B) worst case (B ≈
    d·avg_len/budget). That is fine at loader-shard sizes; a shard big
    enough for B to hurt wants a tree/bucketed residual structure — and
    should usually just raise ``n_shards``, which is the parallelism AND
    work bound (a shard is the data-parallel loader unit)."""
    import bisect

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("pack_shard", T.LongType()),
            T.StructField("pack_bin", T.LongType()),
            T.StructField("pack_offset", T.LongType()),
            T.StructField("truncated", T.BooleanType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_nt", id_col], ascending=[False, True])
        shard = int(pdf["pack_shard"].iloc[0])
        residuals: list[tuple[int, int]] = []  # sorted (residual, bin)
        n_bins = 0
        rows = []
        for doc, nt in zip(pdf[id_col], pdf["_nt"]):
            nt_eff = min(int(nt), budget)
            i = bisect.bisect_left(residuals, (nt_eff, -1))
            if i == len(residuals):
                b, off, res = n_bins, 0, budget - nt_eff
                n_bins += 1
            else:
                r, b = residuals.pop(i)
                off, res = budget - r, r - nt_eff
            if res > 0:
                bisect.insort(residuals, (res, b))
            rows.append(
                (int(doc), shard, b, off, bool(int(nt) > budget))
            )
        return pd.DataFrame(
            rows,
            columns=[
                id_col, "pack_shard", "pack_bin", "pack_offset", "truncated",
            ],
        )

    d = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("pack_shard"),
        F.col(tokens_col).cast("long").alias("_nt"),
    ).filter(F.col("_nt") > 0)
    return d.groupBy("pack_shard").applyInPandas(pack, schema=out_schema)


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
