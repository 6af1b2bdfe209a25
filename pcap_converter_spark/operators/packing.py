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
