"""Deterministic hash-based sampling & split assignment for corpus curation.

Training-data pipelines need REPRODUCIBLE sampling: `df.sample()` draws
from an engine-specific RNG (different rows per engine, per run, per
partition layout), which is useless when a 100 TB corpus must yield the
same subset on every rerun and the same train/val/test membership across
teams. The standard fix is content-addressed bucketing — hash a stable id
into B buckets and select by bucket range. Pure column expressions
(whole-stage codegen, no shuffle), and exactly reproducible in any engine
with the same hash: the DuckDB twin is
``(md5_number_lower(CAST(id AS VARCHAR)) & 0xFFFFFFFF) % B``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pcap_converter_spark.functions.text import word_hash32


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5-low32 of the key's string
    form — membership depends only on the key value, never on partitioning,
    row order, or engine."""
    return F.pmod(word_hash32(key.cast("string")), F.lit(buckets))


def sample_flag(key: Column, pct: int, buckets: int = 100) -> Column:
    """True for a deterministic ~pct% subset (bucket < pct)."""
    return hash_bucket(key, buckets) < pct


def split_assign(key: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    """'train' / 'val' / 'test' assignment by bucket range — disjoint,
    exhaustive, and stable under corpus growth (a document's split never
    changes when other documents are added)."""
    b = hash_bucket(key)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def mix_sources(
    df,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    buckets: int = 10_000,
):
    """Training-mix downsampling: keep a deterministic ``rates[source]``
    fraction of each source's documents (sources absent from ``rates``
    keep everything). THE standard mixture move — a raw crawl dwarfs
    code/books/wiki, so the mix is set by per-source keep rates, not by
    post-hoc shuffling.

    Same content-addressed bucketing as ``sample_flag`` (10k buckets for
    basis-point rate resolution), so membership is reproducible across
    engines, reruns, partition layouts AND corpus growth — adding new
    documents never flips an old document's keep decision, which makes
    incremental re-mixes append-only. Pure column expressions: no
    shuffle, no RNG, no UDF."""
    b = hash_bucket(F.col(id_col), buckets)
    keep = F.lit(True)
    for src, rate in rates.items():
        keep = F.when(
            F.col(source_col) == src, b < int(round(rate * buckets))
        ).otherwise(keep)
    return df.withColumn("keep_mix", keep)
