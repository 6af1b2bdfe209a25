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


def temperature_rates(
    df,
    alpha: float = 0.7,
    source_col: str = "source",
    weight_col: str | None = None,
) -> dict[str, float]:
    """Per-source keep rates from TEMPERATURE sampling — the standard
    multi-source rebalancing (multilingual/multi-domain training mixes,
    e.g. the mBERT/XLM-R exponent): target share of source i ∝ nᵢ^α, so
    α = 1 keeps natural proportions and α → 0 approaches uniform. Rates
    are normalized so the LARGEST down-weighting factor is 1.0 — the
    head source keeps rate  (nᵢ^α / nᵢ) / max_j(nⱼ^α / nⱼ)  and every
    other source keeps more of itself (never > 1: this operator only
    downsamples; upweight by epoch repetition at training time instead).

    ``weight_col`` sizes sources by a column sum (e.g. n_tokens — the
    budget that actually matters) instead of document count. One
    aggregation over the corpus (bounded output: one row per source);
    feed the result straight to ``mix_sources`` for deterministic
    membership."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    agg = (
        F.sum(weight_col) if weight_col else F.count(F.lit(1))
    )
    sizes = {
        r["src"]: float(r["n"])
        for r in df.groupBy(F.col(source_col).alias("src"))
        .agg(agg.alias("n"))
        .collect()
        if r["n"]
    }
    if not sizes:
        return {}
    factors = {s: n ** alpha / n for s, n in sizes.items()}
    top = max(factors.values())
    return {s: f / top for s, f in factors.items()}


def token_budget_flag(
    df,
    budget_tokens: int,
    per_source: bool = True,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
):
    """keep_budget=True for a deterministic prefix of documents whose
    cumulative token count stays within ``budget_tokens`` (per source by
    default, corpus-wide with ``per_source=False``) — "give me ~10B
    tokens of this source" without materializing or counting twice.

    Order is content-addressed (hash_bucket of the id, ties by id), NOT
    arrival order, so the selected subset is reproducible across engines
    and partition layouts and is a SUPERSET-stable prefix: growing the
    corpus only inserts new docs into the hash order, it never reorders
    existing ones relative to each other. A document straddling the
    boundary is kept iff its own start offset is inside the budget (so
    the realized total can overshoot by at most one document).

    Scale shape: a naive global cumsum window would funnel the whole
    corpus through ONE task (an unpartitioned window), so the running
    sum is two-phase — a cumsum window partitioned by (source, bucket)
    runs bucket-parallel, and each bucket's START OFFSET comes from a
    window over the per-bucket totals (a ``buckets``-row frame,
    broadcast back). Two shuffles of the data rows, both keyed; the only
    serial computation is over 100 rows per source."""
    from pyspark.sql import Window

    part = [source_col] if per_source else []
    b = hash_bucket(F.col(id_col))
    rows = df.withColumn("_tb", b)
    # phase 1: per-bucket totals → each bucket's global start offset
    # (window over ≤ `buckets` rows per source — metadata-sized)
    wb = (
        Window.partitionBy(*part)
        .orderBy("_tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        rows.groupBy(*part, "_tb")
        .agg(F.sum(tokens_col).alias("_bt"))
        .withColumn("_off", F.coalesce(F.sum("_bt").over(wb), F.lit(0)))
        .drop("_bt")
    )
    # phase 2: cumsum WITHIN each bucket (parallel across buckets)
    wi = (
        Window.partitionBy(*(part + ["_tb"]))
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_off") + F.coalesce(F.sum(tokens_col).over(wi), F.lit(0))
    return (
        rows.join(F.broadcast(offsets), part + ["_tb"])
        .withColumn("keep_budget", start < F.lit(int(budget_tokens)))
        .drop("_tb", "_off")
    )
