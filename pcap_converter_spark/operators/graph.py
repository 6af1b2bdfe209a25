"""Link-graph signals over crawl metadata — the authority axis of corpus
quality (alongside rules, LM perplexity, and the trained classifier).

A crawl's WAT sidecars carry each page's outlinks; from them the corpus
is a directed graph and the classic graph signals (PageRank here) rank
hosts/pages by link authority — the original web-quality prior, still
used to weight crawl sampling. Both operators are pure DataFrame
compositions:

- ``link_edges``: metadata rows with an outlink array → canonicalized
  (src, dst) edge table (self-loops dropped, exact-dup edges collapsed).
- ``pagerank``: the standard damped power iteration, each round ONE
  shuffle join (edges ⋈ ranks on src) + one aggregation by dst. Out-
  degrees are computed once and ride the persisted edge table; dangling
  mass (pages with no outlinks) redistributes uniformly via a per-round
  scalar aggregate. Deterministic given the input.

At 100 TB the edge table is repartitioned by ``src`` ONCE and persisted;
every iteration's join then reuses that partitioning, so the per-round
cost is the rank table's shuffle (|V| rows of 16 bytes), not the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcap_converter_spark.functions.urls import canonical_url


def link_edges(
    df: DataFrame,
    src_col: str = "url",
    links_col: str = "links",
    canonicalize: bool = True,
) -> DataFrame:
    """(src, dst) edges from rows carrying an outlink ARRAY column (e.g.
    ``wat_metadata`` output parsed with an explicit schema whose links
    field is array<string>). Self-loops and duplicate edges drop."""
    src = F.col(src_col)
    dst = F.explode(links_col)
    e = df.select(src.alias("src"), dst.alias("dst")).filter(
        F.col("dst").isNotNull() & (F.col("dst") != "")
    )
    if canonicalize:
        e = e.select(
            canonical_url(F.col("src")).alias("src"),
            canonical_url(F.col("dst")).alias("dst"),
        )
    return e.filter(F.col("src") != F.col("dst")).distinct()


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    handles: list | None = None,
) -> DataFrame:
    """(node, rank) after ``iters`` damped power iterations; ranks sum to
    1 (dangling mass redistributed uniformly each round, the standard
    treatment). Nodes = every distinct src or dst. Per round: one join of
    the rank table against the src-partitioned edge table, one sum by
    dst, one scalar dangling aggregate — 2 shuffles of |V| 16-byte rows
    plus the co-partitioned probe; the edge table itself shuffles once,
    before the loop."""
    own: list = handles if handles is not None else []

    def _hold(df: DataFrame) -> DataFrame:
        df = df.persist()
        own.append(df)
        return df

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = _hold(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(1.0))
    deg = _hold(e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")))
    # partitioned by src once; every iteration's join reuses this layout
    ej = _hold(e.join(deg, "src").repartition(F.col("src")))
    # dangling NODES are fixed across rounds — compute the set once; the
    # per-round scalar only re-sums their (changing) ranks. Without the
    # persisted deg/dang frames each round would re-derive the caller's
    # whole edge lineage (WAT parse, canonicalization regexes, ...).
    dang = _hold(
        nodes.join(deg.select(F.col("src").alias("node")), "node",
                   "left_anti")
    )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        # dangling mass: rank held by nodes with no outlinks this round
        dangling = (
            ranks.join(dang, "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            ej.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("c"))
        )
        # localCheckpoint per round: an iterative plan that is not
        # truncated nests every prior round's joins and the driver dies
        # in the optimizer long before any executor works (the same
        # lineage contract as the CC fixpoint in dedup.duplicate_groups)
        ranks = nodes.join(
            contrib.select(F.col("dst").alias("node"), "c"),
            "node",
            "left",
        ).select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("c"), F.lit(0.0))
                   + F.lit(float(dangling) / n))
            ).alias("rank"),
        ).localCheckpoint(eager=True)
    return ranks
