"""Semantic deduplication — k-means clustering + within-cluster pruning.

The SemDeDup shape (Abbas et al. 2023, arXiv:2303.09540): cluster the
corpus embeddings with k-means, then look for near-duplicate pairs ONLY
inside each cluster — the cross-cluster pairs a global near-dup scan
would also consider are overwhelmingly below any useful threshold, so
restricting the comparison to clusters turns the O(n²) all-pairs matrix
into O(Σ n_c²), which is O(n²/k) for balanced clusters and tunable by k.
This is the semantic complement to the token-level dedup ladder in
``operators/dedup.py``: MinHash/SimHash catch near-identical *text*;
embedding clustering catches paraphrases and template families whose
surface forms share no shingles.

Spark-first decomposition:

- ``kmeans_fit`` — distributed spherical Lloyd's. Each iteration is
  (1) an assignment that is a PURE PROJECTION: the current centroids are
  plan literals (``ivf_assign``), so the corpus is never shuffled or
  joined for assignment; and (2) an update that is one
  ``posexplode`` + (cluster, position) hash aggregation — map-side
  combined, k·dim output rows regardless of corpus size, collected to
  the driver as the next iteration's literals. At 100 TB each iteration
  is one scan + one tiny agg; the centroid state that crosses the
  driver boundary is k·dim doubles, never data.
- ``semantic_neardup`` — final assignment (again a projection) + ONE
  shuffle keyed by cluster id, then a per-cluster vectorized NumPy
  matmul inside ``applyInPandas``. Cluster size is the memory unit:
  size k so the largest cluster's (n_c × dim) block fits an executor
  (the SemDeDup paper uses k ≈ n/10⁴ at web scale). A skewed hot
  cluster is the known failure mode — raise k or pre-split hot
  clusters by a salt and merge verdicts, exactly like the LSH tier.

Determinism across engines (the property the driver's DuckDB oracle
hash-checks): centroid components are ROUNDED (``round_decimals``) after
every update, so the 1e-16 partition-order noise in a distributed sum
can never flip a later assignment; pair cosines are rounded to 4
decimals before the threshold test, matching ``similarity.cosine_pairs``
and the embed-dedup oracle convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the Arrow-matmul assignment kernel moved to similarity.assign_arrow in
# r6 (index builds dispatch to it past ASSIGN_ARROW_MIN_K centroids);
# the trainer keeps this alias — same contract as similarity.ivf_assign
# (argmax cosine, ties → lowest cluster id, zero-norm rows → cluster 0),
# vectorized because the per-centroid HOF expressions cost O(k·dim)
# interpreter steps per row (measured 51 s for 3 passes at 50k×64,
# k≈100, vs ~2 s — the r5 scale-smoke catch)
from pcap_converter_spark.operators.similarity import (  # noqa: E402
    assign_arrow as _assign_arrow,
)


def kmeans_fit(
    df: DataFrame,
    init: np.ndarray,
    n_iters: int = 2,
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> np.ndarray:
    """Distributed spherical k-means from explicit ``init`` centroids.

    Returns the (k × dim) centroid matrix after ``n_iters`` Lloyd
    iterations. Assignment is max-dot-product against plan-literal
    centroids (ties → lowest cluster id, `array_position` semantics);
    the update L2-normalizes the per-cluster vector sum (spherical
    k-means — the mean direction) and rounds each component to
    ``round_decimals``. An empty cluster keeps its previous centroid.

    The per-iteration Spark work is one job: scan → project(assignment)
    → posexplode → partial-agg → final agg of k·dim groups. The
    ``collect()`` is bounded by construction (k·dim rows — parameters,
    not data), the same contract as ``similarity.ivf_train``'s sample.
    """
    cents = np.asarray(init, dtype=np.float64).copy()
    k, dim = cents.shape
    for _ in range(n_iters):
        assigned = _assign_arrow(df.select(vec_col), cents, vec_col=vec_col)
        sums = (
            assigned.select(
                "_cluster",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "pos", "v"
                ),
            )
            .groupBy("_cluster", "pos")
            .agg(F.sum("v").alias("s"))
            .collect()
        )
        acc = np.zeros((k, dim), dtype=np.float64)
        seen = np.zeros(k, dtype=bool)
        for r in sums:
            acc[r["_cluster"], r["pos"]] = r["s"]
            seen[r["_cluster"]] = True
        nrm = np.linalg.norm(acc, axis=1)
        upd = seen & (nrm > 0)
        cents[upd] = np.round(
            acc[upd] / nrm[upd, None], round_decimals
        )
    return cents


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    target_cluster_rows: int = 1024,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Auto-sized SemDeDup: k grows with the corpus so the within-cluster
    quadratic term stays bounded — k = ⌈n / target_cluster_rows⌉ makes the
    prune O(n · target_cluster_rows) TOTAL (linear in n), the same
    size-the-geometry-from-the-data move as ``embedding_neardup_lsh``. A
    FIXED k would silently go quadratic as the corpus outgrows its
    clusters (the LSH fixed-width lesson from r3, exponent 3.6). The
    residual super-linear term is assignment (n·k dot products — the IVF
    coarse-quantizer cost, n²·dim/target flops); it stays wall-clock
    negligible until k reaches ~10⁵ clusters, where a two-level
    (cluster-the-centroids) assignment is the standard extension.

    One count() job sizes k; dim comes from the first row (metadata-cheap
    probe). For the pinned-geometry form (reproducible across corpus
    sizes, oracle-checkable) call ``kmeans_fit`` + ``semantic_neardup``
    with explicit init.
    """
    import math

    n = df.count()
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if n == 0 or first is None:
        return semantic_neardup(
            df, np.zeros((1, 1)), threshold, id_col, vec_col
        )
    from pcap_converter_spark.operators.similarity import fixed_centroids

    k = max(8, math.ceil(n / target_cluster_rows))
    init = fixed_centroids(int(first["d"]), k, seed=seed)
    cents = kmeans_fit(df, init=init, n_iters=n_iters, vec_col=vec_col)
    return semantic_neardup(df, cents, threshold, id_col, vec_col)


def semantic_neardup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster near-duplicate decision under a keep-lowest-id
    policy — the semantic tier of the dedup ladder.

    Output, one row per input row: (id_col, cluster, keep_id, is_dup)
    where ``keep_id`` is the smallest same-cluster id whose cosine
    (rounded to 4) is ≥ threshold — the same one-hop contract as
    ``dedup.embedding_neardup``, restricted to the cluster.

    Plan shape: projection (assignment over literal centroids) → one
    shuffle keyed by cluster → per-cluster NumPy matmul. Nothing else
    moves; the quadratic term is per-cluster, which is the entire point.
    """
    assigned = _assign_arrow(
        df.select(F.col(id_col), F.col(vec_col)), centroids, vec_col=vec_col
    )
    # id and keep_id keep the caller's id type (string doc keys are as
    # legitimate as bigints here — nothing below does id arithmetic)
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("keep_id", id_type),
            T.StructField("is_dup", T.BooleanType()),
        ]
    )

    def prune(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        sims = np.round((m / nrm) @ (m / nrm).T, 4)
        # ids ascend with position, so a row's smallest qualifying
        # neighbour is its FIRST qualifying column left of the diagonal
        ok = (sims >= threshold) & np.tri(len(ids), k=-1, dtype=bool)
        has = ok.any(axis=1)
        first = ok.argmax(axis=1)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": np.full(len(ids), pdf["_cluster"].iloc[0]),
                "keep_id": np.where(has, ids[first], ids),
                "is_dup": has,
            }
        )

    return assigned.groupBy("_cluster").applyInPandas(prune, schema=out_schema)
