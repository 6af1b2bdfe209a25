"""Skew-mitigation utilities: salting for hot keys.

Spark already covers most skew: hash aggregation does map-side partial
combine, and AQE splits skewed join partitions at runtime
(``spark.sql.adaptive.skewJoin`` — enabled in the session factory). These
helpers are for the cases that remain:

- ``salted_join``: a shuffle join where ONE key dominates (an AQE split
  still sends every copy of that key's build side to the same few tasks).
  The small side is replicated ``n_salts`` times, the big side tags each
  row with a random-but-deterministic salt, and the join runs on
  (key, salt) — a hot key now spreads over n_salts reducers. Exact for
  inner/left equi-joins.
- ``salted_topk``: two-phase heavy-hitter count. Phase 1 aggregates on
  (key, salt) so a hot key's updates land on n_salts reducers; phase 2
  merges the partials. Count/sum are algebraic, so the result is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, n_salts: int):
    # deterministic pseudo-random salt from full row content: rows sharing
    # a hot key still spread across salts, and re-runs assign identically
    # (rand() would not be replay-stable across task retries)
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with the small side replicated across ``n_salts`` salts.

    Output columns = big's columns + small's non-key columns (same as a
    plain ``big.join(small, on, how)``). Only inner/left are exact: with
    right/full joins every unmatched small-side row would surface once per
    salt replica (ADVICE r2) — rejected instead of silently duplicating.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated small side would emit unmatched rows n_salts times"
        )
    if n_salts < 1:
        raise ValueError(
            f"salted_join needs n_salts >= 1, got {n_salts}: range(0) "
            "replicates the small side zero times, so the inner join "
            "silently returns ZERO rows instead of failing (ADVICE r12)"
        )
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    big_s = big.withColumn("_salt", _salt(big, n_salts).cast("int"))
    small_s = small.crossJoin(F.broadcast(salts))
    out = big_s.join(small_s, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def salted_topk(
    df: DataFrame,
    key_cols: list[str],
    k: int,
    n_salts: int = 32,
) -> DataFrame:
    """Exact top-k heavy hitters by count, skew-safe via two-phase agg."""
    salted = df.withColumn("_salt", _salt(df, n_salts))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("_partial").alias("n"))
        .orderBy(F.col("n").desc(), *key_cols)
        .limit(k)
    )
