"""Sinks: partitioned and bucketed Parquet writers.

Bucketing is the shuffle-you-pay-once strategy: write both fact tables
bucketed by the join key and every subsequent equi-join/aggregation on
that key is exchange-free — at 100 TB the one-time write shuffle replaces
a shuffle *per query*. Spark's native (non-Hive) bucketing is used via
``saveAsTable``; readers must enable ``spark.sql.sources.bucketing.enabled``
(on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, out: str, partition_by: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style directory partitioning — partition pruning makes
    `WHERE partition_col = x` skip whole directories at scan time."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(out)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 64,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table. Joins/aggs between tables
    bucketed identically on the join key read co-located buckets — no
    Exchange in the plan. ``sort_by`` additionally pre-sorts within
    buckets so sort-merge joins skip their sort."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables (exchange-free by design —
    tests assert the plan carries no Exchange on either scan side)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
