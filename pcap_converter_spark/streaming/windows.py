"""Streaming window operators over the events stream.

Batch queries DQ21/DQ22 have true streaming twins here: a file-source
`readStream` over the events parquet directory, watermarked event-time
windows, and (for sessions) Spark's native ``session_window``. The same
code runs against Kafka/socket sources by swapping the reader — the
transformations are source-agnostic.

Late data: the watermark bounds state; events older than the watermark gap
are dropped from open windows — at 100 TB/day of events this is what keeps
window state finite.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pcap_converter_spark.session import apply_runtime_confs


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one file today; a
    continuously-landing directory in production — same code)."""
    apply_runtime_confs(spark)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file-stream source wants a *directory* (a landing zone in
    # production); stage the single testdata file behind a symlink dir
    stage = tempfile.mkdtemp(prefix="events_stream_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = spark.readStream.schema(batch_schema).parquet(stage)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":  # nanosAsLong: normalize ns → µs TIMESTAMP_NTZ
        stream = stream.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    # watermarks need TimestampType; the session TZ is pinned UTC so the
    # NTZ→TZ cast is a deterministic relabeling
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming DQ22: tumbling event-time window × event_type, with a
    watermark bounding late-arrival state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal-exact sum (order-independent) so the streaming answer
            # hash-matches the DQ22 batch oracle
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
        )
        .select(F.col("w.start").alias("h"), "event_type", "n", "v")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) event-time window × event_type: every event lands
    in window/slide overlapping windows (2 here). Works on a stream (with
    watermark-bounded state) or a batch frame — Spark's window() assignment
    is engine-agnostic, which is what lets the driver hash-prove the
    assignment semantics against a SQL oracle while pytest proves the
    streaming execution path matches batch."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
        )
        .select(F.col("w.start").alias("h"), "event_type", "n", "v")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming DQ21: per-user session windows with a 30-minute inactivity
    gap (native session_window state operator)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("t0"))
        .select("user_id", F.col("s.start").alias("session_start"), "n_events", "t0")
    )


def run_available_now_append(df: DataFrame, query_name: str) -> DataFrame:
    """Append-mode drain (stream-stream joins and other operators that
    emit rows incrementally reject complete mode)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(query_name)


def run_available_now(agg: DataFrame, query_name: str) -> DataFrame:
    """Drain everything currently available through the streaming engine
    into an in-memory table and return it as a DataFrame (test/bench
    harness; production would writeStream to a real sink)."""
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(query_name)
