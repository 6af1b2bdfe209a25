"""Streaming window operators: the streaming answer must equal the batch
answer over the same (bounded) input — the core Structured Streaming
correctness property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pcap_converter_spark.io.loader import load_table
from pcap_converter_spark.streaming import windows as W

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF, "events")


def test_streaming_tumbling_equals_batch(spark, events_batch):
    stream = W.read_events_stream(spark, SF)
    got = W.run_available_now(W.tumbling_counts(stream), "t_tumbling").cache()

    expected = (
        events_batch.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp").alias("h"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
        )
        .cache()
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_streaming_sessions_equal_batch_gaps_and_islands(spark, events_batch):
    stream = W.read_events_stream(spark, SF)
    got = W.run_available_now(W.session_counts(stream), "t_sessions")

    # batch gaps-and-islands (DQ21 shape) over the same data
    lagged = events_batch.withColumn(
        "prev",
        F.lag("ts").over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                "user_id"
            ).orderBy("ts", "event_id")
        ),
    )
    marked = lagged.withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull() | F.expr("ts - prev > INTERVAL 30 MINUTE"),
            1,
        ).otherwise(0),
    )
    from pyspark.sql.window import Window

    sessions = marked.withColumn(
        "sid",
        F.sum("new_s").over(Window.partitionBy("user_id").orderBy("ts", "event_id")),
    )
    expected = sessions.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("t0")
    )
    # same session partitioning: session count and event totals line up
    assert got.count() == expected.count()
    assert (
        got.agg(F.sum("n_events")).first()[0]
        == expected.agg(F.sum("n_events")).first()[0]
    )