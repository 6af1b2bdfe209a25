"""Stateful streaming dedup: one emission per distinct content, across
micro-batch boundaries."""

from __future__ import annotations

import os

import pytest

from pcap_converter_spark.streaming.stateful import run_stream_to_memory, streaming_dedup


@pytest.fixture()
def dup_stream_dir(spark, tmp_path):
    # two files → two micro-batch-able inputs with duplicates across them
    rows1 = [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")]
    rows2 = [(3, "gamma delta"), (4, "unique text"), (5, "alpha beta")]
    d = str(tmp_path / "docs")
    os.makedirs(d)
    spark.createDataFrame(rows1, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(rows2, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    return d


def test_streaming_dedup_emits_each_content_once(spark, dup_stream_dir):
    schema = spark.read.parquet(dup_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(dup_stream_dir)
    )
    got = run_stream_to_memory(streaming_dedup(stream), "t_dedup").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["alpha beta", "gamma delta", "unique text"]
    # each emission carries a real doc_id of that content
    by_text = {r["text"]: r["doc_id"] for r in got}
    assert by_text["alpha beta"] in (0, 2, 5)
    assert by_text["unique text"] == 4
