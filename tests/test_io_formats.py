"""Source-format coverage beyond parquet: JSONL and CSV roundtrips of the
documents table (schema-explicit reads, quote/escape-safe writes), and the
distributed-sort plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pcap_converter_spark.io.loader import load_table
from pcap_converter_spark.plans import audit

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


def test_jsonl_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(docs.schema).json(path)
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_csv_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", True).option(
        "escape", '"'
    ).csv(path)
    back = spark.read.schema(docs.schema).option("header", True).option(
        "escape", '"'
    ).csv(path)
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_global_sort_is_range_partitioned(spark):
    """A distributed total sort must sample-and-range-partition (one
    Exchange rangepartitioning), not funnel through a single task."""
    li = load_table(spark, SF, "lineitem")
    plan = audit.formatted_plan(li.orderBy("l_extendedprice"))
    assert "rangepartitioning" in plan, plan
