"""Sink tests: partition pruning and exchange-free bucketed joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pcap_converter_spark.io.loader import load_table
from pcap_converter_spark.io.sinks import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)
from pcap_converter_spark.plans import audit

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes(spark, tmp_path):
    out = str(tmp_path / "orders_part")
    orders = load_table(spark, SF, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    write_partitioned(orders, out, ["status"])
    back = spark.read.parquet(out)
    q = back.filter(F.col("status") == "F").select("o_orderkey")
    plan = audit.formatted_plan(q)
    # partition filter must appear as PartitionFilters on the scan, and the
    # full table row count must survive a round trip
    assert "PartitionFilters" in plan and "status" in plan
    assert back.count() == orders.count()


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    # managed tables land in ./spark-warehouse (static conf); the finally
    # block drops them, which removes the files
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"),
                   "orders_b", ["okey"], n_buckets=8, sort_by=["okey"])
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "okey"),
                   "lineitem_b", ["okey"], n_buckets=8, sort_by=["okey"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "lineitem_b", "orders_b", on=["okey"])
        plan = audit.formatted_plan(j)
        assert "Exchange" not in plan, plan[:3000]
        # and the join is correct
        expected = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
