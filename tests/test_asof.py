"""As-of join operator: union+window answer must equal the naive
inequality-self-join answer, plus value-column attachment and approx
sketch error bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pcap_converter_spark.io.loader import load_table
from pcap_converter_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"


def test_asof_equals_naive_self_join(spark):
    ev = load_table(spark, SF, "events")
    got = (
        asof_join(ev, ev, on=["user_id"])
        .filter(F.col("ts_asof").isNotNull())
        .select("event_id", F.col("ts_asof").alias("prev_ts"))
    )
    naive = (
        ev.alias("e")
        .join(
            ev.alias("s"),
            (F.col("s.user_id") == F.col("e.user_id")) & (F.col("s.ts") < F.col("e.ts")),
        )
        .groupBy(F.col("e.event_id").alias("event_id"))
        .agg(F.max("s.ts").alias("prev_ts"))
    )
    assert got.count() == naive.count()
    assert got.exceptAll(naive).count() == 0


def test_asof_attaches_value_columns(spark):
    l = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 15)], ["k", "ts"]
    )
    r = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 19, "c"), (2, 99, "z")], ["k", "ts", "v"]
    )
    got = {
        (row["k"], row["ts"]): (row["ts_asof"], row["v_asof"])
        for row in asof_join(l, r, on=["k"], value_cols=["v"]).collect()
    }
    # strict: the right row AT ts=10 does not match the left row at ts=10
    assert got[(1, 10)] == (5, "a")
    assert got[(1, 20)] == (19, "c")
    assert got[(2, 15)] == (None, None)


def test_asof_plan_has_no_join(spark):
    from pcap_converter_spark.plans import audit

    ev = load_table(spark, SF, "events")
    plan = audit.formatted_plan(asof_join(ev, ev, on=["user_id"]))
    assert "Join" not in plan, plan[:2000]


def test_approx_distinct_error_bound(spark):
    ev = load_table(spark, SF, "events")
    approx = {
        r["event_type"]: r["a"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("a"))
        .collect()
    }
    exact = {
        r["event_type"]: r["x"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    for k, x in exact.items():
        assert abs(approx[k] - x) <= max(5, 0.1 * x), (k, approx[k], x)
