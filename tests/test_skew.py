"""Salting utilities: salted results must equal plain results exactly
(salting changes the distribution, never the answer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pcap_converter_spark.operators.skew import salted_join, salted_topk


@pytest.fixture(scope="module")
def skewed_df(spark):
    # one pathological hot key (80% of rows) + a tail
    rows = [(0, f"v{i}") for i in range(800)] + [(i % 50 + 1, f"w{i}") for i in range(200)]
    return spark.createDataFrame(rows, ["k", "payload"])


def test_salted_topk_equals_plain(spark, skewed_df):
    got = [(r["k"], r["n"]) for r in salted_topk(skewed_df, ["k"], k=5).collect()]
    plain = [
        (r["k"], r["n"])
        for r in skewed_df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "k")
        .limit(5)
        .collect()
    ]
    assert got == plain
    assert got[0] == (0, 800)


def test_salted_join_equals_plain(spark, skewed_df):
    dim = spark.createDataFrame([(i, f"name{i}") for i in range(51)], ["k", "name"])
    got = salted_join(skewed_df, dim, on=["k"]).orderBy("k", "payload")
    plain = skewed_df.join(dim, on=["k"]).orderBy("k", "payload")
    assert got.columns == plain.columns
    assert got.count() == plain.count() == 1000
    assert got.exceptAll(plain).count() == 0


def test_salted_left_join_keeps_unmatched(spark, skewed_df):
    dim = spark.createDataFrame([(0, "zero")], ["k", "name"])
    got = salted_join(skewed_df, dim, on=["k"], how="left")
    assert got.count() == 1000
    assert got.filter(F.col("name").isNull()).count() == 200


def test_salted_join_rejects_right_full(spark, skewed_df):
    """ADVICE r2: right/full would emit unmatched small-side rows once per
    salt replica — rejected loudly instead."""
    dim = spark.createDataFrame([(0, "zero")], ["k", "name"])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(skewed_df, dim, on=["k"], how=how)


def test_salted_join_rejects_empty_salt_range(spark):
    """ADVICE r12: n_salts < 1 makes spark.range(n) empty, so the
    replicated small side is empty and an inner join silently returns
    zero rows — a wrong answer, not an error. Rejected up front, both
    here and at exact_keep_flags (the curate caller)."""
    import pytest

    from pcap_converter_spark.operators.pipeline import exact_keep_flags
    from pcap_converter_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "k")], ["id", "k"])
    small = spark.createDataFrame([("k",)], ["k"])
    for bad in (0, -1):
        with pytest.raises(ValueError, match="n_salts"):
            salted_join(big, small, ["k"], n_salts=bad)
        with pytest.raises(ValueError, match="n_salts"):
            exact_keep_flags(
                spark.createDataFrame([(1, "d")], ["doc_id", "_digest"]),
                n_salts=bad,
            )
