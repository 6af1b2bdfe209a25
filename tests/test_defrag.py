"""Defrag operator property tests (R2-R6): idempotence, row-count
preservation, non-fragmented rows untouched, missing-first-fragment NULLs,
and the convert pipeline branches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pcap_converter_spark.operators.convert import convert
from pcap_converter_spark.operators.defrag import (
    defrag,
    defrag_if_needed,
    first_fragments,
    fragmentation_pct,
)

FIXTURE_PARQUET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "data", "packets.parquet",
)
FIXTURE_PCAP = FIXTURE_PARQUET.replace("packets.parquet", "packets_fixture.pcap")


@pytest.fixture(scope="module")
def packets(spark):
    return spark.read.parquet(FIXTURE_PARQUET).cache()


def test_fragmentation_pct_matches_manual(spark, packets):
    pct = fragmentation_pct(packets)
    total = packets.count()
    frags = packets.filter(
        ((F.col("ip_frag_offset") == 0) & F.col("ip_mf")) | (F.col("ip_frag_offset") > 0)
    ).count()
    assert pct == round(100.0 * frags / total)


def test_defrag_preserves_rowcount_and_schema(spark, packets):
    out = defrag(packets)
    assert out.count() == packets.count()
    assert out.columns == packets.columns


def test_defrag_fills_continuation_fragments(spark, packets):
    out = defrag(packets)
    # continuation fragments of the DNS groups now carry the first
    # fragment's app-layer fields
    cont = out.filter((F.col("ip_frag_offset") > 0) & (F.col("ip_id") == 1000))
    rows = cont.collect()
    assert rows, "fixture has fragments for ip_id=1000"
    for r in rows:
        assert r["udp_dstport"] == 53
        assert r["dns_qry_name"] is not None
        # col_protocol is NOT overwritten: continuation fragments carry a
        # non-NULL 'IPv4' and coalesce keeps the left side (reference parity)
        assert r["col_protocol"] == "IPv4"


def test_defrag_missing_first_fragment_keeps_nulls(spark, packets):
    out = defrag(packets)
    orphan = out.filter(F.col("ip_id") == 4242).collect()
    assert orphan, "fixture has the orphan group 4242"
    for r in orphan:
        assert r["udp_srcport"] is None  # no first fragment to propagate


def test_defrag_leaves_nonfragmented_untouched(spark, packets):
    plain = packets.filter((F.col("ip_frag_offset") == 0) & (~F.col("ip_mf")))
    joined = defrag(packets).alias("d").join(
        plain.alias("p"), on=["frame_time"], how="inner"
    )
    diffs = joined.filter(
        ~(
            F.col("d.col_protocol").eqNullSafe(F.col("p.col_protocol"))
            & F.col("d.udp_srcport").eqNullSafe(F.col("p.udp_srcport"))
            & F.col("d.dns_qry_name").eqNullSafe(F.col("p.dns_qry_name"))
        )
    ).count()
    assert diffs == 0


def test_defrag_idempotent(spark, packets):
    once = defrag(packets)
    twice = defrag(once)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_defrag_if_needed_short_circuits(spark, packets):
    nonfrag = packets.filter((F.col("ip_frag_offset") == 0) & (~F.col("ip_mf")))
    result, pct = defrag_if_needed(nonfrag)
    assert pct < 1.0
    assert result is nonfrag  # passthrough, not a rewritten plan


def test_convert_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "out.parquet")
    stats = convert(spark, FIXTURE_PCAP, out)
    assert stats["packets"] == 2500
    assert stats["errors"] == 0
    assert stats["defragged"]  # fixture is >1% fragmented
    produced = spark.read.parquet(out)
    assert produced.count() == 2500
    # defragged continuation rows carry DNS fields
    got = produced.filter((F.col("ip_id") == 1000) & (F.col("ip_frag_offset") > 0))
    assert got.filter(F.col("dns_qry_name").isNotNull()).count() == got.count()


def test_convert_nodefrag_passthrough(spark, tmp_path):
    out = str(tmp_path / "raw.parquet")
    stats = convert(spark, FIXTURE_PCAP, out, nodefrag=True)
    assert not stats["defragged"]
    produced = spark.read.parquet(out)
    cont = produced.filter((F.col("ip_id") == 1000) & (F.col("ip_frag_offset") > 0))
    assert cont.filter(F.col("dns_qry_name").isNull()).count() == cont.count()
