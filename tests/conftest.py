from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from pcap_converter_spark.session import apply_runtime_confs

    s = (
        SparkSession.builder.master("local[4]")
        .appName("pcs-tests")
        # 2g: the CLI round-trip tests (prep prelude + funnel + index
        # probe in one lineage) OOM the 1g default heap
        .config("spark.driver.memory", "2g")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # r14: the default 100-entry generated-class cache thrashes on
        # wide plans (see session.py) — tests repeat query shapes
        # constantly, so retaining compiled classes cuts suite wall time
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        .getOrCreate()
    )
    apply_runtime_confs(s)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
