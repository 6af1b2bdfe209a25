#!/usr/bin/env python
"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion through the ``noop`` sink — the full plan
runs (scan → ops → sort), nothing is collected to the driver, so timings
measure the engine, not result transfer. The ETL path (pcap decode →
defrag) is benchmarked separately as ``pcap_convert`` over the fixture pcap
and reported in pkts/s alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from pcap_converter_spark.session import apply_runtime_confs

    spark = (
        SparkSession.builder.appName("bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("PCS_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    runners = entrymod.queries()

    # JVM warmup outside timed region: a tiny end-to-end query
    try:
        runners["dq1_scan_filter_project"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name, fn in runners.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"bench: {name} {timings[name]}s", file=sys.stderr)
        except Exception as exc:  # a broken query must not hide the others
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0

    # ETL throughput: decode the fixture pcap through the full source +
    # defrag pipeline (reference anchor: 494k pkts/s on 4 Rust threads).
    pcap_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures", "data", "packets_fixture.pcap",
    )
    if os.path.exists(pcap_path):
        from pcap_converter_spark.operators.defrag import defrag
        from pcap_converter_spark.sources.pcap import read_pcap

        t0 = time.perf_counter()
        decoded, _ = read_pcap(spark, pcap_path)
        defrag(decoded).write.format("noop").mode("overwrite").save()
        timings["pcap_convert"] = round(time.perf_counter() - t0, 3)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
