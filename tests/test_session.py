"""Session factory conf contract (VERDICT r13 stretch #7 + r14 JIT work):
tuning defaults yield to user-supplied conf, the correctness contract
stays pinned, and the generated-class cache ships sized for wide plans."""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import json, os
os.environ["PYSPARK_SUBMIT_ARGS"] = (
    "--conf spark.sql.parquet.compression.codec=gzip "
    "--conf spark.sql.codegen.cache.maxEntries=123 "
    "--conf spark.sql.shuffle.partitions=9 "
    "pyspark-shell"
)
from pyspark.context import SparkContext
SparkContext._ensure_initialized()  # the spark-submit shape: JVM + sys props up before user code
import sys
sys.path.insert(0, %r)
from pcap_converter_spark.session import get_spark
spark = get_spark("conf-precedence-probe", shuffle_partitions=5)
print("PROBE " + json.dumps({
    "codec": spark.conf.get("spark.sql.parquet.compression.codec"),
    "cgcache": spark.conf.get("spark.sql.codegen.cache.maxEntries"),
    "shuffle": spark.conf.get("spark.sql.shuffle.partitions"),
    "tz": spark.conf.get("spark.sql.session.timeZone"),
    "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
}))
spark.stop()
"""


def test_conf_precedence_contract():
    """spark-submit --conf wins over tuning defaults (codec, codegen
    cache); the explicit shuffle_partitions API argument outranks even
    the submit conf; the RUNTIME_CONFS correctness contract (UTC, AQE)
    is pinned regardless."""
    p = subprocess.run(
        [sys.executable, "-c", _PROBE % _REPO],
        capture_output=True, text=True, timeout=300, cwd=_REPO,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    line = next(ln for ln in p.stdout.splitlines() if ln.startswith("PROBE "))
    got = json.loads(line[len("PROBE "):])
    assert got["codec"] == "gzip"          # user tuning conf survived
    assert got["cgcache"] == "123"         # user static conf survived
    assert got["shuffle"] == "5"           # explicit API arg outranks conf
    assert got["tz"] == "UTC"              # pinned contract
    assert got["aqe"] == "true"            # pinned contract


def test_apply_runtime_confs_leaves_user_confs_alone(spark):
    """apply_runtime_confs sets ONLY its pinned keys: a user conf outside
    that list (here shuffle partitions) survives the call."""
    from pcap_converter_spark.session import RUNTIME_CONFS, apply_runtime_confs

    assert "spark.sql.shuffle.partitions" not in RUNTIME_CONFS
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        apply_runtime_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_default_session_sizes_codegen_cache_and_code_cache():
    """Fresh sessions built by get_spark carry the JVM capacity sizing
    (r17, VERDICT r16 #2 — parity with bench.py): the 16384-entry
    generated-class cache (r14/r16: smaller caches LRU-wrap across wide
    plans / the full suite, so every repeat execution re-Janinos +
    re-JITs ~1400 identical methods forever) AND the 640 MB
    ReservedCodeCacheSize on the driver JVM (the 240 MB default is
    smaller than a many-plan session's compiled-method volume, so the
    sweeper flushes hot methods mid-session and they recompile forever).
    Both constants live in session.py; bench.py imports them rather than
    redefining (pinned below)."""
    probe = """
import json, sys
sys.path.insert(0, %r)
from pcap_converter_spark.session import get_spark
spark = get_spark("cgcache-probe")
print("PROBE " + json.dumps({
    "cgcache": spark.conf.get("spark.sql.codegen.cache.maxEntries"),
    "javaopts": spark.conf.get("spark.driver.extraJavaOptions", ""),
}))
spark.stop()
""" % _REPO
    p = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True, text=True, timeout=300, cwd=_REPO,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    line = next(ln for ln in p.stdout.splitlines() if ln.startswith("PROBE "))
    got = json.loads(line[len("PROBE "):])
    assert got["cgcache"] == "16384"
    assert "-XX:ReservedCodeCacheSize=640m" in got["javaopts"]


def test_bench_inherits_session_jvm_capacity_constants():
    """bench.py must not redefine the JVM capacity values: it imports
    CODEGEN_CACHE_MAX_ENTRIES / driver_java_opts() from session.py, so
    the benchmark JVM and production sessions stay in lockstep (VERDICT
    r16 #2 'bench.py inherits rather than redefines')."""
    from pcap_converter_spark import session as S

    assert S.CODEGEN_CACHE_MAX_ENTRIES == "16384"
    assert S.driver_java_opts() == "-XX:ReservedCodeCacheSize=640m"
    src = open(os.path.join(_REPO, "bench.py")).read()
    assert "CODEGEN_CACHE_MAX_ENTRIES" in src
    assert "driver_java_opts()" in src
    # the literals must not be re-declared in bench.py's builder chain
    assert '"16384"' not in src
    assert "ReservedCodeCacheSize=640m" not in src


def test_driver_java_opts_env_override(monkeypatch):
    from pcap_converter_spark import session as S

    monkeypatch.setenv("PCS_DRIVER_JAVA_OPTS", "-XX:ReservedCodeCacheSize=1g")
    assert S.driver_java_opts() == "-XX:ReservedCodeCacheSize=1g"
