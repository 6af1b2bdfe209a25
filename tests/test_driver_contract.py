"""Regression guards for the external driver's contract.

The driver hash-checks the first 50 ``queries()`` entries by sorting each
result with pandas and canonicalizing cell values. Two contract rules fall
out of that, both violated and fixed in earlier rounds — these tests keep
the failure classes from recurring as entries evolve:

1. No top-level ArrayType/MapType/StructType column in any registered
   result: pandas ``sort_values`` factorizes cells, and list/dict cells
   are unhashable (r3: ex_text_all + ex_dedup_exact came back
   ``TypeError: unhashable type: 'list'`` from the driver while passing
   the local checker, which stringifies). Serialize arrays to strings at
   the registry boundary; keep array forms on the operator API.
2. Every entry inside the 50-key window must have an ``oracle_sql()``
   twin: a no-oracle entry inside the window records ``err: "no_oracle"``
   and counts as broken (the driver does not honor rows-only checks
   there), and an oracle-backed entry pushed past 50 is never checked.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

DRIVER_WINDOW = 50

_DISALLOWED = (T.ArrayType, T.MapType, T.StructType)


def _contract():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


def test_window_entries_all_oracle_backed():
    queries, oracles = _contract()
    window = list(queries)[:DRIVER_WINDOW]
    missing = [n for n in window if n not in oracles]
    assert not missing, (
        f"entries inside the driver's {DRIVER_WINDOW}-key hash-check window "
        f"without an oracle (driver records them as broken): {missing}"
    )


def test_no_oracle_backed_entry_outside_window():
    queries, oracles = _contract()
    beyond = list(queries)[DRIVER_WINDOW:]
    orphaned = [n for n in beyond if n in oracles]
    assert not orphaned, (
        "oracle-backed entries pushed beyond the checked window (their "
        f"proof is silently dropped): {orphaned} — merge entries instead "
        "of appending (STATUS.md merge pattern)"
    )


def test_oracle_keys_subset_of_queries():
    queries, oracles = _contract()
    stray = set(oracles) - set(queries)
    assert not stray, f"oracle_sql() keys with no queries() entry: {stray}"


@pytest.mark.parametrize("name", list(_contract()[0]))
def test_result_schema_is_pandas_sortable(name, spark, sf_dir):
    """Every registered result must have only atomic top-level columns —
    the driver's pandas canonicalizer cannot sort list/dict/Row cells."""
    queries, _ = _contract()
    df = queries[name](spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _DISALLOWED)
    ]
    assert not bad, (
        f"{name} returns non-atomic top-level column(s) {bad} "
        f"({[str(df.schema[c].dataType) for c in bad]}): the driver "
        "canonicalizer sorts with pandas and crashes on unhashable cells — "
        "serialize (array_join / to_json) at the registry boundary"
    )


def test_scoped_shuffle_partitions_is_refcounted_and_thread_safe(spark):
    """The r12 overlap pattern runs two entry phases on concurrent
    driver threads, BOTH inside _scoped_shuffle_partitions — the conf is
    session-global, so the scope must restore only when the LAST holder
    exits, and concurrent scopes must agree on n (a different value
    raises loudly instead of silently winning). r16: the scope is a
    TRIM, never a raise — the driver benches at low core counts too,
    where the session default already sits below the fixture constant
    and fanning a 2-core session out to 8-way shuffles would invert the
    trim's purpose (the test session default is 4, so scoping to 8 must
    leave 4 in place while scoping to 2 must take effect)."""
    import threading
    import time

    from pcap_converter_spark.operators.registry import (
        _scoped_shuffle_partitions as scoped,
    )

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)  # conftest pins 4

    # trim, never raise: requesting MORE than the session default is a
    # no-op on the conf
    with scoped(spark, 8):
        assert spark.conf.get(key) == prev, "scope RAISED the default"
    assert spark.conf.get(key) == prev

    # nested same-n: inner exit must NOT restore
    with scoped(spark, 2):
        with scoped(spark, 2):
            assert spark.conf.get(key) == "2"
        assert spark.conf.get(key) == "2", "inner exit restored too early"
    assert spark.conf.get(key) == prev

    # nested different-n refuses
    with scoped(spark, 8):
        with pytest.raises(ValueError, match="disagree"):
            with scoped(spark, 2):
                pass
    assert spark.conf.get(key) == prev

    # staggered threads: A enters, B enters, A exits (conf must stay 2
    # for B), B exits (conf restores)
    a_in, b_in, a_out = (
        threading.Event(), threading.Event(), threading.Event(),
    )
    seen: dict[str, str] = {}

    def thread_a():
        with scoped(spark, 2):
            a_in.set()
            b_in.wait(10)
        a_out.set()

    def thread_b():
        a_in.wait(10)
        with scoped(spark, 2):
            b_in.set()
            a_out.wait(10)
            seen["after_a_exit"] = spark.conf.get(key)

    ts = [threading.Thread(target=thread_a), threading.Thread(target=thread_b)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(20)
    assert seen["after_a_exit"] == "2", "first exit flipped the conf early"
    assert spark.conf.get(key) == prev


def test_scoped_conf_is_refcounted_and_restores(spark):
    """r17 streaming-drain trim: _scoped_conf must restore the caller's
    value only at the LAST exit, refuse disagreeing nested values, and
    restore on exception. The drains scope
    spark.sql.streaming.noDataMicroBatches.enabled=false around
    complete-mode / NoTimeout queries only — the engine default must
    come back for everything outside the scope (append-mode windowed
    consumers NEED the no-data batch)."""
    from pcap_converter_spark.operators.registry import (
        _DRAIN_NO_EMPTY_BATCH, _scoped_conf,
    )

    key, val = _DRAIN_NO_EMPTY_BATCH
    prev = spark.conf.get(key)  # engine default: "true"
    assert prev == "true"

    with _scoped_conf(spark, key, val):
        assert spark.conf.get(key) == "false"
        with _scoped_conf(spark, key, val):  # nested same-value
            assert spark.conf.get(key) == "false"
        assert spark.conf.get(key) == "false", "inner exit restored early"
    assert spark.conf.get(key) == prev

    with _scoped_conf(spark, key, val):
        with pytest.raises(ValueError, match="disagree"):
            with _scoped_conf(spark, key, "true"):
                pass
    assert spark.conf.get(key) == prev

    # exception inside the scope still restores
    with pytest.raises(RuntimeError):
        with _scoped_conf(spark, key, val):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == prev
