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
