"""Shape-parity gate: every oracle-backed ``queries()`` entry must agree
with its DuckDB oracle on ROW COUNT and COLUMN NAMES at the fixture SF.

This is the cheap in-repo twin of the driver's hash gate (VERDICT r8 #2):
round 8 shipped a runner/oracle drift — ``run_lm_filter`` grew 16 'cfold'
provenance rows while ``_LM_FILTER_ORACLE`` still emitted only
uni/bi/clf — because nothing in ``pytest`` compared the two sides. A
count+schema check catches every added/dropped/renamed row family without
the cost of value canonicalization (the full hash check stays in
``tools/check_correctness.py`` / the driver); any change that alters
VALUES but not shape still needs the tools-level run, but shape drift is
how both historical breakages (r3 unhashable columns, r8 cfold) surfaced.

Runs at sf0.001 so the whole sweep stays test-suite-cheap.
"""

from __future__ import annotations

import pytest


def _contract():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


_QUERIES, _ORACLES = _contract()
_ORACLE_BACKED = [n for n in _QUERIES if n in _ORACLES]


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_BACKED)
def test_runner_oracle_shape_parity(name, spark, sf_dir, duck):
    sdf = _QUERIES[name](spark, sf_dir)
    spark_cols = sorted(c.lower() for c in sdf.columns)
    spark_rows = sdf.count()
    rel = duck.execute(_ORACLES[name])
    oracle_cols = sorted(c.lower() for c in [d[0] for d in rel.description])
    # count without materializing the result set driver-side
    oracle_rows = duck.execute(
        f"SELECT count(*) FROM ({_ORACLES[name]}) _q"
    ).fetchone()[0]
    assert spark_cols == oracle_cols, (
        f"{name}: column drift — spark {spark_cols} vs oracle {oracle_cols}"
    )
    assert spark_rows == oracle_rows, (
        f"{name}: row-count drift — spark {spark_rows} vs oracle "
        f"{oracle_rows} (a runner/oracle edit shipped one-sided; "
        "run tools/check_correctness.py on this entry)"
    )
