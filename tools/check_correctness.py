#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, sorted column names, and an order-insensitive canonicalized
value comparison. Usage::

    python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback
from datetime import datetime
from decimal import Decimal

# __spark_entry__ lives at the REPO ROOT (the driver's contract file, not
# part of the installable package), so the root must be importable no
# matter where this tool is launched from; pcap_converter_spark itself
# resolves via the editable install when present, via this same path
# entry otherwise.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon_cell(v) -> str:
    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    try:
        if pd.isna(v):  # catches pd.NaT, pd.NA, np.nan
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_frame(pdf) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import duckdb

    import __spark_entry__ as e
    from pcap_converter_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # warm both Python-worker pools (pandas-UDF + driver-parallelize) so
    # the first UDF-bearing entry doesn't eat 32 cold interpreter forks
    try:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _warm(s: pd.Series) -> pd.Series:
            return s

        p = spark.sparkContext.defaultParallelism
        spark.range(p * 10, numPartitions=p).select(_warm("id")).write.format(
            "noop"
        ).mode("overwrite").save()
        spark.createDataFrame(pd.DataFrame({"i": range(p * 10)})).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass

    runners = e.queries()
    oracles = e.oracle_sql()
    names = [n for n in runners if not only or n in only]

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        try:
            sdf = runners[name](spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        # faithful to the real driver: its canonicalizer sorts with pandas,
        # which cannot hash list/dict cells — canon_cell below stringifies
        # them, so without this check a non-atomic column would PASS here
        # and break only on the actual gate (exactly what happened in r3)
        import numpy as _np

        bad_cols = [
            c
            for c in sdf.columns
            if len(sdf)
            and isinstance(sdf[c].iloc[0], (list, dict, _np.ndarray))
        ]
        if bad_cols:
            print(
                f"FAIL  {name}: non-atomic columns {bad_cols} — the "
                "driver's pandas canonicalizer cannot sort these; "
                "serialize (array_join / to_json) at the registry boundary"
            )
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle, rows-only check)")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: DUCKDB ERROR")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        scols, srows = canon_frame(sdf)
        dcols, drows = canon_frame(ddf)
        if scols != dcols:
            print(f"FAIL  {name}: columns spark={scols} duck={dcols}")
            n_fail += 1
        elif len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
        elif srows != drows:
            diffs = [
                (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
            ][:3]
            print(f"FAIL  {name}: {sum(1 for a, b in zip(srows, drows) if a != b)} "
                  f"mismatched rows of {len(srows)}; cols={scols}")
            for i, a, b in diffs:
                print(f"      row {i}: spark={a}")
                print(f"      row {i}:  duck={b}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
