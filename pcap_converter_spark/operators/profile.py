"""One-pass dataset profiling — per-column statistics in a single job.

The ingestion-time health check every corpus pipeline runs before
committing compute: row/null counts, distinct cardinality, ranges, and
numeric moments for every column, computed in ONE aggregation over one
scan. At 100 TB that shape matters more than the stats themselves: all
statistics are algebraic or sketch-mergeable, so the whole profile is
map-side partial aggregation + a single-row final reduce — no shuffle of
data rows, no per-column extra pass (a naive ``df.describe()``-per-column
loop scans the table once per column).

Output is long-format (column, stat, value, value_str) so downstream
checks are plain filters. Exact stats (count, nulls, min, max, mean,
sum) are cross-engine comparable — tests/test_profile.py replays them
against DuckDB over the same parquet. ``distinct_approx`` is a
HyperLogLog++ sketch (engine-specific by construction, bounded by the
same test) — use it for cardinality triage, not equality gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    round_digits: int = 4,
    include_approx: bool = True,
) -> DataFrame:
    """Per-column profile as one aggregation job.

    For every column: ``count`` (non-null), ``nulls``,
    ``distinct_approx`` (HLL++); numeric columns add ``min`` / ``max`` /
    ``mean`` / ``sum`` (double, rounded — partition-order float noise
    stays below the rounding); strings add lexicographic ``min`` /
    ``max`` in ``value_str`` plus ``avg_len``. Unsupported types (arrays,
    structs, binary) keep the count/nulls/distinct triple only.
    ``include_approx=False`` drops the HLL++ rows — the exact-stats form
    a cross-engine hash gate can check (sketch values are engine-specific
    by construction).

    Returns (column, stat, value, value_str) ordered by (column, stat);
    exactly one of value/value_str is non-NULL per row.
    """
    cols = columns if columns is not None else df.columns
    aggs = []
    plan: list[tuple[str, str, str]] = []  # (column, stat, kind)

    def add(col: str, stat: str, expr, kind: str) -> None:
        alias = f"_{len(plan)}"
        aggs.append(expr.alias(alias))
        plan.append((col, stat, kind))

    for c in cols:
        dt = df.schema[c].dataType
        fc = F.col(c)
        add(c, "count", F.count(fc).cast("double"), "num")
        add(
            c, "nulls",
            (F.count(F.lit(1)) - F.count(fc)).cast("double"), "num",
        )
        if include_approx and not isinstance(dt, (T.MapType,)):
            add(
                c, "distinct_approx",
                F.approx_count_distinct(fc).cast("double"), "num",
            )
        if isinstance(dt, _NUMERIC):
            d = fc.cast("double")
            add(c, "min", F.round(F.min(d), round_digits), "num")
            add(c, "max", F.round(F.max(d), round_digits), "num")
            add(c, "mean", F.round(F.avg(d), round_digits), "num")
            add(c, "sum", F.round(F.sum(d), round_digits), "num")
        elif isinstance(dt, T.StringType):
            add(c, "min", F.min(fc), "str")
            add(c, "max", F.max(fc), "str")
            add(
                c, "avg_len",
                F.round(F.avg(F.length(fc)), round_digits), "num",
            )
        elif isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            add(c, "min", F.min(fc).cast("string"), "str")
            add(c, "max", F.max(fc).cast("string"), "str")

    row = df.agg(*aggs)
    # single-row wide → long: one stack expression, still one job
    parts = []
    for i, (col, stat, kind) in enumerate(plan):
        v = f"CAST(_{i} AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        s = f"CAST(_{i} AS STRING)" if kind == "str" else "CAST(NULL AS STRING)"
        parts.append(f"'{col}', '{stat}', {v}, {s}")
    stacked = row.selectExpr(
        f"stack({len(plan)}, {', '.join(parts)}) AS "
        "(column, stat, value, value_str)"
    )
    return stacked.orderBy("column", "stat")
