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
    by: str | None = None,
    sort: bool = True,
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

    ``by`` (r12) profiles per GROUP in the same single aggregation — the
    per-source health check a multi-source corpus runs before mixing
    (one scan for all sources, still map-side partial aggregation; the
    shuffle moves |groups| aggregate rows, never data rows). The group
    column leads the output and is excluded from the profiled columns.

    Returns (column, stat, value, value_str) — prefixed by the ``by``
    column when grouped — ordered by (group,) column, stat; exactly one
    of value/value_str is non-NULL per row.
    """
    cols = columns if columns is not None else [
        c for c in df.columns if c != by
    ]
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

    row = df.agg(*aggs) if by is None else df.groupBy(by).agg(*aggs)
    # wide → long: one stack expression, still one job (one row per group)
    parts = []
    for i, (col, stat, kind) in enumerate(plan):
        v = f"CAST(_{i} AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        s = f"CAST(_{i} AS STRING)" if kind == "str" else "CAST(NULL AS STRING)"
        parts.append(f"'{col}', '{stat}', {v}, {s}")
    stack = (
        f"stack({len(plan)}, {', '.join(parts)}) AS "
        "(column, stat, value, value_str)"
    )
    # ``sort=False`` skips the presentation ordering: a global sort's
    # range-sampling job re-executes the aggregation subtree (one full
    # scan of ``df``) before the sort stage runs it again — callers that
    # feed the frame into an order-insensitive consumer (the hash-gated
    # entries) pass False; the CLI keeps the readable default.
    if by is None:
        out = row.selectExpr(stack)
        return out.orderBy("column", "stat") if sort else out
    out = row.selectExpr(f"`{by}`", stack)
    return out.orderBy(by, "column", "stat") if sort else out


def profile_diff(
    old: DataFrame,
    new: DataFrame,
    rel_threshold: float = 0.0,
    round_digits: int = 4,
    sort: bool = True,
) -> DataFrame:
    """Snapshot drift report — the QA step a ROLLING pipeline runs before
    committing a new crawl: join two ``profile()`` outputs and emit, per
    (column, stat), the old/new values with absolute and relative change,
    flagging rows whose relative change exceeds ``rel_threshold``
    (``drifted``; string stats flag on any inequality). A schema change
    surfaces as one-sided rows (``old_value``/``new_value`` NULL with the
    other side present) — those always flag.

    Shape: both profiles are tiny long-format frames (a few rows per
    column), so this is a full-outer join of two bounded artifacts —
    driver-cheap at any corpus size, because ``profile()`` already
    reduced each snapshot to one aggregation row. ``distinct_approx``
    rows compare sketch-to-sketch: same-engine estimates are stable for
    similar data, so drift in the ESTIMATE is still a cardinality-drift
    signal even though the absolute value is not cross-engine exact.
    """
    o = old.select(
        "column", "stat",
        F.col("value").alias("old_value"),
        F.col("value_str").alias("old_str"),
    )
    n = new.select(
        "column", "stat",
        F.col("value").alias("new_value"),
        F.col("value_str").alias("new_str"),
    )
    j = o.join(n, ["column", "stat"], "full_outer")
    delta = F.round(F.col("new_value") - F.col("old_value"), round_digits)
    # the UNROUNDED ratio drives the threshold comparison — rounding
    # first would silently pass any drift under 0.5·10^-round_digits
    # even at rel_threshold=0 (review-caught); round_digits only shapes
    # the REPORTED column
    rel_raw = F.when(
        F.col("old_value").isNotNull()
        & F.col("new_value").isNotNull()
        & (F.abs(F.col("old_value")) > 0),
        (F.col("new_value") - F.col("old_value"))
        / F.abs(F.col("old_value")),
    )
    rel = F.round(rel_raw, round_digits)
    one_sided = (
        F.col("old_value").isNull() & F.col("new_value").isNotNull()
    ) | (
        F.col("old_value").isNotNull() & F.col("new_value").isNull()
    ) | (
        F.col("old_str").isNull() != F.col("new_str").isNull()
    )
    num_drift = (
        F.col("old_value").isNotNull()
        & F.col("new_value").isNotNull()
        & (
            F.when(
                F.abs(F.col("old_value")) > 0,
                F.abs(rel_raw) > F.lit(float(rel_threshold)),
            ).otherwise(F.col("new_value") != F.col("old_value"))
        )
    )
    str_drift = (
        F.col("old_str").isNotNull()
        & F.col("new_str").isNotNull()
        & (F.col("old_str") != F.col("new_str"))
    )
    out = j.select(
        "column", "stat", "old_value", "new_value",
        delta.alias("delta"), rel.alias("rel_change"),
        "old_str", "new_str",
        (one_sided | num_drift | str_drift).alias("drifted"),
    )
    # sort=False as in profile(): skip the presentation sort when the
    # consumer is order-insensitive (or re-sorts itself, e.g. via a
    # row_number window over the same keys).
    return out.orderBy("column", "stat") if sort else out
