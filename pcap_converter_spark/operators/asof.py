"""As-of join as a union + window — the shape that scales.

Spark has no native as-of join. The naive formulation (DQ23) is an
inequality self-join: every left row pairs with ALL earlier right rows
before the max() collapses them — O(n·m) per key, ruinous on dense keys.

``asof_join`` instead interleaves both inputs into one stream per key and
takes a running ``last(right value, ignoreNulls)`` ordered by time. ONE
shuffle (the window partitioning), no join node at all; per key the cost is
a sort + linear scan, which is what a 100 TB as-of needs. pandas users know
this trick as merge_asof; DuckDB ships it as ASOF JOIN (the oracle used to
verify this operator).

Tie semantics: strict (right.ts < left.ts matches; equal timestamps do
NOT). Rows sort by (ts, source) with left before right at equal ts so the
running last() cannot see a same-instant right row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent (strictly earlier) right
    row's ``value_cols`` (plus the matched timestamp as ``ts_asof``)."""
    value_cols = value_cols or []
    lcols = left.columns

    rt_type = right.schema[right_ts].dataType
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_src"),
        F.lit(None).cast(rt_type).alias("_rt"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
            for c in value_cols
        ],
    )
    r = right.select(
        *[F.lit(None).alias(c) if c not in on else F.col(c) for c in lcols],
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_src"),
        F.col(right_ts).alias("_rt"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(f"{left_ts}{suffix}", F.last("_rt", ignorenulls=True).over(w))
    for c in value_cols:
        filled = filled.withColumn(
            f"{c}{suffix}", F.last(f"_rv_{c}", ignorenulls=True).over(w)
        )
    return (
        filled.filter(F.col("_src") == 0)
        .select(
            *lcols,
            F.col(f"{left_ts}{suffix}"),
            *[F.col(f"{c}{suffix}") for c in value_cols],
        )
    )
