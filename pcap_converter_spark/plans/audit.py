"""Physical-plan audits: assert the plan shape that survives 100 TB.

Correctness tests prove an operator's answer; these prove its *plan*. A
defrag join that silently became a sort-merge join, or a scan that lost its
pushed filters, is a 100×-at-scale regression that no value-comparison test
can see. Tests call these helpers on `.explain`-formatted plans so plan
regressions fail CI like value regressions do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    # capture df.explain() output — stable across Spark 3/4 py4j APIs
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_broadcast_join(df: DataFrame, msg: str = "") -> None:
    """The join must broadcast its small side — no shuffle of the big side."""
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(
            f"expected a broadcast join {msg}; plan:\n{plan[:4000]}"
        )


def assert_no_sort_merge_join(df: DataFrame, msg: str = "") -> None:
    plan = formatted_plan(df)
    if "SortMergeJoin" in plan:
        raise AssertionError(f"unexpected SortMergeJoin {msg}; plan:\n{plan[:4000]}")


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every named column/filter fragment must appear in PushedFilters of a
    Parquet scan — the predicate reached the reader, not a post-scan Filter."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for frag in fragments:
        if frag not in joined:
            raise AssertionError(
                f"filter fragment {frag!r} not pushed to scan; "
                f"PushedFilters lines:\n{joined}\nfull plan:\n{plan[:4000]}"
            )


def assert_partition_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in a scan's PartitionFilters — the
    predicate prunes whole partition DIRECTORIES before any I/O (the
    property that makes an at-rest IVF probe scan nprobe/C of the data)."""
    plan = formatted_plan(df)
    lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    joined = "\n".join(lines)
    for frag in fragments:
        if frag not in joined:
            raise AssertionError(
                f"partition-filter fragment {frag!r} missing; "
                f"PartitionFilters lines:\n{joined}\nfull plan:\n{plan[:4000]}"
            )


def assert_pruned_columns(df: DataFrame, max_read_columns: int) -> None:
    """The Parquet ReadSchema must carry at most N columns — projection
    pruning reached the scan."""
    plan = formatted_plan(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            struct = ln.split("struct<", 1)[-1]
            ncols = struct.count(":")
            if ncols > max_read_columns:
                raise AssertionError(
                    f"scan reads {ncols} columns, expected <= {max_read_columns}: {ln}"
                )
            return
    raise AssertionError(f"no ReadSchema found in plan:\n{plan[:4000]}")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider is better (fewer breaks)."""
    import contextlib
    import io
    import re

    # under AQE the pre-execution formatted plan has no codegen annotations;
    # "codegen" explain mode compiles the plan and reports subtree count
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen", buf.getvalue())
    if m:
        return int(m.group(1))
    plan = formatted_plan(df)
    ids = {
        ln.rsplit("codegen id :", 1)[1].strip(" ]")
        for ln in plan.splitlines()
        if "codegen id :" in ln
    }
    return len(ids)
