"""Physical-plan inspection + assertions (the engine's scale governance).

SURVEY.md §4.2's position is "zero custom Catalyst rules" - which makes
*verifying* what Catalyst produced the engine's actual optimizer work.
These helpers read `.explain("formatted")` output so tests can pin the
plan properties that matter at 100 TB:

- filters/column pruning reached the parquet scan (PushedFilters/
  ReadSchema),
- small dims are broadcast (no shuffle of the big side),
- shuffle (Exchange) counts don't regress,
- the hot path stays inside WholeStageCodegen.

tests/test_plans.py runs these against the declared queries; a plan
regression fails CI exactly like a wrong answer would.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reached file scans."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan (column-pruning evidence)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges
    excluded - those are the cheap kind).  Formatted mode lists nodes as
    "(n) Exchange" with the partitioning in an Arguments line - matching
    "Exchange hashpartitioning" (the simple-mode shape) counted zero and
    made the shuffle-budget tests vacuous."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters of every file scan (partition-pruning evidence)."""
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df))


def count_broadcast_joins(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def wholestage_codegen_ids(df: DataFrame) -> list[str]:
    """Codegen stage ids: simple explain marks codegen'd operators with
    ``*(n)``.  An un-executed AdaptiveSparkPlan hides the codegen layer
    (isFinalPlan=false), so AQE is toggled off just for the rendering -
    explain re-plans under the current conf, the DataFrame is untouched."""
    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        return sorted(set(re.findall(r"\*\((\d+)\)", simple_plan(df))))
    finally:
        spark.conf.set(key, prev)


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """Assert some pushed filter mentions ``fragment`` (e.g. a column)."""
    pf = pushed_filters(df)
    assert any(fragment in f for f in pf), (
        f"expected a pushed filter mentioning {fragment!r}; got {pf}"
    )


def assert_column_pruned(df: DataFrame, table_cols: int, max_cols: int) -> None:
    """Assert no scan reads more than ``max_cols`` columns (of a table
    with ``table_cols``) - i.e. projection pruning reached the scan."""
    for schema in read_schemas(df):
        n = len([c for c in schema.split(",") if ":" in c])
        assert n <= max_cols, (
            f"scan reads {n}/{table_cols} columns - pruning failed: {schema}"
        )


def assert_broadcast(df: DataFrame, at_least: int = 1) -> None:
    n = count_broadcast_joins(df)
    assert n >= at_least, f"expected >= {at_least} broadcast joins, found {n}"


def assert_max_shuffles(df: DataFrame, budget: int) -> None:
    n = count_exchanges(df)
    assert n <= budget, f"plan has {n} shuffles, budget is {budget}"
