"""Physical-plan assertions — make the optimizer's work checkable.

The scale contract (SURVEY §4): filters and projections must reach the
parquet scan (PushedFilters / ReadSchema), small-side joins must broadcast,
global top-k must plan as TakeOrderedAndProject (per-partition top-k + k-row
driver merge, no full sort), aggregates must have a map-side partial stage,
and hot expression pipelines must be whole-stage-codegen'd. These helpers
turn each of those into a testable predicate so plan regressions fail CI
instead of surfacing as 100 TB slowdowns.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_contains(df: DataFrame, *needles: str) -> str:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle in plan, f"plan missing {needle!r}:\n{plan}"
    return plan


def assert_pushed_filter(df: DataFrame, column: str) -> str:
    """The parquet scan must carry a pushed filter on ``column``."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters line in plan:\n{plan}"
    assert any(column in ln for ln in pushed), (
        f"filter on {column!r} not pushed to scan: {pushed}\n{plan}"
    )
    return plan


def assert_read_schema_only(df: DataFrame, table_cols: set[str], allowed: set[str]) -> str:
    """Column pruning: the scan's ReadSchema must request no column outside
    ``allowed`` (of the table's full column set)."""
    plan = formatted_plan(df)
    read_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_lines, f"no ReadSchema in plan:\n{plan}"
    for ln in read_lines:
        for col in table_cols - allowed:
            assert f"{col}:" not in ln, (
                f"unpruned column {col!r} read by scan: {ln}\n{plan}"
            )
    return plan


def assert_broadcast_join(df: DataFrame) -> str:
    return assert_contains(df, "BroadcastHashJoin")


def assert_top_k_plan(df: DataFrame) -> str:
    return assert_contains(df, "TakeOrderedAndProject")


def assert_partial_aggregation(df: DataFrame) -> str:
    """Hash aggregation must run in partial+final mode (map-side combine)."""
    plan = formatted_plan(df)
    n = plan.count("HashAggregate")
    assert n >= 2, f"expected partial+final HashAggregate, found {n}:\n{plan}"
    return plan


def assert_whole_stage_codegen(df: DataFrame) -> str:
    """Formatted explain marks codegen'd operators with ``[codegen id : N]``
    (the literal ``WholeStageCodegen`` node name only appears in simple mode).
    Under AQE the initial plan carries no codegen ids until it is finalized,
    so execute once and re-explain before asserting."""
    plan = formatted_plan(df)
    if "[codegen id :" not in plan and "AdaptiveSparkPlan" in plan:
        df.collect()  # count() would plan a new query; collect() finalizes THIS one
        plan = formatted_plan(df)
    assert "[codegen id :" in plan, f"plan missing codegen annotations:\n{plan}"
    return plan


def assert_no_cartesian(df: DataFrame) -> str:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"
    return plan


def data_shuffles(plan: str) -> int:
    """Count shuffle Exchange nodes that move DATA BY KEY (hash/range/single
    partition), excluding the scan-spreading round-robin repartition that
    ``sources.parallelize_scan`` inserts on single-split sources: that
    exchange carries each input row once, before any per-token/per-gram
    expansion, and vanishes on production sources with >= cores-many splits.
    BroadcastExchange is a different node name and is never counted here.

    Formatted-mode plans print each node's arguments in a detail block
    (``(4) Exchange`` / ``Arguments: hashpartitioning(...)``), so blocks —
    not lines — are classified."""
    import re

    n = 0
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if re.match(r"\(\d+\) Exchange\b", head):
            # optimized plans print "roundrobinpartitioning", unresolved
            # AQE-wrapped ones "RoundRobinPartitioning" — match both
            if "roundrobinpartitioning" not in block.lower():
                n += 1
    return n
