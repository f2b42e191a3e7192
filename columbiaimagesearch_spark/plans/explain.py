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
    """``len(keyed_exchange_blocks(plan))`` — see there for the contract."""
    return len(keyed_exchange_blocks(plan))


def keyed_exchange_blocks(plan: str) -> list[str]:
    """Detail blocks of shuffle Exchange nodes that move EXPANDED or KEYED data,
    excluding only the scan-spreading round-robin repartition that
    ``sources.parallelize_scan`` inserts on single-split sources: that
    exchange carries each input row once, directly off the scan, before
    any per-token/per-gram expansion, and vanishes on production sources
    with >= cores-many splits. The exemption is POSITIONAL, not just
    by partitioning kind: a round-robin exchange sitting above an
    explode/map stage re-shuffles the expanded stream — exactly the
    pathology the map-only plan guards exist to catch — and is counted.
    BroadcastExchange is a different node name and is never counted here.

    Formatted-mode plans print a tree section, then one detail block per
    node (``(4) Exchange`` / ``Arguments: hashpartitioning(...)``); the
    blocks classify the partitioning, the tree gives the position.

    Returning the BLOCKS (not just a count) lets payload assertions ride
    the same exemption logic: a block's ``Input [...]`` line names every
    column the exchange moves, so ``any("text#" in b for b in blocks)``
    checks whether a wide column crosses a data shuffle."""
    import re

    sections = plan.split("\n\n")
    tree = sections[0].splitlines()
    blocks: dict[int, str] = {}
    for block in sections[1:]:
        head = block.strip().splitlines()[0] if block.strip() else ""
        m = re.match(r"\((\d+)\) (\S+)", head)
        if m:
            blocks[int(m.group(1))] = block

    # nodes an Exchange may sit on top of and still be "directly off the
    # scan": pruning/evaluation shims that do not expand rows
    _SHIMS = ("Project", "Filter", "ColumnarToRow", "InputAdapter")

    def _scan_below(i: int) -> bool:
        for ln in tree[i + 1 :]:
            node = re.search(r"([A-Za-z]+[A-Za-z ]*?)\s*\(\d+\)", ln)
            if not node:
                return False
            name = node.group(1).strip()
            if name.startswith("Scan"):
                return True
            if name not in _SHIMS:
                return False
        return False

    out: list[str] = []
    for i, ln in enumerate(tree):
        m = re.search(r"(\S*Exchange) \((\d+)\)", ln)
        if not m or m.group(1) != "Exchange":
            continue
        block = blocks.get(int(m.group(2)), "")
        # optimized plans print "roundrobinpartitioning", unresolved
        # AQE-wrapped ones "RoundRobinPartitioning" — match both
        if "roundrobinpartitioning" in block.lower() and _scan_below(i):
            continue
        out.append(block)
    return out
