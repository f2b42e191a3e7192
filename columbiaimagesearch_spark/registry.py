"""Query/operator registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a
:class:`QuerySpec`: a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent ANSI SQL that DuckDB runs on the
same parquet tables. ``__spark_entry__.py`` exposes this registry to the
driver; ``tests/test_oracle_parity.py`` mirrors the driver's check locally
(row count + column names + order-insensitive value comparison).

Parity rules (Spark vs DuckDB) baked into every spec:
- alias every computed column identically on both sides;
- round every floating aggregate to a fixed number of decimals on both sides
  (summation order differs between engines; rounding removes the noise);
- CAST DuckDB ``sum(integer)`` to BIGINT (DuckDB widens to HUGEINT, Spark
  does not);
- emit epochs (BIGINT) instead of raw timestamps;
- any LIMIT/top-k carries a total tie-breaking order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None -> driver does a rows-only check
    survey_ops: tuple[str, ...] = ()  # SURVEY §2 operator ids covered
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None,
    survey_ops: tuple[str, ...] = (),
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query spec {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, survey_ops=survey_ops, doc=doc, tags=tags
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import all operator modules (side-effect: registration) and return specs."""
    from .operators import (  # noqa: F401
        ann_ivf,
        dedup,
        ledger,
        merge,
        relational,
        similarity,
        skew,
        textstats,
    )
    from .lopq import queries as lopq_queries  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
