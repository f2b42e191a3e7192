"""Skew mitigation utilities — salting for hot keys (SURVEY §7.2 hard part c).

Cell populations in a multi-index are Zipf-ish (the reference ships a
histogram diagnostic, ``lopq/lopq/eval.py:66-74``); at 100 TB a hot cell or
hot group key turns one reducer into the straggler. Two standing answers:

1. AQE (on by default in ``session.py``) splits skewed shuffle partitions at
   runtime — covers joins and most aggs with no plan change.
2. Explicit salting, here, for the cases AQE can't rebalance: algebraic
   aggregations whose single hot KEY exceeds one task's budget. Two-phase:
   spray each key over ``n_salts`` sub-keys, partial-aggregate, then merge.
   Results are identical to the direct groupBy (asserted by the DuckDB
   oracle), cost is one extra narrow aggregation of (keys × salts) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

N_SALTS = 16


def salted_count_sum(
    df: DataFrame, key: str, value: str, n_salts: int = N_SALTS
) -> DataFrame:
    """groupBy(key).agg(count, sum(value)) with a salt-spray first phase.

    The salt is the physical partition id folded into ``n_salts`` (review
    r13): the previous value-column hash collapsed to ONE salt whenever a
    hot key's rows carried a constant/low-cardinality value — exactly the
    single-hot-key case this op exists to spread — while the partition id
    spreads any key by where its rows physically live, and stays
    deterministic under task retry (a retried task keeps its partition
    id; no rand()). Count/sum are algebraic, so the regrouped partials
    merge to the identical result (integral values exactly; float sums to
    the same 4dp the oracle pins)."""
    salt: Column = F.pmod(F.spark_partition_id(), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(value).alias("_s"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_s"), 4).alias("total"),
    )


@register(
    "a_salted_hot_key_agg",
    survey_ops=("A2", "SKEW"),
    doc=f"Two-phase salted aggregation ({N_SALTS} salts) over a skewed key "
    "(l_returnflag: 3 values across all of lineitem — every key is hot). "
    "Identical result to the direct groupBy, verified by the oracle; the "
    "plan trades one wide shuffle of raw rows for partial rows.",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(l_quantity), 4) AS total
FROM lineitem
GROUP BY l_returnflag
""",
)
def a_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return salted_count_sum(li, "l_returnflag", "l_quantity")
