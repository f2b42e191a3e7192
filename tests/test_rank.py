"""ordered_global_index == the single-partition window numbering, without
the single-partition sort."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from columbiaimagesearch_spark.functions.rank import ordered_global_index
from columbiaimagesearch_spark.sources import load_table

from conftest import SF_SMOKE


def test_matches_global_window_numbering(spark):
    df = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    got = {
        int(r["o_orderkey"]): int(r["gidx"])
        for r in ordered_global_index(df, "o_orderkey").collect()
    }
    want = {
        int(r["o_orderkey"]): int(r["rn"]) - 1
        for r in df.select(
            "o_orderkey",
            F.row_number().over(Window.orderBy("o_orderkey")).alias("rn"),
        ).collect()
    }
    assert got == want
    assert sorted(got.values()) == list(range(len(got)))


def test_no_single_partition_exchange(spark):
    """The plan must contain NO SinglePartition exchange — that's the whole
    point of the two-phase rank."""
    df = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    out = ordered_global_index(df, "o_orderkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
