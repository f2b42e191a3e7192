"""Bucketed-layout co-located joins (sources/bucketed.py): the shuffle-free
join path heavy sha1-keyed tables take at 100 TB."""

from __future__ import annotations

import pytest

from columbiaimagesearch_spark.plans.explain import formatted_plan
from columbiaimagesearch_spark.sources import load_table
from columbiaimagesearch_spark.sources.bucketed import bucketed, save_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    save_bucketed(orders, "bkt_orders", ["o_custkey"], n_buckets=4)
    save_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "bkt_customer",
        ["o_custkey"],
        n_buckets=4,
    )
    yield "bkt_orders", "bkt_customer"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    t_orders, t_cust = bucketed_pair
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed(spark, t_orders).join(bucketed(spark, t_cust), "o_custkey")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    t_orders, t_cust = bucketed_pair
    got = (
        bucketed(spark, t_orders)
        .join(bucketed(spark, t_cust), "o_custkey")
        .groupBy("c_mktsegment")
        .count()
    )
    exp = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "customer").withColumnRenamed(
                "c_custkey", "o_custkey"
            ),
            "o_custkey",
        )
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
