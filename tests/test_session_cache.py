"""cached_relation must never hand back a DataFrame bound to another
(stopped/replaced) SparkSession — the stale-handle failure mode is opaque
errors on first use after a session restart in the same process."""

from __future__ import annotations

from types import SimpleNamespace

from columbiaimagesearch_spark.session import cached_relation


def test_hit_on_same_session(spark):
    cache = {}
    df = spark.range(3)
    assert cached_relation(cache, spark, "k", lambda: df) is df
    # second lookup: cache hit, builder not invoked
    def boom():
        raise AssertionError("builder must not run on a hit")

    assert cached_relation(cache, spark, "k", boom) is df


def test_rebuild_when_cached_handle_belongs_to_other_session(spark):
    cache = {"k": SimpleNamespace(sparkSession=object())}  # foreign session
    fresh = spark.range(1)
    got = cached_relation(cache, spark, "k", lambda: fresh)
    assert got is fresh
    assert cache["k"] is fresh  # stale entry replaced
