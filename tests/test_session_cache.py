"""cached_relation must never hand back a DataFrame bound to another
(stopped/replaced) SparkSession — the stale-handle failure mode is opaque
errors on first use after a session restart in the same process.

fixture_cache_key / evict_stale_fixture_entries (r15, VERDICT r14 #5):
the per-sf_dir module caches key on the source parquet's (mtime, size)
stamp, so a REWRITTEN fixture dir is never served stale results, and the
evicted entry's persisted blocks are released instead of pinning forever
(ADVICE r14)."""

from __future__ import annotations

from types import SimpleNamespace

from columbiaimagesearch_spark.session import (
    cached_relation,
    evict_stale_fixture_entries,
    fixture_cache_key,
)


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


def test_fixture_key_changes_when_dir_rewritten(tmp_path):
    p = tmp_path / "embeddings.parquet"
    p.write_bytes(b"v1-bytes")
    k1 = fixture_cache_key(str(tmp_path))
    assert fixture_cache_key(str(tmp_path)) == k1  # stable while unchanged
    import os

    os.utime(p, ns=(1, 1))  # rewrite-in-place: same size, new mtime
    k2 = fixture_cache_key(str(tmp_path))
    assert k2 != k1
    p.write_bytes(b"v2-bytes-longer")  # regenerated with different content
    assert fixture_cache_key(str(tmp_path)) not in (k1, k2)
    # a dir with no embeddings parquet still yields a usable (degraded) key
    assert fixture_cache_key(str(tmp_path / "nope"))[0].endswith("nope")


def test_evict_stale_fixture_entries_unpersists(spark, tmp_path):
    p = tmp_path / "embeddings.parquet"
    p.write_bytes(b"v1")
    k1 = fixture_cache_key(str(tmp_path))
    df = spark.range(5).persist()
    df.count()  # materialize so the persisted blocks exist
    other = spark.range(2)
    cache = {k1: df, ("other_dir", 0, 0): other, (*k1, 16, 20000): "centroids"}
    import os

    os.utime(p, ns=(2, 2))
    k2 = fixture_cache_key(str(tmp_path))
    evict_stale_fixture_entries(cache, k2)
    # both same-dir entries (exact and extended key) evicted; foreign kept
    assert k1 not in cache and (*k1, 16, 20000) not in cache
    assert cache == {("other_dir", 0, 0): other}
    assert df.storageLevel.useMemory is False  # unpersisted, blocks released
    # idempotent under the CURRENT stamp: entries keyed by k2 survive
    cache[k2] = df
    cache[(*k2, 16, 20000)] = "centroids"
    evict_stale_fixture_entries(cache, k2)
    assert k2 in cache and (*k2, 16, 20000) in cache


def test_rewritten_fixture_dir_not_served_stale(spark, tmp_path):
    """End-to-end on a real cached builder: fixture_model retrains after
    the fixture parquet is rewritten instead of serving the stale model."""
    import shutil

    from columbiaimagesearch_spark.lopq import queries as lq

    src = "/root/testdata/sf0.001/embeddings.parquet"
    dst = tmp_path / "embeddings.parquet"
    shutil.copy(src, dst)
    m1 = lq.fixture_model(spark, str(tmp_path))
    assert lq.fixture_model(spark, str(tmp_path)) is m1  # memoized
    shutil.copy(src, dst)  # regenerate: same bytes, fresh mtime
    m2 = lq.fixture_model(spark, str(tmp_path))
    assert m2 is not m1  # retrained, not served stale
    assert len([k for k in lq._MODEL_CACHE if k[0] == str(tmp_path)]) == 1


def test_scan_relation_memo_hits_and_invalidates(spark, tmp_path):
    """load_table memoizes the lazy scan per (path, stamp): repeat calls
    return the SAME DataFrame (no FileIndex rebuild), a rewritten file
    misses (fresh stamp), and the spread form still goes through the
    parallelize_scan seam on every call (the invariance suite's
    monkeypatch must keep working)."""
    import shutil

    from columbiaimagesearch_spark.sources import tables as tables_mod

    src = "/root/testdata/sf0.001/documents.parquet"
    dst = tmp_path / "documents.parquet"
    shutil.copy(src, dst)
    d1 = tables_mod.load_table(spark, str(tmp_path), "documents")
    assert tables_mod.load_table(spark, str(tmp_path), "documents") is d1
    shutil.copy(src, dst)  # rewrite: same bytes, fresh mtime stamp
    d2 = tables_mod.load_table(spark, str(tmp_path), "documents")
    assert d2 is not d1  # stale FileIndex never served
    # exactly one live entry for the path (old stamp evicted)
    assert (
        len([k for k in tables_mod._SCAN_CACHE if k[0] == str(dst)]) == 1
    )
    # the spread seam is applied per call, NOT captured in the memo
    calls = []
    orig = tables_mod.parallelize_scan
    tables_mod.parallelize_scan = lambda df, cache_key=None: calls.append(1) or df
    try:
        tables_mod.load_table(spark, str(tmp_path), "documents", spread=True)
        tables_mod.load_table(spark, str(tmp_path), "documents", spread=True)
    finally:
        tables_mod.parallelize_scan = orig
    assert len(calls) == 2


def test_builder_memo_hits_invalidates_and_respects_seam(spark, tmp_path):
    """registry builders memoize the lazy plan per (query, sf stamp, scan
    seam): repeat builds return the SAME DataFrame (no py4j re-construction),
    a rewritten fixture file misses (fresh dir stamp), and stubbing the
    parallelize_scan seam misses too (the spread-invariance suite's
    monkeypatch must reach repeat builds)."""
    import shutil

    from columbiaimagesearch_spark import registry
    from columbiaimagesearch_spark.sources import tables as tables_mod

    src = "/root/testdata/sf0.001"
    for t in tables_mod.TABLES:
        shutil.copy(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    b = registry.all_specs()["dedup_exact_groups"].builder
    d1 = b(spark, str(tmp_path))
    assert b(spark, str(tmp_path)) is d1
    # rewrite one input: same bytes, fresh mtime -> dir stamp changes
    shutil.copy(f"{src}/documents.parquet", tmp_path / "documents.parquet")
    d2 = b(spark, str(tmp_path))
    assert d2 is not d1
    # one live entry per query name (old stamp evicted)
    assert (
        len([k for k in registry._BUILDER_MEMO if k[0] == "dedup_exact_groups"])
        == 1
    )
    # seam stub -> miss (plan rebuilt through the stubbed seam)
    orig = tables_mod.parallelize_scan
    tables_mod.parallelize_scan = lambda df, cache_key=None: df
    try:
        d3 = b(spark, str(tmp_path))
    finally:
        tables_mod.parallelize_scan = orig
    assert d3 is not d2
    # rows unaffected by memoization
    assert sorted(map(tuple, d2.collect())) == sorted(map(tuple, d3.collect()))
