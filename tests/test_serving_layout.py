"""Serving searcher == distributed search; cell layout actually prunes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from columbiaimagesearch_spark.lopq import layout
from columbiaimagesearch_spark.lopq.queries import (
    QUOTA,
    TOP_K,
    codes_df,
    fixture_model,
)
from columbiaimagesearch_spark.lopq.search import search
from columbiaimagesearch_spark.lopq.serving import ServingSearcher
from columbiaimagesearch_spark.sources import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def model(spark):
    return fixture_model(spark, SF_SMOKE)


@pytest.fixture(scope="module")
def codes(spark):
    return codes_df(spark, SF_SMOKE).persist()


@pytest.fixture(scope="module")
def queries_np(spark):
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    )
    return [(int(r["vec_id"]), np.array(r["embedding"])) for r in rows]


def test_serving_matches_distributed_search(spark, model, codes, queries_np):
    serving = ServingSearcher(model).load_codes(codes)
    assert serving.n_items == codes.count()
    dist = search(spark, codes, model, queries_np, quota=QUOTA, k=TOP_K)
    by_qid: dict[int, list] = {}
    for r in dist.orderBy("qid", "rank").collect():
        by_qid.setdefault(int(r["qid"]), []).append(
            (int(r["id"]), round(float(r["adc_dist"]), 9))
        )
    for qid, q in queries_np:
        got = [(i, round(d, 9)) for i, d in serving.search(q, quota=QUOTA, k=TOP_K)]
        assert got == by_qid[qid], f"serving != distributed for qid={qid}"


def test_serving_rerank_matches_distributed(spark, model, codes, queries_np):
    """Serving rerank (ADC shortlist -> exact L2 re-sort) must equal the
    distributed rerank path row-for-row — both via resident vectors and
    via the production fetch-callback shape."""
    from columbiaimagesearch_spark.lopq.queries import RERANK_NB

    emb = load_table(spark, SF_SMOKE, "embeddings")
    serving = ServingSearcher(model).load_codes(codes).load_vectors(emb)
    dist = search(
        spark, codes, model, queries_np, quota=QUOTA, k=TOP_K,
        vectors=emb, rerank_nb=RERANK_NB,
    )
    by_qid: dict[int, list] = {}
    for r in dist.orderBy("qid", "rank").collect():
        by_qid.setdefault(int(r["qid"]), []).append(
            (int(r["id"]), round(float(r["adc_dist"]), 9), round(float(r["exact_dist"]), 9))
        )
    rows = emb.select("vec_id", "embedding").collect()
    vec_map = {int(r["vec_id"]): np.array(r["embedding"]) for r in rows}

    def fetch(ids):
        return np.stack([vec_map[int(i)] for i in ids])

    for qid, q in queries_np:
        got_res = [
            (i, round(a, 9), round(e, 9))
            for i, a, e in serving.search(q, quota=QUOTA, k=TOP_K, rerank_nb=RERANK_NB)
        ]
        assert got_res == by_qid[qid], f"resident-vector rerank != dist for {qid}"
        got_cb = [
            (i, round(a, 9), round(e, 9))
            for i, a, e in serving.search(
                q, quota=QUOTA, k=TOP_K, rerank_nb=RERANK_NB, fetch_vectors=fetch
            )
        ]
        assert got_cb == by_qid[qid], f"callback rerank != dist for {qid}"


def test_serving_rerank_requires_vectors(spark, model, codes, queries_np):
    s = ServingSearcher(model).load_codes(codes)
    with pytest.raises(ValueError, match="fetch_vectors or load_vectors"):
        s.search(queries_np[0][1], quota=QUOTA, k=TOP_K, rerank_nb=10)


def test_serving_incremental_add_dedups(spark, model, codes):
    first = codes.where(F.col("id") < 250)
    rest = codes.where(F.col("id") >= 250)
    s = ServingSearcher(model).load_codes(first)
    n1 = s.n_items
    s.add_codes(rest)
    assert s.n_items == codes.count()
    # re-adding existing codes is a no-op (J7 dedup semantics)
    s.add_codes(first.limit(50))
    assert s.n_items == codes.count()
    assert n1 < s.n_items


def test_serving_add_batch_with_internal_dups(spark, model, codes):
    """A single add batch containing repeated (cell, id) rows must land each
    id once (first occurrence wins) — the vectorized group-per-cell path."""
    base = codes.where(F.col("id") < 100)
    incoming = codes.where(F.col("id") >= 100)
    s = ServingSearcher(model).load_codes(base)
    s.add_codes(incoming.unionByName(incoming))  # every row duplicated
    assert s.n_items == codes.count()
    # contents equal to a fresh full load, cell by cell
    full = ServingSearcher(model).load_codes(codes)
    assert set(s._cells) == set(full._cells)
    for c in full._cells:
        ids_a = sorted(s._cells[c][0].tolist())
        ids_b = sorted(full._cells[c][0].tolist())
        assert ids_a == ids_b, f"cell {c} id mismatch"


def test_cell_counts_histogram_cap(spark, codes, monkeypatch):
    """An index spread over more occupied cells than the cap must fail
    loudly with the sharding recipe, not balloon the driver."""
    from columbiaimagesearch_spark.lopq import search as search_mod

    n_cells = codes.select("cell").distinct().count()
    monkeypatch.setattr(search_mod, "MAX_OCCUPIED_CELLS", n_cells - 1)
    with pytest.raises(ValueError, match="occupied cells"):
        search_mod._cell_counts(codes)
    monkeypatch.setattr(search_mod, "MAX_OCCUPIED_CELLS", n_cells)
    counts = search_mod._cell_counts(codes)
    assert sum(counts.values()) == codes.count()


def test_cell_partitioned_layout_prunes(spark, codes, tmp_path):
    path = str(tmp_path / "codes_by_cell")
    layout.write_codes_partitioned(codes, path)
    table = layout.read_codes(spark, path)
    assert table.count() == codes.count()

    cells = [int(r["cell"]) for r in codes.select("cell").distinct().limit(3).collect()]
    probed = layout.probe_cells(table, cells)
    # the scan must carry the IN-list as a PARTITION filter (directory
    # pruning), not a post-scan data filter
    from columbiaimagesearch_spark.plans.explain import formatted_plan

    plan = formatted_plan(probed)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, f"no PartitionFilters in plan:\n{plan}"
    assert any("cell" in ln and "IN" in ln for ln in pf), pf
    # and the probe answers match an unpartitioned filter
    expect = sorted(
        (int(r["id"]), int(r["cell"]))
        for r in codes.where(F.col("cell").isin(cells)).select("id", "cell").collect()
    )
    got = sorted((int(r["id"]), int(r["cell"])) for r in probed.select("id", "cell").collect())
    assert got == expect


def test_bucketed_layout_roundtrip(spark, codes, tmp_path):
    path = str(tmp_path / "codes_bucketed")
    layout.write_codes_partitioned(codes, path, bucket_cells=8)
    table = layout.read_codes(spark, path)
    assert table.count() == codes.count()
    cells = [int(r["cell"]) for r in codes.select("cell").distinct().limit(2).collect()]
    probed = layout.probe_cells(table, cells, bucket_cells=8)
    from columbiaimagesearch_spark.plans.explain import formatted_plan

    plan = formatted_plan(probed)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cell_bucket" in ln and "IN" in ln for ln in pf), pf
    assert probed.count() == codes.where(F.col("cell").isin(cells)).count()


def test_histogram_sidecar_matches_codes(spark, codes, tmp_path):
    path = str(tmp_path / "codes_hist")
    layout.write_codes_partitioned(codes, path, bucket_cells=8)
    hist = layout.read_cell_histogram(spark, path)
    want = {
        int(r["cell"]): int(r["n"])
        for r in codes.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert hist == want
    # the sidecar must be invisible to the data scan
    assert layout.read_codes(spark, path).count() == codes.count()


def test_search_from_bucketed_layout(spark, model, codes, queries_np, tmp_path):
    """The production read path: search planned from the histogram sidecar
    against the bucketed layout must (a) return exactly what search() on
    the raw codes relation returns, and (b) show directory pruning on
    cell_bucket AND a pushed cell filter in the scan plan."""
    from columbiaimagesearch_spark.plans.explain import formatted_plan

    path = str(tmp_path / "codes_prod")
    layout.write_codes_partitioned(codes, path, bucket_cells=8)

    got = layout.search_from_layout(
        spark, path, model, queries_np, quota=QUOTA, k=TOP_K, bucket_cells=8
    )
    want = search(spark, codes, model, queries_np, quota=QUOTA, k=TOP_K)
    as_rows = lambda df: sorted(  # noqa: E731
        (int(r["qid"]), int(r["rank"]), int(r["id"]), round(float(r["adc_dist"]), 9))
        for r in df.collect()
    )
    assert as_rows(got) == as_rows(want)

    plan = formatted_plan(got)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cell_bucket" in ln and "IN" in ln for ln in pf), pf
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("In(cell" in ln for ln in pushed), pushed


def test_bucketed_layout_row_group_pruning(spark, codes, tmp_path):
    """Row-group pruning inside a bucket directory: files are cell-sorted,
    so with multiple row groups per file the parquet min/max stats let the
    pushed cell filter skip whole groups. Written with a tiny row-group
    size to force multi-group files, then proven from the parquet footers:
    (a) cell stats are monotone across each file's groups (the sort
    guarantee), (b) a single-cell probe overlaps a strict subset of the
    groups."""
    import pyarrow.parquet as pq
    from pathlib import Path

    path = str(tmp_path / "codes_rg")
    layout.write_codes_partitioned(
        codes, path, bucket_cells=2, row_group_bytes=1024
    )
    files = sorted(Path(path).glob("cell_bucket=*/*.parquet"))
    assert files
    multi_group = False
    total_groups = 0
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        idx = next(
            i for i in range(len(md.schema))
            if md.schema.column(i).name == "cell"
        )
        stats = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        assert all(s is not None and s.has_min_max for s in stats)
        # monotone: the writer's sortWithinPartitions("cell") guarantee
        for a, b in zip(stats, stats[1:]):
            assert a.max <= b.min
        multi_group = multi_group or md.num_row_groups > 1
        total_groups += md.num_row_groups
        # a probe of the first group's min cell can skip every group whose
        # range excludes it
        probe_cell = stats[0].min
        matching = sum(1 for s in stats if s.min <= probe_cell <= s.max)
        if md.num_row_groups > 1:
            assert matching < md.num_row_groups
    assert multi_group, "row_group_bytes failed to force multi-group files"


def test_layout_is_self_describing(spark, model, codes, queries_np, tmp_path):
    """search_from_layout reads bucket_cells from the writer-recorded
    metadata (no caller knowledge needed); an explicit mismatch raises
    instead of silently pruning correct directories."""
    path = str(tmp_path / "codes_auto")
    layout.write_codes_partitioned(codes, path, bucket_cells=8)
    assert layout.read_layout_meta(spark, path) == 8
    got = layout.search_from_layout(spark, path, model, queries_np[:2], quota=QUOTA, k=TOP_K)
    want = search(spark, codes, model, queries_np[:2], quota=QUOTA, k=TOP_K)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    with pytest.raises(ValueError, match="recorded bucketing"):
        layout.search_from_layout(
            spark, path, model, queries_np[:1], quota=QUOTA, k=TOP_K, bucket_cells=4
        )


def test_production_bootstrap_roundtrip(spark, model, codes, queries_np, tmp_path):
    """The full deploy story: persist the model (parquet artifact) and the
    codes as the bucketed layout, then bootstrap BOTH read paths from disk
    in a fresh state — the distributed pruned search and a serving replica
    — and require row-identical answers to the original in-session search.
    This is what a real rollout does: train once, write artifacts, serve
    from artifacts."""
    from columbiaimagesearch_spark.lopq import store

    mpath, cpath = str(tmp_path / "model_artifact"), str(tmp_path / "codes_prod2")
    store.save_model(spark, model, mpath)
    layout.write_codes_partitioned(codes, cpath, bucket_cells=8)

    m2 = store.load_model(spark, mpath)
    want = {}
    for r in search(spark, codes, model, queries_np, quota=QUOTA, k=TOP_K).collect():
        want.setdefault(int(r["qid"]), []).append(
            (int(r["rank"]), int(r["id"]), round(float(r["adc_dist"]), 9))
        )
    # distributed pruned read path from the persisted artifacts
    got = layout.search_from_layout(
        spark, cpath, m2, queries_np, quota=QUOTA, k=TOP_K, bucket_cells=8
    )
    for r in got.collect():
        assert (int(r["rank"]), int(r["id"]), round(float(r["adc_dist"]), 9)) in want[
            int(r["qid"])
        ]
    # serving replica bootstrapped from the same layout
    replica = ServingSearcher(m2).load_codes(
        layout.read_codes(spark, cpath).select("cell", "id", "fine")
    )
    for qid, q in queries_np:
        got_s = [
            (rk + 1, i, round(d, 9))
            for rk, (i, d) in enumerate(replica.search(q, quota=QUOTA, k=TOP_K))
        ]
        assert got_s == sorted(want[qid]), f"replica != batch for qid={qid}"


def test_serving_snapshot_budget_enforced(spark, model, codes):
    """An over-budget codes table must raise BEFORE any collect (driver OOM
    is never the failure mode); a cell-range shard under the same budget
    loads fine — the documented scale-out path."""
    import pytest as _pytest

    n = codes.count()
    with _pytest.raises(ValueError, match="serving replica budget"):
        ServingSearcher(model, max_rows=n - 1).load_codes(codes)

    # cell-range sharding: each replica holds a slice under its budget
    from pyspark.sql import functions as F

    lo_half = codes.where(F.col("cell") < model.V * model.V // 2)
    shard = ServingSearcher(model, max_rows=n - 1).load_codes(lo_half)
    assert 0 < shard.n_items < n

    # add_codes shares the budget
    s = ServingSearcher(model, max_rows=n - 1).load_codes(lo_half)
    with _pytest.raises(ValueError, match="serving replica budget"):
        s.add_codes(codes)


def test_incremental_append_to_layout(spark, model, codes, queries_np, tmp_path):
    """ST6 meets the pruned read path: append an increment into the
    bucketed layout, and search_from_layout over the refreshed layout
    equals search() over the full codes relation; the merged sidecar
    matches true per-cell counts, and rebuild_histogram reproduces it."""
    path = str(tmp_path / "codes_incr")
    first = codes.where(F.col("id") < 250)
    rest = codes.where(F.col("id") >= 250)
    layout.write_codes_partitioned(first, path, bucket_cells=8)
    layout.append_codes_to_layout(rest, path)

    want_hist = {
        int(r["cell"]): int(r["n"])
        for r in codes.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert layout.read_cell_histogram(spark, path) == want_hist

    got = layout.search_from_layout(spark, path, model, queries_np, quota=QUOTA, k=TOP_K)
    want = search(spark, codes, model, queries_np, quota=QUOTA, k=TOP_K)
    rows = lambda df: sorted(  # noqa: E731
        (int(r["qid"]), int(r["rank"]), int(r["id"]), round(float(r["adc_dist"]), 9))
        for r in df.collect()
    )
    assert rows(got) == rows(want)

    # recovery path reproduces the same sidecar from the data
    layout.rebuild_histogram(spark, path)
    assert layout.read_cell_histogram(spark, path) == want_hist


def test_appended_files_stay_cell_sorted(spark, codes, tmp_path):
    """Files landed by append_codes_to_layout must be cell-sorted too
    (monotone row-group min/max), or the refreshed part of the index
    silently loses row-group prunability."""
    import pyarrow.parquet as pq
    from pathlib import Path

    path = str(tmp_path / "codes_append_rg")
    layout.write_codes_partitioned(
        codes.where(F.col("id") < 250), path, bucket_cells=2, row_group_bytes=1024
    )
    before = {str(f) for f in Path(path).glob("cell_bucket=*/*.parquet")}
    layout.append_codes_to_layout(
        codes.where(F.col("id") >= 250), path, row_group_bytes=1024
    )
    appended = [
        f for f in Path(path).glob("cell_bucket=*/*.parquet") if str(f) not in before
    ]
    assert appended, "append must land new files"
    for f in appended:
        md = pq.ParquetFile(str(f)).metadata
        idx = next(
            i for i in range(len(md.schema)) if md.schema.column(i).name == "cell"
        )
        stats = [
            md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)
        ]
        for a, b in zip(stats, stats[1:]):
            assert a.max <= b.min, f"appended file {f} not cell-sorted"
    # the tiny row-group size must actually yield multi-group appended files
    # somewhere, or the monotonicity check above proves nothing
    assert any(
        pq.ParquetFile(str(f)).metadata.num_row_groups > 1 for f in appended
    ), "expected at least one multi-row-group appended file"


def test_crashed_append_detected_and_auto_repaired(
    spark, model, codes, queries_np, tmp_path, monkeypatch
):
    """Crash between the data append and the sidecar merge: the intent
    marker stays set, so the next search_from_layout must DETECT the stale
    sidecar, plan from an in-memory data rebuild, and return the same
    answers as a search over the full codes relation — never silently
    under-visit the newly landed cells. The READER must NOT write the
    sidecar or clear the marker (the marker may belong to a live writer;
    a reader-side clear would hide a post-data crash of that append) —
    repair of the on-disk state is writer-side (explicit rebuild or the
    next append's pre-repair)."""
    path = str(tmp_path / "codes_crash")
    first = codes.where(F.col("id") < 250)
    rest = codes.where(F.col("id") >= 250)
    layout.write_codes_partitioned(first, path, bucket_cells=8)
    assert not layout.layout_is_pending(path)

    # crash at the sidecar overwrite itself: the data append has landed,
    # the histogram has not (the real crash window)
    from pyspark.sql.readwriter import DataFrameWriter

    real_parquet = DataFrameWriter.parquet

    def boom(self, p, *a, **kw):
        if p.rstrip("/").endswith(layout.HISTOGRAM_DIR):
            raise RuntimeError("simulated crash before sidecar merge")
        return real_parquet(self, p, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        layout.append_codes_to_layout(rest, path)
    monkeypatch.undo()

    # data landed, sidecar did not: marker set, sidecar under-counts
    assert layout.layout_is_pending(path)
    true_hist = {
        int(r["cell"]): int(r["n"])
        for r in codes.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert layout.read_cell_histogram(spark, path) != true_hist

    with pytest.warns(RuntimeWarning, match="interrupted append"):
        got = layout.search_from_layout(
            spark, path, model, queries_np, quota=QUOTA, k=TOP_K
        )
    rows = lambda df: sorted(  # noqa: E731
        (int(r["qid"]), int(r["rank"]), int(r["id"]), round(float(r["adc_dist"]), 9))
        for r in df.collect()
    )
    want = search(spark, codes, model, queries_np, quota=QUOTA, k=TOP_K)
    assert rows(got) == rows(want)
    # the reader answered correctly but left the on-disk state alone:
    # marker still set, sidecar still stale (writer-side repair owns them)
    assert layout.layout_is_pending(path)
    assert layout.read_cell_histogram(spark, path) != true_hist
    # writer-side repair commits: marker cleared, sidecar matches the data
    layout.rebuild_histogram(spark, path)
    assert not layout.layout_is_pending(path)
    assert layout.read_cell_histogram(spark, path) == true_hist


def test_append_onto_crashed_layout_repairs_first(
    spark, model, codes, tmp_path, monkeypatch
):
    """An append that finds a stale intent marker must repair the sidecar
    BEFORE merging — otherwise its merge bakes the crashed predecessor's
    under-count in forever (ADVICE r5 marker-protocol hardening)."""
    from pyspark.sql.readwriter import DataFrameWriter

    path = str(tmp_path / "codes_crash_then_append")
    a = codes.where(F.col("id") < 200)
    b = codes.where((F.col("id") >= 200) & (F.col("id") < 350))
    c = codes.where(F.col("id") >= 350)
    layout.write_codes_partitioned(a, path, bucket_cells=8)

    real_parquet = DataFrameWriter.parquet

    def boom(self, p, *arg, **kw):
        if p.rstrip("/").endswith(layout.HISTOGRAM_DIR):
            raise RuntimeError("simulated crash before sidecar merge")
        return real_parquet(self, p, *arg, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        layout.append_codes_to_layout(b, path)
    monkeypatch.undo()
    assert layout.layout_is_pending(path)

    # the NEXT append repairs first, then merges — sidecar ends exact
    layout.append_codes_to_layout(c, path)
    assert not layout.layout_is_pending(path)
    true_hist = {
        int(r["cell"]): int(r["n"])
        for r in codes.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert layout.read_cell_histogram(spark, path) == true_hist


def test_rebuild_keeps_marker_replaced_midway(spark, codes, tmp_path):
    """rebuild_histogram clears ONLY the marker token it started with: a
    marker re-asserted by a new writer mid-rebuild survives (the reader
    can't prove it stale)."""
    path = str(tmp_path / "codes_token")
    layout.write_codes_partitioned(codes, path, bucket_cells=8)
    stale_token = layout._write_pending_marker(path)
    # simulate a NEW append starting mid-rebuild: replace the marker token
    # before rebuild runs its clear step
    import columbiaimagesearch_spark.lopq.layout as lay

    orig_clear = lay._clear_pending_marker

    def swap_then_clear(p, token):
        assert token == stale_token
        lay._write_pending_marker(p)  # new writer asserts intent
        orig_clear(p, token)

    lay_clear = lay._clear_pending_marker
    try:
        lay._clear_pending_marker = swap_then_clear
        layout.rebuild_histogram(spark, path)
    finally:
        lay._clear_pending_marker = lay_clear
    # the new writer's marker must still be present
    assert layout.layout_is_pending(path)


def test_budget_guard_exact_boundary(spark, model, codes):
    """The snapshot budget at its exact limit: loading precisely max_rows
    succeeds, one more row over (via add_codes) raises BEFORE any collect
    — the guard is conservative (checks incoming+existing, pre-dedup)."""
    n = codes.count()
    s = ServingSearcher(model, max_rows=n).load_codes(codes)
    assert s.n_items == n
    with pytest.raises(ValueError, match="serving replica budget"):
        s.add_codes(codes.limit(1))


def test_sharded_router_equals_single_replica(spark, model, codes, queries_np):
    """The scale-out recipe implemented: cell-range shards behind a router
    must answer EVERY query identically to one replica holding the whole
    index — ADC path and rerank path (shortlist fetch_vectors) alike —
    because the router plans the multisequence traversal on the merged
    histogram, not per-shard."""
    from columbiaimagesearch_spark.lopq.serving import ShardedServingRouter
    from columbiaimagesearch_spark.sources import load_table

    single = ServingSearcher(model).load_codes(codes)
    n = codes.count()
    router = ShardedServingRouter.build(
        model, codes, n_shards=4, max_rows_per_shard=n  # each shard < total
    )
    assert router.n_items == n
    assert len(router.shards) == 4
    sizes = [s.n_items for _, _, s in router.shards]
    assert all(sz < n for sz in sizes), sizes  # genuinely sharded
    # histogram-mass split: no shard more than ~2x the ideal share
    assert max(sizes) <= 2 * (n // 4 + 1), sizes

    vec_map = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }

    def fetch(ids):
        return np.stack([vec_map[int(i)] for i in ids])

    for qid, q in queries_np:
        got = router.search(q, quota=QUOTA, k=TOP_K)
        want = single.search(q, quota=QUOTA, k=TOP_K)
        assert got == want, f"ADC path diverged for qid={qid}"
        got_rr = router.search(q, quota=QUOTA, k=TOP_K, rerank_nb=40,
                               fetch_vectors=fetch)
        want_rr = single.search(q, quota=QUOTA, k=TOP_K, rerank_nb=40,
                                fetch_vectors=fetch)
        assert got_rr == want_rr, f"rerank path diverged for qid={qid}"


def test_router_equals_replica_on_skewed_cells(spark, model, codes, queries_np):
    """The Zipf-skew scenario the r7 bench measures for LATENCY
    (serving_skew_ms), pinned here for CORRECTNESS: with ~10% of all rows
    remapped into the naturally hottest cell, the cumulative-mass split
    concentrates that cell on one shard — answers must still equal a
    single whole-index replica's exactly (the router plans the traversal
    on the merged histogram, so a fat cell changes load, never results)."""
    from columbiaimagesearch_spark.lopq.serving import ShardedServingRouter

    base = ServingSearcher(model).load_codes(codes)
    hot = int(max(base.cell_counts, key=base.cell_counts.get))
    skewed = codes.withColumn(
        "cell",
        F.when(F.col("id") % 10 == 7, F.lit(hot)).otherwise(F.col("cell")),
    )
    single = ServingSearcher(model).load_codes(skewed)
    assert single.cell_counts[hot] > base.cell_counts[hot]
    router = ShardedServingRouter.build(
        model, skewed, n_shards=4, max_rows_per_shard=single.n_items
    )
    assert router.n_items == single.n_items
    for qid, q in queries_np:
        got = router.search(q, quota=QUOTA, k=TOP_K)
        want = single.search(q, quota=QUOTA, k=TOP_K)
        assert got == want, f"skewed ADC path diverged for qid={qid}"


def test_from_replica_resharding_identical(spark, model, codes):
    """from_replica re-shards a LIVE replica in memory: same ranges as
    build() on the same populations, zero re-read, identical answers on
    both the ADC and rerank paths, and resident vectors route to the
    shard owning their cell."""
    from columbiaimagesearch_spark.lopq.serving import ShardedServingRouter
    from columbiaimagesearch_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    single = ServingSearcher(model).load_codes(codes).load_vectors(emb)
    built = ShardedServingRouter.build(model, codes, n_shards=4)
    resharded = ShardedServingRouter.from_replica(single, 4)
    # a TIGHTLY-capped source replica must not pass its cap to the shards
    # (build's shards default to MAX_SNAPSHOT_ROWS; from_replica matches,
    # or the very next add would spuriously hit the inherited budget)
    from columbiaimagesearch_spark.lopq.serving import MAX_SNAPSHOT_ROWS

    tight = ServingSearcher(model, max_rows=single.n_items).load_codes(codes)
    for _lo, _hi, s in ShardedServingRouter.from_replica(tight, 4).shards:
        assert s.max_rows == MAX_SNAPSHOT_ROWS
    assert [(lo, hi) for lo, hi, _ in resharded.shards] == [
        (lo, hi) for lo, hi, _ in built.shards
    ]
    assert resharded.n_items == single.n_items
    # vectors landed on exactly the shard owning their cell
    total_vecs = sum(
        len(getattr(s, "_vectors", {})) for _, _, s in resharded.shards
    )
    assert total_vecs == len(single._vectors)

    qs = [
        np.array(r["embedding"], dtype=np.float64)
        for r in emb.where(F.col("vec_id") < 4).select("embedding").collect()
    ]
    for q in qs:
        assert resharded.search(q, quota=QUOTA, k=TOP_K) == single.search(
            q, quota=QUOTA, k=TOP_K
        )
        got_rr = resharded.search(
            q, quota=QUOTA, k=TOP_K, rerank_nb=40,
            fetch_vectors=resharded.resident_vectors,
        )
        want_rr = single.search(
            q, quota=QUOTA, k=TOP_K, rerank_nb=40,
            fetch_vectors=single.resident_vectors,
        )
        assert got_rr == want_rr


def test_sharded_router_respects_per_shard_budget(spark, model, codes):
    """Each shard's replica enforces its own budget: a per-shard cap below
    the largest shard's mass raises the standard budget error."""
    from columbiaimagesearch_spark.lopq.serving import ShardedServingRouter

    n = codes.count()
    with pytest.raises(ValueError, match="serving replica budget"):
        ShardedServingRouter.build(model, codes, n_shards=2,
                                   max_rows_per_shard=n // 4)


def test_sharded_router_add_codes_all_or_nothing(spark, model, codes):
    """router.add_codes checks EVERY shard's budget before ANY shard
    admits: a batch that would overflow one shard leaves the whole router
    untouched — no partial admit whose ids the caller's metadata never
    learned about (a mid-loop raise used to corrupt the service
    permanently)."""
    from columbiaimagesearch_spark.lopq.serving import ShardedServingRouter

    first = codes.where(F.col("id") < 250)
    rest = codes.where(F.col("id") >= 250)
    n_first = first.count()
    router = ShardedServingRouter.build(model, first, n_shards=2)
    for _lo, _hi, s in router.shards:
        # headroom fits only a few more rows per shard, so `rest` must
        # overflow at least one shard
        s.max_rows = s.n_items + 5
    before = {
        (lo, hi): s.n_items for lo, hi, s in router.shards
    }
    with pytest.raises(ValueError, match="serving replica budget"):
        router.add_codes(rest)
    after = {(lo, hi): s.n_items for lo, hi, s in router.shards}
    assert after == before  # NOTHING admitted anywhere
    assert router.n_items == n_first


def test_fat_cell_slices_across_distinct_shards(spark, model, codes, queries_np):
    """A Zipf-fat cell must actually SPLIT (r8, VERDICT r7 #4): the planner
    slices it by id-mod across distinct shards so per-query work on the hot
    cell divides too — and build/from_replica agree on the slicing, answers
    stay identical to one replica, and add_codes routes new rows of a split
    cell to exactly one slice owner."""
    from columbiaimagesearch_spark.lopq.serving import ShardedServingRouter

    base = ServingSearcher(model).load_codes(codes)
    hot = int(max(base.cell_counts, key=base.cell_counts.get))
    first = codes.where(F.col("id") % 17 != 3)
    rest = codes.where(F.col("id") % 17 == 3)
    skewed_first = first.withColumn(
        "cell",
        F.when(F.col("id") % 10 == 7, F.lit(hot)).otherwise(F.col("cell")),
    )
    skewed_all = codes.withColumn(
        "cell",
        F.when(F.col("id") % 10 == 7, F.lit(hot)).otherwise(F.col("cell")),
    )
    single = ServingSearcher(model).load_codes(skewed_first)
    router = ShardedServingRouter.build(model, skewed_first, n_shards=4)

    # the hot cell engaged the slicer: distinct owners, every slice bounded
    # by ~the cell's share, total preserved
    assert hot in router._splits, router._splits
    owners = router._splits[hot]
    assert len(owners) >= 2 and len(set(owners)) == len(owners)
    hot_total = single.cell_counts[hot]
    slice_sizes = [
        router.shards[o][2].cell_counts.get(hot, 0) for o in set(owners)
    ]
    assert sum(slice_sizes) == hot_total
    # mixed-hash split: binomially balanced, not exact — 2x fair share is
    # many standard deviations out at any cell size
    assert max(slice_sizes) <= 2 * -(-hot_total // len(owners))
    assert router.n_items == single.n_items

    # from_replica plans the identical slicing from resident arrays
    resharded = ShardedServingRouter.from_replica(single, 4)
    assert resharded._splits == router._splits
    assert [(lo, hi) for lo, hi, _ in resharded.shards] == [
        (lo, hi) for lo, hi, _ in router.shards
    ]

    # answers identical to the whole-index replica through the split path
    for qid, q in queries_np:
        assert router.search(q, quota=QUOTA, k=TOP_K) == single.search(
            q, quota=QUOTA, k=TOP_K
        ), f"split ADC path diverged for qid={qid}"

    # incremental add into a split cell: each new row lands on exactly its
    # id-mod owner; router answers track a replica fed the same batch
    skewed_rest = rest.withColumn(
        "cell",
        F.when(F.col("id") % 10 == 7, F.lit(hot)).otherwise(F.col("cell")),
    )
    router.add_codes(skewed_rest)
    single.add_codes(skewed_rest)
    assert router.n_items == single.n_items
    m = len(owners)
    full = ServingSearcher(model).load_codes(skewed_all)
    from columbiaimagesearch_spark.lopq.serving import _slice_of_ids

    for j, o in enumerate(owners):
        ids, _f = router.shards[o][2]._cells[hot]
        assert (_slice_of_ids(ids, m) == j).all()
    assert sum(
        router.shards[o][2].cell_counts.get(hot, 0) for o in set(owners)
    ) == full.cell_counts[hot]
    for qid, q in queries_np:
        assert router.search(q, quota=QUOTA, k=TOP_K) == single.search(
            q, quota=QUOTA, k=TOP_K
        ), f"post-add split path diverged for qid={qid}"


def test_router_single_cell_degenerate(spark, model, codes, queries_np):
    """Degenerate histogram: EVERY row forced into one cell. The planner
    slices it across all shards, pads the tail ranges, and the router must
    still answer exactly like a whole-index replica (the pad path and the
    all-mass-split walk are otherwise never exercised)."""
    from columbiaimagesearch_spark.lopq.serving import ShardedServingRouter

    one_cell = codes.withColumn("cell", F.lit(3))
    single = ServingSearcher(model).load_codes(one_cell)
    router = ShardedServingRouter.build(model, one_cell, n_shards=4)
    assert router.n_items == single.n_items
    assert 3 in router._splits and len(set(router._splits[3])) >= 2
    assert len(router.shards) == 4
    for qid, q in queries_np:
        assert router.search(q, quota=QUOTA, k=TOP_K) == single.search(
            q, quota=QUOTA, k=TOP_K
        ), f"degenerate single-cell path diverged for qid={qid}"


def test_split_owner_lists_rotate_across_cells():
    """ADVICE r8: multiple split cells with the same m must land their
    slices on DIFFERENT shard sets — without rotation every owner list
    starts at shard 0, so shard 0 owns a slice of EVERY split cell and a
    query visiting several split cells concentrates its work there."""
    from columbiaimagesearch_spark.lopq.serving import _plan_shard_claims

    # two fat cells (each > per_shard/4 of the total), same mass -> same m
    hist = [(1, 4000), (2, 4000), (3, 100), (4, 100)]
    _ranges, splits = _plan_shard_claims(hist, n_shards=8, last_cell=15)
    assert set(splits) == {1, 2}
    a, b = splits[1], splits[2]
    assert len(set(a)) == len(a) and len(set(b)) == len(b)  # distinct owners
    assert a != b, "owner lists must rotate across split cells"
    # first slices of the two cells on different shards
    assert a[0] != b[0]


def test_split_slice_stats_telemetry(spark, model, codes):
    """The CELL_SLICE_FACTOR cap telemetry: a single-cell degenerate
    index caps m at n_shards; split_slice_stats must say so and report
    the residual slice size (~rows/n_shards)."""
    from columbiaimagesearch_spark.lopq.serving import ShardedServingRouter

    one_cell = codes.withColumn("cell", F.lit(3))
    router = ShardedServingRouter.build(model, one_cell, n_shards=4)
    stats = router.split_slice_stats
    assert stats["split_cells"] == 1
    assert stats["capped_split_cells"] == 1  # m hit n_shards
    n = codes.count()
    assert 0 < stats["max_slice_rows"] <= n  # residual, visible
    # roughly even slices: no slice more than 2x the fair share
    assert stats["max_slice_rows"] <= 2 * (n // 4 + 1)


def test_forked_pool_matches_sequential_router(spark, model, codes, queries_np):
    """ForkedRouterPool (process-parallel fan-out, COW-shared arrays,
    k-sized replies) must answer EXACTLY like the sequential router —
    including through split cells (the skew path it exists to serve)."""
    from columbiaimagesearch_spark.lopq.serving import (
        ForkedRouterPool,
        ServingSearcher,
        ShardedServingRouter,
    )

    # skew a slice of rows into the hottest cell so splits exist
    single = ServingSearcher(model).load_codes(codes)
    hot = int(max(single.cell_counts, key=single.cell_counts.get))
    skewed = codes.withColumn(
        "cell",
        F.when(F.col("id") % 3 == 1, F.lit(hot)).otherwise(F.col("cell")),
    )
    router = ShardedServingRouter.build(model, skewed, n_shards=4)
    assert router._splits, "fixture must exercise the split path"
    with ForkedRouterPool(router) as pool:
        for qid, q in queries_np:
            assert pool.search(q, quota=QUOTA, k=TOP_K) == router.search(
                q, quota=QUOTA, k=TOP_K
            ), f"forked pool diverged for qid={qid}"
    # pool is closed; workers are gone
    assert not pool._procs


def test_forked_pool_rerank_matches_sequential_router(
    spark, model, codes, queries_np
):
    """Pool rerank (workers reply local top-max(k, rerank_nb); parent
    merges, fetches resident vectors, exact-sorts) must equal the
    sequential router's rerank path tuple-for-tuple."""
    from columbiaimagesearch_spark.lopq.serving import (
        ForkedRouterPool,
        ShardedServingRouter,
    )
    from columbiaimagesearch_spark.sources import load_table

    router = ShardedServingRouter.build(model, codes, n_shards=4)
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    id_cells = {
        int(r["id"]): int(r["cell"])
        for r in codes.select("id", "cell").collect()
    }
    for r in emb.collect():
        vid = int(r["vec_id"])
        if vid in id_cells:
            router.put_vector(
                vid, np.asarray(r["embedding"], dtype=np.float64),
                cell=id_cells[vid],
            )
    with ForkedRouterPool(router) as pool:
        for qid, q in queries_np:
            want = router.search(
                q, quota=QUOTA, k=TOP_K, rerank_nb=4 * TOP_K,
                fetch_vectors=router.resident_vectors,
            )
            got = pool.search(
                q, quota=QUOTA, k=TOP_K, rerank_nb=4 * TOP_K,
                fetch_vectors=router.resident_vectors,
            )
            assert got == want, f"pool rerank diverged for qid={qid}"


def test_forked_pool_concurrent_queries_serialize_correctly(
    spark, model, codes, queries_np
):
    """The HTTP layer serves from a ThreadingHTTPServer, so concurrent
    threads WILL call pool.search simultaneously — requests are id-tagged
    and multiplexed over the worker pipes (r10; the r9 pool-wide lock
    serialized them), so replies must route back to exactly the query
    that sent them. Hammer the pool from 8 threads and check every answer
    against the sequential router."""
    import threading

    from columbiaimagesearch_spark.lopq.serving import (
        ForkedRouterPool,
        ShardedServingRouter,
    )

    router = ShardedServingRouter.build(model, codes, n_shards=4)
    want = {qid: router.search(q, quota=QUOTA, k=TOP_K) for qid, q in queries_np}
    errors: list = []
    with ForkedRouterPool(router) as pool:

        def worker():
            try:
                for _ in range(5):
                    for qid, q in queries_np:
                        got = pool.search(q, quota=QUOTA, k=TOP_K)
                        if got != want[qid]:
                            errors.append((qid, got[:2], want[qid][:2]))
            except Exception as e:  # noqa: BLE001 - surface to main thread
                errors.append(repr(e))

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert not errors, errors[:3]


def test_forked_pool_worker_death_is_fatal(spark, model, codes, queries_np):
    """ADVICE r9: a mid-protocol failure must be FATAL to the pool — a
    desynced pipe can never serve another query. Kill one worker; the
    pool must raise PoolBrokenError (never a silently partial answer) on
    the next query touching it, and keep refusing afterwards."""
    import time as _time

    from columbiaimagesearch_spark.lopq.serving import (
        ForkedRouterPool,
        PoolBrokenError,
        ShardedServingRouter,
    )

    router = ShardedServingRouter.build(model, codes, n_shards=4)
    pool = ForkedRouterPool(router)
    try:
        _qid, q = queries_np[0]
        assert pool.search(q, quota=QUOTA, k=TOP_K) == router.search(
            q, quota=QUOTA, k=TOP_K
        )
        pool._procs[0].kill()
        # the reader thread marks the pool broken on the worker's EOF;
        # give it a beat, then every query must refuse loudly
        deadline = _time.time() + 10
        while not pool._broken and _time.time() < deadline:
            _time.sleep(0.05)
        assert pool._broken, "worker death never marked the pool broken"
        for _ in range(3):
            with pytest.raises(PoolBrokenError):
                pool.search(q, quota=QUOTA, k=TOP_K)
    finally:
        pool.close()
    with pytest.raises(PoolBrokenError):
        pool.search(queries_np[0][1], quota=QUOTA, k=TOP_K)


def test_forked_pool_close_terminates_stragglers(spark, model, codes):
    """ADVICE r9: close() must not leave a stuck worker COW-holding the
    index. SIGSTOP one worker (it can neither drain the sentinel nor
    exit); close() must escalate to terminate/kill and return with every
    worker dead."""
    import os
    import signal

    from columbiaimagesearch_spark.lopq.serving import (
        ForkedRouterPool,
        ShardedServingRouter,
    )

    router = ShardedServingRouter.build(model, codes, n_shards=4)
    pool = ForkedRouterPool(router)
    pool.JOIN_GRACE_S = 0.2  # don't wait the production grace in a test
    victim = pool._procs[0]
    os.kill(victim.pid, signal.SIGSTOP)
    pool.close()
    assert not victim.is_alive(), "close() left a stopped worker running"
    assert not pool._procs


def test_forked_pool_close_race_raises_pool_broken(spark, model, codes, queries_np):
    """ADVICE r10: close() empties _conns/_send_locks while _broken was
    only set at the very end — a search() racing close() could index the
    emptied lists and leak an IndexError outside the documented
    PoolBrokenError contract. Pin the contract: once _closing is set (and
    even if _broken were somehow still False with the lists gone), search
    raises PoolBrokenError, never IndexError."""
    from columbiaimagesearch_spark.lopq.serving import (
        ForkedRouterPool,
        PoolBrokenError,
        ShardedServingRouter,
    )

    router = ShardedServingRouter.build(model, codes, n_shards=2)
    pool = ForkedRouterPool(router)
    pool.close()
    assert not pool._conns and not pool._send_locks
    # simulate the mid-close interleaving the ADVICE describes: lists
    # already cleared but the broken flag not yet observed by the caller
    pool._broken = False
    q = queries_np[0][1]
    with pytest.raises(PoolBrokenError):
        pool.search(q, quota=QUOTA, k=TOP_K)


def test_forked_pool_close_survives_full_pipe_buffer(spark, model, codes):
    """ADVICE r10: close() used to send the shutdown sentinel with a
    blocking Connection.send() — a wedged (SIGSTOPped) worker whose pipe
    buffer is FULL would block close() forever, never reaching the
    terminate/kill escalation built for exactly that worker. Fill the
    victim's pipe to the brim, then close(): it must return promptly with
    every worker dead."""
    import os
    import select as _select
    import signal
    import time as _time

    from columbiaimagesearch_spark.lopq.serving import (
        ForkedRouterPool,
        ShardedServingRouter,
    )

    router = ShardedServingRouter.build(model, codes, n_shards=2)
    pool = ForkedRouterPool(router)
    pool.JOIN_GRACE_S = 0.2
    victim = pool._procs[0]
    os.kill(victim.pid, signal.SIGSTOP)
    conn = pool._conns[0]
    junk = b"x" * 65536
    for _ in range(1024):  # O/S pipe buffer is ~64KiB-1MiB; stop when full
        _, writable, _ = _select.select([], [conn], [], 0)
        if not writable:
            break
        conn.send_bytes(junk)
    else:
        pytest.skip("could not fill the pipe buffer")
    t0 = _time.time()
    pool.close()
    elapsed = _time.time() - t0
    assert not victim.is_alive(), "close() left the wedged worker running"
    assert elapsed < 10, f"close() blocked {elapsed:.1f}s on a full pipe"


def test_forked_pool_late_complete_answer_not_marked_broken(
    spark, model, codes, queries_np, monkeypatch
):
    """ADVICE r10: a wait() that times out AFTER the final part landed
    (FIFO queue time, or the land-between-timeout-and-mark window) must
    NOT tear down a healthy pool. Simulate it deterministically: patch
    the pending event's wait() to let the real answer arrive, then report
    timeout anyway — the completeness re-check must keep the pool alive
    and the query must return the correct (router-equal) answer."""
    import threading

    from columbiaimagesearch_spark.lopq import serving as srv

    router = srv.ShardedServingRouter.build(model, codes, n_shards=2)
    pool = srv.ForkedRouterPool(router)

    class _TimeoutButComplete(threading.Event):
        def wait(self, timeout=None):
            super().wait(timeout=30)  # the answer genuinely arrives...
            return False  # ...but the caller sees a timeout

    class _PatchedPending(srv._PendingQuery):
        def __init__(self, expected):
            super().__init__(expected)
            self.event = _TimeoutButComplete()

    orig_pending = srv._PendingQuery
    monkeypatch.setattr(srv, "_PendingQuery", _PatchedPending)
    try:
        q = queries_np[0][1]
        want = [
            (i, round(d, 9)) for i, d in router.search(q, quota=QUOTA, k=TOP_K)
        ]
        got = [
            (i, round(d, 9)) for i, d in pool.search(q, quota=QUOTA, k=TOP_K)
        ]
        assert got == want  # the complete late answer is returned
        assert not pool._broken  # ...and the healthy pool survives
        # restore the ORIGINAL class (ADVICE r11: re-reading the attr here
        # returned the already-patched _PatchedPending, so this leg was a
        # no-op and re-ran the patched path) — the follow-up query below
        # must exercise the normal wait path
        monkeypatch.setattr(srv, "_PendingQuery", orig_pending)
        # and it keeps serving afterwards
        got2 = [
            (i, round(d, 9)) for i, d in pool.search(q, quota=QUOTA, k=TOP_K)
        ]
        assert got2 == want
    finally:
        pool.close()


def test_forked_pool_deadline_per_target_depth_and_capped(
    spark, model, codes, queries_np, monkeypatch
):
    """ADVICE r11: the reply deadline must scale with the queue depth of
    THIS query's target workers, capped — not the pool-wide in-flight
    count. Otherwise a genuinely wedged worker under concurrent load is
    detected only after 60*(1+N) s. Pin all three legs deterministically
    by planting fake pending entries and recording the wait() timeout:
    (a) an idle pool waits exactly REPLY_TIMEOUT_S;
    (b) in-flight queries that owe nothing (parts complete) or owe only
        NON-target shards do not scale the deadline;
    (c) a deep backlog on the target shards scales it but never past
        REPLY_TIMEOUT_S * (1 + DEADLINE_DEPTH_CAP)."""
    import threading

    from columbiaimagesearch_spark.lopq import serving as srv

    router = srv.ShardedServingRouter.build(model, codes, n_shards=2)
    pool = srv.ForkedRouterPool(router)
    recorded = []

    class _RecordingEvent(threading.Event):
        def wait(self, timeout=None):
            recorded.append(timeout)
            return super().wait(timeout=timeout)

    class _PatchedPending(srv._PendingQuery):
        def __init__(self, expected):
            super().__init__(expected)
            self.event = _RecordingEvent()

    monkeypatch.setattr(srv, "_PendingQuery", _PatchedPending)
    base = srv.ForkedRouterPool.REPLY_TIMEOUT_S
    cap = srv.ForkedRouterPool.DEADLINE_DEPTH_CAP
    all_shards = set(range(len(router.shards)))
    try:
        q = queries_np[0][1]
        # (a) idle pool
        pool.search(q, quota=QUOTA, k=TOP_K)
        assert recorded[-1] == base

        # (b) noise that must NOT scale the deadline: a completed-but-not-
        # yet-popped query, and one owing a reply only from a shard no
        # real query targets
        done = srv._PendingQuery(set(all_shards))
        for i in all_shards:
            done.parts[i] = ((), ())
        foreign = srv._PendingQuery({99})
        with pool._pending_lock:
            pool._pending[-1] = done
            pool._pending[-2] = foreign
        pool.search(q, quota=QUOTA, k=TOP_K)
        assert recorded[-1] == base

        # (c) a deep backlog owing replies from EVERY shard scales the
        # deadline, capped
        with pool._pending_lock:
            for j in range(cap + 10):
                pool._pending[-10 - j] = srv._PendingQuery(set(all_shards))
        pool.search(q, quota=QUOTA, k=TOP_K)
        assert recorded[-1] == base * (1 + cap)
        assert not pool._broken
    finally:
        with pool._pending_lock:
            for key in [k for k in pool._pending if k < 0]:
                pool._pending.pop(key)
        pool.close()
