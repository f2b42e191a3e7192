"""Physical layout of the codes table — cell partitioning that makes the
probe a partition-prune, not a scan (SURVEY §4: "cell pruning via
multi-index" as a layout decision).

The reference gets cell pruning from LMDB prefix cursors
(``search.py:472-499``); here the same effect is the parquet partition
layout: ``partitionBy(cell)`` means a probe of cells {c1..ck} reads exactly
those directories. ``tests/test_layout.py`` proves it by inspecting the
files a filtered scan actually touches. At 4096² cells, partition-per-cell
over-fragments — production would bucket cells into ~4k directories by
``cell % n_buckets`` and keep a row-group sort on cell within each; the
probe predicate then prunes directories AND row groups. Both layouts share
this writer's interface.

The writer also emits a ``_histogram`` sidecar (per-cell populations — a
V²-bounded tiny table; the ``_`` prefix keeps it out of the data scan's
file listing). ``search_from_layout`` plans the multisequence probe from
the sidecar alone, so a search against a 100 TB codes layout reads: one
tiny histogram + exactly the pruned directories/row-groups of the visited
cells — never a full scan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HISTOGRAM_DIR = "_histogram"
META_DIR = "_layout_meta"
# write-ahead intent marker for appends: present => an append may have
# landed data without its sidecar merge (the `_` prefix keeps it out of
# Spark's data-file listing). O(1) to check — no footer scan at any scale;
# on an object store this is a zero-byte object put/delete.
PENDING_MARKER = "_PENDING_APPEND"


def _pending_path(path: str) -> str:
    import os

    return os.path.join(path, PENDING_MARKER)


def layout_is_pending(path: str) -> bool:
    """True iff an append's intent marker is present — the histogram sidecar
    may under-count newly landed cells until :func:`rebuild_histogram`."""
    import os

    return os.path.exists(_pending_path(path))


def _read_pending_token(path: str) -> str | None:
    """The marker's writer token (None when no marker). Tokens let a repair
    distinguish 'the append I saw when I started' from 'a NEW append that
    began mid-repair' — the latter must keep its marker."""
    try:
        with open(_pending_path(path)) as fh:
            return fh.read().strip() or "<untokened>"
    except FileNotFoundError:
        return None


def _write_pending_marker(path: str) -> str:
    import uuid

    token = uuid.uuid4().hex
    with open(_pending_path(path), "w") as fh:
        fh.write(token)
    return token


def _clear_pending_marker(path: str, token: str) -> None:
    """Remove the marker ONLY if it still carries ``token`` — never clear
    another writer's in-flight intent."""
    import os

    if _read_pending_token(path) == token:
        os.remove(_pending_path(path))


def write_codes_partitioned(
    codes: DataFrame,
    path: str,
    bucket_cells: int | None = None,
    row_group_bytes: int | None = None,
) -> None:
    """Write (id, c1, c2, cell, fine) partitioned for probe pruning, plus
    the ``_histogram`` sidecar (cell, n) the search planner reads.

    ``bucket_cells``: optionally fold cells into ``cell_bucket = cell % n``
    directories (the production layout for large V²); rows are sorted by
    ``cell`` within each bucket file so parquet row-group min/max stats
    prune inside the directory.

    ``row_group_bytes``: parquet row-group size for the data files — the
    row-group-pruning granularity knob (smaller groups = finer pruning,
    more footer overhead; the default engine setting is fine in
    production, tests shrink it to prove multi-row-group pruning)."""
    # ONE materialization serves the data write AND the histogram (review
    # r13): unpersisted, the sidecar agg re-ran the full input lineage
    # after the write — a second full scan/encode at the 100 TB design
    # point, and a NON-DETERMINISTIC input (a fresh sample/encode) could
    # commit a sidecar that diverges from the data files it counts.
    codes = codes.persist()
    try:
        _write_codes_partitioned_inner(codes, path, bucket_cells, row_group_bytes)
    finally:
        codes.unpersist()


def _write_codes_partitioned_inner(
    codes: DataFrame,
    path: str,
    bucket_cells: int | None,
    row_group_bytes: int | None,
) -> None:
    if bucket_cells:
        # the in-partition sort MUST lead with the partitionBy column:
        # FileFormatWriter demands its input ordered by the partition
        # columns and inserts its OWN sort (by cell_bucket alone) when the
        # incoming ordering doesn't already satisfy that — which would
        # destroy the cell order inside each file and with it the
        # row-group min/max prunability (same pitfall documented at
        # curate.write_training_shards).
        out = (
            codes.withColumn("cell_bucket", F.col("cell") % bucket_cells)
            .repartition("cell_bucket")
            .sortWithinPartitions("cell_bucket", "cell")
        )
        part_col = "cell_bucket"
    else:
        out, part_col = codes, "cell"
    writer = out.write.mode("overwrite")
    if row_group_bytes:
        writer = writer.option("parquet.block.size", str(int(row_group_bytes)))
    writer.partitionBy(part_col).parquet(path)
    # per-cell population sidecar: partial+final count agg, V²-bounded rows
    (
        codes.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/{HISTOGRAM_DIR}")
    )
    # layout-shape metadata: the bucket count travels WITH the layout, so a
    # reader never has to know (or can be given the wrong) bucket_cells —
    # a mismatched bucket IN-list would silently prune CORRECT directories.
    # Built from range(1), NOT createDataFrame([...]).coalesce(1): a
    # Python-parallelized local relation spreads over defaultParallelism
    # slices, and coalesce(1) then computes ALL of them inside one task —
    # 32 sequential Python-worker round-trips, measured ~5 s of the old
    # 5.5 s write wall for this one-row file (r17, guide §4 boundary cost).
    spark = codes.sparkSession
    spark.range(1).select(
        F.lit(int(bucket_cells) if bucket_cells else None)
        .cast("int")
        .alias("bucket_cells")
    ).write.mode("overwrite").parquet(f"{path}/{META_DIR}")


def read_codes(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_layout_meta(spark: SparkSession, path: str) -> int | None:
    """The writer-recorded ``bucket_cells`` of a layout (None = plain
    cell-partitioned)."""
    row = spark.read.parquet(f"{path}/{META_DIR}").collect()[0]
    return int(row["bucket_cells"]) if row["bucket_cells"] is not None else None


def read_cell_histogram(spark: SparkSession, path: str) -> dict[int, int]:
    """The (cell -> n) histogram sidecar written by
    :func:`write_codes_partitioned` — the search planner's only driver-side
    input, read without touching the data files."""
    rows = spark.read.parquet(f"{path}/{HISTOGRAM_DIR}").collect()
    return {int(r["cell"]): int(r["n"]) for r in rows}


def probe_cells(
    codes: DataFrame, cells: list[int], bucket_cells: int | None = None
) -> DataFrame:
    """The probe predicate in prunable form: with a cell-partitioned layout
    Catalyst turns the IN-list into partition pruning (asserted in tests);
    with the bucketed layout the derived ``cell_bucket`` IN-list prunes
    directories and the cell predicate is pushed to the parquet reader,
    whose row-group min/max stats (rows are cell-sorted within each bucket
    file) skip non-matching row groups."""
    cells = [int(c) for c in cells]
    cond = F.col("cell").isin(cells)
    if bucket_cells:
        cond = F.col("cell_bucket").isin(sorted({c % bucket_cells for c in cells})) & cond
    return codes.where(cond)


_META_AUTO = "auto"


def search_from_layout(
    spark: SparkSession,
    path: str,
    model,
    queries: list[tuple[int, np.ndarray]],
    quota: int = 1000,
    k: int = 10,
    bucket_cells: int | None | str = _META_AUTO,
    vectors: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_nb: int = 0,
) -> DataFrame:
    """ANN search against a materialized codes layout — the production read
    path (reference serving: LMDB prefix-cursor per visited cell,
    ``lopq/lopq/search.py:472-499``).

    Unlike :func:`search` (which persists an arbitrary codes relation and
    scans it for the histogram), this plans the probe from the tiny
    ``_histogram`` sidecar and STATICALLY prunes the data scan to the
    visited cells via :func:`probe_cells` — with the bucketed layout the
    plan shows directory pruning on ``cell_bucket`` plus a pushed ``cell``
    filter that skips row groups, so a quota-bounded query against a
    100 TB layout reads MB, not TB. Results are identical to
    :func:`search` on the same codes (tests pin it)."""
    from .model import LOPQModelPCA
    from .search import _execute_probe, _plan_probe

    if rerank_nb and rerank_nb < k:
        # same contract as search() (review r13): the shortlist caps the
        # per-query result count, so this would silently return fewer
        # than k rows
        raise ValueError(
            f"rerank_nb={rerank_nb} < k={k}: the rerank shortlist must be "
            "at least as large as the requested top-k (raise rerank_nb or "
            "disable rerank)"
        )
    if isinstance(model, LOPQModelPCA):
        queries = [(qid, model.project_queries(q)[0]) for qid, q in queries]
        model = model.lopq
    # the layout is self-describing: default reads bucket_cells from the
    # writer-recorded metadata; an explicit value is VALIDATED against it
    # (a mismatched bucket IN-list silently prunes correct directories —
    # wrong answers, not an error, so fail loudly here instead)
    # staleness probe: an in-flight/interrupted append leaves the intent
    # marker set — the sidecar may under-count newly landed cells, so a
    # probe planned from it would silently under-visit. The READER repairs
    # IN MEMORY only (one data scan feeding this probe's planning): it
    # must not write the sidecar or clear the marker, because the marker
    # may belong to a LIVE writer — a reader-side clear would let a
    # post-data crash of that append go permanently undetected, and a
    # reader-side sidecar write could overwrite the writer's exact commit
    # with a partial count. A crashed append's marker stays set until the
    # next append's pre-repair or an explicit rebuild_histogram — both
    # writer-side, where the single-writer contract makes clearing safe.
    pending = layout_is_pending(path)
    if pending:
        import warnings

        warnings.warn(
            f"layout at {path} has an in-flight/interrupted append "
            "(_PENDING_APPEND set); planning this probe from a histogram "
            "rebuilt in memory from the data (sidecar and marker are left "
            "for the writer-side repair)",
            RuntimeWarning,
            stacklevel=2,
        )
    recorded = read_layout_meta(spark, path)
    if bucket_cells == _META_AUTO:
        bucket_cells = recorded
    elif bucket_cells != recorded:
        raise ValueError(
            f"bucket_cells={bucket_cells} does not match the layout's "
            f"recorded bucketing ({recorded}); probing with a mismatched "
            "bucket list would silently drop matching directories"
        )
    if pending:
        counts = {
            int(r["cell"]): int(r["n"])
            for r in read_codes(spark, path)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    else:
        counts = read_cell_histogram(spark, path)
    probe_rows, luts, qvecs = _plan_probe(model, queries, counts, quota)
    codes = read_codes(spark, path)
    visited = sorted({cell for _, cell in probe_rows})
    pruned = probe_cells(codes, visited, bucket_cells=bucket_cells)
    return _execute_probe(
        spark, pruned, model, probe_rows, luts, qvecs,
        k=k, vectors=vectors, id_col=id_col, vec_col=vec_col,
        rerank_nb=rerank_nb,
    )


def append_codes_to_layout(
    codes_new: DataFrame, path: str, row_group_bytes: int | None = None
) -> None:
    """ST6 incremental refresh INTO the production layout: append the new
    codes under their bucket directories (cell-sorted within the appended
    files, so their row groups stay prunable) and MERGE the histogram
    sidecar — the next ``search_from_layout`` plans against the refreshed
    populations without ever scanning the data.

    Idempotency is the CALLER's ledger concern (``refresh.refresh_codes``'s
    update_id anti-join decides WHAT is new); this is the physical append.
    The sidecar rewrite is the commit point: a crash between the data
    append and the sidecar merge leaves newly-landed cells under-counted
    (a probe may under-visit them until repaired). The crash window is
    CLOSED for readers by a write-ahead intent marker: ``_PENDING_APPEND``
    lands before the data (carrying a per-append writer token), clears
    after the sidecar merge, and :func:`search_from_layout` plans from an
    in-memory data rebuild while it finds the marker set (readers never
    write the sidecar or clear the marker — only writer-side paths do).

    Crash/concurrency protocol (single WRITER per layout — the module
    contract; readers may race the writer):
    - an append that finds a stale marker repairs FIRST (one data scan),
      so its own merge never inherits a crashed predecessor's under-count;
    - the merge base is the sidecar snapshot taken BEFORE the data lands,
      so a reader's mid-append rebuild (which may count partially-landed
      files) is overwritten by the exact value at commit;
    - the marker clears only if it still carries THIS append's token."""
    spark = codes_new.sparkSession
    bucket_cells = read_layout_meta(spark, path)
    if layout_is_pending(path):
        # a previous append crashed before its sidecar merge: repair before
        # merging, or this append's merge would bake the under-count in
        rebuild_histogram(spark, path)
    token = _write_pending_marker(path)
    # merge base: the PRE-append snapshot (exact under single-writer), so
    # the final overwrite is correct even if a reader rebuilds mid-append
    merged = read_cell_histogram(spark, path)
    # one materialization serves the histogram increment AND the data
    # write (review r13 — same rationale as write_codes_partitioned)
    codes_new = codes_new.persist()
    try:
        if bucket_cells:
            out = (
                codes_new.withColumn("cell_bucket", F.col("cell") % bucket_cells)
                .repartition("cell_bucket")
                .sortWithinPartitions("cell_bucket", "cell")
            )
            part_col = "cell_bucket"
        else:
            out, part_col = codes_new, "cell"
        inc = codes_new.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        writer = out.write.mode("append")
        if row_group_bytes:
            writer = writer.option("parquet.block.size", str(int(row_group_bytes)))
        writer.partitionBy(part_col).parquet(path)
    finally:
        codes_new.unpersist()
    for r in inc:
        merged[int(r["cell"])] = merged.get(int(r["cell"]), 0) + int(r["n"])
    # repartition(1), not coalesce(1): the local relation parallelizes over
    # defaultParallelism slices, and coalesce would fold every slice's
    # Python-worker computation into ONE sequential task (~5 s measured for
    # a tiny file — see the META_DIR writer note); the repartition computes
    # the slices in parallel and shuffles the few histogram rows to one
    # writer task.
    spark.createDataFrame(
        sorted(merged.items()), "cell int, n bigint"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/{HISTOGRAM_DIR}")
    _clear_pending_marker(path, token)


def rebuild_histogram(spark: SparkSession, path: str) -> None:
    """WRITER-SIDE recovery: recompute the histogram sidecar from the data
    files (one scan) — restores probe-planning correctness after a crash
    between a data append and its sidecar merge. Called by the next
    append's pre-repair or explicitly by an operator; readers never call
    it (``search_from_layout`` plans from an in-memory rebuild instead),
    so under the single-writer contract no append can be in flight here
    and clearing the marker is safe.

    The intent marker still clears only if it carries the SAME writer token
    it had when this rebuild started — a marker replaced mid-rebuild
    belongs to a NEW in-flight append and must survive."""
    token_before = _read_pending_token(path)
    (
        read_codes(spark, path)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/{HISTOGRAM_DIR}")
    )
    if token_before is not None:
        _clear_pending_marker(path, token_before)
