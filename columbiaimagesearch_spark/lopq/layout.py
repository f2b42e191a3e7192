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
this writer's interface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_codes_partitioned(
    codes: DataFrame, path: str, bucket_cells: int | None = None
) -> None:
    """Write (id, c1, c2, cell, fine) partitioned for probe pruning.

    ``bucket_cells``: optionally fold cells into ``cell_bucket = cell % n``
    directories (the production layout for large V²)."""
    if bucket_cells:
        (
            codes.withColumn("cell_bucket", F.col("cell") % bucket_cells)
            .repartition("cell_bucket")
            .sortWithinPartitions("cell")
            .write.mode("overwrite")
            .partitionBy("cell_bucket")
            .parquet(path)
        )
    else:
        codes.write.mode("overwrite").partitionBy("cell").parquet(path)


def read_codes(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def probe_cells(
    codes: DataFrame, cells: list[int], bucket_cells: int | None = None
) -> DataFrame:
    """The probe predicate in prunable form: with a cell-partitioned layout
    Catalyst turns the IN-list into partition pruning (asserted in tests);
    with the bucketed layout the derived ``cell_bucket`` IN-list prunes
    directories and the cell predicate prunes row groups within them."""
    cells = [int(c) for c in cells]
    cond = F.col("cell").isin(cells)
    if bucket_cells:
        cond = F.col("cell_bucket").isin(sorted({c % bucket_cells for c in cells})) & cond
    return codes.where(cond)
