"""Bucketed table layout — shuffle-free co-located joins (SURVEY §1.3, §7.2).

The reference co-locates work by lexicographic HBase row key and hand-batched
RPCs; the Spark-native equivalent is hash-bucketing heavy tables on their
join key at write time (``bucketBy`` + ``saveAsTable``). Two tables bucketed
on the same key with the same bucket count join with NO Exchange on either
side — at 100 TB that deletes the dominant cost of J1/J2-shaped
fact-to-fact joins (images ⋈ features ⋈ codes on sha1), paying one
well-partitioned write instead of a shuffle per query.

``sortBy`` within buckets additionally lets sort-merge join skip its sort
when each bucket holds one file — the layout the incremental refresh (ST6)
compacts toward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) by
    ``keys``. Overwrites any existing table of the same name."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata comes from the catalog —
    a plain ``read.parquet`` of the files would lose it)."""
    return spark.table(table)
