"""Processing-ledger operators — the update/claim lifecycle of the reference.

The reference coordinates work through an HBase "updates" ledger: batches of
ids are claimed, marked started/processed/completed, re-scanned when stale
(``updater/extraction_checker.py``, ``updater/extraction_processor.py``).
The batch-semantics half is rendered here on the synthetic ``events`` table
(SQL-oracle checkable); the streaming half (count-OR-time trigger, ST1) lives
in ``..streaming.ingest`` and is verified against these batch plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

BATCH_SIZE = 50  # ids per update batch (reference: 1000, hbase_indexer_minimal.py:36)


@register(
    "st1_count_batch_assembly",
    survey_ops=("ST1", "A7", "C6"),
    doc=f"Count-cut update batching: per event_type, ids in time order are "
    f"cut into batches of {BATCH_SIZE} (the count half of the reference's "
    "1000-or-600s trigger, extraction_checker.py:281-454); emits the "
    "update_id grammar `index_update_<type>_<date>_<seq>` "
    "(hbase_indexer_minimal.py:595-617).",
    oracle=f"""
WITH seq AS (
  SELECT event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS pos
  FROM events
),
batched AS (
  SELECT event_type, event_id, ts, CAST(FLOOR(pos / {BATCH_SIZE}) AS BIGINT) AS batch_seq
  FROM seq
)
SELECT 'index_update_' || event_type || '_' ||
         strftime(MIN(ts), '%Y-%m-%d') || '_' ||
         lpad(CAST(batch_seq AS VARCHAR), 3, '0') AS update_id,
       event_type,
       batch_seq,
       CAST(COUNT(*) AS BIGINT) AS batch_size,
       CAST(MIN(event_id) AS BIGINT) AS first_id,
       CAST(MAX(event_id) AS BIGINT) AS last_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS created_epoch
FROM batched
GROUP BY event_type, batch_seq
""",
)
def st1_count_batch_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    batched = events.select(
        "event_type",
        "event_id",
        "ts",
        F.floor((F.row_number().over(w) - 1) / BATCH_SIZE).alias("batch_seq"),
    )
    return batched.groupBy("event_type", "batch_seq").agg(
        F.concat(
            F.lit("index_update_"),
            F.col("event_type"),
            F.lit("_"),
            F.date_format(F.min("ts"), "yyyy-MM-dd"),
            F.lit("_"),
            F.lpad(F.col("batch_seq").cast("string"), 3, "0"),
        ).alias("update_id"),
        F.count(F.lit(1)).alias("batch_size"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
        F.unix_timestamp(F.min("ts")).alias("created_epoch"),
    ).select(
        "update_id", "event_type", "batch_seq", "batch_size",
        "first_id", "last_id", "created_epoch",
    )
