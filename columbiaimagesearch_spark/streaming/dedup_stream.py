"""Incremental near-duplicate dedup — the streaming twin of
``dedup_minhash_lsh_pairs``.

A 100 TB training corpus is not deduped once: new crawl drops arrive and
must be checked against everything already ingested WITHOUT recomputing the
corpus. The batch LSH query's physical trick (pairwise work only inside
band buckets) becomes an incremental one here: the corpus state is the
band table itself, so each arriving batch does

  1. shingle-hash + minhash-band the NEW docs only (one md5 per shingle,
     reusing the exact operators of the batch path — equivalence is by
     construction, and asserted in tests);
  2. claim anti-join on doc_id (ST2/J3 idiom): docs already in state are
     dropped, so replays after a crash are idempotent;
  3. candidates = fresh bands ⋈ fresh bands (new-new) ∪ fresh bands ⋈
     state bands (new-old) — the state side is only ever touched through
     the band-key equi-join, never scanned pairwise;
  4. exact-Jaccard verify against the union hash table (the shared
     ``verified_jaccard_pairs`` stage), append verified pairs;
  5. append the fresh (doc_id, hs) and (doc_id, band_key) rows to state.

Per-batch cost is O(batch × bands + collisions) regardless of corpus size;
state tables grow by exactly the fresh rows. At cluster scale the state
tables are the same parquet relations partitioned/bucketed by band_key —
the join prunes to colliding buckets.

Reference anchor: this is the streaming composition of the reference's
ingest claim (extraction_checker.py:225-258 get_unprocessed_rows) with the
dedup family SURVEY §7.0 adds for LLM-pipeline work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup

DOC_SCHEMA = "doc_id long, text string"
_HASHES_SCHEMA = "doc_id long, hs array<bigint>"
_BANDS_SCHEMA = "doc_id long, band_key string"
_PAIRS_SCHEMA = "doc_a long, doc_b long, jaccard double"


def _state_path(state_dir: str, name: str) -> str:
    return os.path.join(state_dir, name)


def _read_state(spark: SparkSession, state_dir: str, name: str, schema: str) -> DataFrame:
    path = _state_path(state_dir, name)
    if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        # Spark caches file-status listings per path across queries
        # (metadataCacheTTLSeconds = -1 by default), so a state path first
        # listed in batch N would silently hide files batch N appends from
        # batch N+1 — refresh makes every step see the current snapshot.
        spark.catalog.refreshByPath(path)
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def read_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """Verified near-dup pairs, deduped on (doc_a, doc_b) at read time: a
    crash between the pairs append and the hashes append leaves the batch
    unclaimed, so its replay appends the same verified pairs again —
    duplicate EDGES are the documented crash-replay residue (survivor sets
    are unaffected either way; min-label propagation is idempotent over
    repeated edges). Deduping here keeps every consumer's view exact."""
    return _read_state(spark, state_dir, "pairs", _PAIRS_SCHEMA).dropDuplicates(
        ["doc_a", "doc_b"]
    )


def read_hashes(spark: SparkSession, state_dir: str) -> DataFrame:
    return _read_state(spark, state_dir, "hashes", _HASHES_SCHEMA)


def dedup_batch_step(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    hashed: DataFrame | None = None,
) -> int:
    """One incremental step: dedup ``docs`` against state, append verified
    pairs + fresh state rows. Returns the number of fresh docs admitted.

    Pure batch function (the foreachBatch body), so tests drive it directly
    and the stream wrapper stays a thin trigger shell.

    ``hashed``: optional pre-computed (doc_id, hs) shingle-hash relation
    for exactly these docs — the streaming form of the batch chain's
    hashed contract (review r13: curate_batch_step's fuzzy path hashed
    every micro-batch twice, once for the fuzzy rung and once here).
    The caller guarantees it covers the same post-dedup doc_ids."""
    docs = docs.where(F.col("doc_id").isNotNull()).dropDuplicates(["doc_id"])
    hashed_new = (
        dedup.hashed_from(docs, persist=False)
        if hashed is None
        else hashed.select("doc_id", "hs")
    )

    state_hashes = read_hashes(spark, state_dir)
    # ST2 claim: drop already-ingested docs; replay after crash is a no-op.
    # Materialized (persist + count) BEFORE any append below so no plan
    # reads a state path while new files land in it.
    fresh = hashed_new.join(state_hashes, "doc_id", "left_anti").persist()
    n_fresh = fresh.count()
    if n_fresh == 0:
        fresh.unpersist()
        return 0

    bands_fresh = dedup.bands_from(fresh).persist()
    bands_fresh.count()
    state_bands = _read_state(spark, state_dir, "bands", _BANDS_SCHEMA)

    new_new = (
        bands_fresh.alias("a")
        .join(bands_fresh.alias("b"), ["band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    # new-old: canonical (min, max) ordering keeps pair identity stable no
    # matter which side arrived first
    new_old = (
        bands_fresh.alias("n")
        .join(state_bands.alias("o"), ["band_key"])
        # crash-replay guard (mirror of emb_dedup_stream): a crash between
        # the bands and hashes appends leaves this batch's band rows in
        # state but the batch unclaimed — the replay meets its OWN bands
        # here, and without this filter emits doc_a == doc_b self-pairs
        # (jaccard 1.0) that pass verify and poison the pairs state.
        .where(F.col("n.doc_id") != F.col("o.doc_id"))
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_b"),
        )
    )
    cands = new_new.unionByName(new_old).distinct()
    all_hashed = fresh.unionByName(state_hashes)
    pairs = dedup.verified_jaccard_pairs(cands, all_hashed)

    # Append ORDER is load-bearing: writing to a path makes Spark re-cache
    # every cached plan that scans that path (CacheManager.recacheByPath),
    # so appending `fresh` to the hashes path first would recompute
    # `bands_fresh` (whose lineage anti-joins against that very path) as
    # EMPTY before its own write. Hashes — the claim table — must therefore
    # land last, after every plan derived from the pre-append snapshot has
    # been written out.
    pairs.write.mode("append").parquet(_state_path(state_dir, "pairs"))
    # second half of the crash-replay guard (mirror of emb_dedup_stream): a
    # replayed batch whose bands already landed must not append them again —
    # duplicate band rows would accumulate in state on every replay. One
    # extra column-pruned scan of state_bands' doc_id column per batch; the
    # candidates join above already scans state each batch, so the per-batch
    # cost stays O(batch x bands + state + collisions).
    bands_to_append = bands_fresh.join(
        state_bands.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    bands_to_append.write.mode("append").parquet(_state_path(state_dir, "bands"))
    fresh.write.mode("append").parquet(_state_path(state_dir, "hashes"))
    bands_fresh.unpersist()
    fresh.unpersist()
    return n_fresh


def run_incremental_dedup(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``src_dir`` (JSONL doc drops, availableNow) through the
    incremental dedup. Source offsets checkpoint with the query (ST3); the
    claim anti-join inside the step makes redelivered batches no-ops, so
    transport is at-least-once but state is exactly-once."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, _bid: dedup_batch_step(spark, batch_df, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
