"""S2/S10 Kinesis emulation: sequence-number checkpoint + resume-after.

Mirrors the reference's restart contract (kinesis_ingester.py:71-149 —
shard-infos JSON reloaded on init, shard iterators resumed from the stored
sequence numbers) the same way test_stateful_batching proves the ST1/ST3
carry: push, consume, commit, RESTART (new consumer object, same shard-infos
file), push more, and assert the second consumer sees exactly the new
records — none missed, none re-delivered.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from columbiaimagesearch_spark.streaming.kinesis import (
    KinesisConsumerEmulator,
    KinesisStreamEmulator,
)


@pytest.fixture()
def stream(tmp_path):
    return KinesisStreamEmulator(str(tmp_path / "stream"), n_shards=2)


def _msgs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("sha1_"), F.col("id")).alias("key"),
        F.to_json(F.struct(F.col("id"), F.lit("img").alias("kind"))).alias("data"),
    )


def test_put_records_assigns_monotonic_seq_per_shard(spark, stream):
    assert stream.put_records(_msgs(spark, 0, 50), "key", "data") == 50
    assert stream.put_records(_msgs(spark, 50, 80), "key", "data") == 30
    recs = stream.records(spark).toPandas()
    assert len(recs) == 80
    assert set(recs["shard_id"]) <= {"shard-0000", "shard-0001"}
    for sh, grp in recs.groupby("shard_id"):
        seqs = sorted(grp["sequence_number"])
        # service-assigned: dense, monotonic, continuing across batches
        assert seqs == list(range(len(seqs)))


def test_consumer_resumes_after_stored_sequence_number(spark, stream, tmp_path):
    infos = str(tmp_path / "shard_infos.json")
    stream.put_records(_msgs(spark, 0, 40), "key", "data")

    c1 = KinesisConsumerEmulator(stream, infos)
    batch1 = c1.read_new(spark)
    got1 = {r["data"] for r in batch1.collect()}
    assert len(got1) == 40
    c1.commit(batch1)
    assert os.path.isfile(infos)

    # nothing new: empty sweep, backoff counter escalates (ST7 twin)
    empty = c1.read_new(spark)
    assert empty.count() == 0
    c1.commit(empty)
    assert c1.sleep_count == 1

    stream.put_records(_msgs(spark, 40, 65), "key", "data")

    # RESTART: a brand-new consumer on the same shard-infos file must resume
    # strictly after the stored sequence numbers
    c2 = KinesisConsumerEmulator(stream, infos)
    batch2 = c2.read_new(spark)
    got2 = {r["data"] for r in batch2.collect()}
    assert len(got2) == 25
    assert got1.isdisjoint(got2), "re-delivered already-committed records"
    assert got1 | got2 == {r["data"] for r in stream.records(spark).collect()}
    c2.commit(batch2)
    assert c2.sleep_count == 0

    # shard-infos contract: per-shard sqn high-water marks + read counters
    with open(infos) as f:
        si = json.load(f)
    recs = stream.records(spark).toPandas()
    for sh, grp in recs.groupby("shard_id"):
        assert si[sh]["sqn"] == max(grp["sequence_number"])


def test_uncommitted_batch_is_redelivered(spark, stream, tmp_path):
    """Crash before commit -> at-least-once redelivery from the old cursor
    (the reference's failure mode: shard-infos only advances on the
    post-sweep json.dump)."""
    infos = str(tmp_path / "shard_infos.json")
    stream.put_records(_msgs(spark, 0, 10), "key", "data")
    c1 = KinesisConsumerEmulator(stream, infos)
    b = c1.read_new(spark)
    assert b.count() == 10  # read but NOT committed (crash)
    c2 = KinesisConsumerEmulator(stream, infos)
    assert c2.read_new(spark).count() == 10  # redelivered
