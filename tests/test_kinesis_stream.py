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
    run_ingest_kinesis,
)


@pytest.fixture()
def stream(tmp_path):
    return KinesisStreamEmulator(str(tmp_path / "stream"), n_shards=2)


def _msgs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("sha1_"), F.col("id")).alias("key"),
        F.to_json(F.struct(F.col("id"), F.lit("img").alias("kind"))).alias("data"),
    )


def test_old_meta_format_migrates_on_open(spark, stream, tmp_path):
    """A stream dir written before the reshard lifecycle ({"n_shards": N})
    opens cleanly: the shards dict is synthesized (all open), next_shard
    seats past them, and the upgraded meta persists (ADVICE r5)."""
    import json
    import os

    # produce into the CURRENT format, then rewrite meta in the old shape
    stream.put_records(_msgs(spark, 0, 40), "key", "data")
    meta_path = os.path.join(stream.stream_dir, "stream_meta.json")
    with open(meta_path) as f:
        cur = json.load(f)
    with open(meta_path, "w") as f:
        json.dump({"n_shards": 2, "next_seq": cur["next_seq"]}, f)

    reopened = KinesisStreamEmulator(stream.stream_dir)
    assert reopened.open_shards() == ["shard-0000", "shard-0001"]
    # records survive and sequencing continues where the old meta left off
    assert reopened.put_records(_msgs(spark, 40, 60), "key", "data") == 20
    with open(meta_path) as f:
        upgraded = json.load(f)
    assert upgraded["next_shard"] == 2 and "shards" in upgraded
    # the reshard lifecycle works on the migrated stream
    ch1, ch2 = reopened.split_shard("shard-0000")
    assert ch1 == "shard-0002" and ch2 == "shard-0003"


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


def _img_msgs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("sha1_"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("key"),
        F.to_json(
            F.struct(
                F.upper(F.concat(F.lit("sha1_"), F.lpad(F.col("id").cast("string"), 4, "0"))).alias("sha1"),
                F.concat(F.lit("https://img.host/"), F.col("id").cast("string")).alias("s3_url"),
            )
        ).alias("data"),
    )


def test_kinesis_ingest_end_to_end(spark, stream, tmp_path):
    """S2 -> ST4/J3 -> ST1 -> ledger, with the cursor commit LAST: a sweep
    claims everything it read in ceil(n/batch_size) updates; replaying an
    already-committed-to-ledger sweep (crash before cursor commit) adds
    NOTHING — at-least-once transport, exactly-once ledger effects."""
    import shutil

    infos = str(tmp_path / "shard_infos.json")
    ledger = str(tmp_path / "ledger")
    stream.put_records(_img_msgs(spark, 0, 75), "key", "data")

    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=30, date_str="2024-03-01"
    ) == 75
    updates = spark.read.parquet(f"{ledger}/updates")
    assert sorted(r["batch_size"] for r in updates.collect()) == [15, 30, 30]
    images = spark.read.parquet(f"{ledger}/images")
    assert images.count() == 75 and images.select("sha1").distinct().count() == 75

    # crash-before-commit replay: stash the cursor file, run (advances it),
    # then restore the stale cursor and run again — the sweep redelivers but
    # the claim anti-join drops every sha1; ledger unchanged, no new update.
    stale = str(tmp_path / "stale.json")
    shutil.copy(infos, stale)
    stream.put_records(_img_msgs(spark, 50, 100), "key", "data")  # 25 new, 25 dup
    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=30, date_str="2024-03-01"
    ) == 25
    assert spark.read.parquet(f"{ledger}/images").count() == 100

    shutil.copy(stale, infos)  # simulate: cursor write never happened
    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=30, date_str="2024-03-01"
    ) == 0
    images3 = spark.read.parquet(f"{ledger}/images")
    assert images3.count() == 100
    assert images3.select("sha1").distinct().count() == 100

    # update ids are dense across sweeps: 000..003 (75 -> 3 cuts, 25 -> 1)
    ids = sorted(r["update_id"] for r in spark.read.parquet(f"{ledger}/updates").collect())
    assert ids == [
        f"index_update_toy_feat_full_image_2024-03-01_{s:03d}" for s in range(4)
    ]
    # every claimed row appears in exactly one update's sha1s
    ex = spark.read.parquet(f"{ledger}/updates").select(
        "update_id", F.explode("sha1s").alias("sha1")
    )
    assert ex.count() == 100 and ex.select("sha1").distinct().count() == 100


def test_corrupt_records_skip_but_cursor_advances(spark, stream, tmp_path):
    """A malformed payload must not wedge the shard: the sweep quarantines
    it (normalize_messages' corrupt-capture path) yet the cursor still
    advances past its sequence number — the reference's catch-log-continue
    per record, without the risk of re-reading the poison record forever."""
    infos = str(tmp_path / "si.json")
    ledger = str(tmp_path / "ledger")
    good = _img_msgs(spark, 0, 10)
    bad = spark.range(1).select(
        F.lit("poison").alias("key"), F.lit("{not json").alias("data")
    )
    stream.put_records(good.unionByName(bad), "key", "data")

    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=30, date_str="2024-03-01"
    ) == 10
    assert spark.read.parquet(f"{ledger}/images").count() == 10

    # the poison record is consumed: a fresh sweep sees nothing
    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=30, date_str="2024-03-01"
    ) == 0


def test_reshard_split_new_shard_records_not_lost(spark, stream, tmp_path):
    """Resharding contract (reference re-lists shards per sweep,
    kinesis_ingester.py:187-240): after a SplitShard between commits, a
    restarted consumer with no cursor for the children reads them from
    their beginning (TRIM_HORIZON) — records landing on new shards after
    the first commit are never lost, and the closed parent drains."""
    infos = str(tmp_path / "shard_infos.json")
    stream.put_records(_msgs(spark, 0, 40), "key", "data")
    c1 = KinesisConsumerEmulator(stream, infos)
    b1 = c1.read_new(spark)
    assert b1.count() == 40
    c1.commit(b1)

    children = stream.split_shard("shard-0001")
    assert set(stream.open_shards()) == {"shard-0000", *children}
    assert stream.list_shards()["shard-0001"]["open"] is False
    stream.put_records(_msgs(spark, 40, 100), "key", "data")
    post = stream.records(spark).where(
        F.col("sequence_number").isNotNull()
    ).toPandas()
    # new records routed to open shards only — none to the closed parent
    new_on_parent = post[
        (post["shard_id"] == "shard-0001")
        & (post["partition_key"].isin([f"sha1_{i}" for i in range(40, 100)]))
    ]
    assert len(new_on_parent) == 0
    landed_on_children = post[post["shard_id"].isin(children)]
    assert len(landed_on_children) > 0, "split children must receive traffic"

    # RESTART: fresh consumer object on the same shard-infos
    c2 = KinesisConsumerEmulator(stream, infos)
    b2 = c2.read_new(spark)
    got = {r["partition_key"] for r in b2.collect()}
    assert got == {f"sha1_{i}" for i in range(40, 100)}, "new-shard records lost"
    c2.commit(b2)
    # nothing left after commit
    assert KinesisConsumerEmulator(stream, infos).read_new(spark).count() == 0


def test_reshard_merge_closes_parents_and_drains(spark, stream, tmp_path):
    infos = str(tmp_path / "shard_infos.json")
    stream.put_records(_msgs(spark, 0, 30), "key", "data")
    child = stream.merge_shards("shard-0000", "shard-0001")
    assert stream.open_shards() == [child]
    stream.put_records(_msgs(spark, 30, 60), "key", "data")
    only_child = stream.records(spark).where(F.col("shard_id") == child)
    assert only_child.count() == 30  # all post-merge traffic on the child
    # one sweep drains BOTH the closed parents' backlog and the child
    c = KinesisConsumerEmulator(stream, infos)
    b = c.read_new(spark)
    assert b.count() == 60
    c.commit(b)
    assert KinesisConsumerEmulator(stream, infos).read_new(spark).count() == 0


def test_ingest_end_to_end_across_reshard(spark, stream, tmp_path):
    """The full S2 ingest pipeline survives a reshard between sweeps: after
    SplitShard, records routed to the new children are claimed into the
    ledger exactly once — no loss, no duplicates — and the closed parent's
    backlog drains in the same sweep."""
    infos = str(tmp_path / "shard_infos.json")
    ledger = str(tmp_path / "ledger")
    stream.put_records(_img_msgs(spark, 0, 40), "key", "data")
    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=25, date_str="2024-03-02"
    ) == 40

    stream.split_shard("shard-0000")
    stream.split_shard("shard-0001")  # both originals closed
    # 20 duplicates (claimed already) + 40 new, all landing on child shards
    stream.put_records(_img_msgs(spark, 20, 80), "key", "data")
    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=25, date_str="2024-03-02"
    ) == 40
    images = spark.read.parquet(f"{ledger}/images")
    assert images.count() == 80
    assert images.select("sha1").distinct().count() == 80
    # idle sweep after the reshard is a no-op
    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=25, date_str="2024-03-02"
    ) == 0


def test_ingest_converges_after_crash_between_ledger_writes(spark, stream, tmp_path):
    """Review r13: a crash AFTER the updates append but BEFORE the images
    claim append previously re-batched the replayed sweep under NEW
    update ids (seq0 counted the orphaned ledger rows), leaving two
    updates covering the same sha1s forever. seq0 now counts ids on the
    CLAIM table and the deterministic replay ids anti-join away — the
    ledger converges to exactly one update row per id (ST2)."""
    import shutil

    infos = str(tmp_path / "shard_infos.json")
    ledger = str(tmp_path / "ledger")
    stream.put_records(_img_msgs(spark, 0, 40), "key", "data")
    stale = str(tmp_path / "stale.json")

    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=20, date_str="2024-04-01"
    ) == 40
    shutil.copy(infos, stale)

    # simulate the crash window: updates for the NEXT sweep landed but the
    # claims (and the cursor commit) did not — run a sweep, then delete the
    # claim rows it wrote and restore the cursor
    stream.put_records(_img_msgs(spark, 40, 60), "key", "data")
    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=20, date_str="2024-04-01"
    ) == 20
    import glob
    import os

    images_files = sorted(glob.glob(f"{ledger}/images/*.parquet"), key=os.path.getmtime)
    kept = spark.read.parquet(f"{ledger}/images").where(
        ~F.col("update_id").isin(["index_update_toy_feat_full_image_2024-04-01_002"])
    )
    pdf = kept.toPandas()
    for f in images_files:
        os.remove(f)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{ledger}/images")
    shutil.copy(stale, infos)  # cursor never committed either

    # replay: the sweep redelivers records 40..59; the orphaned update row
    # for batch 002 already exists — convergence means NO duplicate
    # coverage and the claims complete
    assert run_ingest_kinesis(
        spark, stream, infos, ledger, batch_size=20, date_str="2024-04-01"
    ) == 20
    updates = spark.read.parquet(f"{ledger}/updates")
    ex = updates.select("update_id", F.explode("sha1s").alias("sha1"))
    # every sha1 covered by exactly ONE update row (no duplicate batches)
    assert ex.count() == 60
    assert ex.select("sha1").distinct().count() == 60
    assert updates.select("update_id").distinct().count() == updates.count()
    images = spark.read.parquet(f"{ledger}/images")
    assert images.count() == 60 and images.select("sha1").distinct().count() == 60
