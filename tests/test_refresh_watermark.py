"""ST6 incremental index refresh + watermark late-data semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from columbiaimagesearch_spark.lopq import refresh
from columbiaimagesearch_spark.lopq.queries import fixture_model
from columbiaimagesearch_spark.lopq.search import search
from columbiaimagesearch_spark.sources import load_table
from columbiaimagesearch_spark.streaming.windows import (
    read_event_stream,
    windowed_event_agg,
)

from conftest import SF_SMOKE

import numpy as np


@pytest.fixture(scope="module")
def model(spark):
    return fixture_model(spark, SF_SMOKE)


def _features(spark, lo, hi, update_id):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).select(
        "vec_id", "embedding", F.lit(update_id).alias("update_id")
    )


def test_incremental_refresh_idempotent(spark, model, tmp_path):
    codes_dir = str(tmp_path / "codes")
    f1 = _features(spark, 0, 200, "index_update_toy_2024-01-01_000")
    f2 = _features(spark, 200, 500, "index_update_toy_2024-01-02_000")

    added = refresh.refresh_codes(spark, codes_dir, f1, model)
    assert added == ["index_update_toy_2024-01-01_000"]
    snap1 = refresh.serving_snapshot(spark, codes_dir)
    assert snap1.count() == 200

    # re-running the same update adds nothing (idempotent claim, no races)
    assert refresh.refresh_codes(spark, codes_dir, f1, model) == []
    assert refresh.serving_snapshot(spark, codes_dir).count() == 200

    # a second update appends only its partition
    both = f1.unionByName(f2)
    assert refresh.refresh_codes(spark, codes_dir, both, model) == [
        "index_update_toy_2024-01-02_000"
    ]
    snap = refresh.serving_snapshot(spark, codes_dir)
    assert snap.count() == 500
    assert snap.select("update_id").distinct().count() == 2

    # the refreshed snapshot serves searches over the union of updates
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.where(F.col("vec_id") == 450).collect()[0]
    res = search(
        spark,
        snap.select("id", "c1", "c2", "cell", "fine"),
        model,
        [(450, np.array(q["embedding"]))],
        quota=500,
        k=5,
    ).collect()
    assert res and res[0]["id"] == 450  # finds itself at rank 1


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed agg finalizes a window once the watermark passes
    its end; an event arriving later than (max_ts - watermark) for a closed
    window must not resurrect it."""
    src = tmp_path / "events_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    import os
    import time

    base = time.time() - 1000

    def write_file(name, rows):
        p = src / name
        p.write_text("\n".join(json.dumps(r) for r in rows))
        # the file source orders by modification time — pin an increasing
        # mtime per file so micro-batches replay in authored order
        write_file.i += 1
        os.utime(p, (base + write_file.i, base + write_file.i))

    write_file.i = 0

    # batch 1: two events in the 10:00 window
    write_file(
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01 10:05:00", "user_id": 1,
             "event_type": "view", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 10:20:00", "user_id": 1,
             "event_type": "view", "value": 2.0},
        ],
    )
    # batches 2-3: events far ahead — advance the watermark past
    # 10:00 + 1 h window + 2 h delay, which finalizes + emits the 10:00
    # window (eviction applies the advanced watermark at batch end)
    write_file(
        "b2.json",
        [
            {"event_id": 3, "ts": "2024-01-01 15:00:00", "user_id": 2,
             "event_type": "view", "value": 4.0}
        ],
    )
    write_file(
        "b3.json",
        [
            {"event_id": 4, "ts": "2024-01-01 16:00:00", "user_id": 2,
             "event_type": "view", "value": 4.0}
        ],
    )
    # batch 4: a VERY late event for the already-emitted 10:00 window —
    # append mode may emit each window once, so the watermark must drop it
    write_file(
        "b4.json",
        [
            {"event_id": 5, "ts": "2024-01-01 10:30:00", "user_id": 3,
             "event_type": "view", "value": 8.0}
        ],
    )

    stream = read_event_stream(spark, str(src))
    agg = windowed_event_agg(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    all_rows = spark.read.parquet(out_dir).collect()
    # epoch of 2024-01-01 10:00 UTC
    w10 = 1704103200
    w10_rows = [r for r in all_rows if r["window_start"] == w10]
    # emitted exactly once (append-mode contract), with only the two on-time
    # events — the post-emission late event (value 8.0) was dropped
    assert len(w10_rows) == 1, f"10:00 window rows: {w10_rows}"
    assert w10_rows[0]["n"] == 2
    assert w10_rows[0]["total_value"] == pytest.approx(3.0)


def test_refresh_one_code_row_per_id_update_pair(spark, model, tmp_path):
    """Review r13: an id appearing in TWO pending updates previously
    encoded twice and the re-attach join fanned 2x2, writing duplicate
    (cell, id) rows into BOTH partitions — double-counted by the batch
    search's top-k (it has no per-row dedup). Now each (id, update_id)
    pair lands exactly one code row."""
    codes_dir = str(tmp_path / "codes")
    overlap = _features(spark, 0, 30, "upd_a").unionByName(
        _features(spark, 20, 50, "upd_b")
    )
    added = refresh.refresh_codes(spark, codes_dir, overlap, model)
    assert sorted(added) == ["upd_a", "upd_b"]
    snap = refresh.serving_snapshot(spark, codes_dir)
    per_pair = (
        snap.groupBy("update_id", "id").count().where(F.col("count") > 1)
    )
    assert per_pair.count() == 0  # no duplicates within any partition
    # overlap ids appear once in EACH of the two updates
    both = (
        snap.where((F.col("id") >= 20) & (F.col("id") < 30))
        .groupBy("id")
        .agg(F.countDistinct("update_id").alias("n_upd"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["n_upd"] == 2 and r["n"] == 2 for r in both)


def test_refresh_rejects_conflicting_vectors_for_same_id(spark, model, tmp_path):
    """Review r14: the per-id single-encode contract ASSUMES an id's vector
    is stable across pending updates. The assumption is now checked — the
    same id carrying two DIFFERENT vectors (an upstream ledger bug) must
    fail loudly instead of silently encoding one update's rows with the
    other update's vector (dropDuplicates picks an arbitrary row)."""
    codes_dir = str(tmp_path / "codes")
    base = _features(spark, 0, 30, "upd_a")
    mutated = _features(spark, 20, 50, "upd_b").withColumn(
        "embedding",
        F.transform("embedding", lambda x: x * F.lit(2.0)).cast("array<float>"),
    )
    with pytest.raises(ValueError, match="DIFFERENT vectors"):
        refresh.refresh_codes(spark, codes_dir, base.unionByName(mutated), model)
    # nothing was written: the check fires before any encode/append
    assert refresh.indexed_update_ids(spark, codes_dir) == set()

    # identical vectors across updates still refresh fine (the r13 test's
    # overlap case re-asserted against the new guard)
    ok = base.unionByName(_features(spark, 20, 50, "upd_b"))
    assert sorted(refresh.refresh_codes(spark, codes_dir, ok, model)) == [
        "upd_a", "upd_b",
    ]
