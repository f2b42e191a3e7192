"""ST1 distributed count-or-time batching (streaming/stateful.py)."""

from __future__ import annotations

import json
import os
import time

import pandas as pd
import pytest

from columbiaimagesearch_spark.streaming import stateful
from columbiaimagesearch_spark.streaming.stateful import (
    _FakeGroupState,
    advance,
    batch_updates_stateful,
    make_batcher_fn,
)


def test_advance_count_cutoff():
    emitted, pending, seq = advance([], 0, [f"a{i:02d}" for i in range(12)], 5, False)
    assert [(s, len(ids), r) for s, ids, r in emitted] == [(0, 5, "count"), (1, 5, "count")]
    assert pending == ["a10", "a11"] and seq == 2


def test_advance_timeout_flush():
    emitted, pending, seq = advance(["x"], 3, ["y"], 100, True)
    assert emitted == [(3, ["x", "y"], "timeout")]
    assert pending == [] and seq == 4


def test_advance_no_cut():
    emitted, pending, seq = advance(["x"], 1, ["y"], 5, False)
    assert emitted == [] and pending == ["x", "y"] and seq == 1


def test_batcher_fn_state_transitions():
    fn = make_batcher_fn("2026-01-01", batch_size=3, max_delay_ms=1234, use_timer=True)
    state = _FakeGroupState(now_ms=50)
    out = list(fn(("t",), iter([pd.DataFrame({"sha1": ["c", "a", "b", "d"]})]), state))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["update_id"] == "index_update_t_2026-01-01_000"
    assert row["sha1s"] == ["a", "b", "c"] and row["reason"] == "count"
    # pending state carries (sha1, s3_url) items since the s3_url passthrough;
    # first_ms marks when the current accumulation started
    assert state.get == ([("d", None)], 1, 50) and state.timeout_ms == 1234

    # timer-fired invocation: no input, flush remainder; seq survives in state
    state.hasTimedOut = True
    out = list(fn(("t",), iter([]), state))
    assert out[0].iloc[0]["sha1s"] == ["d"] and out[0].iloc[0]["reason"] == "timeout"
    assert not state.removed and state.get == ([], 2, None)


def test_batcher_fn_deadline_in_state_flush():
    """NoTimeout rendering: a later invocation past first_ms + max_delay
    flushes the carry even though no timer fired (hasTimedOut stays False)."""
    fn = make_batcher_fn("2026-01-01", batch_size=100, max_delay_ms=1000)
    state = _FakeGroupState(now_ms=50)
    assert list(fn(("t",), iter([pd.DataFrame({"sha1": ["a"]})]), state)) == []
    assert state.get == ([("a", None)], 0, 50) and state.timeout_ms is None

    state.now_ms = 900  # within deadline: keep accumulating, first_ms kept
    assert list(fn(("t",), iter([pd.DataFrame({"sha1": ["b"]})]), state)) == []
    assert state.get == ([("a", None), ("b", None)], 0, 50)

    state.now_ms = 1100  # 1100-50 >= 1000: flush pending + arriving rows
    out = list(fn(("t",), iter([pd.DataFrame({"sha1": ["c"]})]), state))
    row = out[0].iloc[0]
    assert row["sha1s"] == ["a", "b", "c"] and row["reason"] == "timeout"
    assert state.get == ([], 1, None)


def test_stateful_stream_carries_pending(spark, tmp_path):
    """Three 4-id files at one file per trigger, batch_size=5: pending ids
    must carry across micro-batches through the state store."""
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        p = src / f"f{i}.json"
        with open(p, "w") as fh:
            for j in range(4):
                fh.write(json.dumps({"extr_type": "t", "sha1": f"a{i * 4 + j:02d}"}) + "\n")
        ts = time.time() + i  # distinct mtimes fix trigger admission order
        os.utime(p, (ts, ts))

    stream = (
        spark.readStream.schema("extr_type string, sha1 string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        batch_updates_stateful(stream, "2026-01-01", batch_size=5)
        .writeStream.format("memory")
        .queryName("st1_batches")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["update_id"]: r
        for r in spark.table("st1_batches").collect()
    }
    assert set(rows) == {
        "index_update_t_2026-01-01_000",
        "index_update_t_2026-01-01_001",
    }
    # f1 leaves 4 pending; f2 tops up to 8 -> cut [a00..a04], carry 3;
    # f3 -> 7 -> cut [a05..a09], carry [a10, a11] (stays in state store).
    assert rows["index_update_t_2026-01-01_000"]["sha1s"] == [
        f"a{i:02d}" for i in range(5)
    ]
    assert rows["index_update_t_2026-01-01_001"]["sha1s"] == [
        f"a{i:02d}" for i in range(5, 10)
    ]
    assert all(r["reason"] == "count" for r in rows.values())


def test_defaults_match_reference():
    assert stateful.DEFAULT_BATCH_SIZE == 1000
    assert stateful.DEFAULT_MAX_DELAY_MS == 600_000
