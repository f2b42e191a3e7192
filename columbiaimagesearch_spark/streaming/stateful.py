"""Distributed count-or-time batching — ST1 as a stateful streaming operator.

``ingest.IngestLedger`` renders the reference's update batching
(``updater/extraction_checker.py:281-454``: cut a batch at 1000 ids OR 600 s)
with a driver-held carry buffer inside ``foreachBatch`` — faithful, but the
buffer lives on the driver. This module is the scale-out form:
``applyInPandasWithState`` keys the carry state by ``extr_type``, so each
extraction type's pending ids live in executor state-store partitions,
checkpointed with the query (ST3) and recovered on restart (ST2). The driver
never sees ids; state volume per key is bounded by ``batch_size``.

The count cutoff fires inline as rows arrive; the time cutoff uses the
state-store's ProcessingTimeTimeout rather than the reference's wall-clock
arithmetic. Batch payloads are sorted in-micro-batch, so emitted batches are
deterministic given per-trigger contents.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_BATCH_SIZE = 1000  # reference: hbase_indexer_minimal.py:36
DEFAULT_MAX_DELAY_MS = 600_000  # reference: extraction_checker.py:24 (600 s)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("extr_type", T.StringType()),
        T.StructField("update_id", T.StringType()),
        T.StructField("sha1s", T.ArrayType(T.StringType())),
        T.StructField("batch_size", T.IntegerType()),
        T.StructField("reason", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("pending", T.ArrayType(T.StringType())),
        T.StructField("seq", T.IntegerType()),
    ]
)


def advance(
    pending: list[str],
    seq: int,
    new_ids: list[str],
    batch_size: int,
    timed_out: bool,
) -> tuple[list[tuple[int, list[str], str]], list[str], int]:
    """Pure cut logic: returns (emitted [(seq, ids, reason)], pending', seq').

    Count cutoff emits full batches; a timeout flushes whatever remains
    (the reference's max-delay branch, extraction_checker.py:382-390)."""
    pending = pending + new_ids
    emitted: list[tuple[int, list[str], str]] = []
    while len(pending) >= batch_size:
        emitted.append((seq, pending[:batch_size], "count"))
        pending = pending[batch_size:]
        seq += 1
    if timed_out and pending:
        emitted.append((seq, pending, "timeout"))
        pending = []
        seq += 1
    return emitted, pending, seq


def make_batcher_fn(
    extr_date: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_delay_ms: int = DEFAULT_MAX_DELAY_MS,
):
    """Build the applyInPandasWithState function. ``extr_date`` is pinned by
    the caller (the reference mints ids with the checker's start date,
    extraction_checker.py:199-223) so update ids stay deterministic."""

    def fn(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (extr_type,) = key
        pending, seq = state.get if state.exists else ([], 0)
        new_ids: list[str] = []
        for pdf in pdfs:
            new_ids.extend(pdf["sha1"].tolist())
        new_ids.sort()
        emitted, pending, seq = advance(
            list(pending), seq, new_ids, batch_size, state.hasTimedOut
        )
        if state.hasTimedOut and not pending:
            state.remove()
        else:
            state.update((pending, seq))
            state.setTimeoutDuration(max_delay_ms)
        if emitted:
            yield pd.DataFrame(
                {
                    "extr_type": [extr_type] * len(emitted),
                    "update_id": [
                        f"index_update_{extr_type}_{extr_date}_{s:03d}"
                        for s, _, _ in emitted
                    ],
                    "sha1s": [ids for _, ids, _ in emitted],
                    "batch_size": [len(ids) for _, ids, _ in emitted],
                    "reason": [r for _, _, r in emitted],
                }
            )

    return fn


def batch_updates_stateful(
    stream: DataFrame,
    extr_date: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_delay_ms: int = DEFAULT_MAX_DELAY_MS,
) -> DataFrame:
    """(extr_type, sha1) stream -> update-batch stream, state in the store."""
    return stream.groupBy("extr_type").applyInPandasWithState(
        make_batcher_fn(extr_date, batch_size, max_delay_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


class _FakeGroupState:
    """Minimal GroupState stand-in for unit-testing ``make_batcher_fn``'s
    state transitions without a streaming query."""

    def __init__(self, value: Any = None, timed_out: bool = False) -> None:
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms: int | None = None

    @property
    def exists(self) -> bool:
        return self._value is not None

    @property
    def get(self) -> Any:
        return self._value

    def update(self, value: Any) -> None:
        self._value = value

    def remove(self) -> None:
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms: int) -> None:
        self.timeout_ms = ms
