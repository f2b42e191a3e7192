"""Structured Streaming ingestion — the reference's checker pipeline rebuilt.

Reference flow (SURVEY §3.2): Kafka image messages ``{sha1, s3_url,
img_info}`` -> normalize/dedup -> anti-check against already-stored rows ->
cut update batches at 1000 ids OR 600 s -> write image rows + update-ledger
rows (``updater/extraction_checker.py:281-454``).

Spark rendering:
- source: ``readStream.format("json")`` over a drop directory (S7 twin of
  the Kafka source S1 — swap ``format("kafka")`` + ``from_json(value)`` on a
  cluster; offset/sequence checkpointing ST3 is ``checkpointLocation``);
- validation + normalization: explicit schema, malformed rows quarantined
  (``_corrupt_record``), sha1 uppercased (C1 discipline);
- in-stream dedup ST4: ``dropDuplicates(["sha1"])`` per micro-batch plus
  terminal anti-join against the images table (J3) — duplicate suppression
  across restarts without the reference's marker-column races (ST2);
- count-or-time batching ST1 — two renderings:
  * PRIMARY (scale path): ``run_ingest_stateful`` routes the stream through
    the executor-side ``applyInPandasWithState`` batcher
    (``streaming/stateful.py``) — pending ids live in state-store
    partitions keyed by ``extr_type``, checkpointed with the query; the
    ``foreachBatch`` sink only ever sees *emitted* update batches, so no
    id list ever accumulates on the driver.
  * FIXTURE (semantic model): ``run_ingest`` keeps the reference-shaped
    driver-held carry buffer (``CountOrTimeBatcher`` inside
    ``foreachBatch``) — useful for unit-level reasoning about cut logic
    and for the deterministic ``finalize()`` flush in tests; state is
    bounded by ``batch_size`` but it is NOT the 100 TB path.

At 100 TB: the same plan with a Kafka source; the anti-join is
stream-static against a bucketed images table (broadcast of the *batch*
side); ledger writes append parquet partitioned by date.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_MSG_SCHEMA = T.StructType(
    [
        T.StructField("sha1", T.StringType()),
        T.StructField("s3_url", T.StringType()),
        T.StructField(
            "img_info",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("list_sha1s", T.ArrayType(T.StringType())),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

DEFAULT_BATCH_SIZE = 1000  # reference: hbase_indexer_minimal.py:36
DEFAULT_MAX_DELAY_S = 600.0  # reference: extraction_checker.py:24


def read_message_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-drop JSON message stream with explicit schema + corrupt capture."""
    return (
        spark.readStream.schema(IMAGE_MSG_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )


def read_kafka_message_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1 production form: Kafka topic -> the same message relation as the
    file-drop source, so every downstream stage is source-agnostic.

    Replaces the reference's consumer-group/SSL/manual-commit plumbing
    (``ingester/generic_kafka_processor.py:200-268``,
    ``kafka_ingester.py:197-251``) — offsets live in the query's
    ``checkpointLocation`` (ST3). Requires the spark-sql-kafka package on
    the cluster classpath; not exercised in local tests (no broker), but the
    returned plan is identical shape to ``read_message_stream``'s.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), IMAGE_MSG_SCHEMA).alias("m"),
        F.col("value").cast("string").alias("_raw"),
    )
    return parsed.select(
        "m.sha1",
        "m.s3_url",
        "m.img_info",
        "m.list_sha1s",
        # PERMISSIVE-equivalent corrupt capture: null struct -> raw payload
        F.when(F.col("m").isNull(), F.col("_raw"))
        .otherwise(F.lit(None))
        .alias("_corrupt_record"),
    )


def observe_messages(stream: DataFrame, name: str = "ingest_metrics") -> DataFrame:
    """A6 stream throughput counters (generic_kafka_processor.py:120-187's
    processed/skipped counters) as Spark observed metrics — surfaced per
    micro-batch in StreamingQueryProgress.observedMetrics[name]."""
    return stream.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        F.count(F.col("sha1")).alias("n_single"),
        F.count(F.col("list_sha1s")).alias("n_list"),
    )


def normalize_messages(stream: DataFrame, prefer_url: bool = False) -> DataFrame:
    """Valid messages -> one row per sha1 (single or list messages), sha1
    uppercased, dupes within the frame dropped (ST4 first tier).

    Hardening (review r13): a NULL element inside ``list_sha1s`` is
    dropped — it previously survived the explode (schema-valid message,
    null join keys never match the claim anti-join) and crashed the
    stateful batcher's sort or was re-claimed forever.

    ``prefer_url=True`` (BATCH callers only — the kinesis sweep): when
    the same sha1 arrives both as a single message (with s3_url) and
    inside another message's list (without), keep the s3_url-bearing
    row deterministically via a max-struct agg — plain dropDuplicates
    picks an arbitrary winner and could permanently record NULL for a
    URL that was delivered. The default stays dropDuplicates because
    the STREAMING call sites feed applyInPandasWithState, which cannot
    follow a streaming aggregation."""
    valid = stream.where(F.col("_corrupt_record").isNull())
    singles = valid.where(F.col("sha1").isNotNull()).select(
        F.upper("sha1").alias("sha1"), "s3_url", "img_info"
    )
    lists = (
        valid.where(F.col("list_sha1s").isNotNull())
        .select(F.explode("list_sha1s").alias("sha1"))
        .where(F.col("sha1").isNotNull())
        .select(
            F.upper("sha1").alias("sha1"),
            F.lit(None).cast("string").alias("s3_url"),
            F.lit(None).cast(IMAGE_MSG_SCHEMA["img_info"].dataType).alias("img_info"),
        )
    )
    both = singles.unionByName(lists)
    if prefer_url:
        # max of the struct sorts NULL url first under struct ordering, so
        # the url-bearing row wins; ties break on the url value itself
        return (
            both.groupBy("sha1")
            .agg(F.max(F.struct("s3_url", "img_info")).alias("_best"))
            .select("sha1", "_best.s3_url", "_best.img_info")
        )
    return both.dropDuplicates(["sha1"])


@dataclass
class CountOrTimeBatcher:
    """ST1 state: carry ids until batch_size reached OR max_delay elapsed.

    ``pending`` carries (sha1, s3_url) tuples between micro-batches;
    ``first_seen`` is the wall-clock arrival of the oldest pending id.
    Re-derivable from the ledger on restart (exactly-once comes from the
    checkpoint + idempotent append; no marker-column races, ST2).
    """

    batch_size: int = DEFAULT_BATCH_SIZE
    max_delay_s: float = DEFAULT_MAX_DELAY_S
    clock: object = time.monotonic
    pending: list[tuple] = field(default_factory=list)
    first_seen: float | None = None
    seqs: dict[str, int] = field(default_factory=dict)

    def add(self, rows: list[tuple]) -> list[list[tuple]]:
        """Feed new rows; return zero or more full update batches to emit."""
        out: list[list[tuple]] = []
        if rows and self.first_seen is None:
            self.first_seen = self.clock()
        self.pending.extend(rows)
        while len(self.pending) >= self.batch_size:
            out.append(self.pending[: self.batch_size])
            self.pending = self.pending[self.batch_size :]
            self.first_seen = self.clock() if self.pending else None
        if (
            self.pending
            and self.first_seen is not None
            and self.clock() - self.first_seen >= self.max_delay_s
        ):
            out.append(self.pending)
            self.pending = []
            self.first_seen = None
        return out

    def flush(self) -> list[list[tuple]]:
        if not self.pending:
            return []
        out = [self.pending]
        self.pending = []
        self.first_seen = None
        return out

    def mint(self, extr_type: str, date_str: str) -> str:
        key = f"{extr_type}_{date_str}"
        seq = self.seqs.get(key, 0)
        self.seqs[key] = seq + 1
        return f"index_update_{extr_type}_{date_str}_{seq:03d}"


class IngestLedger:
    """foreachBatch sink: claim-check anti-join + batch cut + ledger append.

    Writes two parquet tables under ``ledger_dir``:
    - ``images/``  (sha1, s3_url, update_id)           — claimed rows (J3-deduped)
    - ``updates/`` (update_id, extr_type, sha1s, created, batch_size)
    """

    def __init__(
        self,
        spark: SparkSession,
        ledger_dir: str,
        extr_type: str = "toy_feat_full_image",
        batch_size: int = DEFAULT_BATCH_SIZE,
        max_delay_s: float = DEFAULT_MAX_DELAY_S,
        clock=time.monotonic,
        date_str: str | None = None,
    ) -> None:
        self.spark = spark
        self.ledger_dir = ledger_dir
        self.extr_type = extr_type
        self.batcher = CountOrTimeBatcher(
            batch_size=batch_size, max_delay_s=max_delay_s, clock=clock
        )
        self.date_str = date_str or time.strftime("%Y-%m-%d")
        self.images_dir = os.path.join(ledger_dir, "images")
        self.updates_dir = os.path.join(ledger_dir, "updates")
        # Seed the mint counter from the CLAIM table (review r13): a fresh
        # process previously restarted seqs at 0 and re-minted ids that
        # already existed in the ledger from an earlier session on the same
        # (type, date) — duplicate update_ids over different content. The
        # images table is the commit point, so counting its distinct ids
        # also makes a crash-window replay re-mint the SAME id (the
        # kinesis-twin idiom), which the _emit guard below resolves.
        if os.path.isdir(self.images_dir) and any(
            f.endswith(".parquet") for f in os.listdir(self.images_dir)
        ):
            prefix = f"index_update_{self.extr_type}_{self.date_str}_"
            n = (
                self.spark.read.parquet(self.images_dir)
                .where(F.col("update_id").startswith(prefix))
                .select("update_id")
                .distinct()
                .count()
            )
            if n:
                self.batcher.seqs[f"{self.extr_type}_{self.date_str}"] = n

    # -- claim check (J3 stream-static anti-join) --------------------------
    def _unclaimed(self, batch_df: DataFrame) -> DataFrame:
        if os.path.isdir(self.images_dir) and any(
            f.endswith(".parquet") for f in os.listdir(self.images_dir)
        ):
            existing = self.spark.read.parquet(self.images_dir).select("sha1")
            return batch_df.join(existing, "sha1", "left_anti")
        return batch_df

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = [
            (r["sha1"], r["s3_url"])
            for r in self._unclaimed(batch_df)
            .select("sha1", "s3_url")
            .orderBy("sha1")
            .collect()
        ]
        self._emit(self.batcher.add(rows))

    def finalize(self) -> None:
        """Emit the trailing partial batch (max-delay expiry at shutdown)."""
        self._emit(self.batcher.flush())

    def _existing_update_ids(self) -> set[str]:
        if os.path.isdir(self.updates_dir) and any(
            f.endswith(".parquet") for f in os.listdir(self.updates_dir)
        ):
            return {
                r["update_id"]
                for r in self.spark.read.parquet(self.updates_dir)
                .select("update_id")
                .distinct()
                .collect()
            }
        return set()

    def _emit(self, batches: list[list[tuple]]) -> None:
        # Write order + guard (review r13): the UPDATES row lands first,
        # skipped if its id already exists (a crash-window replay re-mints
        # the same id — see the seqs seeding in __init__), and the images
        # CLAIM lands last as the commit point. The old images-first order
        # lost the updates row forever on a crash between the writes (the
        # claim blocked re-emission). Residual caveat, documented: this
        # driver-buffered sink can lose its pending carry across a crash
        # (rows from already-committed triggers), so an orphaned update's
        # membership is authoritative over a differently-cut replay —
        # run_ingest_stateful (state-store batching) is the crash-safe
        # primary path.
        existing = self._existing_update_ids() if batches else set()
        for batch in batches:
            if not batch:
                continue
            update_id = self.batcher.mint(self.extr_type, self.date_str)
            if update_id not in existing:
                self.spark.createDataFrame(
                    [
                        (
                            update_id,
                            self.extr_type,
                            [sha1 for sha1, _ in batch],
                            len(batch),
                        )
                    ],
                    "update_id string, extr_type string, sha1s array<string>, batch_size int",
                ).withColumn("created", F.current_timestamp()).write.mode(
                    "append"
                ).parquet(self.updates_dir)
            img_rows = [(sha1, url, update_id) for sha1, url in batch]
            self.spark.createDataFrame(
                img_rows, "sha1 string, s3_url string, update_id string"
            ).write.mode("append").parquet(self.images_dir)


class StatefulLedgerSink:
    """foreachBatch sink for the executor-side batcher's OUTPUT stream.

    Unlike :class:`IngestLedger` this never buffers ids: its input rows are
    already-cut update batches ``(extr_type, update_id, sha1s, s3_urls,
    batch_size, reason)`` — O(updates) rows per trigger, each bounded by
    ``batch_size`` — and it just appends them to the two ledger tables
    (``updates/`` verbatim; ``images/`` via an arrays_zip explode). All
    writes are distributed; the driver handles only query lifecycle.
    """

    def __init__(self, spark: SparkSession, ledger_dir: str) -> None:
        self.spark = spark
        self.ledger_dir = ledger_dir
        self.images_dir = os.path.join(ledger_dir, "images")
        self.updates_dir = os.path.join(ledger_dir, "updates")

    def _minus_existing(self, df: DataFrame, table_dir: str) -> DataFrame:
        """Drop rows whose update_id a previous (crashed, replayed) attempt
        already appended to ``table_dir`` — foreachBatch is at-least-once
        and the state-store batcher re-emits the SAME deterministic
        update_ids on replay (state is versioned with the checkpoint), so
        per-table id guards make the appends converge exactly (review r13:
        replays previously duplicated rows in whichever tables the crashed
        attempt had reached)."""
        if os.path.isdir(table_dir) and any(
            f.endswith(".parquet") for f in os.listdir(table_dir)
        ):
            existing = (
                self.spark.read.parquet(table_dir).select("update_id").distinct()
            )
            return df.join(F.broadcast(existing), "update_id", "left_anti")
        return df

    def process_batch(self, bdf: DataFrame, batch_id: int) -> None:
        bdf = bdf.persist()
        try:
            self._minus_existing(bdf, self.updates_dir).select(
                "update_id", "extr_type", "sha1s", "batch_size"
            ).withColumn("created", F.current_timestamp()).write.mode(
                "append"
            ).parquet(self.updates_dir)
            self._minus_existing(bdf, self.images_dir).select(
                "update_id",
                F.explode(F.arrays_zip("sha1s", "s3_urls")).alias("z"),
            ).select(
                F.col("z.sha1s").alias("sha1"),
                F.col("z.s3_urls").alias("s3_url"),
                "update_id",
            ).write.mode("append").parquet(self.images_dir)
        finally:
            bdf.unpersist()


def run_ingest_stateful(
    spark: SparkSession,
    src_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    extr_type: str = "toy_feat_full_image",
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_delay_ms: int = int(DEFAULT_MAX_DELAY_S * 1000),
    date_str: str | None = None,
) -> StatefulLedgerSink:
    """PRIMARY ST1 path: drain ``src_dir`` (availableNow) with the batching
    state in the state store (``streaming/stateful.py``), not on the driver.

    Stages: file/Kafka source -> observe (A6) -> normalize + stateful
    dropDuplicates (ST4, survives restarts via the checkpoint) ->
    stream-static anti-join against the already-claimed images table (J3
    claim check; the static side is re-read per run, so across-run dedup
    holds even with a fresh checkpoint) -> applyInPandasWithState
    count-or-time batcher (ST1/ST2/ST3) -> :class:`StatefulLedgerSink`.

    A trailing partial batch stays in the state store and is emitted by a
    later run's count cut or deadline-in-state expiry (``first_ms`` +
    ``max_delay_ms``, checked on the next invocation that sees data for the
    key) — the reference's max-delay flush, minus its requirement that the
    process stay alive. ``NoTimeout`` is deliberate: state-store timers
    keep re-arming micro-batches and an ``availableNow`` drain would never
    terminate; a long-running deployment that wants no-input flushes passes
    ``ProcessingTimeTimeout`` to :func:`batch_updates_stateful` directly.
    """
    from .stateful import batch_updates_stateful

    sink = StatefulLedgerSink(spark, ledger_dir)
    raw = observe_messages(read_message_stream(spark, src_dir))
    stream = normalize_messages(raw)
    if os.path.isdir(sink.images_dir) and any(
        f.endswith(".parquet") for f in os.listdir(sink.images_dir)
    ):
        claimed = spark.read.parquet(sink.images_dir).select("sha1")
        stream = stream.join(claimed, "sha1", "left_anti")
    typed = stream.select(F.lit(extr_type).alias("extr_type"), "sha1", "s3_url")
    batches = batch_updates_stateful(
        typed,
        date_str or time.strftime("%Y-%m-%d"),
        batch_size=batch_size,
        max_delay_ms=max_delay_ms,
    )
    q = (
        batches.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink.last_query = q
    return sink


def run_ingest(
    spark: SparkSession,
    src_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    **ledger_kwargs,
) -> IngestLedger:
    """Driver-side fixture twin of :func:`run_ingest_stateful` — drain
    ``src_dir`` (availableNow) with the carry buffer on the driver."""
    ledger = IngestLedger(spark, ledger_dir, **ledger_kwargs)
    raw = observe_messages(read_message_stream(spark, src_dir))
    stream = normalize_messages(raw)
    q = (
        stream.writeStream.foreachBatch(ledger.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ledger.last_query = q  # observed A6 metrics: q.recentProgress[*].observedMetrics
    return ledger
