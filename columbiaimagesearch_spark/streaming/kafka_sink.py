"""Kafka producer sinks — S9 rebuilt on writeStream / batch write.

The reference pushes three message families to Kafka: per-image messages
``{sha1, s3_url, img_info}`` (``pusher/kafka_pusher.py:108-138``), update
messages ``{update_id: "sha1,sha1,..."}``
(``updater/extraction_checker.py:424-431``), and CDR enrichments
(``ingester/generic_kafka_processor.py:247-260``). Spark-side, a Kafka sink
is just a relation with ``key``/``value`` binary columns handed to
``format("kafka")`` — serialization is declarative ``to_json(struct(...))``,
partitioning rides the key (sha1 / update_id), and delivery semantics come
from the streaming checkpoint instead of producer flush bookkeeping.

The message-shaping functions are plain column transforms, testable without
a broker; ``write_*`` attach the broker-facing options and are exercised on
a cluster classpath that ships spark-sql-kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def image_messages(df: DataFrame) -> DataFrame:
    """(sha1, s3_url, img_info struct) -> Kafka (key, value) relation.
    Key = sha1 so a partition owns an image's full history."""
    return df.select(
        F.col("sha1").cast("string").alias("key"),
        F.to_json(F.struct("sha1", "s3_url", "img_info")).alias("value"),
    )


def update_messages(df: DataFrame) -> DataFrame:
    """(update_id, sha1s array<string>) -> Kafka (key, value) relation.
    The reference's comma-joined id list (extraction_checker.py:424-431),
    keyed by update_id."""
    return df.select(
        F.col("update_id").cast("string").alias("key"),
        F.to_json(
            F.create_map(F.col("update_id"), F.concat_ws(",", F.col("sha1s")))
        ).alias("value"),
    )


def write_kafka_stream(
    messages: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """Streaming producer: exactly the reference's pusher loop with offsets,
    retries, and batching delegated to the sink + checkpoint (ST3)."""
    return (
        messages.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def write_kafka_batch(
    messages: DataFrame, bootstrap_servers: str, topic: str
) -> None:
    """Batch producer (the one-shot push paths, e.g. backfill enrichment)."""
    (
        messages.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
