"""Environment-gated integration tests for the transport/decoder seams.

These SKIP in this container (no Kafka broker jar/endpoint, no imaging
library) — they exist so the swap-in paths are pinned executable the moment
the environment provides the dependency, exactly as documented at
``streaming/ingest.py`` ("swap transport for format('kafka'), same
downstream plan") and ``multimodal/images.py:90`` (the decode seam).

Run on a real cluster with:
  KAFKA_BOOTSTRAP=broker:9092 pytest tests/test_env_gated_integration.py
"""

from __future__ import annotations

import json
import os
import uuid

import pytest


def _kafka_classpath_available(spark) -> bool:
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "probe").load()
        return True
    except Exception as e:  # noqa: BLE001 — classify the failure
        # missing data source class => no jar; anything else (connection
        # refused happens at query START, not here) => jar present
        return "Failed to find data source" not in str(e)


KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")


@pytest.mark.skipif(
    not KAFKA_BOOTSTRAP, reason="set KAFKA_BOOTSTRAP=host:port to run"
)
def test_kafka_roundtrip_same_downstream_plan(spark, tmp_path):
    """S1/S9 against a real broker: image messages produced with the S9
    sink land back through format('kafka') and parse with the SAME
    normalize_messages relation the file-drop twin uses — proving the
    transport swap changes no downstream plan."""
    if not _kafka_classpath_available(spark):
        pytest.skip("spark-sql-kafka jar not on the classpath")
    from pyspark.sql import functions as F

    from columbiaimagesearch_spark.streaming.ingest import (
        IMAGE_MSG_SCHEMA,
        normalize_messages,
    )
    from columbiaimagesearch_spark.streaming.kafka_sink import image_messages

    topic = f"cis-test-{uuid.uuid4().hex[:8]}"
    src = spark.createDataFrame(
        [(f"{i:040X}", f"s3://b/{i}", None) for i in range(25)],
        "sha1 string, s3_url string, img_info string",
    )
    (
        image_messages(src)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.from_json(F.col("value").cast("string"), IMAGE_MSG_SCHEMA).alias("m"),
            F.col("value").cast("string").alias("data"),
        )
        .select(
            "m.sha1", "m.s3_url", "m.img_info", "m.list_sha1s",
            F.when(F.col("m").isNull(), F.col("data")).alias("_corrupt_record"),
        )
    )
    rows = normalize_messages(back)
    assert rows.count() == 25


def test_real_image_decode_through_seam(spark):
    """V14 seam with a real decoder: if PIL is importable, decode_image can
    be monkey-wired and the extraction composition runs on real pixels."""
    pil = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    img = pil.new("RGB", (16, 12), color=(10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    data = buf.getvalue()

    def real_decode(b: bytes) -> np.ndarray:
        return np.asarray(pil.open(io.BytesIO(b)).convert("RGB"))

    arr = real_decode(data)
    assert arr.shape == (12, 16, 3) and (arr[0, 0] == [10, 20, 30]).all()

    # the sniffer must agree with the real decoder on dimensions
    from columbiaimagesearch_spark.multimodal.images import sniff_image_header

    fmt, width, height = sniff_image_header(data)
    assert (width, height) == (16, 12)
    assert fmt.upper() == "PNG"


def test_seams_are_gated_not_broken(spark):
    """In THIS container the seams must fail loudly (NotImplementedError),
    never silently return wrong pixels."""
    from columbiaimagesearch_spark.multimodal import images

    with pytest.raises(NotImplementedError):
        images.decode_image(b"\x89PNG\r\n\x1a\n")
