"""S9 Kafka producer sink message shaping (streaming/kafka_sink.py).

No broker in the test environment, so these pin the (key, value) relation's
contract: schema, key choice, and JSON payloads that round-trip through the
matching source schema (``ingest.IMAGE_MSG_SCHEMA``) — producer and consumer
stay inverse transforms of each other.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from columbiaimagesearch_spark.streaming.ingest import IMAGE_MSG_SCHEMA
from columbiaimagesearch_spark.streaming.kafka_sink import (
    image_messages,
    update_messages,
)


def test_image_messages_roundtrip(spark):
    df = spark.createDataFrame(
        [("ABC123", "s3://b/k.jpg", ("JPEG", 640, 480))],
        "sha1 string, s3_url string, "
        "img_info struct<format:string,width:int,height:int>",
    )
    out = image_messages(df)
    assert out.columns == ["key", "value"]
    row = out.collect()[0]
    assert row["key"] == "ABC123"
    payload = json.loads(row["value"])
    assert payload == {
        "sha1": "ABC123",
        "s3_url": "s3://b/k.jpg",
        "img_info": {"format": "JPEG", "width": 640, "height": 480},
    }
    # consumer-side parse with the source schema recovers the fields
    parsed = out.select(
        F.from_json("value", IMAGE_MSG_SCHEMA).alias("m")
    ).select("m.sha1", "m.s3_url", "m.img_info.width")
    assert parsed.collect()[0] == ("ABC123", "s3://b/k.jpg", 640)


def test_update_messages_comma_joined(spark):
    df = spark.createDataFrame(
        [("index_update_t_2026-01-01_000", ["A", "B", "C"])],
        "update_id string, sha1s array<string>",
    )
    row = update_messages(df).collect()[0]
    assert row["key"] == "index_update_t_2026-01-01_000"
    assert json.loads(row["value"]) == {
        "index_update_t_2026-01-01_000": "A,B,C"
    }
