"""Event-time windowed aggregation with watermarks — the ST-gap adoption.

The reference has no event-time semantics (SURVEY §2.9 gap: time is
wall-clock, late data handled by re-scans). The engine adopts Spark
watermark + tumbling-window aggregation as the analytic surface for the
``events`` stream; the batch twin (``w_tumbling_event_agg`` in
operators/relational.py) is the DuckDB-oracle-checked reference plan, and
tests assert the streamed result converges to the batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_event_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )


def windowed_event_agg(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows with late-data watermark; same output
    contract as the batch twin (window_start epoch, event_type, n,
    total_value, avg_value)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            # +1e-9 before the 4dp round, exactly like the batch twin
            # (w_tumbling_event_agg): without the nudge a mean within 1e-9
            # of a half boundary rounds differently per side and breaks
            # the stream-converges-to-batch contract (review r13)
            F.round(F.avg("value") + F.lit(1e-9), 4).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
            "avg_value",
        )
    )
