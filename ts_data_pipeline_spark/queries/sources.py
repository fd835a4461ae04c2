"""Connector queries: replay-frames DataSource roundtrip (S1-S3).

Dumps the events table to captured-frame JSONL, reads it back
through the custom ``replay_frames`` DataSource (source-side
key/timestamp extraction + JVM-side ``from_json`` payload parse),
and projects the original columns — the DuckDB oracle reads the
events table directly, so hash-equality certifies the connector.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.registry import register
from ts_data_pipeline_spark.sources import replay

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def replay_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = io.load(spark, sf_dir, "events")
    frames = events.select(
        F.unix_millis("ts").alias("ts"),
        F.col("user_id").cast("string").alias("key"),
        "event_id", "event_type", "value", "props",
    )
    dump_dir = os.path.join(tempfile.mkdtemp(prefix="tsdp_frames_"), "frames")
    frames.write.mode("overwrite").json(dump_dir)

    replay.register(spark)
    raw = (
        spark.read.format("replay_frames")
        .option("path", dump_dir)
        .option("key_field", "key")
        .option("ts_field", "ts")
        .load()
    )
    return raw.select(
        F.col("key"),
        F.timestamp_millis(F.col("ts")).alias("ts"),
        F.from_json(F.col("payload"), PAYLOAD_SCHEMA).alias("v"),
    ).select("key", "ts", "v.event_id", "v.event_type", "v.value", "v.props")


REPLAY_SOURCE_ROUNDTRIP_SQL = """
SELECT CAST(user_id AS VARCHAR) AS key,
       make_timestamp(epoch_ms(ts) * 1000) AS ts,
       event_id, event_type, value, props
FROM events
"""


register("replay_source_roundtrip", replay_source_roundtrip, REPLAY_SOURCE_ROUNDTRIP_SQL)
