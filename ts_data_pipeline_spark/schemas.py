"""Canonical schemas for every dataset the engine understands.

The reference has a *mixed* schema system: permissive dict-shaped
JSON with per-field defaults (option_trades/utils.py:111-145), one
pinned Avro schema (darkpool_trades/main.py:19-39), and fixed
swagger contracts for the query API (dashboard/src/Models/*.ts).
Here every dataset gets one explicit StructType; permissive JSON
ingestion goes through ``from_json(col, schema)`` with these.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Enriched option trade — output of map_fields,
# /root/reference/option_trades/utils.py:111-145. Key = osym,
# event-time = ts (epoch ms).
OPTION_TRADE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("ts", T.LongType(), nullable=False),
        T.StructField("osym", T.StringType(), nullable=False),
        T.StructField("usym", T.StringType()),
        T.StructField("spot", T.DoubleType()),
        T.StructField("strike", T.DoubleType()),
        T.StructField("expiration", T.StringType()),
        T.StructField("dtx", T.IntegerType()),
        T.StructField("otype", T.StringType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("premium", T.DoubleType()),
        T.StructField("side", T.StringType()),
        T.StructField("xchg", T.StringType()),
        T.StructField("cond", T.StringType()),
        T.StructField("iv", T.DoubleType()),
        T.StructField("oi", T.IntegerType()),
        T.StructField("bid", T.DoubleType()),
        T.StructField("ask", T.DoubleType()),
        T.StructField("theo", T.DoubleType()),
        T.StructField("delta", T.DoubleType()),
        T.StructField("gamma", T.DoubleType()),
        T.StructField("vega", T.DoubleType()),
        T.StructField("theta", T.DoubleType()),
        T.StructField("rho", T.DoubleType()),
        T.StructField("vol", T.IntegerType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)

# Dark-pool print — Avro schema literal
# /root/reference/darkpool_trades/main.py:19-39. The reference
# serializes decimals as strings to dodge float loss; Spark keeps
# DecimalType natively and casts only at the Avro boundary (P12).
DARKPOOL_TRADE = T.StructType(
    [
        T.StructField("ts", T.LongType(), nullable=False),
        T.StructField("symbol", T.StringType(), nullable=False),
        T.StructField("bid", T.DecimalType(18, 6)),
        T.StructField("bid_sz", T.IntegerType()),
        T.StructField("ask", T.DecimalType(18, 6)),
        T.StructField("ask_sz", T.IntegerType()),
        T.StructField("price", T.DecimalType(18, 6)),
        T.StructField("qty", T.IntegerType()),
        T.StructField("value", T.DecimalType(24, 6)),
        T.StructField("side", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("venue", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)

# Equity aggregate bar — transform_func output,
# /root/reference/equity_quotes/main.py:52-75.
EQUITY_BAR = T.StructType(
    [
        T.StructField("symbol", T.StringType(), nullable=False),
        T.StructField("event", T.StringType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("vwap", T.DoubleType()),
        T.StructField("bar_volume", T.LongType()),
        T.StructField("num_of_trades", T.LongType()),
        T.StructField("session_volume", T.LongType()),
        T.StructField("timestamp", T.LongType(), nullable=False),
    ]
)

# News article — nested JSON fields used at
# /root/reference/news/main.py:56-67.
NEWS_ARTICLE = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("published_utc", T.StringType(), nullable=False),
        T.StructField("publisher", T.StructType([T.StructField("name", T.StringType())])),
        T.StructField("tickers", T.ArrayType(T.StringType())),
        T.StructField("title", T.StringType()),
        T.StructField("article_url", T.StringType()),
    ]
)

# Telemetry storage model — dashboard/src/Models/parameterData.ts:16-38,
# eventValue.ts:16-29, stream.ts:17-67.
PARAMETER_VALUES = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), nullable=False),
        T.StructField("ts", T.LongType(), nullable=False),
        T.StructField("parameter_id", T.StringType(), nullable=False),
        T.StructField("num_value", T.DoubleType()),
        T.StructField("str_value", T.StringType()),
        T.StructField("bin_value", T.BinaryType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)

TELEMETRY_EVENTS = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), nullable=False),
        T.StructField("ts", T.LongType(), nullable=False),
        T.StructField("event_id", T.StringType(), nullable=False),
        T.StructField("level", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)

STREAMS_CATALOG = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), nullable=False),
        T.StructField("name", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("parents", T.ArrayType(T.StringType())),
        T.StructField("location", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("data_start", T.LongType()),
        T.StructField("data_end", T.LongType()),
        T.StructField("soft_delete_at", T.TimestampType()),
    ]
)

# Stream status enum — dashboard/src/Models/streamStatus.ts:16.
STREAM_STATUSES = (
    "Open", "Closed", "Aborted", "Terminated", "Interrupted",
    "Deleting", "SoftDeleted", "Idle",
)

# Event severity enum — dashboard/src/Models/eventLevel.ts:16.
EVENT_LEVELS = ("Trace", "Debug", "Information", "Warning", "Error", "Critical")
