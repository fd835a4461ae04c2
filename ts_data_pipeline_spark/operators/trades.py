"""Option-trade stream adapter + enrichment over the driver tables.

The driver's synthetic ``events`` table stands in for the enriched
option-trade stream (FIXTURES.md mapping): ``user_id`` <-> the Kafka
key ``osym`` (option_trades/utils.py:192), ``ts`` <-> event time,
``value`` <-> premium, ``event_type``/``props`` drive side/type
derivation. Thresholds are the FIXTURES.md-scaled analogs of the
reference's 75k/250k/1M premium cutoffs
(option_trades/utils.py:94-100).

Every derivation is a Column expression; ``events_as_option_trades``
is one narrow ``select`` — exactly the reference's ``map_fields``
projection shape (P1, utils.py:66-149) but declarative, so Catalyst
prunes the scan to the five columns used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Scaled premium buckets (FIXTURES.md "Thresholds are scaled to the
# stand-in data's value ranges"): events.value spans ~0..490.
LARGE_TRADE = 75.0
WHALE = 250.0
MILLIONAIRE = 400.0

# Side analog of option_trades/utils.py:124 ('ask_side' in tags ->
# buy, 'bid_side' -> sell, else no_side) keyed on event_type.
BUY_EVENTS = ("purchase", "signup")
SELL_EVENTS = ("click", "view")

SIDE_SQL = (
    "CASE WHEN event_type IN ('purchase','signup') THEN 'buy' "
    "WHEN event_type IN ('click','view') THEN 'sell' "
    "ELSE 'no_side' END"
)
OTYPE_SQL = (
    "CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0 "
    "THEN 'call' ELSE 'put' END"
)
QTY_SQL = "CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 + 1"


def events_as_option_trades(events: DataFrame) -> DataFrame:
    """Project driver events into the enriched option-trade shape.

    Columns: osym (key), ts, premium, qty, side, otype, whale.
    Mirrors map_fields' rename/derive/coalesce projection
    (/root/reference/option_trades/utils.py:111-145) plus the side
    derivation (utils.py:124) and the whale split used by the
    aggregator (/root/reference/option_trade_aggs/main.py:99,118).
    """
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return events.select(
        F.col("event_id").alias("trade_id"),
        F.col("user_id").alias("osym"),
        F.col("ts"),
        F.col("value").alias("premium"),
        (k % 2 == 0).alias("_is_call"),
        (k % 10 + 1).alias("qty"),
        F.when(F.col("event_type").isin(*BUY_EVENTS), F.lit("buy"))
        .when(F.col("event_type").isin(*SELL_EVENTS), F.lit("sell"))
        .otherwise(F.lit("no_side"))
        .alias("side"),
    ).withColumn(
        "otype", F.when(F.col("_is_call"), F.lit("call")).otherwise(F.lit("put"))
    ).withColumn(
        "whale", F.col("premium") > WHALE
    ).drop("_is_call")
