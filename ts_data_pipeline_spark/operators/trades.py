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
    # ``$.k`` is parsed ONCE in its own projection: inlining the
    # get_json_object into both consumers (qty and otype) made
    # Catalyst keep two copies of the JSON parse — the single
    # expensive expression in this path (r15 A/B: -10% end-to-end).
    # CollapseProject leaves ``_k`` un-inlined because it is
    # non-cheap and referenced twice. selectExpr strings keep the
    # build to two driver round trips (OPTIMIZATION_r15.md §driver).
    buy_list = ", ".join(f"'{e}'" for e in BUY_EVENTS)
    sell_list = ", ".join(f"'{e}'" for e in SELL_EVENTS)
    return events.selectExpr(
        "event_id",
        "user_id",
        "ts",
        "value",
        "event_type",
        "CAST(get_json_object(props, '$.k') AS INT) AS _k",
    ).selectExpr(
        "event_id AS trade_id",
        "user_id AS osym",
        "ts",
        "value AS premium",
        "(_k % 10) + 1 AS qty",
        f"CASE WHEN event_type IN ({buy_list}) THEN 'buy' "
        f"WHEN event_type IN ({sell_list}) THEN 'sell' "
        f"ELSE 'no_side' END AS side",
        "CASE WHEN _k % 2 = 0 THEN 'call' ELSE 'put' END AS otype",
        f"value > CAST('{WHALE}' AS DOUBLE) AS whale",
    )
