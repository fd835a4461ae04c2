"""Flagship: the option_trade_aggs pipeline in batch (SURVEY §7 ph.1).

A1+A2+A11 — scan -> project/enrich -> keyed 1-minute tumbling
window -> 24 conditional sums + count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import trades, window_agg
from ts_data_pipeline_spark.registry import register

# DuckDB-side projection matching trades.events_as_option_trades.
TRADES_SQL = f"""
SELECT
  event_id AS trade_id,
  user_id AS osym,
  ts,
  value AS premium,
  {trades.QTY_SQL} AS qty,
  {trades.SIDE_SQL} AS side,
  {trades.OTYPE_SQL} AS otype,
  value > {trades.WHALE} AS whale
FROM events
"""


def flagship_option_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+A11 — 1-minute tumbling keyed conditional-sum fan-out."""
    events = io.load(spark, sf_dir, "events")
    return window_agg.option_window_agg(trades.events_as_option_trades(events))


def flagship_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same flagship plan with the opt-in two-phase skew salt
    (operators/skew.py pattern wired into option_window_agg) —
    pinned value-identical to the unsalted oracle."""
    events = io.load(spark, sf_dir, "events")
    return window_agg.option_window_agg(
        trades.events_as_option_trades(events), salt_buckets=8
    )


_FLAGSHIP_SQL = window_agg.option_window_agg_sql(TRADES_SQL, bucket="minute")

register("flagship_option_window_agg", flagship_option_window_agg, _FLAGSHIP_SQL)
# Same oracle on purpose: salting must not change a single value.
register("flagship_salted", flagship_salted, _FLAGSHIP_SQL)
