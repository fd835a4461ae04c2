"""Market-bar operators: OHLCV resampling, per-group top-K,
permissive JSON ingestion.

The equity_quotes service lands 1-minute bars
(/root/reference/equity_quotes/main.py:52-75); consumers re-bucket
them (the dashboard's groupByTime). ``ohlc_resample`` is that
operation done right: order-sensitive open/close via min_by/max_by
on event time, extrema and volume sums — one hash agg, no window
sort. ``top_premium_per_day`` is the leaderboard shape (row_number
over a day partition). ``permissive_json_ingest`` reproduces the
reference's defensive per-record try/except parse
(option_trades/utils.py:147-149, data_source.py:239): malformed
payloads become null rows that are counted, never crashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import trades
from ts_data_pipeline_spark.registry import register


def ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the tick-ish event stream to hourly OHLCV per key."""
    e = io.load(spark, sf_dir, "events")
    px, ts = F.col("value"), F.col("ts")
    return (
        e.groupBy(F.window(ts, "1 hour"), F.col("user_id").alias("sym"))
        .agg(
            F.min_by(px, ts).alias("open"),
            F.max(px).alias("high"),
            F.min(px).alias("low"),
            F.max_by(px, ts).alias("close"),
            F.round(F.sum(px), 4).alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("window.start").alias("bar_start"),
            "sym", "open", "high", "low", "close", "volume", "n_ticks",
        )
    )


OHLC_RESAMPLE_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS bar_start,
       user_id AS sym,
       arg_min(value, ts) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, ts) AS close,
       ROUND(SUM(value), 4) AS volume,
       COUNT(*) AS n_ticks
FROM events
GROUP BY 1, 2
"""


def top_premium_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 premium trades per day (leaderboard): partial top-K
    happens map-side inside the window sort, no global ordering."""
    t = trades.events_as_option_trades(io.load(spark, sf_dir, "events"))
    day = F.date_trunc("day", F.col("ts")).alias("day")
    w = Window.partitionBy("day").orderBy(
        F.col("premium").desc(), F.col("trade_id").asc()
    )
    return (
        t.select(day, "trade_id", "osym", "premium")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )


TOP_PREMIUM_SQL = """
WITH t AS (
  SELECT date_trunc('day', ts) AS day, event_id AS trade_id,
         user_id AS osym, value AS premium
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY day ORDER BY premium DESC, trade_id ASC) AS rk
  FROM t
)
SELECT day, trade_id, osym, premium, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 5
"""


def permissive_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Defensive ingestion: every 10th payload is corrupted
    (truncated mid-object — trailing-garbage corruption would still
    parse, Jackson stops after the first complete JSON value),
    from_json yields null for it, and the pipeline counts good vs bad
    per key instead of crashing — the declarative form of the
    reference's try/except-log-continue."""
    e = io.load(spark, sf_dir, "events")
    js = F.to_json(F.struct(F.col("value").alias("v")))
    payload = F.when(
        F.col("event_id") % 10 == 0,
        F.expr("left(to_json(struct(value AS v)), length(to_json(struct(value AS v))) - 2)"),
    ).otherwise(js)
    parsed = e.select(
        F.col("user_id"),
        F.from_json(payload, "v double").alias("p"),
    )
    return parsed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.col("p.v")).alias("n_ok"),
        (F.count(F.lit(1)) - F.count(F.col("p.v"))).alias("n_bad"),
        F.round(F.sum("p.v"), 4).alias("v_sum"),
    )


PERMISSIVE_JSON_SQL = """
SELECT user_id,
       COUNT(*) AS n,
       COUNT(CASE WHEN event_id % 10 != 0 THEN 1 END) AS n_ok,
       CAST(SUM(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       ROUND(SUM(CASE WHEN event_id % 10 != 0 THEN value END), 4) AS v_sum
FROM events
GROUP BY user_id
"""


register("ohlc_resample", ohlc_resample, OHLC_RESAMPLE_SQL)
# top_premium_per_day -> olap_pivot_suite; permissive_json_ingest ->
# enrichment_suite (queries/suites.py).
