"""Projection/transform/scalar operators (SURVEY §2.2, P1-P18).

Each query exercises a family of pure-Column enrichment functions on
the driver's stand-in tables, with an exactly-matching DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.functions import enrich
from ts_data_pipeline_spark.operators import trades
from ts_data_pipeline_spark.registry import register


# --------------------------------------------------------------------
# P1-P6 + P11: option-trade enrichment — projection, side derivation,
# position-type, premium-bucket tags, tag merge, deterministic key.
# Reference: option_trades/utils.py:66-149 (map_fields) and
# darkpool_trades/main.py:88-92 (sha256 key).
# --------------------------------------------------------------------

def enrich_option_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = trades.events_as_option_trades(io.load(spark, sf_dir, "events"))
    bucket_tags = enrich.premium_bucket_tags(
        F.col("premium"), trades.LARGE_TRADE, trades.WHALE, trades.MILLIONAIRE
    )
    # Fixture for the reference's explicit-no_side case: even-keyed
    # sideless trades carry the literal "no_side" tag (-> neutral_),
    # odd-keyed ones carry no side tag at all (-> no_side_), so both
    # branches of utils.py:84-91 are exercised and oracle-pinned.
    side_tag = (
        F.when(F.col("side") == "buy", F.lit("ask_side"))
        .when(F.col("side") == "sell", F.lit("bid_side"))
        .when(F.col("trade_id") % 2 == 0, F.lit("no_side"))
    )
    all_tags = enrich.merge_tags(bucket_tags, F.array_compact(F.array(side_tag)))
    return t.select(
        "trade_id",
        "osym",
        "ts",
        "premium",
        "qty",
        "side",
        "otype",
        enrich.position_type(all_tags, F.col("otype")).alias("position_type"),
        F.array_join(all_tags, ",").alias("tags"),
        enrich.deterministic_key(F.col("osym"), F.col("trade_id")).alias("trade_key"),
    )


ENRICH_TRADES_SQL = f"""
WITH t AS ({{trades_sql}})
SELECT
  trade_id, osym, ts, premium, qty, side, otype,
  (CASE WHEN side = 'buy' THEN 'long_' WHEN side = 'sell' THEN 'short_'
        WHEN trade_id % 2 = 0 THEN 'neutral_'
        ELSE 'no_side_' END) || otype AS position_type,
  concat_ws(',',
    CASE WHEN premium > {trades.LARGE_TRADE} THEN 'large_trade' END,
    CASE WHEN premium > {trades.WHALE} AND premium <= {trades.MILLIONAIRE}
         THEN 'whale' END,
    CASE WHEN premium > {trades.MILLIONAIRE} THEN 'millionaire' END,
    CASE WHEN side = 'buy' THEN 'ask_side'
         WHEN side = 'sell' THEN 'bid_side'
         WHEN trade_id % 2 = 0 THEN 'no_side' END) AS tags,
  sha256(CAST(osym AS VARCHAR) || CAST(trade_id AS VARCHAR)) AS trade_key
FROM t
"""


# --------------------------------------------------------------------
# P8-P12: dark-pool enrichment — NBBO side classification, sigmoid
# confidence, sentiment/condition tags, decimal value math, sha256 key.
# Reference: darkpool_trades/main.py:71-133. The driver's orders table
# stands in for the print feed; NBBO is derived deterministically so
# price lands below/at/above mid to exercise every branch.
# --------------------------------------------------------------------

def darkpool_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = io.load(spark, sf_dir, "orders")
    base = F.col("o_totalprice").cast("decimal(18,6)")
    bid = base
    ask = (base + F.lit(4)).cast("decimal(18,6)")
    price = (base + (F.col("o_orderkey") % 5)).cast("decimal(18,6)")
    qty = (F.col("o_orderkey") % 100 + 1).cast("int")
    side = enrich.darkpool_side(price, bid, ask)
    conf = enrich.side_confidence(
        price.cast("double"), bid.cast("double"), ask.cast("double")
    )
    return o.select(
        F.col("o_orderkey").alias("trade_id"),
        F.col("o_orderkey").cast("string").alias("symbol"),
        price.cast("decimal(24,6)").cast("string").alias("price"),
        qty.alias("qty"),
        (price * qty).cast("decimal(24,6)").cast("string").alias("value"),
        side.alias("side"),
        F.round(conf, 6).alias("confidence"),
        enrich.sentiment_from_side(side).alias("sentiment"),
        F.array_join(
            enrich.condition_tags(F.col("o_orderpriority"), F.col("o_orderstatus")), ","
        ).alias("cond_tags"),
        enrich.deterministic_key(F.col("o_orderkey"), F.col("o_custkey")).alias("key"),
    )


DARKPOOL_SQL = """
WITH t AS (
  SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,6)) AS bid,
         CAST(CAST(o_totalprice AS DECIMAL(18,6)) + 4 AS DECIMAL(18,6)) AS ask,
         CAST(CAST(o_totalprice AS DECIMAL(18,6)) + (o_orderkey % 5)
              AS DECIMAL(18,6)) AS price,
         CAST(o_orderkey % 100 + 1 AS INTEGER) AS qty
  FROM orders
)
SELECT
  o_orderkey AS trade_id,
  CAST(o_orderkey AS VARCHAR) AS symbol,
  CAST(CAST(price AS DECIMAL(24,6)) AS VARCHAR) AS price,
  qty,
  CAST(CAST(price * qty AS DECIMAL(24,6)) AS VARCHAR) AS value,
  CASE WHEN abs(price - bid) < abs(price - ask) THEN 'S'
       WHEN abs(price - bid) > abs(price - ask) THEN 'B'
       ELSE 'N' END AS side,
  ROUND(2.0 / (1.0 + exp(-((CAST(price AS DOUBLE) -
        (CAST(bid AS DOUBLE) + CAST(ask AS DOUBLE)) / 2) /
        (CAST(ask AS DOUBLE) - CAST(bid AS DOUBLE))))) - 1.0, 6) AS confidence,
  CASE WHEN abs(price - bid) < abs(price - ask) THEN 'sentiment:bearish'
       WHEN abs(price - bid) > abs(price - ask) THEN 'sentiment:bullish'
       ELSE 'sentiment:neutral' END AS sentiment,
  concat_ws(',',
    CASE WHEN o_orderpriority IS NOT NULL
         THEN 'condition:' || o_orderpriority END,
    CASE WHEN o_orderstatus IS NOT NULL
         THEN 'condition:' || o_orderstatus END) AS cond_tags,
  sha256(CAST(o_orderkey AS VARCHAR) || CAST(o_custkey AS VARCHAR)) AS key
FROM t
"""


# --------------------------------------------------------------------
# P7 + F2: equity-bar rename/projection with defaults-on-miss and the
# required-field validator. Reference: equity_quotes/main.py:52-84.
# part stands in for the vendor bar feed.
# --------------------------------------------------------------------

def equity_bar_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = io.load(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").isNotNull())  # validate_message analog (F2)
        .select(
            F.col("p_brand").alias("symbol"),
            F.coalesce(F.col("p_type"), F.lit("unknown")).alias("event"),
            F.col("p_retailprice").alias("open"),
            F.round(F.col("p_retailprice") * 1.1, 4).alias("high"),
            F.round(F.col("p_retailprice") * 0.95, 4).alias("low"),
            F.round((F.col("p_retailprice") * 1.1 + F.col("p_retailprice") * 0.95) / 2, 4).alias("vwap"),
            (F.col("p_size").cast("bigint") * 100).alias("bar_volume"),
            F.col("p_partkey").alias("bar_id"),
        )
    )


EQUITY_BAR_SQL = """
SELECT
  p_brand AS symbol,
  COALESCE(p_type, 'unknown') AS event,
  p_retailprice AS open,
  ROUND(p_retailprice * 1.1, 4) AS high,
  ROUND(p_retailprice * 0.95, 4) AS low,
  ROUND((p_retailprice * 1.1 + p_retailprice * 0.95) / 2, 4) AS vwap,
  CAST(p_size AS BIGINT) * 100 AS bar_volume,
  p_partkey AS bar_id
FROM part
WHERE p_name IS NOT NULL
"""


# --------------------------------------------------------------------
# P15 + P18: JSON decode + field extraction (permissive ingestion).
# Reference: json.loads at option_trades/utils.py:182 and nested
# extraction news/main.py:62-67.
# --------------------------------------------------------------------

def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = io.load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return e.select(
        "event_id",
        "ts",
        k.alias("k_str"),
        k.cast("int").alias("k"),
        (k.cast("int") % 10).alias("k_mod10"),
    )


JSON_PROPS_SQL = """
SELECT
  event_id,
  ts,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
  CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod10
FROM events
"""


# --------------------------------------------------------------------
# P18 + S3: news-article ingestion — nested JSON with a publisher
# struct and a tickers array, parsed with an explicit schema and
# exploded. Reference: news/main.py:58-67 keeps the raw Polygon JSON
# and pulls published_utc, publisher.name and tickers[].
# --------------------------------------------------------------------

_ARTICLE_SCHEMA = (
    "id BIGINT, published_utc STRING, "
    "publisher STRUCT<name: STRING>, tickers ARRAY<STRING>"
)


def news_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build article-shaped nested JSON from events, then ingest it:
    from_json with a pinned schema -> nested field access -> explode
    of the tickers array (one row per (article, ticker))."""
    e = io.load(spark, sf_dir, "events")
    raw = e.select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("published_utc"),
                F.struct(
                    F.concat(F.lit("pub-"), (F.col("user_id") % 5)).alias("name")
                ).alias("publisher"),
                F.array(
                    F.concat(F.lit("T"), F.col("user_id")),
                    F.upper(F.col("event_type")),
                ).alias("tickers"),
            )
        ).alias("raw")
    )
    a = raw.select(F.from_json(F.col("raw"), _ARTICLE_SCHEMA).alias("a"))
    return a.select(
        F.col("a.id").alias("article_id"),
        F.to_timestamp(F.col("a.published_utc")).alias("published_at"),
        F.col("a.publisher.name").alias("publisher"),
        F.explode(F.col("a.tickers")).alias("ticker"),
    )


NEWS_NESTED_SQL = """
SELECT event_id AS article_id,
       date_trunc('second', ts) AS published_at,
       'pub-' || CAST(user_id % 5 AS VARCHAR) AS publisher,
       unnest([ 'T' || CAST(user_id AS VARCHAR), upper(event_type) ]) AS ticker
FROM events
"""


# --------------------------------------------------------------------
# Pricing summary rollup (TPC-H Q1 shape): the canonical wide-agg
# scan — pushdown + partial/final agg over two low-cardinality keys.
# --------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# P1-P18 row-level enrichments are verified together as
# ``enrichment_suite`` (queries/suites.py); only the headline
# pricing rollup keeps its own registry entry.
register("pricing_summary", pricing_summary, PRICING_SUMMARY_SQL)
