"""Filters / predicates / sort / paging (SURVEY §2.3, §2.5).

F1/F4 time-range + value predicates, F6 tag-filter theta operators,
F7 smart-case catalog matching, F8 include/exclude lists, O1/O2
multi-key ordering + fixed-size paging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.registry import register


# --------------------------------------------------------------------
# F1 + F4: null/zero drop + time-range predicate + arithmetic agg.
# The ingest null-price filter (option_trades/utils.py:184) and the
# query API from/to bounds (getDataRequestBase.ts:14-22) composed
# into one pushdown-friendly scan-filter-agg (TPC-H Q6 shape).
# --------------------------------------------------------------------

def time_range_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_quantity").isNotNull()
            & (F.col("l_quantity") < 24)
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


TIME_RANGE_REVENUE_SQL = """
SELECT
  ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_quantity IS NOT NULL AND l_quantity < 24
  AND l_discount >= 0.02 AND l_discount <= 0.06
"""


# --------------------------------------------------------------------
# F6: tag-filter theta operators on map-like values — Equal/NotEqual/
# Like/NotLike over the JSON props "tag" (tagFilter.ts:17-27,
# tagOperator.ts:16-23), composed with a group-by.
# --------------------------------------------------------------------

def tag_filter_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = io.load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        e.filter(
            k.like("%1%")          # Like
            & ~k.like("7%")        # NotLike
            & (k != "13")          # NotEqual
            & (F.col("event_type") != "view")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )


TAG_FILTER_SQL = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS value_sum
FROM events
WHERE json_extract_string(props, '$.k') LIKE '%1%'
  AND json_extract_string(props, '$.k') NOT LIKE '7%'
  AND json_extract_string(props, '$.k') <> '13'
  AND event_type <> 'view'
GROUP BY event_type
"""


# --------------------------------------------------------------------
# F7: catalog string-match filters — smart-case Contains (case
# sensitive iff the pattern has a capital), StartsWith, Equals,
# ContainsAny (getAllStreamsRequest.ts:20-69). The part table stands
# in for the stream/parameter catalog.
# --------------------------------------------------------------------

def smartcase_contains(col: F.Column, pattern: str) -> F.Column:
    """Smart-case Contains: case-sensitive iff pattern has a capital."""
    if pattern != pattern.lower():
        return F.instr(col, pattern) > 0
    return F.instr(F.lower(col), pattern) > 0


def catalog_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = io.load(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        "p_name",
        "p_type",
        smartcase_contains(F.col("p_name"), "red").alias("m_contains"),
        smartcase_contains(F.col("p_type"), "ECON").alias("m_contains_cs"),
        F.col("p_type").startswith("STAND").alias("m_startswith"),
        (F.col("p_brand") == "Brand#1").alias("m_equals"),
        F.arrays_overlap(words, F.array(F.lit("red"), F.lit("blue"))).alias("m_contains_any"),
    ).filter(
        F.col("m_contains") | F.col("m_startswith") | F.col("m_contains_any")
    )


CATALOG_FILTERS_SQL = """
SELECT * FROM (
  SELECT
    p_partkey, p_name, p_type,
    position('red' IN lower(p_name)) > 0 AS m_contains,
    position('ECON' IN p_type) > 0 AS m_contains_cs,
    p_type LIKE 'STAND%' AS m_startswith,
    p_brand = 'Brand#1' AS m_equals,
    (position(' red ' IN ' ' || p_name || ' ') > 0
     OR position(' blue ' IN ' ' || p_name || ' ') > 0) AS m_contains_any
  FROM part
)
WHERE m_contains OR m_startswith OR m_contains_any
"""


# --------------------------------------------------------------------
# F8: level include/exclude lists (getAllEventsRequest.ts:44-51) —
# event_type stands in for EventLevel.
# --------------------------------------------------------------------

def level_include_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = io.load(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("event_type").isin("error", "purchase", "signup")
            & ~F.col("event_type").isin("signup")
        )
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


LEVEL_INCLUDE_EXCLUDE_SQL = """
SELECT user_id, event_type, COUNT(*) AS n
FROM events
WHERE event_type IN ('error', 'purchase', 'signup')
  AND event_type NOT IN ('signup')
GROUP BY user_id, event_type
"""


# --------------------------------------------------------------------
# O1 + O2: multi-key ordering + fixed-size paging (ordering.ts:17-23,
# paging.ts:13-22) — page index 3, length 20, unique tiebreak key so
# the page content is deterministic. Spark >=3.4 offset/limit keeps
# this fully declarative (no global row_number window).
# --------------------------------------------------------------------

def ordering_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = io.load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .offset(60)
        .limit(20)
    )


ORDERING_PAGING_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20 OFFSET 60
"""

# F1/F4/F6/F7/F8 + O1/O2 are verified together as ``filters_suite``
# (queries/suites.py).
