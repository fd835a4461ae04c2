"""Telemetry Query API evaluator queries (SURVEY §2.4, §3.3).

Each case drives plans/queryspec.evaluate over the events table
adapted to the long parameter_values layout (FIXTURES.md §6), with a
hand-written DuckDB oracle. Together they cover A4 aggregation types,
A7 group-by-time, A8 interpolation (Null/Previous/Linear), A9
group-by-tags, F4-F6 filters, and O1/O2 ordering+paging — the full
getDataRequest.ts surface for numeric parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.plans.queryspec import (
    EventQuerySpec,
    GroupByTime,
    NumericAggregation,
    Ordering,
    Paging,
    QuerySpec,
    StringAggregation,
    TagFilter,
    evaluate,
    evaluate_events,
)
from ts_data_pipeline_spark.registry import register


def events_as_parameter_values(events: DataFrame) -> DataFrame:
    """Adapt driver events to the parameter_values storage model.

    stream_id <- user_id, parameter_id <- event_type,
    num_value <- value, tags <- {'k': props.k}
    (FIXTURES.md mapping; storage contract parameterData.ts:16-38).
    """
    # One selectExpr (r16): the Column spelling cost ~12 py4j round
    # trips per build; the SQL strings resolve to the identical
    # expression tree (same get_json_object twins, same map literal).
    return events.selectExpr(
        "CAST(user_id AS STRING) AS stream_id",
        "ts",
        "event_type AS parameter_id",
        "value AS num_value",
        "get_json_object(props, '$.k') AS str_value",
        "map('k', get_json_object(props, '$.k')) AS tags",
    )


PV_SQL = """
SELECT CAST(user_id AS VARCHAR) AS stream_id, ts,
       event_type AS parameter_id, value AS num_value,
       json_extract_string(props, '$.k') AS str_value,
       json_extract_string(props, '$.k') AS tag_k
FROM events
"""


def events_as_event_model(events: DataFrame) -> DataFrame:
    """Adapt driver events to the telemetry events model (FIXTURES.md:
    event_id <- event_type, level derived from event_type, string
    value <- formatted amount; contract eventValue.ts:16-29).
    """
    return events.select(
        F.col("user_id").cast("string").alias("stream_id"),
        F.col("ts"),
        F.col("event_type").alias("event_id"),
        F.when(F.col("event_type") == "error", "Error")
        .when(F.col("event_type") == "signup", "Information")
        .otherwise("Debug")
        .alias("level"),
        F.format_string("%.2f", F.col("value")).alias("value"),
        F.create_map(
            F.lit("k"), F.get_json_object(F.col("props"), "$.k")
        ).alias("tags"),
    )


EV_SQL = """
SELECT CAST(user_id AS VARCHAR) AS stream_id, ts,
       event_type AS event_id,
       CASE WHEN event_type = 'error' THEN 'Error'
            WHEN event_type = 'signup' THEN 'Information'
            ELSE 'Debug' END AS level,
       printf('%.2f', value) AS value,
       json_extract_string(props, '$.k') AS tag_k
FROM events
"""


def _pv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_parameter_values(io.load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------
# Case 1 — bucketed multi-aggregate with stream + tag filters
# (A4 Mean/Sum/Count/Max/Min, A7, F4-F6).
# ---------------------------------------------------------------------

def telemetry_bucket_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(
        numeric_aggregations=[
            NumericAggregation("purchase", "Mean"),
            NumericAggregation("purchase", "Sum"),
            NumericAggregation("purchase", "Count"),
            NumericAggregation("error", "Max"),
            NumericAggregation("view", "Min"),
        ],
        from_ts="2024-01-05 00:00:00",
        to_ts="2024-01-20 00:00:00",
        stream_ids=["1", "3", "5", "7"],
        tag_filters=[TagFilter("k", "NotLike", "9%")],
        group_by_time=GroupByTime("15 minutes"),
    )
    return evaluate(_pv(spark, sf_dir), spec)


TELEMETRY_BUCKET_MULTI_AGG_SQL = f"""
WITH pv AS ({PV_SQL})
SELECT
  time_bucket(INTERVAL '15 minutes', ts) AS bucket,
  ROUND(AVG(CASE WHEN parameter_id = 'purchase' THEN num_value END), 4) AS purchase_mean,
  ROUND(SUM(CASE WHEN parameter_id = 'purchase' THEN num_value END), 4) AS purchase_sum,
  COUNT(CASE WHEN parameter_id = 'purchase' THEN num_value END) AS purchase_count,
  MAX(CASE WHEN parameter_id = 'error' THEN num_value END) AS error_max,
  MIN(CASE WHEN parameter_id = 'view' THEN num_value END) AS view_min
FROM pv
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
  AND stream_id IN ('1', '3', '5', '7')
  AND tag_k NOT LIKE '9%'
GROUP BY 1
"""


# ---------------------------------------------------------------------
# Case 2 — First/Last/Median/Spread (A4's order-sensitive and
# distribution aggregates) per 1-hour bucket.
# ---------------------------------------------------------------------

def telemetry_first_last_median_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(
        numeric_aggregations=[
            NumericAggregation("click", "First"),
            NumericAggregation("click", "Last"),
            NumericAggregation("click", "Median"),
            NumericAggregation("click", "Spread"),
            NumericAggregation("click", "CountDistinct"),
            NumericAggregation("click", "P90"),
            NumericAggregation("click", "P99"),
        ],
        from_ts="2024-01-01 00:00:00",
        to_ts="2024-01-31 00:00:00",
        group_by_time=GroupByTime("1 hour"),
    )
    return evaluate(_pv(spark, sf_dir), spec)


TELEMETRY_FIRST_LAST_SQL = f"""
WITH pv AS ({PV_SQL})
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS bucket,
  arg_min(CASE WHEN parameter_id = 'click' THEN num_value END,
          CASE WHEN parameter_id = 'click' THEN ts END) AS click_first,
  arg_max(CASE WHEN parameter_id = 'click' THEN num_value END,
          CASE WHEN parameter_id = 'click' THEN ts END) AS click_last,
  ROUND(median(CASE WHEN parameter_id = 'click' THEN num_value END), 4) AS click_median,
  ROUND(MAX(CASE WHEN parameter_id = 'click' THEN num_value END)
        - MIN(CASE WHEN parameter_id = 'click' THEN num_value END), 4) AS click_spread,
  COUNT(DISTINCT CASE WHEN parameter_id = 'click' THEN num_value END) AS click_countdistinct,
  ROUND(quantile_cont(CASE WHEN parameter_id = 'click' THEN num_value END, 0.90), 4) AS click_p90,
  ROUND(quantile_cont(CASE WHEN parameter_id = 'click' THEN num_value END, 0.99), 4) AS click_p99
FROM pv
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
GROUP BY 1
"""


# ---------------------------------------------------------------------
# Case 3 — group-by tags x daily buckets (A9 + A7).
# ---------------------------------------------------------------------

def telemetry_group_by_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(
        numeric_aggregations=[
            NumericAggregation("purchase", "Count"),
            NumericAggregation("purchase", "Mean"),
        ],
        from_ts="2024-01-01 00:00:00",
        to_ts="2024-01-31 00:00:00",
        group_by_time=GroupByTime("1 day"),
        group_by_tags=["k"],
    )
    return evaluate(_pv(spark, sf_dir), spec)


TELEMETRY_GROUP_BY_TAGS_SQL = f"""
WITH pv AS ({PV_SQL})
SELECT
  time_bucket(INTERVAL '1 day', ts) AS bucket,
  tag_k,
  COUNT(CASE WHEN parameter_id = 'purchase' THEN num_value END) AS purchase_count,
  ROUND(AVG(CASE WHEN parameter_id = 'purchase' THEN num_value END), 4) AS purchase_mean
FROM pv
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------
# Cases 4-6 — interpolation over the bucket spine (A8): Null fill,
# Previous fill, Linear. Restricted to one stream so gaps exist.
# ---------------------------------------------------------------------

_INTERP_KW = dict(
    numeric_aggregations=[NumericAggregation("purchase", "Mean")],
    from_ts="2024-01-02 00:00:00",
    to_ts="2024-01-12 00:00:00",
    stream_ids=["2"],
)


def telemetry_interp_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(group_by_time=GroupByTime("6 hours", "Null"), **_INTERP_KW)
    return evaluate(_pv(spark, sf_dir), spec)


def telemetry_interp_previous(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(group_by_time=GroupByTime("6 hours", "Previous"), **_INTERP_KW)
    return evaluate(_pv(spark, sf_dir), spec)


def telemetry_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(group_by_time=GroupByTime("6 hours", "Linear"), **_INTERP_KW)
    return evaluate(_pv(spark, sf_dir), spec)


def telemetry_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three interpolation modes (A8) over the same spec, labeled
    by mode — one registry entry, three verified fill behaviors."""
    parts = []
    for mode, fn in (
        ("Null", telemetry_interp_null),
        ("Previous", telemetry_interp_previous),
        ("Linear", telemetry_interp_linear),
    ):
        parts.append(fn(spark, sf_dir).select(F.lit(mode).alias("mode"), "*"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_INTERP_BASE_SQL = f"""
WITH pv AS ({PV_SQL}),
agg AS (
  SELECT time_bucket(INTERVAL '6 hours', ts) AS bucket,
         ROUND(AVG(CASE WHEN parameter_id = 'purchase' THEN num_value END), 4) AS v
  FROM pv
  WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
    AND stream_id IN ('2')
  GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-02 00:00:00',
                                TIMESTAMP '2024-01-12 00:00:00' - INTERVAL '6 hours',
                                INTERVAL '6 hours')) AS bucket
),
j AS (SELECT s.bucket, a.v FROM spine s LEFT JOIN agg a USING (bucket))
"""

TELEMETRY_INTERP_NULL_SQL = (
    _INTERP_BASE_SQL + "SELECT bucket, v AS purchase_mean FROM j"
)

TELEMETRY_INTERP_PREVIOUS_SQL = _INTERP_BASE_SQL + """
SELECT bucket,
       last_value(v IGNORE NULLS) OVER (
         ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS purchase_mean
FROM j
"""

TELEMETRY_INTERP_LINEAR_SQL = _INTERP_BASE_SQL + """,
w AS (
  SELECT bucket, v,
    last_value(v IGNORE NULLS) OVER (
      ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv_,
    first_value(v IGNORE NULLS) OVER (
      ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv_,
    last_value(CASE WHEN v IS NOT NULL THEN epoch_us(bucket) END IGNORE NULLS) OVER (
      ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb_,
    first_value(CASE WHEN v IS NOT NULL THEN epoch_us(bucket) END IGNORE NULLS) OVER (
      ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb_
  FROM j
)
SELECT bucket,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv_ IS NULL OR nv_ IS NULL THEN NULL
            ELSE ROUND(pv_ + (nv_ - pv_) *
                       CAST(epoch_us(bucket) - pb_ AS DOUBLE) /
                       CAST(nb_ - pb_ AS DOUBLE), 4)
       END AS purchase_mean
FROM w
"""


TELEMETRY_INTERP_SQL = f"""
SELECT 'Null' AS mode, * FROM ({TELEMETRY_INTERP_NULL_SQL})
UNION ALL
SELECT 'Previous' AS mode, * FROM ({TELEMETRY_INTERP_PREVIOUS_SQL})
UNION ALL
SELECT 'Linear' AS mode, * FROM ({TELEMETRY_INTERP_LINEAR_SQL})
"""


# ---------------------------------------------------------------------
# Case 7 — ordering + paging on the aggregated series (O1 + O2).
# ---------------------------------------------------------------------

def telemetry_order_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(
        numeric_aggregations=[
            NumericAggregation("purchase", "Count"),
            NumericAggregation("purchase", "Mean"),
        ],
        from_ts="2024-01-01 00:00:00",
        to_ts="2024-01-31 00:00:00",
        group_by_time=GroupByTime("1 day"),
        group_by_tags=["k"],
        orderings=[
            Ordering("purchase_count", "Desc"),
            Ordering("bucket", "Asc"),
            Ordering("tag_k", "Asc"),
        ],
        paging=Paging(index=2, length=25),
    )
    return evaluate(_pv(spark, sf_dir), spec)


TELEMETRY_ORDER_PAGE_SQL = (
    TELEMETRY_GROUP_BY_TAGS_SQL
    + "ORDER BY purchase_count DESC, bucket ASC, tag_k ASC LIMIT 25 OFFSET 50"
)

# ---------------------------------------------------------------------
# Case 8 — string-channel aggregations (A5: First/Last/Count over a
# string parameter) alongside a numeric aggregate, daily buckets.
# ---------------------------------------------------------------------

def telemetry_string_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(
        numeric_aggregations=[NumericAggregation("signup", "Count")],
        string_aggregations=[
            StringAggregation("signup", "First"),
            StringAggregation("signup", "Last"),
            StringAggregation("signup", "Count"),
        ],
        from_ts="2024-01-01 00:00:00",
        to_ts="2024-01-31 00:00:00",
        group_by_time=GroupByTime("1 day"),
    )
    return evaluate(_pv(spark, sf_dir), spec)


TELEMETRY_STRING_AGGS_SQL = f"""
WITH pv AS ({PV_SQL})
SELECT
  time_bucket(INTERVAL '1 day', ts) AS bucket,
  COUNT(CASE WHEN parameter_id = 'signup' THEN num_value END) AS signup_count,
  arg_min(CASE WHEN parameter_id = 'signup' THEN str_value END,
          CASE WHEN parameter_id = 'signup' THEN ts END) AS signup_str_first,
  arg_max(CASE WHEN parameter_id = 'signup' THEN str_value END,
          CASE WHEN parameter_id = 'signup' THEN ts END) AS signup_str_last,
  COUNT(CASE WHEN parameter_id = 'signup' THEN str_value END) AS signup_str_count
FROM pv
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
GROUP BY 1
"""


# ---------------------------------------------------------------------
# Case 9 — event aggregation (A6): Last value + count per event
# channel per 12h bucket, with level include/exclude (F8) and a tag
# filter (F6).
# ---------------------------------------------------------------------

def telemetry_event_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = EventQuerySpec(
        aggregation="Last",
        interval="12 hours",
        from_ts="2024-01-01 00:00:00",
        to_ts="2024-01-31 00:00:00",
        include_levels=["Error", "Debug"],
        exclude_levels=["Trace"],
        tag_filters=[TagFilter("k", "NotEqual", "13")],
    )
    return evaluate_events(
        events_as_event_model(io.load(spark, sf_dir, "events")), spec
    )


TELEMETRY_EVENT_AGGS_SQL = f"""
WITH ev AS ({EV_SQL})
SELECT
  time_bucket(INTERVAL '12 hours', ts) AS bucket,
  event_id,
  arg_max(value, CASE WHEN value IS NOT NULL THEN ts END) AS event_value,
  CAST(COUNT(*) AS BIGINT) AS event_count
FROM ev
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
  AND level IN ('Error', 'Debug') AND level NOT IN ('Trace')
  AND tag_k != '13'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------
# Case 10 — binary-channel aggregation (A5 binary: the bin_value
# parameter channel, parameterType.ts:16 / getParameterDataRequest.ts:
# 26-29). Same First/Last/Count path as strings over BinaryType.
# ---------------------------------------------------------------------

def telemetry_binary_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pv = _pv(spark, sf_dir).withColumn("bin_value", F.encode(F.col("str_value"), "UTF-8"))
    spec = QuerySpec(
        numeric_aggregations=[NumericAggregation("error", "Count")],
        string_aggregations=[
            StringAggregation("error", "First"),
            StringAggregation("error", "Last"),
            StringAggregation("error", "Count"),
        ],
        from_ts="2024-01-01 00:00:00",
        to_ts="2024-01-15 00:00:00",
        group_by_time=GroupByTime("1 day"),
    )
    out = evaluate(pv, spec, str_value_col="bin_value")
    # Hex at the wire edge so the oracle compare is engine-neutral.
    return out.select(
        "bucket",
        "error_count",
        F.lower(F.hex(F.col("error_str_first"))).alias("bin_first_hex"),
        F.lower(F.hex(F.col("error_str_last"))).alias("bin_last_hex"),
        F.col("error_str_count").alias("bin_count"),
    )


TELEMETRY_BINARY_AGGS_SQL = f"""
WITH pv AS ({PV_SQL})
SELECT
  time_bucket(INTERVAL '1 day', ts) AS bucket,
  COUNT(CASE WHEN parameter_id = 'error' THEN num_value END) AS error_count,
  lower(hex(encode(arg_min(CASE WHEN parameter_id = 'error' THEN str_value END,
          CASE WHEN parameter_id = 'error' AND str_value IS NOT NULL THEN ts END))))
    AS bin_first_hex,
  lower(hex(encode(arg_max(CASE WHEN parameter_id = 'error' THEN str_value END,
          CASE WHEN parameter_id = 'error' AND str_value IS NOT NULL THEN ts END))))
    AS bin_last_hex,
  COUNT(CASE WHEN parameter_id = 'error' THEN str_value END) AS bin_count
FROM pv
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
GROUP BY 1
"""


# ---------------------------------------------------------------------
# Case 11 — data snippet: saved selection replayed through the same
# evaluator (dataSnippet.ts:13-50; getDataSnippetParameterDataRequest).
# ---------------------------------------------------------------------

def telemetry_snippet_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ts_data_pipeline_spark.plans.snippets import DataSnippet, materialize

    snippet = DataSnippet(
        name="whale_watch",
        stream_ids=["2", "4", "6", "8"],
        parameter_ids=["purchase", "click"],
        from_ts="2024-01-03 00:00:00",
        to_ts="2024-01-21 00:00:00",
    )
    saved = materialize(_pv(spark, sf_dir), snippet)
    spec = QuerySpec(
        numeric_aggregations=[
            NumericAggregation("purchase", "Sum"),
            NumericAggregation("click", "Mean"),
        ],
        group_by_time=GroupByTime("1 day"),
    )
    return evaluate(saved, spec)


TELEMETRY_SNIPPET_SQL = f"""
WITH pv AS ({PV_SQL})
SELECT time_bucket(INTERVAL '1 day', ts) AS bucket,
       ROUND(SUM(CASE WHEN parameter_id = 'purchase' THEN num_value END), 4)
         AS purchase_sum,
       ROUND(AVG(CASE WHEN parameter_id = 'click' THEN num_value END), 4)
         AS click_mean
FROM pv
WHERE stream_id IN ('2', '4', '6', '8')
  AND parameter_id IN ('purchase', 'click')
  AND ts >= TIMESTAMP '2024-01-03 00:00:00'
  AND ts < TIMESTAMP '2024-01-21 00:00:00'
GROUP BY 1
"""


# ---------------------------------------------------------------------
# Case 12 — event aggregation + interpolation over the bucket spine
# (A6 x A8, eventDataAggregation.ts:19-21 + interpolationType.ts:16).
# One rare channel ('error' for one stream) so gaps exist. TWO modes
# from the same filtered channel, union'd under a mode column (the
# telemetry_interp pattern): Previous over Last-aggregated string
# values (counts 0-fill), and Linear over the Count series — the one
# event aggregation that is numeric by construction, so the r10
# documented deviation (Linear rejected on events outright) is closed.
# ---------------------------------------------------------------------

def telemetry_event_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_as_event_model(io.load(spark, sf_dir, "events"))
    common = dict(
        event_ids=["error"],
        interval="1 day",
        from_ts="2024-01-01 00:00:00",
        to_ts="2024-01-31 00:00:00",
        stream_ids=["5"],
    )
    prev = evaluate_events(
        ev,
        EventQuerySpec(aggregation="Last", interpolation="Previous", **common),
    ).select(
        F.lit("Previous").alias("mode"),
        "bucket",
        "event_id",
        "event_value",
        F.col("event_count").cast("double").alias("event_count"),
    )
    lin = evaluate_events(
        ev,
        EventQuerySpec(aggregation="Count", interpolation="Linear", **common),
    ).select(
        F.lit("Linear").alias("mode"),
        "bucket",
        "event_id",
        F.lit(None).cast("string").alias("event_value"),
        "event_count",
    )
    return prev.unionByName(lin)


_EVENT_INTERP_BASE_SQL = f"""
WITH ev AS ({EV_SQL}),
agg AS (
  SELECT time_bucket(INTERVAL '1 day', ts) AS bucket,
         event_id,
         arg_max(value, CASE WHEN value IS NOT NULL THEN ts END) AS event_value,
         CAST(COUNT(*) AS BIGINT) AS event_count
  FROM ev
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
    AND stream_id IN ('5') AND event_id IN ('error')
  GROUP BY 1, 2
),
spine AS (
  SELECT s.bucket, g.event_id
  FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                      TIMESTAMP '2024-01-31 00:00:00' - INTERVAL '1 day',
                                      INTERVAL '1 day')) AS bucket) s
  CROSS JOIN (SELECT DISTINCT event_id FROM agg) g
),
j AS (
  SELECT s.bucket, s.event_id, a.event_value, a.event_count
  FROM spine s LEFT JOIN agg a USING (bucket, event_id)
)"""

TELEMETRY_EVENT_INTERP_PREV_SQL = (
    _EVENT_INTERP_BASE_SQL
    + """
SELECT bucket, event_id,
       last_value(event_value IGNORE NULLS) OVER (
         PARTITION BY event_id ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS event_value,
       CAST(COALESCE(event_count, 0) AS DOUBLE) AS event_count
FROM j
"""
)

TELEMETRY_EVENT_INTERP_LINEAR_SQL = (
    _EVENT_INTERP_BASE_SQL
    + """,
w AS (
  SELECT bucket, event_id, CAST(event_count AS DOUBLE) AS v,
    last_value(CAST(event_count AS DOUBLE) IGNORE NULLS) OVER (
      PARTITION BY event_id ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv_,
    first_value(CAST(event_count AS DOUBLE) IGNORE NULLS) OVER (
      PARTITION BY event_id ORDER BY bucket
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv_,
    last_value(CASE WHEN event_count IS NOT NULL THEN epoch_us(bucket) END
               IGNORE NULLS) OVER (
      PARTITION BY event_id ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb_,
    first_value(CASE WHEN event_count IS NOT NULL THEN epoch_us(bucket) END
                IGNORE NULLS) OVER (
      PARTITION BY event_id ORDER BY bucket
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb_
  FROM j
)
SELECT bucket, event_id,
       CAST(NULL AS VARCHAR) AS event_value,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv_ IS NULL OR nv_ IS NULL THEN NULL
            ELSE ROUND(pv_ + (nv_ - pv_) *
                       CAST(epoch_us(bucket) - pb_ AS DOUBLE) /
                       CAST(nb_ - pb_ AS DOUBLE), 4)
       END AS event_count
FROM w
"""
)

TELEMETRY_EVENT_INTERP_SQL = f"""
SELECT 'Previous' AS mode, * FROM ({TELEMETRY_EVENT_INTERP_PREV_SQL})
UNION ALL
SELECT 'Linear' AS mode, * FROM ({TELEMETRY_EVENT_INTERP_LINEAR_SQL})
"""


# ---------------------------------------------------------------------
# Case 13 — 'None' aggregation = raw passthrough (numericAggregation
# Type.ts:17 / aggregationType.ts:17): the response carries the
# samples themselves, parameters pivoted to columns, tags projected.
# ---------------------------------------------------------------------

def telemetry_raw_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(
        numeric_aggregations=[NumericAggregation("purchase", "None")],
        string_aggregations=[StringAggregation("signup", "None")],
        from_ts="2024-01-05 00:00:00",
        to_ts="2024-01-10 00:00:00",
        stream_ids=["1", "2", "3"],
        group_by_tags=["k"],
    )
    return evaluate(_pv(spark, sf_dir), spec)


TELEMETRY_RAW_PASSTHROUGH_SQL = f"""
WITH pv AS ({PV_SQL})
SELECT ts, tag_k,
       CASE WHEN parameter_id = 'purchase' THEN num_value END AS purchase_none,
       CASE WHEN parameter_id = 'signup' THEN str_value END AS signup_str_none
FROM pv
WHERE parameter_id IN ('purchase', 'signup')
  AND ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-10 00:00:00'
  AND stream_id IN ('1', '2', '3')
"""


# ---------------------------------------------------------------------
# Tag values listing (getTagValuesRequest.ts:14-30): the tag-picker
# dropdown feed — distinct values of one tag key under the same
# time/stream/tag predicates as a data query.
# ---------------------------------------------------------------------

def tag_values_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ts_data_pipeline_spark.plans.queryspec import tag_values

    return tag_values(
        _pv(spark, sf_dir),
        "k",
        from_ts="2024-01-05 00:00:00",
        to_ts="2024-01-20 00:00:00",
        stream_ids=[str(i) for i in range(30)],
        tag_filters=[TagFilter("k", "NotLike", "1%")],
    )


TAG_VALUES_LISTING_SQL = (
    """
SELECT tag_k AS tag_value,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       COUNT(DISTINCT stream_id) AS n_streams
FROM ("""
    + PV_SQL
    + """)
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts < TIMESTAMP '2024-01-20 00:00:00'
  AND stream_id IN ("""
    + ", ".join(f"'{i}'" for i in range(30))
    + """)
  AND tag_k NOT LIKE '1%'
  AND tag_k IS NOT NULL
GROUP BY tag_value
ORDER BY tag_value
"""
)


def telemetry_string_binary_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 string + binary channel aggregates in one labeled result
    (binary values hex-encoded at the wire edge, as the binary case
    already does)."""
    s = telemetry_string_aggs(spark, sf_dir).select(
        F.lit("string").alias("channel"),
        "bucket",
        F.col("signup_count").alias("n_value"),
        F.col("signup_str_first").alias("val_first"),
        F.col("signup_str_last").alias("val_last"),
        F.col("signup_str_count").alias("n_str"),
    )
    b = telemetry_binary_aggs(spark, sf_dir).select(
        F.lit("binary").alias("channel"),
        "bucket",
        F.col("error_count").alias("n_value"),
        F.col("bin_first_hex").alias("val_first"),
        F.col("bin_last_hex").alias("val_last"),
        F.col("bin_count").alias("n_str"),
    )
    return s.unionByName(b)


TELEMETRY_STRING_BINARY_SQL = f"""
SELECT 'string' AS channel, bucket,
       CAST(signup_count AS BIGINT) AS n_value,
       signup_str_first AS val_first, signup_str_last AS val_last,
       CAST(signup_str_count AS BIGINT) AS n_str
FROM ({TELEMETRY_STRING_AGGS_SQL})
UNION ALL
SELECT 'binary' AS channel, bucket,
       CAST(error_count AS BIGINT) AS n_value,
       bin_first_hex AS val_first, bin_last_hex AS val_last,
       CAST(bin_count AS BIGINT) AS n_str
FROM ({TELEMETRY_BINARY_AGGS_SQL})
"""


register("tag_values_listing", tag_values_listing, TAG_VALUES_LISTING_SQL)
register("telemetry_event_interp", telemetry_event_interp, TELEMETRY_EVENT_INTERP_SQL)
register("telemetry_raw_passthrough", telemetry_raw_passthrough, TELEMETRY_RAW_PASSTHROUGH_SQL)
register("telemetry_snippet_replay", telemetry_snippet_replay, TELEMETRY_SNIPPET_SQL)
# string + binary channels are verified together (A5):
register(
    "telemetry_string_binary_aggs",
    telemetry_string_binary_aggs,
    TELEMETRY_STRING_BINARY_SQL,
)
register("telemetry_event_aggs", telemetry_event_aggs, TELEMETRY_EVENT_AGGS_SQL)
register("telemetry_bucket_multi_agg", telemetry_bucket_multi_agg, TELEMETRY_BUCKET_MULTI_AGG_SQL)
register("telemetry_first_last_median_spread", telemetry_first_last_median_spread, TELEMETRY_FIRST_LAST_SQL)
register("telemetry_group_by_tags", telemetry_group_by_tags, TELEMETRY_GROUP_BY_TAGS_SQL)
# the three interpolation modes are verified together (A8):
register("telemetry_interp", telemetry_interp, TELEMETRY_INTERP_SQL)
register("telemetry_order_page", telemetry_order_page, TELEMETRY_ORDER_PAGE_SQL)
