"""Data-quality operator queries (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import quality
from ts_data_pipeline_spark.registry import register


def data_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-Q4 — null/zero/gap/staleness counters per event_type."""
    return quality.data_quality_summary(io.load(spark, sf_dir, "events"))


def required_field_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — required-field null counts over the order feed."""
    return quality.required_field_nulls(
        io.load(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    )


REQUIRED_FIELD_SQL = """
SELECT
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_custkey,
  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_orderstatus,
  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_totalprice,
  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_orderdate
FROM orders
"""

def consecutive_alert_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 — >=3 consecutive high-value records per key -> alert run."""
    return quality.consecutive_alert_runs(io.load(spark, sf_dir, "events"))


def metrics_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — describe-style per-group metrics summary."""
    return quality.metrics_summary(io.load(spark, sf_dir, "events"))


# Q1-Q6 are verified together as ``quality_suite`` (queries/suites.py).


def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling per-stream z-score outliers (Q3/Q5 alerting scan)."""
    return quality.rolling_zscore_anomalies(io.load(spark, sf_dir, "events"))
