"""Relational join queries (engine extension — the reference has no
joins, SURVEY §2.9; these power dimension enrichment and the
north-star rollups and pin the physical join strategies)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import joins
from ts_data_pipeline_spark.registry import register


def join_dim_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.dim_enrich_revenue(
        io.load(spark, sf_dir, "lineitem"), io.load(spark, sf_dir, "part")
    )


def join_segment_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.segment_order_revenue(
        io.load(spark, sf_dir, "customer"),
        io.load(spark, sf_dir, "orders"),
        io.load(spark, sf_dir, "lineitem"),
    )


def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.customers_without_orders(
        io.load(spark, sf_dir, "customer"), io.load(spark, sf_dir, "orders")
    )


def join_semi_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.customers_with_high_value_orders(
        io.load(spark, sf_dir, "customer"), io.load(spark, sf_dir, "orders")
    )


register("join_dim_revenue", join_dim_revenue, joins.dim_enrich_revenue_sql())
register("join_segment_top_orders", join_segment_top_orders, joins.segment_order_revenue_sql())
# Semi + anti joins are verified together as ``join_semi_anti``
# (queries/suites.py).
