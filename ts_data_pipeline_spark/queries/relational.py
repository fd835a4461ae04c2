"""Relational join queries (engine extension — the reference has no
joins, SURVEY §2.9; these power dimension enrichment and the
north-star rollups and pin the physical join strategies)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def bloom_semi_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders of BUILDING-segment customers via an explicit bloom
    runtime filter on the fact scan (operators/bloom.py): sketch the
    filtered customer keys, prune orders scan-side, exact semi join
    the survivors. Identical to the plain semi join (the oracle);
    only the fact-side shuffle volume differs."""
    from ts_data_pipeline_spark.operators import bloom

    building = io.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return bloom.bloom_semi_join(
        io.load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        building,
        "o_custkey",
        "c_custkey",
    ).select("o_orderkey", "o_custkey", "o_totalprice")


BLOOM_SEMI_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
"""


def salted_fact_dim_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large lineitem x orders join under explicit fact-side
    salting (operators/skew.py::salted_join) — value-identical to the
    plain join by construction, proven by the plain-join oracle."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.operators import skew

    li = io.load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    orders = io.load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = skew.salted_join(li, orders, ["okey"], salt_buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("rev"), 4).alias("revenue"),
    )


SALTED_FACT_DIM_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


register("join_dim_revenue", join_dim_revenue, joins.dim_enrich_revenue_sql())
register("join_segment_top_orders", join_segment_top_orders, joins.segment_order_revenue_sql())
# Semi + anti joins are verified together as ``join_semi_anti``
# (queries/suites.py).
