"""Physical join-strategy pins: a silent strategy flip fails here."""

from __future__ import annotations

import contextlib
import io as pyio

from tests.conftest import SF_DIR
from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import joins


def _plan(df) -> str:
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dim_join_broadcasts_and_prunes(spark):
    df = joins.dim_enrich_revenue(
        io.load(spark, SF_DIR, "lineitem"), io.load(spark, SF_DIR, "part")
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # Date-range predicate must reach the parquet scan.
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    # Column pruning: only the 4 lineitem columns used are read.
    assert "l_extendedprice" in plan and "l_tax" not in plan


def test_large_join_shuffles_on_key(spark):
    df = joins.segment_order_revenue(
        io.load(spark, SF_DIR, "customer"),
        io.load(spark, SF_DIR, "orders"),
        io.load(spark, SF_DIR, "lineitem"),
    )
    plan = _plan(df)
    # orders x lineitem resolves to a shuffle join (either merge or
    # hash variant depending on stats) — never a broadcast of the
    # unbounded fact table, never a nested loop.
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan  # AQE may legitimately broadcast at tiny SF
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_semi_anti_use_existence_joins(spark):
    cust = io.load(spark, SF_DIR, "customer")
    orders = io.load(spark, SF_DIR, "orders")
    anti = _plan(joins.customers_without_orders(cust, orders))
    semi = _plan(joins.customers_with_high_value_orders(cust, orders))
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi
