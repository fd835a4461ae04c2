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


def test_salted_join_value_identical_and_guarded(spark):
    """salted_join must be row-identical to the plain join for inner
    and left; the join keys must carry the salt (both exchanges
    partition on (key, _salt)); right/full are rejected."""
    import pytest

    from ts_data_pipeline_spark.operators import skew

    facts = spark.createDataFrame(
        [(k, v) for k in (1, 1, 1, 1, 2, 3, 7) for v in (10, 20)],
        "k long, v long",
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (9, "z")], "k long, name string"
    )
    plain = facts.join(dim, ["k"]).groupBy("k", "name").count()
    salted = (
        skew.salted_join(facts, dim, ["k"], salt_buckets=4)
        .groupBy("k", "name")
        .count()
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # left join: unmatched fact keys survive exactly once per row
    left = skew.salted_join(facts, dim, ["k"], salt_buckets=4, how="left")
    assert left.filter("k = 7").count() == 2
    assert left.filter("k = 7 and name is null").count() == 2
    # the physical join keys include the salt
    plan = (
        skew.salted_join(facts, dim, ["k"], salt_buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .lower()
    )
    assert "_salt" in plan
    with pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(facts, dim, ["k"], how="right")
    with pytest.raises(ValueError, match="reserved"):
        skew.salted_join(facts.withColumn("_salt", facts.k), dim, ["k"])
