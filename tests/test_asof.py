"""As-of join equivalence: the expression composition (union + LOCF)
and the grouped-map pandas form must agree row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import asof


def test_asof_expression_and_pandas_forms_agree(spark):
    e = io.load(spark, SF_DIR, "events")
    trades = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("sym"), "ts",
        F.col("value").alias("trade_px"), F.col("event_id").alias("trade_id"),
    )
    quotes = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("sym"), "ts", F.col("value").alias("quote_px")
    )
    expr_form = {
        (r.sym, r.trade_id): r.quote_px
        for r in asof.asof_join(
            trades, quotes, key="sym", ts="ts", right_value_cols=["quote_px"]
        ).collect()
    }
    pandas_form = {
        (r.sym, r.trade_id): r.quote_px
        for r in asof.asof_join_pandas(
            trades, quotes, key="sym", ts="ts", right_value_cols=["quote_px"]
        ).collect()
    }
    assert len(expr_form) == trades.count()
    assert expr_form == pandas_form


def test_temporal_dimension_join_routes_events_to_valid_version(spark):
    """Facts split exactly at the SCD2 boundary: events before the
    version flip join the old name, at/after it the new one; keys
    with one open version take everything."""
    import datetime as dt

    from ts_data_pipeline_spark.operators import asof

    t = lambda s: dt.datetime.fromisoformat(s)
    facts = spark.createDataFrame(
        [("a", t("2024-01-15 00:00:00")), ("a", t("2024-02-10 00:00:00")),
         ("b", t("2024-03-01 00:00:00"))],
        "stream_id string, ts timestamp",
    )
    dim = spark.createDataFrame(
        [("a", "old-a", t("2024-01-01 00:00:00"), t("2024-02-01 00:00:00")),
         ("a", "new-a", t("2024-02-01 00:00:00"), None),
         ("b", "b0", t("2024-01-01 00:00:00"), None)],
        "stream_id string, name string, valid_from timestamp, valid_to timestamp",
    )
    got = {
        (r.stream_id, r.ts.isoformat(), r.name)
        for r in asof.temporal_dimension_join(
            facts, dim, key="stream_id"
        ).collect()
    }
    assert got == {
        ("a", "2024-01-15T00:00:00", "old-a"),
        ("a", "2024-02-10T00:00:00", "new-a"),
        ("b", "2024-03-01T00:00:00", "b0"),
    }


def test_asof_forward_and_tolerance(spark):
    """Forward direction matches the NEXT quote (>= ts, equal-ts
    visible); tolerance nulls matches farther than the bound in both
    directions."""
    import datetime as dt

    from ts_data_pipeline_spark.operators import asof

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)
    trades = spark.createDataFrame(
        [("a", t(10), 1), ("a", t(30), 2)], "sym string, ts timestamp, tid long"
    )
    quotes = spark.createDataFrame(
        [("a", t(5), 100.0), ("a", t(10), 110.0), ("a", t(50), 120.0)],
        "sym string, ts timestamp, px double",
    )
    back = {
        r.tid: r.px
        for r in asof.asof_join(
            trades, quotes, key="sym", ts="ts", right_value_cols=["px"]
        ).collect()
    }
    assert back == {1: 110.0, 2: 110.0}  # equal-ts visible backward
    fwd = {
        r.tid: r.px
        for r in asof.asof_join(
            trades, quotes, key="sym", ts="ts", right_value_cols=["px"],
            direction="forward",
        ).collect()
    }
    assert fwd == {1: 110.0, 2: 120.0}  # equal-ts visible forward
    back_tol = {
        r.tid: r.px
        for r in asof.asof_join(
            trades, quotes, key="sym", ts="ts", right_value_cols=["px"],
            tolerance="5 minutes",
        ).collect()
    }
    assert back_tol == {1: 110.0, 2: None}  # 20-min-old quote nulled
    fwd_tol = {
        r.tid: r.px
        for r in asof.asof_join(
            trades, quotes, key="sym", ts="ts", right_value_cols=["px"],
            direction="forward", tolerance="10 minutes",
        ).collect()
    }
    assert fwd_tol == {1: 110.0, 2: None}  # next quote 20 min ahead


def test_asof_matches_nearest_row_not_nearest_nonnull_value(spark):
    """merge_asof matches a ROW: when the nearest right row has a
    NULL value, the result is NULL — an older non-null value must not
    leak through the fill."""
    import datetime as dt

    from ts_data_pipeline_spark.operators import asof

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)
    trades = spark.createDataFrame(
        [("a", t(30), 1)], "sym string, ts timestamp, tid long"
    )
    quotes = spark.createDataFrame(
        [("a", t(0), 100.0), ("a", t(29), None)],
        "sym string, ts timestamp, px double",
    )
    got = asof.asof_join(
        trades, quotes, key="sym", ts="ts", right_value_cols=["px"]
    ).collect()
    assert got[0].px is None  # nearest row's value, even though NULL
