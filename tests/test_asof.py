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
