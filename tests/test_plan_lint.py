"""Plan-linter pins: each anti-pattern rule detects its constructed
specimen, and — the standing architectural gate — EVERY registered
query plans clean, modulo an explicit per-query allowlist whose every
entry states the row bound that justifies it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ts_data_pipeline_spark.plans.lint import assert_scale_clean, plan_lint

from conftest import SF_DIR


def _df(spark):
    return spark.range(200).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("v")
    )


def test_detects_lookahead_frame(spark):
    bad = _df(spark).withColumn(
        "nxt",
        F.first("v").over(
            Window.partitionBy("k")
            .orderBy("id")
            .rowsBetween(1, Window.unboundedFollowing)
        ),
    )
    kinds = {f["kind"] for f in plan_lint(bad)}
    assert "lookahead_frame" in kinds
    with pytest.raises(AssertionError):
        assert_scale_clean(bad)


def test_running_and_whole_partition_frames_are_clean(spark):
    ok = (
        _df(spark)
        .withColumn(
            "run",
            F.sum("v").over(
                Window.partitionBy("k")
                .orderBy("id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("tot", F.sum("v").over(Window.partitionBy("k")))
    )
    assert plan_lint(ok) == []


def test_detects_global_ordered_window(spark):
    bad = _df(spark).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert {f["kind"] for f in plan_lint(bad)} == {"global_ordered_window"}
    ok = _df(spark).withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert plan_lint(ok) == []


def test_detects_row_udf_but_not_arrow_paths(spark):
    from pyspark.sql.types import LongType

    u = F.udf(lambda x: x + 1, LongType())
    assert {f["kind"] for f in plan_lint(_df(spark).select(u("id")))} == {
        "python_row_udf"
    }

    def addone(it):
        for pdf in it:
            pdf["id"] = pdf["id"] + 1
            yield pdf

    arrow = _df(spark).mapInPandas(addone, "id long, k long, v long")
    assert plan_lint(arrow) == []


def test_detects_cartesian_product(spark):
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    a = _df(spark).hint("shuffle_replicate_nl")
    bad = a.crossJoin(_df(spark).selectExpr("id as id2"))
    assert "cartesian_product" in {f["kind"] for f in plan_lint(bad)}
    # broadcast nested loop (1-row stats cross) is the sanctioned form
    ok = _df(spark).crossJoin(
        F.broadcast(_df(spark).agg(F.sum("v").alias("tot")))
    )
    assert plan_lint(ok) == []


# Per-query allowances for global_ordered_window, matched against the
# finding DETAIL (the ordering columns) so an unrelated future window
# in the same query still fails. EVERY pattern states the row bound
# that makes the global ordering harmless.
_ALLOWED_GLOBAL_WINDOWS = {
    # interpolation spine windows when the query has no group tags:
    # rows = time_range / interval buckets — bounded by the QUERY
    # parameters, not the data (grouped variants partition by tags;
    # queryspec uses partitionBy(lit(1)), which Catalyst folds away)
    "telemetry_interp": [r"\bbucket#"],
    "telemetry_event_interp": [r"\bbucket#"],
    "text_stats_suite": [
        # two-phase prefix-sum BASES relations: ≤ one row per range
        # partition (token_budget_pick, vocab_coverage_curve,
        # sequence packing / corpus shuffle buckets)
        r"\b_pid#", r"\bbucket#",
        # rank windows over relations already reduced by LIMIT k
        # (TakeOrderedAndProject): bm25/rrf/dsir/heavy-hitters top-k
        r"\bbm25#", r"\brrf#", r"\bperturbed#", r"\bfreq#",
    ],
    # skew_report's residual rank over the post-LIMIT top-N rows
    "quality_suite": [r"\bn#\d+L DESC"],
    # session-path leaderboard: rank over the post-LIMIT top-20
    "olap_pivot_suite": [r"\bn_sessions#"],
    # the composed recipe reuses the two-phase prefix-sum stages
    # (corpus_shuffle bucket bases + sequence_pack bucket bases):
    # both global windows run over the per-bucket relation — ≤
    # n/bucket_size rows by construction, same bound as
    # text_stats_suite's allowance
    "recipe_training_corpus": [r"\bbucket#"],
}


def test_all_registered_queries_plan_scale_clean(spark):
    """The standing gate: every registry query's physical plan is free
    of lookahead frames, unpartitioned ordered windows, cartesian
    products, and row-at-a-time Python UDFs — except the explicitly
    justified, detail-matched allowances above. (This is the
    mechanized form of the SCALE.md audit: the three lookahead frames
    fixed in round 6 and skew_report's rank-then-filter would all
    have failed here.)"""
    import re

    import __spark_entry__ as entry

    failures = {}
    for name, fn in entry.queries().items():
        patterns = _ALLOWED_GLOBAL_WINDOWS.get(name, [])
        try:
            findings = plan_lint(fn(spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            failures[name] = f"build error: {exc}"[:300]
            continue
        bad = [
            f
            for f in findings
            if not (
                f["kind"] == "global_ordered_window"
                and any(re.search(p, f["detail"]) for p in patterns)
            )
        ]
        if bad:
            failures[name] = str(bad)[:300]
    assert not failures, failures
