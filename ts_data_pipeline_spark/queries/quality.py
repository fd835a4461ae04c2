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


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff report between the documents table and a
    deterministically perturbed 'next crawl': doc_id%11==0 removed,
    doc_id%13==0 rewritten, a doc_id+1000000 twin added for
    doc_id%17==0 (operators/ingest.snapshot_diff)."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.operators import ingest

    old = io.load(spark, sf_dir, "documents").select("doc_id", "text")
    kept = old.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    added = old.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    diff = ingest.snapshot_diff(old, kept.unionByName(added))
    return diff.groupBy("change").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


CORPUS_SNAPSHOT_DIFF_OLD_SQL = "SELECT doc_id, text FROM documents"
CORPUS_SNAPSHOT_DIFF_NEW_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
FROM documents WHERE doc_id % 11 <> 0
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text
FROM documents WHERE doc_id % 17 = 0
"""


def source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution KL vs the corpus (operators/
    quality.py::source_drift_kl; closed-form absent-mass smoothing)."""
    return quality.source_drift_kl(io.load(spark, sf_dir, "documents"))


def summary_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable per-key aggregation state, gated on the MERGE PATH:
    two half-partition summary states (event_id parity) combined by
    the Chan parallel-variance update (operators/sketch.py::
    summary_state / merge_summary_states) — the incremental
    materialized-view upkeep primitive. The oracle replicates the
    same halves + the same sum-form merge, so a broken merge formula
    cannot hide behind a single-pass recomputation."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.operators import sketch

    ev = io.load(spark, sf_dir, "events").withColumn(
        "half", F.pmod("event_id", F.lit(2))
    )
    merged = sketch.merge_summary_states(
        sketch.summary_state(ev.filter("half = 0"), ["event_type"]),
        sketch.summary_state(ev.filter("half = 1"), ["event_type"]),
        ["event_type"],
    )
    return merged.withColumnRenamed("event_type", "key")


def histogram_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin histogram state (operators/sketch.py::
    histogram_state / merge_histogram_states): half-partition
    histograms vector-added over a full-outer key join, exploded to
    (key, n, bin, cnt) rows. The merge is exact integer addition, so
    the oracle's direct whole-input histogram gates it hard — any
    dropped one-sided key, zip misalignment, or bin-formula drift
    diverges."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.operators import sketch

    ev = io.load(spark, sf_dir, "events").withColumn(
        "half", F.pmod("event_id", F.lit(2))
    )
    kw = dict(lo=0.0, hi=1000.0, n_bins=20)
    merged = sketch.merge_histogram_states(
        sketch.histogram_state(ev.filter("half = 0"), ["event_type"], **kw),
        sketch.histogram_state(ev.filter("half = 1"), ["event_type"], **kw),
        ["event_type"],
    )
    return merged.select(
        F.col("event_type").alias("key"),
        "n",
        F.posexplode("bins").alias("bin", "cnt"),
    ).select("key", "n", F.col("bin").cast("bigint").alias("bin"), "cnt")
