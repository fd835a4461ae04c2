"""Skew-resistant aggregation: two-phase salted groupBy.

A groupBy on a heavily skewed key (3-value return flags, hot option
symbols at market open) funnels the hot key's rows into one reducer.
Salting splits every key into ``salt_buckets`` sub-keys for the first
(partial) aggregation, then re-aggregates the tiny salted result —
the hot key's work spreads across ``salt_buckets`` tasks, and the
second shuffle moves only (keys x salt_buckets) rows.

AQE's skew-join handling covers joins; salting is the analogous
pattern for aggregation, kept explicit so plans can opt in where key
histograms are known-bad. Decomposable aggregates only (sum/count/
min/max; avg = sum/count assembled at the end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    sums: dict[str, Column],
    *,
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase sum/count aggregation under a salt.

    ``sums`` maps output name -> expression to sum. ``salt_source``
    is a column whose hash spreads rows (defaults to
    ``spark_partition_id`` — zero extra column reads, already
    uniform across input splits).
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
        if salt_source is not None
        else F.spark_partition_id() % salt_buckets
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            *[F.sum(expr).alias(f"_p_{name}") for name, expr in sums.items()],
            F.count(F.lit(1)).alias("_p_cnt"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in sums],
        F.sum("_p_cnt").alias("n_rows"),
    )
