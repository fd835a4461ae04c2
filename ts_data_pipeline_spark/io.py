"""Table loading for the driver's synthetic parquet datasets.

Reads are plain ``spark.read.parquet`` — declarative scans so
Catalyst applies predicate pushdown / column pruning / partition
pruning for free (the reference's only "optimizations" are a
hand-ordered null filter and a manual projection,
option_trades/utils.py:184 + 111-145; here they fall out of the
planner).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which
    Spark's reader rejects outright; we read it as nanos-long
    (legacy conf, safe to set per-session) and truncate to
    microseconds — the same ns->us truncation DuckDB applies, so
    oracle comparisons agree.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # Scale note: deriving ts blocks parquet predicate pushdown of
        # time-range filters on this one table (the planner cannot
        # invert timestamp_micros(ts div 1000) into a raw-long bound).
        # In production the fix is at the storage layer — write
        # TIMESTAMP(MICROS) and partition by date, and the same
        # QuerySpec time filters prune files/row-groups for free.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table; keys match DuckDB oracle views."""
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for spark.sql queries."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
