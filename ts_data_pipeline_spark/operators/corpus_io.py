"""Corpus storage management: partitioned writes, small-file
compaction, and a file-level manifest.

At 100 TB the dominant storage failure mode is not correctness but
layout: thousands of tiny files per partition (listing + open cost
dominates scans) or single giant files (no scan parallelism). The
writer shuffles once on the partition columns so each partition
directory is produced by few tasks, and rolls files at
``max_records_per_file`` so no file exceeds the target size. The
manifest and compactor are scan-shaped DataFrame jobs — file
accounting uses ``input_file_name()`` on the executors, never a
driver-side directory walk of the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = ("lang",),
    max_records_per_file: int = 1 << 20,
) -> None:
    """Write a corpus partitioned by ``partition_by`` with bounded
    file sizes.

    ``repartition(cols)`` co-locates each partition value into one
    task (one shuffle), so a partition directory gets one writer;
    ``maxRecordsPerFile`` then rolls that writer's output so files
    stay scan-parallel. Skewed partition values (one lang holding
    half the corpus) remain a single task's work — for those, raise
    parallelism by adding a derived bucket column to ``partition_by``
    (e.g. ``pmod(hash(doc_id), 64)``), which AQE cannot do for a
    write.
    """
    (
        df.repartition(*[F.col(c) for c in partition_by])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*list(partition_by))
        .parquet(path)
    )


def corpus_manifest(
    spark: SparkSession, path: str, *, partition_by: Sequence[str] = ("lang",)
) -> DataFrame:
    """Per-partition layout stats: file count, rows, min/max rows per
    file. One scan; file attribution via ``input_file_name()`` stays
    on the executors."""
    df = spark.read.parquet(path)
    per_file = (
        df.groupBy(*partition_by, F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).alias("rows"))
    )
    return per_file.groupBy(*partition_by).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("rows").alias("n_rows"),
        F.min("rows").alias("min_file_rows"),
        F.max("rows").alias("max_file_rows"),
    )


def compact_corpus(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    partition_by: Sequence[str] = ("lang",),
    max_records_per_file: int = 1 << 20,
) -> DataFrame:
    """Rewrite a fragmented corpus with a healthy file layout and
    return the before/after manifest (joined on the partition cols).

    Compaction into a NEW path keeps the operation atomic-by-rename
    at the catalog level (swap the table location after the write
    lands) — rewriting in place would race concurrent readers.
    """
    before = corpus_manifest(spark, src_path, partition_by=partition_by)
    write_corpus(
        spark.read.parquet(src_path),
        dst_path,
        partition_by=partition_by,
        max_records_per_file=max_records_per_file,
    )
    after = corpus_manifest(spark, dst_path, partition_by=partition_by)
    b = before.select(
        *partition_by,
        F.col("n_files").alias("files_before"),
        F.col("n_rows").alias("rows_before"),
    )
    a = after.select(
        *partition_by,
        F.col("n_files").alias("files_after"),
        F.col("n_rows").alias("rows_after"),
    )
    return b.join(a, list(partition_by))


def shard_manifest(
    spark: SparkSession,
    path: str,
    *,
    token_col: str = "tokens",
    order_col: str = "tok_offset",
) -> DataFrame:
    """Per-SHARD (file) manifest for training dataloaders: rows,
    token sum, and the token-offset span each file covers.

    A pretraining loader plans work from exactly this contract —
    which shard holds which token range, how many samples each
    worker gets — without opening data files. One scan; file
    attribution via ``input_file_name()`` stays executor-side, the
    manifest is files-count-sized.
    """
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.input_file_name().alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(token_col).alias("n_tokens"),
            F.min(order_col).alias("offset_lo"),
            F.max(order_col).alias("offset_hi"),
        )
        .orderBy("offset_lo")
    )


def write_jsonl(
    df: DataFrame, path: str, *, max_records_per_file: int = 1 << 20
) -> None:
    """Write the corpus as JSON Lines — the interchange format LLM
    data tooling expects. One ``to_json(struct(*))`` projection into
    the text sink; executor-side, bounded file sizes."""
    (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .text(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read a JSON Lines corpus with an EXPLICIT schema (never infer
    at scale: inference is a full extra pass) in PERMISSIVE mode —
    corrupt lines surface in ``_corrupt_record`` instead of failing
    the read. The corrupt-record field is appended to the caller's
    schema automatically (Spark only captures corrupt lines into a
    column the schema actually contains)."""
    from pyspark.sql import types as T

    if "_corrupt_record" not in [f.name for f in schema.fields]:
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
