"""Storage-layout pins: date-partition pruning and streaming dedup.

The io.py scale note says time filters prune files for free once the
data is laid out by date — this test proves that claim end-to-end.
Streaming dedup is the exactly-once ingest guard a training-data
pipeline puts in front of everything else.
"""

from __future__ import annotations

import contextlib
import io as pyio

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from ts_data_pipeline_spark import io
from tests.test_streaming import TRADE_SCHEMA, _trade, _write_chunk


def _plan(df) -> str:
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_date_partitioned_layout_prunes_scan(spark, tmp_path):
    """Writing events partitioned by date turns the QuerySpec time
    filter into partition pruning: the scan lists only matching
    date directories (PartitionFilters), not the whole table."""
    events = io.load(spark, SF_DIR, "events")
    out = str(tmp_path / "events_by_dt")
    events.withColumn("dt", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "dt"
    ).parquet(out)

    laid_out = spark.read.parquet(out)
    q = laid_out.filter(
        (F.col("dt") >= "2024-01-10") & (F.col("dt") < "2024-01-12")
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(q)
    assert "PartitionFilters" in plan
    assert "isnotnull(dt" in plan, plan
    # Correctness of the pruned read.
    expected = events.filter(
        (F.to_date("ts") >= "2024-01-10") & (F.to_date("ts") < "2024-01-12")
    ).count()
    assert q.collect()[0].n == expected


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark suppresses redeliveries across
    micro-batches — the at-least-once -> effectively-once ingest
    guard (reference T4/T5 processing guarantees)."""
    data_dir = str(tmp_path / "data")
    # Batch 0: two trades. Batch 1: exact redelivery of trade A plus
    # a new trade. Batch 2: watermark-advancing tail.
    _write_chunk(spark, [
        _trade("A", "2024-01-01 10:00:10", premium=5.0),
        _trade("B", "2024-01-01 10:00:20", premium=6.0),
    ], data_dir)
    _write_chunk(spark, [
        _trade("A", "2024-01-01 10:00:10", premium=5.0),  # duplicate
        _trade("C", "2024-01-01 10:01:00", premium=7.0),
    ], data_dir)
    _write_chunk(spark, [_trade("D", "2024-01-01 10:30:00", premium=8.0)], data_dir)

    stream = (
        spark.readStream.schema(TRADE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["osym", "ts"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_dedup_stream").collect()
    keys = sorted((r.osym, r.ts.isoformat()) for r in rows)
    assert keys == [
        ("A", "2024-01-01T10:00:10"),
        ("B", "2024-01-01T10:00:20"),
        ("C", "2024-01-01T10:01:00"),
        ("D", "2024-01-01T10:30:00"),
    ], keys


def test_write_corpus_bounds_file_sizes(spark, tmp_path):
    """The corpus writer must roll files at max_records_per_file and
    lay directories out by the partition column, with no data loss."""
    from ts_data_pipeline_spark.operators import corpus_io

    docs = io.load(spark, SF_DIR, "documents")
    out = str(tmp_path / "corpus")
    corpus_io.write_corpus(
        docs, out, partition_by=("lang",), max_records_per_file=100
    )
    manifest = corpus_io.corpus_manifest(spark, out, partition_by=("lang",))
    rows = manifest.collect()
    assert sum(r.n_rows for r in rows) == docs.count()
    assert all(r.max_file_rows <= 100 for r in rows)
    # every partition with >100 rows must have rolled into >1 file
    for r in rows:
        if r.n_rows > 100:
            assert r.n_files > 1


def test_compact_corpus_heals_fragmentation(spark, tmp_path):
    """A corpus fragmented into ~32 files per partition compacts to
    the minimal file count for the cap, value-identically."""
    from ts_data_pipeline_spark.operators import corpus_io

    docs = io.load(spark, SF_DIR, "documents")
    frag, healed = str(tmp_path / "frag"), str(tmp_path / "healed")
    # Fragment deliberately: round-robin shuffle before partitionBy
    # gives every task a slice of every lang -> many tiny files.
    docs.repartition(32).write.partitionBy("lang").parquet(frag)
    stats = {
        r.lang: r
        for r in corpus_io.compact_corpus(
            spark, frag, healed, partition_by=("lang",),
            max_records_per_file=1000,
        ).collect()
    }
    assert all(s.rows_after == s.rows_before for s in stats.values())
    assert all(s.files_after < s.files_before for s in stats.values())
    # value-identical round trip
    a = sorted(spark.read.parquet(frag).collect(), key=lambda r: r.doc_id)
    b = sorted(spark.read.parquet(healed).collect(), key=lambda r: r.doc_id)
    assert a == b


def test_shard_manifest_covers_corpus(spark, tmp_path):
    """The per-shard manifest's rows/tokens must total the corpus,
    and shard offset spans must be disjoint-orderable."""
    from ts_data_pipeline_spark.operators import corpus_io, sampling

    docs = io.load(spark, SF_DIR, "documents")
    packed = sampling.sequence_pack(docs).select(
        "doc_id", "tokens", "tok_offset",
        (F.col("doc_id") % 4).alias("shard_part"),
    )
    out = str(tmp_path / "shards")
    corpus_io.write_corpus(packed, out, partition_by=("shard_part",))
    man = corpus_io.shard_manifest(spark, out).collect()
    assert len(man) >= 4
    assert sum(r.n_rows for r in man) == packed.count()
    total_tokens = packed.agg(F.sum("tokens")).collect()[0][0]
    assert sum(r.n_tokens for r in man) == total_tokens


def test_jsonl_roundtrip_and_corrupt_line_surfacing(spark, tmp_path):
    """JSONL interchange: write -> read roundtrips exactly with an
    explicit schema; a corrupt line lands in _corrupt_record rather
    than failing the read."""
    from pyspark.sql import types as T

    from ts_data_pipeline_spark.operators import corpus_io

    docs = io.load(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    out = str(tmp_path / "corpus.jsonl")
    corpus_io.write_jsonl(docs, out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    # corrupt-record-only queries require materialization (Spark
    # disallows them on the raw lazy JSON relation)
    back = corpus_io.read_jsonl(spark, out, schema).cache()
    assert back.filter("_corrupt_record IS NOT NULL").count() == 0
    a = {(r.doc_id, r.text, r.lang) for r in docs.collect()}
    b = {(r.doc_id, r.text, r.lang) for r in back.collect()}
    assert a == b
    # plant a corrupt line
    import pathlib

    bad = pathlib.Path(out) / "zz_corrupt.txt"
    bad.write_text('{"doc_id": 1, "text": broken\n')
    # identical plan would serve the stale cache — drop it first
    back.unpersist()
    back2 = corpus_io.read_jsonl(spark, out, schema).cache()
    assert back2.filter("_corrupt_record IS NOT NULL").count() == 1
    assert back2.count() == len(a) + 1
