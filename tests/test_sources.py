"""Replay-frames DataSource tests: batch partitioning + streaming cursor."""

from __future__ import annotations

import json

from ts_data_pipeline_spark.sources import replay


def _write_frames(path, frames):
    with open(path, "w", encoding="utf-8") as fh:
        for f in frames:
            fh.write(json.dumps(f) + "\n")


FRAMES_A = [
    {"ts": 1000 + i, "key": f"K{i % 3}", "price": 1.5 * i, "side": "B"}
    for i in range(10)
]
FRAMES_B = [
    {"ts": 2000 + i, "key": f"K{i % 3}", "price": 2.5 * i, "side": "S"}
    for i in range(7)
]


def test_batch_read_partitions_per_file(spark, tmp_path):
    _write_frames(tmp_path / "a.json", FRAMES_A)
    _write_frames(tmp_path / "b.json", FRAMES_B)
    replay.register(spark)
    df = (
        spark.read.format("replay_frames")
        .option("path", str(tmp_path))
        .load()
    )
    rows = df.collect()
    assert len(rows) == 17
    assert df.columns == ["ts", "key", "payload"]
    got = sorted((r.ts, r.key) for r in rows)
    want = sorted((f["ts"], f["key"]) for f in FRAMES_A + FRAMES_B)
    assert got == want
    # payload is the raw frame for downstream from_json.
    assert all(json.loads(r.payload)["price"] is not None for r in rows)


def test_batch_write_then_read_roundtrip(spark, tmp_path):
    """The writer side: frames written by the custom sink read back
    identically through the custom source (produce->consume loop)."""
    out = str(tmp_path / "out")
    replay.register(spark)
    df = spark.createDataFrame(
        [(1000 + i, f"K{i % 3}", float(i)) for i in range(20)],
        "ts long, key string, price double",
    )
    df.write.format("replay_frames").option("path", out).mode("append").save()

    back = (
        spark.read.format("replay_frames").option("path", out).load()
    )
    rows = back.collect()
    assert len(rows) == 20
    assert sorted((r.ts, r.key) for r in rows) == sorted(
        (1000 + i, f"K{i % 3}") for i in range(20)
    )
    assert all(json.loads(r.payload)["price"] == float(r.ts - 1000) for r in rows)


def test_batch_append_twice_is_additive(spark, tmp_path):
    """Two batch appends into the same path must accumulate, not
    clobber: batch commits promote to uuid-suffixed names (only the
    stream retry path uses deterministic per-(batchId, partition)
    names)."""
    out = str(tmp_path / "out")
    replay.register(spark)
    df = spark.createDataFrame(
        [(1000 + i, f"K{i % 3}", float(i)) for i in range(10)],
        "ts long, key string, price double",
    )
    df.write.format("replay_frames").option("path", out).mode("append").save()
    df.write.format("replay_frames").option("path", out).mode("append").save()

    back = spark.read.format("replay_frames").option("path", out).load()
    assert back.count() == 20


def test_stream_write_per_batch_files(spark, tmp_path):
    """Streaming sink: each micro-batch commits its own frame files
    (two-phase temp->promote), replayable by the source."""
    import glob as _glob

    data_dir = tmp_path / "in"
    out = str(tmp_path / "out")
    replay.register(spark)
    _write_frames(data_dir.mkdir() or (data_dir / "a.json"), FRAMES_A)
    stream = (
        spark.readStream.format("replay_frames")
        .option("path", str(data_dir))
        .option("batch_lines", 4)
        .load()
    )
    q = (
        stream.writeStream.format("replay_frames")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    files = _glob.glob(out + "/frames-*.json")
    assert len(files) >= 3  # 10 frames at 4/batch
    total = sum(1 for f in files for line in open(f) if line.strip())
    assert total == 10
    # No leftover uncommitted temp files.
    assert _glob.glob(out + "/_tmp/*") == []


def test_stream_commit_idempotent_across_retry(tmp_path):
    """A replayed micro-batch must overwrite its own frame files, not
    accrete uuid-named duplicates (ADVICE r01: promotion was
    at-least-once). Simulates attempt 1 promoting 2 partitions, then a
    retry of the SAME batch with a different partition count."""
    import glob as _glob
    import os

    out = str(tmp_path / "out")
    os.makedirs(out + "/_tmp")
    w = replay.ReplayFrameWriter({"path": out})

    def attempt(parts):
        msgs = []
        for p, rows in parts.items():
            tmp = os.path.join(out, "_tmp", f"part-{p}-deadbeef{p}.json")
            with open(tmp, "w") as fh:
                fh.writelines(json.dumps(r) + "\n" for r in rows)
            msgs.append(replay._FrameCommit(path=tmp, rows=len(rows), partition=p))
        return msgs

    w.commit(attempt({0: FRAMES_A[:4], 1: FRAMES_A[4:]}), batchId=7)
    # Retry of batch 7 repartitions to 3 tasks.
    third = len(FRAMES_A) // 3
    w.commit(
        attempt({0: FRAMES_A[:third], 1: FRAMES_A[third:2 * third],
                 2: FRAMES_A[2 * third:]}),
        batchId=7,
    )
    files = sorted(_glob.glob(out + "/frames-7-part-*.json"))
    assert [os.path.basename(f) for f in files] == [
        f"frames-7-part-{p}.json" for p in (0, 1, 2)
    ]
    got = [json.loads(line) for f in files for line in open(f) if line.strip()]
    assert sorted(r["ts"] for r in got) == sorted(f["ts"] for f in FRAMES_A)


def test_stream_read_paged_cursor(spark, tmp_path):
    """The line cursor pages through frames (REST limit=500 analog)
    across multiple micro-batches, exactly once."""
    _write_frames(tmp_path / "a.json", FRAMES_A + FRAMES_B)
    replay.register(spark)
    stream = (
        spark.readStream.format("replay_frames")
        .option("path", str(tmp_path))
        .option("batch_lines", 5)
        .load()
    )
    # availableNow snapshots only the first prefetched chunk of a
    # SimpleDataSourceStreamReader, so drive the continuous trigger
    # until the cursor drains instead.
    q = (
        stream.writeStream.format("memory")
        .queryName("t_replay")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    rows = spark.table("t_replay").collect()
    assert len(rows) == 17
    assert len({(r.ts, r.key) for r in rows}) == 17
    # 17 frames at 5/batch -> at least 4 micro-batches.
    progressed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progressed) >= 4
