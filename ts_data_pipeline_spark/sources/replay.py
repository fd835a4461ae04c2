"""Replay-frames connector: captured-feed source, batch + streaming.

The reference ingests from a WebSocket with a reconnect loop
(/root/reference/option_trades/utils.py:152-214 ``UnusualWhalesSource``,
duplicate /root/reference/option_trades/data_source.py:210-265), a
configurable source with pluggable key/timestamp/transform callables
(/root/reference/equity_quotes/main.py:108-119), and a 1 s REST poll
loop with a ``last_polled`` high-watermark
(/root/reference/news/main.py:25-95). All three reduce to the same
engine-side abstraction: *an external feed of keyed, timestamped
JSON frames consumed from a cursor*.

Spark-first restatement: a Python ``DataSource`` ("replay_frames")
that reads captured frame files (JSONL):

- **batch**: one ``InputPartition`` per file — distributed scan, no
  driver-side iteration; at scale, landed frame files fan out across
  executors exactly like any file source.
- **streaming**: a ``SimpleDataSourceStreamReader`` whose offset is
  the global line cursor — the REST poll's ``last_polled`` watermark
  (news/main.py:45,54) made durable in the Spark offset log, which
  also subsumes the reconnect-after-5s loop (utils.py:209-214):
  recovery replays from the committed cursor instead.

Per-record key/timestamp extraction (the reference's ``key_func`` /
``timestamp_func`` callables) happens here in the source, while the
payload stays an opaque JSON string — body parsing belongs JVM-side
in ``from_json`` so the hot path stays in codegen.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

#: Output schema: event-time ms + routing key extracted source-side
#: (P14/T6), payload left for from_json downstream.
FRAME_SCHEMA = "ts bigint, key string, payload string"

DEFAULT_BATCH_LINES = 1000


def _frame_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.json")))
    return [path]


def _parse_line(line: str, key_field: str, ts_field: str) -> Tuple[int, str, str]:
    obj = json.loads(line)
    ts = obj.get(ts_field) or 0  # null-guard: utils.py:63 `or 0`
    return int(ts), str(obj.get(key_field)), line


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ReplayBatchReader(DataSourceReader):
    """Batch scan: one partition per captured file."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.key_field = options.get("key_field", "key")
        self.ts_field = options.get("ts_field", "ts")

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in _frame_files(self.path)]

    def read(self, partition: _FilePartition) -> Iterator[Tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                yield _parse_line(line, self.key_field, self.ts_field)


class ReplayStreamReader(SimpleDataSourceStreamReader):
    """Poll-loop analog: the offset is the global line cursor.

    ``read(start)`` serves at most ``batch_lines`` new lines per
    micro-batch — the page-size knob of the REST backfill
    (darkpool_trades/main.py:168 ``limit=500``). An exhausted cursor
    returns an empty batch at the same offset (the 1 s idle poll,
    news/main.py:95).
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.key_field = options.get("key_field", "key")
        self.ts_field = options.get("ts_field", "ts")
        self.batch_lines = int(options.get("batch_lines", DEFAULT_BATCH_LINES))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _lines(self) -> list[str]:
        out: list[str] = []
        for path in _frame_files(self.path):
            with open(path, encoding="utf-8") as fh:
                out.extend(l.strip() for l in fh if l.strip())
        return out

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        lines = self._lines()
        pos = start["pos"]
        chunk = lines[pos : pos + self.batch_lines]
        rows = [
            _parse_line(l, self.key_field, self.ts_field) for l in chunk
        ]
        return iter(rows), {"pos": pos + len(chunk)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # Deterministic replay for recovery (T4): same cursor range ->
        # same rows, the changelog-replay equivalent.
        lines = self._lines()
        return iter(
            _parse_line(l, self.key_field, self.ts_field)
            for l in lines[start["pos"] : end["pos"]]
        )


@dataclass
class _FrameCommit(WriterCommitMessage):
    path: str
    rows: int
    partition: int


class ReplayFrameWriter(DataSourceWriter, DataSourceStreamWriter):
    """Frame-file sink: the produce side of the connector (S5 analog
    for files). Each task writes one JSONL frame file; commit is the
    two-phase file protocol — tasks write to uniquely-named temp
    files and return them in commit messages; ``commit`` promotes
    them, ``abort`` discards. Promotion is IDEMPOTENT across batch
    retries: final names are deterministic per (batchId, partitionId)
    so a replayed micro-batch overwrites its own files instead of
    duplicating them, and ``commit`` first clears any stale
    ``frames-{batchId}-*`` leftovers from a partially-promoted prior
    attempt (the retry may repartition). Mirrors the reference's
    producer flush checkpoint (option_trades/data_source.py:171-187)
    with exactly-once file output instead of at-least-once.
    """

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, rows) -> _FrameCommit:
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx else 0
        _os.makedirs(_os.path.join(self.path, "_tmp"), exist_ok=True)
        tmp = _os.path.join(
            self.path, "_tmp", f"part-{part}-{_uuid.uuid4().hex}.json"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in rows:
                fh.write(_json.dumps(row.asDict(recursive=True)) + "\n")
                n += 1
        return _FrameCommit(path=tmp, rows=n, partition=part)

    def _promote(self, messages, prefix: str, *, deterministic: bool) -> None:
        import os as _os
        import uuid as _uuid

        for m in messages:
            if m is None or m.rows == 0:
                if m is not None and _os.path.exists(m.path):
                    _os.remove(m.path)
                continue
            if deterministic:
                # Deterministic final name -> os.replace overwrites on
                # a STREAM batch retry instead of accreting duplicates.
                final = _os.path.join(
                    self.path, f"{prefix}-part-{m.partition}.json"
                )
            else:
                # Batch appends must never clobber a prior write's
                # files: keep a unique suffix per commit.
                final = _os.path.join(
                    self.path,
                    f"{prefix}-part-{m.partition}-{_uuid.uuid4().hex}.json",
                )
            _os.replace(m.path, final)

    # batch protocol
    def commit(self, messages, batchId: int | None = None) -> None:
        import glob as _glob
        import os as _os

        if batchId is not None:
            # Streaming micro-batch: idempotent per (batchId, partition).
            prefix = f"frames-{batchId}"
            # Clear a partially-promoted prior attempt of this batch
            # (the retry may have a different partition count).
            for stale in _glob.glob(_os.path.join(self.path, f"{prefix}-part-*.json")):
                _os.remove(stale)
            self._promote(messages, prefix, deterministic=True)
        else:
            # Plain batch write: Spark's commit protocol already ran
            # once; uuid suffix keeps successive appends additive.
            self._promote(messages, "frames", deterministic=False)

    def abort(self, messages, batchId: int | None = None) -> None:
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.path):
                _os.remove(m.path)


class ReplayFramesDataSource(DataSource):
    """``spark.read.format("replay_frames")`` — register with
    ``spark.dataSource.register(ReplayFramesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "replay_frames"

    def schema(self) -> str:
        return FRAME_SCHEMA

    def reader(self, schema: StructType) -> ReplayBatchReader:
        return ReplayBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> ReplayStreamReader:
        return ReplayStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ReplayFrameWriter:
        return ReplayFrameWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> ReplayFrameWriter:
        return ReplayFrameWriter(self.options)


def register(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(ReplayFramesDataSource)
