"""Exactly-once streaming UPSERT sink: foreachBatch + versioned
commits (a minimal lakehouse commit protocol over plain parquet).

The reference's catalog mutations arrive as a stream of updates; a
plain parquet "table" cannot MERGE in place. This sink gives each
micro-batch an atomic, idempotent commit:

- every applied batch writes a brand-new immutable version directory
  holding the FULL post-merge keyed state (current rows whose key is
  absent from the batch + the batch's latest row per key) — pure
  append, no in-place rewrite, object-store safe;
- a pointer file ``_CURRENT`` names the live version DIRECTORY and
  is replaced atomically (write temp + rename); readers resolve it
  first, so they always see a complete version;
- a version counts as COMMITTED only when its ``_SUCCESS`` marker
  exists (written last by Spark's file committer). A directory
  without the marker is a crashed half-write: re-delivery removes it
  and re-applies the merge instead of repointing at truncated data;
- batch versions live under ``b<batch_id>`` and compliance-delete
  versions under ``d<token>`` — separate namespaces, so an operator
  delete can never collide with (and silently swallow) a future
  micro-batch's commit;
- idempotence: foreachBatch can re-deliver a batch after recovery
  (Spark's contract is at-least-once delivery of (batch_id, data));
  a COMMITTED version for this batch_id means the merge was already
  applied — re-delivery only repoints ``_CURRENT``, never re-merges
  — which upgrades the sink to effectively-once.

Scale: the merge is one keyed anti-join (current vs batch keys —
batch side broadcast-able) + union + write; state size is the keyed
table, not the stream history. Version GC = delete directories older
than the retention horizon; never the one ``_CURRENT`` names.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _current_dir(table_dir: str) -> str | None:
    ptr = os.path.join(table_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return f.read().strip()


def _point_current(table_dir: str, version_dir: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._CURRENT.")
    with os.fdopen(fd, "w") as f:
        f.write(version_dir)
    os.replace(tmp, os.path.join(table_dir, "_CURRENT"))


def _committed(table_dir: str, version_dir: str) -> bool:
    """True only when the version finished writing: Spark's committer
    creates _SUCCESS last, so a directory without it is a crashed
    half-write, not a commit."""
    return os.path.exists(os.path.join(table_dir, version_dir, "_SUCCESS"))


def read_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Resolve _CURRENT and read that (complete, immutable) version."""
    v = _current_dir(table_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(table_dir, v))


def _write_version(
    table_dir: str, version_dir: str, df: DataFrame
) -> None:
    """Write a version idempotently: a committed directory is left
    untouched; a half-written one (no _SUCCESS) is removed and
    rewritten."""
    vpath = os.path.join(table_dir, version_dir)
    if os.path.exists(vpath):
        if _committed(table_dir, version_dir):
            return
        shutil.rmtree(vpath)  # crashed half-write: redo the merge
    df.write.mode("errorifexists").parquet(vpath)


def upsert_batch(
    spark: SparkSession,
    table_dir: str,
    batch: DataFrame,
    batch_id: int,
    *,
    key_col: str,
    ts_col: str,
) -> None:
    """Apply one micro-batch as a versioned keyed UPSERT (see module
    docstring). Safe to call again with the same batch_id."""
    os.makedirs(table_dir, exist_ok=True)
    vdir = f"b{batch_id}"
    if not _committed(table_dir, vdir):
        # latest row per key within the batch (ts desc, stable)
        from pyspark.sql import Window

        w = Window.partitionBy(key_col).orderBy(F.col(ts_col).desc())
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn")
        )
        current = read_table(spark, table_dir)
        if current is None:
            merged = latest
        else:
            merged = current.join(
                F.broadcast(latest.select(key_col)), key_col, "left_anti"
            ).unionByName(latest)
        _write_version(table_dir, vdir, merged)
    # Re-delivery of a committed batch lands here: only the pointer
    # moves (atomic), the merge never re-applies.
    _point_current(table_dir, vdir)


def upsert_writer(table_dir: str, *, key_col: str, ts_col: str):
    """foreachBatch hook: ``stream.writeStream.foreachBatch(
    upsert_writer(dir, key_col=..., ts_col=...))``."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        upsert_batch(
            batch.sparkSession,
            table_dir,
            batch,
            batch_id,
            key_col=key_col,
            ts_col=ts_col,
        )

    return apply


def delete_keys(
    spark: SparkSession,
    table_dir: str,
    keys: DataFrame,
    *,
    key_col: str,
    version: int,
) -> None:
    """Compliance delete (GDPR/right-to-erasure) as a first-class
    version: write a new immutable version WITHOUT the given keys and
    repoint ``_CURRENT``. Delete versions live in their own ``d<n>``
    namespace so they can never collide with a streaming batch id
    (a collision would silently swallow that micro-batch's merge).
    History directories still hold the rows — full erasure = version
    GC past the retention horizon, the same operational story as any
    lakehouse's VACUUM. Idempotent per ``version``: a committed
    delete version is never rewritten.
    """
    current = read_table(spark, table_dir)
    if current is None:
        raise ValueError(f"no current version in {table_dir}")
    vdir = f"d{version}"
    if not _committed(table_dir, vdir):
        purged = current.join(
            F.broadcast(keys.select(key_col).distinct()), key_col, "left_anti"
        )
        _write_version(table_dir, vdir, purged)
    _point_current(table_dir, vdir)
