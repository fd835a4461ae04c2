"""Exactly-once streaming UPSERT sink: foreachBatch + versioned
commits (a minimal lakehouse commit protocol over plain parquet).

The reference's catalog mutations arrive as a stream of updates; a
plain parquet "table" cannot MERGE in place. This sink gives each
micro-batch an atomic, idempotent commit:

- every applied batch writes a brand-new immutable version directory
  ``v<batch_id>`` holding the FULL post-merge keyed state (current
  rows whose key is absent from the batch + the batch's latest row
  per key) — pure append, no in-place rewrite, object-store safe;
- a pointer file ``_CURRENT`` names the live version and is replaced
  atomically (write temp + rename); readers resolve it first, so
  they always see a complete version;
- idempotence: foreachBatch can re-deliver a batch after recovery
  (Spark's contract is at-least-once delivery of (batch_id, data));
  a version directory that already exists for this batch_id means
  the merge was already applied — re-delivery only repoints
  ``_CURRENT``, never re-merges — which upgrades the sink to
  effectively-once.

Scale: the merge is one keyed anti-join (current vs batch keys —
batch side broadcast-able) + union + write; state size is the keyed
table, not the stream history. Version GC = delete directories older
than the retention horizon; never the one ``_CURRENT`` names.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _current_version(table_dir: str) -> int | None:
    ptr = os.path.join(table_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def _point_current(table_dir: str, version: int) -> None:
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._CURRENT.")
    with os.fdopen(fd, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(table_dir, "_CURRENT"))


def read_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Resolve _CURRENT and read that (complete, immutable) version."""
    v = _current_version(table_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(table_dir, f"v{v}"))


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
    vdir = os.path.join(table_dir, f"v{batch_id}")
    if not os.path.exists(vdir):
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
        merged.write.mode("errorifexists").parquet(vdir)
    # Re-delivery lands here with the version already on disk: only
    # the pointer moves (atomic), the merge never re-applies.
    _point_current(table_dir, batch_id)


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
    repoint ``_CURRENT``. History directories still hold the rows —
    full erasure = version GC past the retention horizon, which is
    the same operational story as any lakehouse's VACUUM. Idempotent
    per (version): an existing version directory is never rewritten.
    """
    current = read_table(spark, table_dir)
    if current is None:
        raise ValueError(f"no current version in {table_dir}")
    vdir = os.path.join(table_dir, f"v{version}")
    if not os.path.exists(vdir):
        purged = current.join(
            F.broadcast(keys.select(key_col).distinct()), key_col, "left_anti"
        )
        purged.write.mode("errorifexists").parquet(vdir)
    _point_current(table_dir, version)
