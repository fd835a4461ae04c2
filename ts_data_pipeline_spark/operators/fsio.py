"""Filesystem primitives for index maintenance, through the Hadoop
FileSystem API.

The IVF(PQ) index maintenance path (``ivfpq_index_stats`` /
``ivfpq_index_compact`` in :mod:`operators.similarity`) needs five
primitives: list a directory with sizes, check existence, delete,
atomically replace a small pointer file, and read it back. Through
``os.listdir``/``open`` those work only on the driver's local disk; at
100 TB the index lives on HDFS or an object store, where the SAME
Hadoop ``FileSystem`` interface Spark itself reads parquet through is
the portable surface (VERDICT r10 ask #7). Every helper here resolves
the filesystem FROM THE PATH (``Path.getFileSystem``), so plain local
paths, ``file://`` URIs, ``hdfs://`` and ``s3a://`` all route to the
right implementation with no local-path special case.

Atomicity notes, by backend:

- ``replace_text`` uses ``FileContext.rename(..., Rename.OVERWRITE)``
  — atomic on HDFS and POSIX; on S3A it is copy+delete (the pointer
  file is tiny, and the read-repair in :func:`read_text_or_recover`
  covers the non-atomic window).
- Directory delete/rename follow the usual Hadoop contracts (atomic
  dir rename on HDFS, per-key on S3A) — which is exactly why the
  compact swap commits through the POINTER FILE, never through a
  directory rename pair.
"""

from __future__ import annotations


def _jpath(spark, path: str):
    """A Hadoop Path for ``path`` (plain local paths and URIs alike),
    plus its owning FileSystem."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def join(path: str, *names: str) -> str:
    """URI-safe path join (os.path.join breaks ``file://`` on
    Windows-style separators and never understands ``s3a://``)."""
    out = path.rstrip("/")
    for n in names:
        out = f"{out}/{n.strip('/')}"
    return out


def exists(spark, path: str) -> bool:
    fs, p = _jpath(spark, path)
    return bool(fs.exists(p))


def is_dir(spark, path: str) -> bool:
    """True iff the path exists and is a directory. Fetches the
    status directly (no exists() pre-check) and maps a
    FileNotFound raced in by a concurrent delete/rename to False —
    the pin/prune protocol's validate-after-write relies on this
    never throwing for a vanished path (r11 review)."""
    fs, p = _jpath(spark, path)
    try:
        return bool(fs.getFileStatus(p).isDirectory())
    except Exception:  # noqa: BLE001 — FileNotFound via Py4J
        return False


def rename(spark, src: str, dst: str) -> bool:
    """Plain FileSystem.rename (NO overwrite — fails when dst
    exists, HDFS semantics); returns success. Atomic on HDFS/POSIX;
    per-key copy on object stores — callers that need an atomic
    commit use :func:`replace_text` pointers instead."""
    jvm = spark._jvm
    fs, p = _jpath(spark, src)
    try:
        return bool(fs.rename(p, jvm.org.apache.hadoop.fs.Path(dst)))
    except Exception:  # noqa: BLE001 — src vanished mid-call
        return False


def listdir(spark, path: str) -> list[dict]:
    """Immediate children of ``path`` as
    ``{"name", "is_dir", "size"}`` dicts (size = file length; 0 for
    directories — callers sum file sizes per subtree themselves)."""
    fs, p = _jpath(spark, path)
    out = []
    for st in fs.listStatus(p):
        out.append(
            {
                "name": st.getPath().getName(),
                "is_dir": bool(st.isDirectory()),
                "size": int(st.getLen()),
            }
        )
    return out


def delete(spark, path: str) -> bool:
    """Recursive delete; False if the path was already gone."""
    fs, p = _jpath(spark, path)
    return bool(fs.delete(p, True))


def write_text(spark, path: str, text: str) -> None:
    """Create/overwrite a small text file through the FS API."""
    fs, p = _jpath(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark, path: str) -> str:
    """Read a small text file through the FS API (pointer/meta files
    — NOT a data path). One gateway round-trip: the stream drains
    through commons-io's IOUtils (always on Spark's classpath); the
    byte-at-a-time loop is only the paranoid fallback (a 15 KB meta
    sidecar would otherwise cost ~15k JVM round-trips — r11
    review)."""
    fs, p = _jpath(spark, path)
    inp = fs.open(p)
    try:
        try:
            data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(inp)
            return bytes(data).decode("utf-8")
        except Exception:  # noqa: BLE001 — commons-io absent/shaded
            buf = bytearray()
            while True:
                b = inp.read()
                if b < 0:
                    break
                buf.append(b)
            return buf.decode("utf-8")
    finally:
        inp.close()


def _rename_overwrite(spark, src: str, dst: str) -> None:
    """FileContext.rename(..., Rename.OVERWRITE) — the Hadoop
    equivalent of POSIX os.replace (atomic on HDFS/POSIX). One
    definition serves the pointer write and its read-repair so the
    two paths can never diverge."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        spark._jsc.hadoopConfiguration()
    )
    opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
    opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(
        jvm.org.apache.hadoop.fs.Path(src),
        jvm.org.apache.hadoop.fs.Path(dst),
        opts,
    )


def replace_text(spark, path: str, text: str) -> None:
    """Atomically replace ``path`` with ``text``: write
    ``path + ".tmp"`` then rename-with-overwrite (see module
    docstring for the S3A caveat + read repair)."""
    tmp = path + ".tmp"
    write_text(spark, tmp, text)
    _rename_overwrite(spark, tmp, path)


def read_text_or_recover(spark, path: str) -> str | None:
    """Read a pointer file, repairing a crash between
    :func:`replace_text`'s write and rename: if ``path`` is missing
    but ``path + ".tmp"`` holds VALID JSON, the tmp is the newer
    committed content (written before the swap) — promote it and
    read. A TORN tmp (killed mid-write) is deleted and ignored
    instead of promoted, so it can never poison the pointer; the
    caller's default (e.g. the build-time ``codes`` dir) still
    resolves (r11 review). Returns None when nothing readable
    exists."""
    import json

    if exists(spark, path):
        return read_text(spark, path)
    tmp = path + ".tmp"
    if exists(spark, tmp):
        txt = read_text(spark, tmp)
        try:
            json.loads(txt)
        except ValueError:
            delete(spark, tmp)  # torn mid-write: not a commit
            return None
        _rename_overwrite(spark, tmp, path)
        return read_text(spark, path)
    return None
