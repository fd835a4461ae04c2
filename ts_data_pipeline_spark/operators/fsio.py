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
    two paths can never diverge.

    The FileContext is resolved PER PATH (``getFileContext(uri,
    conf)``) because FileContext requires an ``AbstractFileSystem``
    binding (``fs.AbstractFileSystem.<scheme>.impl``) which object
    stores like s3a frequently leave unset even when the plain
    ``FileSystem`` works fine (r11 ADVICE). When the binding is
    missing, fall back to delete-then-rename through the path's
    FileSystem — non-atomic, but that is already S3A's rename
    reality, and :func:`read_text_or_recover`'s read-repair covers
    the window for every pointer this module writes."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    conf = spark._jsc.hadoopConfiguration()
    psrc = jvm.org.apache.hadoop.fs.Path(src)
    pdst = jvm.org.apache.hadoop.fs.Path(dst)
    try:
        uri = psrc.toUri()
        if uri.getScheme() is not None:
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(uri, conf)
        else:  # scheme-less local path: the default FileContext
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(conf)
    except Exception:  # noqa: BLE001 — no AbstractFileSystem binding
        fs = psrc.getFileSystem(conf)
        fs.delete(pdst, False)
        if not bool(fs.rename(psrc, pdst)):
            raise IOError(f"rename {src} -> {dst} failed")
        return
    opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
    opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(psrc, pdst, opts)


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

def mkdirs(spark, path: str) -> None:
    """Create a directory (and parents) — no-op if it exists."""
    fs, p = _jpath(spark, path)
    fs.mkdirs(p)


def stat_token(spark, path: str):
    """``(modification_time_ms, length)`` of a file, or ``None`` when
    it does not exist — a cheap change-detection token for
    driver-side caches (the POSIX twin uses ``st_mtime_ns``; only
    token EQUALITY is meaningful, never cross-backend comparison)."""
    fs, p = _jpath(spark, path)
    try:
        st = fs.getFileStatus(p)
    except Exception:  # noqa: BLE001 — FileNotFound via Py4J
        return None
    return (int(st.getModificationTime()), int(st.getLen()))


# ---------------------------------------------------------------------------
# Pluggable ops: ONE primitive interface with a POSIX and a Hadoop
# implementation, shared by every commit protocol in the repo (the
# summary-state sink in operators/sketch, the exactly-once upsert sink
# in streaming/upsert_sink, and the IVF index maintenance above). The
# r11 state sink introduced the pattern privately; r12 hoists it here
# so the upsert sink's manifest/_CURRENT/tombstone protocol can run on
# HDFS / object stores too (VERDICT r11 ask #1).


class PosixOps:
    """Driver-local filesystem primitives — the no-SparkSession
    fallback (plain local paths only). ``replace_text`` is
    ``os.replace`` (atomic), matching the Hadoop twin. ``rename``
    diverges from HDFS semantics: POSIX ``os.rename`` silently
    REPLACES an existing dst file (and an empty dst dir), whereas
    ``HadoopOps.rename`` is fail-if-dst-exists — callers that need
    first-writer-wins must use the Hadoop path or pre-check; every
    in-repo commit protocol renames onto fresh, never-reused names,
    so neither backend's rename ever sees an existing dst."""

    def join(self, path: str, *names: str) -> str:
        import os

        return os.path.join(path, *names)

    def exists(self, p: str) -> bool:
        import os

        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        import os

        return os.path.isdir(p)

    def listdir(self, p: str) -> list[str]:
        import os

        return os.listdir(p)

    def list_entries(self, p: str) -> list[dict]:
        """Immediate children as ``{"name", "is_dir"}`` dicts — one
        scan, so the Hadoop twin needs one RPC instead of
        one-stat-per-child."""
        import os

        return [
            {"name": e.name, "is_dir": e.is_dir()} for e in os.scandir(p)
        ]

    def read_text(self, p: str) -> str:
        with open(p) as fh:
            return fh.read()

    def replace_text(self, p: str, text: str) -> None:
        """Atomic overwrite via a UNIQUE temp name (``mkstemp`` in the
        target directory) — two concurrent writers each stage their own
        inode and the last ``os.replace`` wins whole, never torn. A
        fixed ``p + ".tmp"`` staging name (used only by the Hadoop
        twin, whose ``read_text_or_recover`` repair depends on it)
        would let concurrent bare-path writers interleave
        open/truncate/write on one inode and commit mixed JSON.

        Two deliberate details: mkstemp creates 0600 files, so the
        mode is widened — preserving the replaced file's mode, 0644
        for new files (the committed pointer/manifest must stay
        readable by a DIFFERENT OS user's read-only reader — the
        exact client read_table's roll-forward serves); and the
        staging name is dot-prefixed with a ``.tmp``
        suffix, so a hard crash (SIGKILL between write and replace —
        the except-clause can't run) orphans at most one clearly-
        labeled hidden file per crash that no listing consumer ever
        reads and a maintenance wipe of ``.*.tmp`` may remove. The
        orphan-per-hard-crash is the price of tear-safety: a
        self-overwriting fixed name would cap the litter at one file
        but reopen the concurrent-writer tear."""
        import os
        import stat as _stat
        import tempfile

        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(p) or ".",
            prefix="." + os.path.basename(p) + ".",
            suffix=".tmp",
        )
        try:
            # fdopen FIRST so the fd always has an owner (a failing
            # fchmod must not leak it), then widen mkstemp's 0600:
            # PRESERVE the replaced file's mode, default new files to
            # 0644. A umask probe (os.umask flip) would be the
            # umask-honoring alternative, but it mutates process-
            # global state and two concurrent writers can corrupt the
            # process umask permanently — stat-and-preserve is
            # thread-safe and deterministic. Directory permissions
            # gate access for callers needing tighter than 0644.
            with os.fdopen(fd, "w") as fh:
                try:
                    mode = _stat.S_IMODE(os.stat(p).st_mode)
                except FileNotFoundError:
                    mode = 0o644
                os.fchmod(fh.fileno(), mode)
                fh.write(text)
            os.replace(tmp, p)
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise

    def remove_file(self, p: str) -> None:
        import os

        try:
            os.remove(p)
        except FileNotFoundError:
            pass

    def rename(self, src: str, dst: str) -> bool:
        import os

        try:
            os.rename(src, dst)
            return True
        except OSError:
            return False

    def rmtree(self, p: str) -> None:
        import shutil

        shutil.rmtree(p, ignore_errors=True)

    def mkdirs(self, p: str) -> None:
        import os

        os.makedirs(p, exist_ok=True)

    def stat_token(self, p: str):
        import os

        try:
            st = os.stat(p)
        except FileNotFoundError:
            return None
        return (st.st_mtime_ns, st.st_size)


class HadoopOps:
    """The same primitives through the Hadoop FileSystem API — local
    paths, ``file://`` URIs, HDFS and object stores all route to the
    right implementation (the r11 convention the IVF index
    maintenance established)."""

    def __init__(self, spark) -> None:
        self.spark = spark

    def join(self, path: str, *names: str) -> str:
        return join(path, *names)

    def exists(self, p: str) -> bool:
        return exists(self.spark, p)

    def isdir(self, p: str) -> bool:
        return is_dir(self.spark, p)

    def listdir(self, p: str) -> list[str]:
        return [e["name"] for e in listdir(self.spark, p)]

    def list_entries(self, p: str) -> list[dict]:
        return [
            {"name": e["name"], "is_dir": e["is_dir"]}
            for e in listdir(self.spark, p)
        ]

    def read_text(self, p: str) -> str:
        return read_text(self.spark, p)

    def replace_text(self, p: str, text: str) -> None:
        replace_text(self.spark, p, text)

    def remove_file(self, p: str) -> None:
        delete(self.spark, p)

    def rename(self, src: str, dst: str) -> bool:
        return rename(self.spark, src, dst)

    def rmtree(self, p: str) -> None:
        delete(self.spark, p)

    def mkdirs(self, p: str) -> None:
        mkdirs(self.spark, p)

    def stat_token(self, p: str):
        return stat_token(self.spark, p)


def resolve_ops(spark=None):
    """Hadoop-FS ops when a session is at hand (every sink and every
    spark-taking reader), driver-local POSIX ops otherwise (bare-path
    helpers keep working with no session)."""
    return HadoopOps(spark) if spark is not None else PosixOps()
