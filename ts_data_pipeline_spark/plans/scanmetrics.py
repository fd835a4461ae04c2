"""Physical scan-I/O metrics off the EXECUTED plan.

The pruning operators in this repo (IVF cell partitions —
operators/similarity.py:ivfpq_query_index; Z-order zdir directories —
operators/layout.py; date-partitioned corpus writes —
operators/corpus_io.py) justify themselves with an I/O claim: "this
query reads a FRACTION of the stored relation". Until round 9 that
claim was plan-pinned (``PartitionFilters`` appears in the formatted
plan), which proves the filter is in the right place but not that
bytes stayed on disk. This module turns the claim into a measured
number: execute the plan, then walk the executed physical tree and
sum each file scan's ``filesSize`` (bytes of files actually read,
post partition-pruning) and ``numFiles`` SQL metrics — the same
values the Spark UI's scan node shows.

Used two ways:
- pytest pins (tests/test_scale_patterns.py): assert
  ``pruned_bytes <= fraction * flat_bytes`` and that the pruned scan
  reads exactly the probed directories' bytes (filesystem ground
  truth).
- bench extras: publish ``*_bytes_read_frac`` so the fraction is a
  per-round artifact, not a one-time test result.

py4j traversal notes: under AQE the root is AdaptiveSparkPlanExec
(final plan behind ``executedPlan()``); materialized stages appear as
*QueryStageExec leaves wrapping their real plan behind ``plan()``;
ReusedExchangeExec re-points at an exchange that was already counted
once, so recursing into it would double-count a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _iter_scala_map(jmap):
    it = jmap.iterator()
    while it.hasNext():
        kv = it.next()
        yield kv._1(), kv._2()


def _collect_scans(node, out: list) -> None:
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _collect_scans(node.executedPlan(), out)
        return
    if cls.endswith("QueryStageExec"):
        _collect_scans(node.plan(), out)
        return
    if cls == "ReusedExchangeExec":
        # points at an exchange already reached through its original
        # parent — recursing would double-count its scan metrics
        return
    if cls in ("FileSourceScanExec", "BatchScanExec"):
        out.append(node)
        return
    children = node.children()
    for i in range(children.length()):
        _collect_scans(children.apply(i), out)


def scan_metrics(df: DataFrame, path_contains: str | None = None) -> dict:
    """Execute ``df`` distributed (JVM RDD count — nothing collected
    to the driver) and return the summed file-scan I/O metrics of its
    executed plan.

    ``path_contains`` restricts to scans whose file-index Location
    string contains the substring (e.g. the index's ``codes`` dir),
    so a query that also scans other relations (centroids, queries)
    reports only the relation under test.

    Returns ``{"rows", "bytes_read", "files_read", "num_scans"}``;
    ``bytes_read`` is the scan metric ``filesSize`` — the size of the
    files the scan actually listed after partition pruning.

    CONTRACT: pass a FRESH DataFrame and call this ONCE per plan.
    SQL metric accumulators belong to the QueryExecution and only
    ever accumulate — executing a DataFrame that already ran (or
    calling scan_metrics twice on the same object) double-counts
    filesSize/numFiles and inflates ``bytes_read`` (r9 advisor
    finding; latent — all current callers build the plan inline).
    The assertion below catches a reused plan whose scan metrics are
    already non-zero before this execution.
    """
    qe = df._jdf.queryExecution()
    pre: list = []
    _collect_scans(qe.executedPlan(), pre)
    for node in pre:
        for k, metric in _iter_scala_map(node.metrics()):
            if k == "filesSize" and metric.value() != 0:
                raise ValueError(
                    "scan_metrics requires a fresh, never-executed "
                    "DataFrame: a scan's filesSize accumulator is "
                    "already non-zero, so this plan ran before and "
                    "the metrics would double-count (see docstring)"
                )
    rows = qe.executedPlan().execute().count()
    scans: list = []
    _collect_scans(qe.executedPlan(), scans)
    bytes_read = 0
    files_read = 0
    matched = 0
    for node in scans:
        if path_contains is not None:
            loc = ""
            for k, v in _iter_scala_map(node.metadata()):
                if k == "Location":
                    loc = str(v)
                    break
            if path_contains not in loc:
                continue
        matched += 1
        for k, metric in _iter_scala_map(node.metrics()):
            if k == "filesSize":
                bytes_read += metric.value()
            elif k == "numFiles":
                files_read += metric.value()
    return {
        "rows": rows,
        "bytes_read": bytes_read,
        "files_read": files_read,
        "num_scans": matched,
    }


def dir_bytes(path: str, subdirs: list[str] | None = None) -> int:
    """Filesystem ground truth: total size of the data files under
    ``path`` (or only under the named immediate ``subdirs``),
    ignoring _metadata/_SUCCESS sidecars. Local-FS walk — this is a
    TEST helper; production metrics come from :func:`scan_metrics`.
    """
    import os

    roots = (
        [os.path.join(path, s) for s in subdirs]
        if subdirs is not None
        else [path]
    )
    total = 0
    for root in roots:
        for dirpath, _dirnames, filenames in os.walk(root):
            for f in filenames:
                if f.startswith("_") or f.startswith("."):
                    continue
                total += os.path.getsize(os.path.join(dirpath, f))
    return total
