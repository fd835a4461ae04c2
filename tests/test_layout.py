"""Z-order layout (operators/layout.py): zone-map soundness, pruning
effectiveness vs a single-dim layout, and real partition pruning on
the written parquet directories."""

from __future__ import annotations

import contextlib
import io as _io
import os

from pyspark.sql import functions as F

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import layout

SF = "/root/testdata/sf0.001"
RECT = dict(x_lo=100, x_hi=500, y_lo=1_000, y_hi=30_000)


def test_zone_map_sound_and_prunes(spark):
    """(a) Soundness: every row inside the query rectangle lives in a
    cell marked scanned — skipping unscanned cells can never lose a
    result row. (b) Effectiveness: the rectangle leaves a real
    fraction of cells unscanned under the Z layout."""
    orders = io.load(spark, SF, "orders")
    zm = layout.zone_map_prune(
        orders, "o_custkey", "o_orderkey", **RECT
    ).cache()

    scanned_cells = {
        r.cell for r in zm.filter("scanned").select("cell").collect()
    }
    total_cells = zm.count()
    assert 0 < len(scanned_cells) < total_cells  # real pruning

    rows = layout.with_zcell(
        orders, "o_custkey", "o_orderkey"
    ).withColumn("cell", F.shiftright("zcell", 8))
    in_rect = rows.filter(
        (F.col("o_custkey") >= RECT["x_lo"])
        & (F.col("o_custkey") <= RECT["x_hi"])
        & (F.col("o_orderkey") >= RECT["y_lo"])
        & (F.col("o_orderkey") <= RECT["y_hi"])
    )
    cells_with_hits = {r.cell for r in in_rect.select("cell").distinct().collect()}
    assert cells_with_hits <= scanned_cells


def test_zorder_beats_single_dim_layout(spark):
    """The point of Z-order: a rectangle selective in BOTH dims
    prunes under Z, while an x-only layout cannot prune a predicate
    on y. Compare cells scanned for a y-only band (all x)."""
    orders = io.load(spark, SF, "orders")
    y_band = dict(x_lo=0, x_hi=10**9, y_lo=1_000, y_hi=5_000)

    zm = layout.zone_map_prune(orders, "o_custkey", "o_orderkey", **y_band)
    z_scanned = zm.filter("scanned").count()
    z_total = zm.count()

    # single-dim layout: cells are ranges of x only; every cell spans
    # the full y range, so the y band scans ALL cells
    xs = orders.select(F.col("o_custkey").alias("x"),
                       F.col("o_orderkey").alias("y"))
    x_cells = xs.withColumn("cell", F.expr("x div 64")).groupBy("cell").agg(
        F.min("y").alias("y_min"), F.max("y").alias("y_max")
    )
    x_scanned = x_cells.filter(
        ~((F.col("y_max") < y_band["y_lo"]) | (F.col("y_min") > y_band["y_hi"]))
    ).count()
    x_total = x_cells.count()

    assert z_scanned / z_total < 1.0
    assert x_scanned == x_total  # x-layout cannot skip on y
    assert z_scanned / z_total < x_scanned / x_total


def test_zorder_write_partition_pruning(spark, tmp_path):
    """zorder_write materializes zdir directories; a rectangle read
    with the matching zdir set hits Spark partition pruning
    (PartitionFilters, fewer input files) and returns exactly the
    plain-scan result."""
    orders = io.load(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "zorders")
    stats = layout.zorder_write(orders, path, "o_custkey", "o_orderkey",
                                bits=8, cell_shift=10)

    ndirs = len([d for d in os.listdir(path) if d.startswith("zdir=")])
    assert ndirs > 4

    back = spark.read.parquet(path)
    rect = (
        (F.col("o_custkey") >= RECT["x_lo"])
        & (F.col("o_custkey") <= RECT["x_hi"])
        & (F.col("o_orderkey") >= RECT["y_lo"])
        & (F.col("o_orderkey") <= RECT["y_hi"])
    )
    # the layout is self-describing: plan the directory set from the
    # persisted sidecar alone — NO rescan of the source
    assert layout.read_zorder_stats(path) == stats
    dirs = layout.zdirs_for_rect(stats, **RECT)
    assert len(dirs) < ndirs  # the rectangle needs only a subset

    pruned = back.filter(F.col("zdir").isin(dirs)).filter(rect)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "zdir" in plan

    expect = sorted(
        (r.o_orderkey, r.o_custkey) for r in orders.filter(rect).collect()
    )
    got = sorted((r.o_orderkey, r.o_custkey) for r in pruned.collect())
    assert got == expect


def test_zorder_compact_rewrites_only_touched_dirs(spark, tmp_path):
    """zorder_compact: (a) rows land in the pinned-frame layout and
    read-back equals base UNION delta, (b) untouched zdir directories
    are not rewritten (file mtimes unchanged), (c) write I/O is
    delta-scoped — only the touched dirs change. Out-of-frame delta
    values clamp onto edge cells instead of creating off-grid dirs."""
    import time

    from ts_data_pipeline_spark.operators.layout import zorder_compact

    orders = io.load(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "ztab")
    layout.zorder_write(orders, path, "o_custkey", "o_orderkey",
                        bits=8, cell_shift=10)

    def dir_sig(d):
        full = os.path.join(path, d)
        return sorted(
            (f, os.path.getmtime(os.path.join(full, f)))
            for f in os.listdir(full)
            if not f.startswith(".")
        )

    before = {
        d: dir_sig(d)
        for d in os.listdir(path)
        if d.startswith("zdir=")
    }

    # a tight delta (two close points) + one out-of-frame row that
    # must clamp to an edge cell
    top = orders.agg(F.max("o_custkey"), F.max("o_orderkey")).collect()[0]
    delta = spark.createDataFrame(
        [
            (900001, 150, 1.0),
            (900002, 151, 2.0),
            (900003, int(top[0]) * 10, 3.0),  # off-frame x -> clamps
        ],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    time.sleep(1.1)  # mtime resolution
    touched = zorder_compact(spark, path, delta)
    assert 0 < len(touched) < len(before)

    after = {
        d: dir_sig(d)
        for d in os.listdir(path)
        if d.startswith("zdir=")
    }
    assert set(after) == set(before)  # clamping: no new off-grid dirs
    for d, sig in before.items():
        zd = int(d.split("=")[1])
        if zd in touched:
            assert after[d] != sig, d
        else:
            assert after[d] == sig, d

    back = spark.read.parquet(path).drop("zdir")
    want = sorted(
        (r.o_orderkey, r.o_custkey)
        for r in orders.unionByName(delta).collect()
    )
    got = sorted((r.o_orderkey, r.o_custkey) for r in back.collect())
    assert got == want


def test_zdirs_for_rect_plans_clamped_edge_cells(spark, tmp_path):
    """Regression (round-6 review): out-of-frame delta rows clamp
    into edge cells; a rectangle extending past the frame must plan
    those edge dirs — quantizing the clamped VALUE instead returned
    [] and silently lost the compacted row."""
    from ts_data_pipeline_spark.operators.layout import zorder_compact

    base = spark.createDataFrame(
        [(i, i % 100, float(i)) for i in range(1000)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    path = str(tmp_path / "ztab")
    stats = layout.zorder_write(base, path, "o_custkey", "o_orderkey",
                                bits=8, cell_shift=10)

    delta = spark.createDataFrame(
        [(5000, 500, 1.0)],  # x=500 far beyond x_max=99 -> clamps
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    touched = zorder_compact(spark, path, delta)

    # a rect that contains the out-of-frame point must plan its dir
    dirs = layout.zdirs_for_rect(stats, x_lo=400, x_hi=600,
                                 y_lo=4000, y_hi=6000)
    assert set(touched) & set(dirs), (touched, dirs)

    back = spark.read.parquet(path).filter(
        (F.col("zdir").isin(dirs))
        & (F.col("o_custkey") >= 400) & (F.col("o_custkey") <= 600)
    )
    assert [r.o_orderkey for r in back.collect()] == [5000]


def test_zdirs_for_rect_matches_cell_enumeration_and_is_cheap():
    """The zdir-grid planner (VERDICT r6 #3) must return EXACTLY the
    set the cell-level enumeration produced, for even and odd shifts
    and rects clamped past the frame — and must do so enumerating the
    zdir grid, cheap enough to run at bits=12 (the cell-level form
    paid 4^12 = 16.7M iterations there)."""
    import itertools
    import time

    def cell_level(stats, x_lo, x_hi, y_lo, y_hi):
        bits, shift = stats["bits"], stats["cell_shift"]
        n_hi = (1 << bits) - 1
        q = layout._quant_py
        xq_lo = 0 if x_lo <= stats["x_min"] else q(
            x_lo, stats["x_min"], stats["x_max"], bits)
        xq_hi = n_hi if x_hi >= stats["x_max"] else q(
            x_hi, stats["x_min"], stats["x_max"], bits)
        yq_lo = 0 if y_lo <= stats["y_min"] else q(
            y_lo, stats["y_min"], stats["y_max"], bits)
        yq_hi = n_hi if y_hi >= stats["y_max"] else q(
            y_hi, stats["y_min"], stats["y_max"], bits)
        dirs = set()
        for xq in range(xq_lo, xq_hi + 1):
            for yq in range(yq_lo, yq_hi + 1):
                code = 0
                for b in range(bits):
                    code |= ((xq >> b) & 1) << (2 * b)
                    code |= ((yq >> b) & 1) << (2 * b + 1)
                dirs.add(code >> shift)
        return sorted(dirs)

    rng = [(0, 999), (100, 450), (7, 8), (-50, 2000), (512, 512)]
    for bits, shift in [(8, 10), (8, 9), (6, 7), (6, 4), (5, 3)]:
        stats = {"bits": bits, "cell_shift": shift,
                 "x_min": 0, "x_max": 999, "y_min": 0, "y_max": 999}
        for (xl, xh), (yl, yh) in itertools.product(rng, rng):
            got = layout.zdirs_for_rect(stats, xl, xh, yl, yh)
            want = cell_level(stats, xl, xh, yl, yh)
            assert got == want, (bits, shift, (xl, xh, yl, yh))

    # planning-cost bound: full-frame rect at bits=12/shift=10 is
    # 4^12 >> 10 = 16k zdir iterations — must be near-instant (the
    # cell form needs 16.7M Morton expansions, ~minutes)
    stats = {"bits": 12, "cell_shift": 10,
             "x_min": 0, "x_max": 10**6, "y_min": 0, "y_max": 10**6}
    t0 = time.perf_counter()
    dirs = layout.zdirs_for_rect(stats, 0, 10**6, 0, 10**6)
    assert time.perf_counter() - t0 < 2.0
    assert len(dirs) == (4 ** 12) >> 10  # every zdir, each exactly once
