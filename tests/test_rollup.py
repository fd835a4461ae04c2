"""Multi-resolution rollup (operators/rollup.py): the continuous-
aggregate lattice must (a) reproduce direct aggregation at every
grain and (b) scan the raw table exactly once — every coarser grain
reads the cached finest partials, not the source."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, normalize
from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import rollup


def test_reaggregate_equals_direct(spark):
    """sum/count/min/max folded from 1-min partials == the same aggs
    computed directly at 10-min grain (decomposable-agg algebra)."""
    events = io.load(spark, SF_DIR, "events")
    fine = rollup.windowed_partials(events, 1)
    rolled = rollup.reaggregate(fine, 10)
    direct = rollup.windowed_partials(events, 10)
    got = normalize(rolled.toPandas())
    want = normalize(direct.toPandas())
    # float sums may differ in last ulps from fold order; compare
    # exactly on the integer state and to 1e-9 on the sums.
    import pandas as pd

    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_lattice_scans_raw_once(spark):
    """The unioned lattice plan must serve every coarse grain from the
    InMemory finest partials; the parquet source appears only inside
    the cached relation's build, never as a live scan per branch."""
    events = io.load(spark, SF_DIR, "events")
    df = rollup.rollup_lattice(events)
    df.count()  # materialize the cache
    plan = df._jdf.queryExecution().executedPlan().toString()
    # three grain branches, each reading the cached partials
    assert plan.count("InMemoryTableScan") >= 3


def test_grain_windows_nest(spark):
    """Every 10m window start is a multiple of 600s; every row of the
    coarse grain is the fold of its fine children (row-count checks)."""
    events = io.load(spark, SF_DIR, "events")
    out = rollup.rollup_lattice(events)
    bad = out.filter(
        (F.col("grain") == "10m")
        & (F.unix_timestamp("window_start") % 600 != 0)
    ).count()
    assert bad == 0
    # n is conserved across grains: total event count identical per grain
    totals = {
        r["grain"]: r["total"]
        for r in out.groupBy("grain").agg(F.sum("n").alias("total")).collect()
    }
    assert totals["1m"] == totals["10m"] == totals["60m"]


def test_streaming_partials_reaggregate_to_batch_coarse(spark, tmp_path):
    """Continuous-aggregate maintenance: streaming 1-min finals
    (append mode), batch-reaggregated to 10-min, must equal the
    direct batch 10-min agg for every closed window."""
    import pandas as pd
    from pyspark.sql import Window

    from ts_data_pipeline_spark.streaming import windowed

    events = io.load(spark, SF_DIR, "events").select(
        "ts", "event_type", "value"
    )
    data_dir = str(tmp_path / "data")
    chunks = events.withColumn("chunk", F.ntile(3).over(Window.orderBy("ts")))
    for i in (1, 2, 3):
        chunks.filter(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "append"
        ).parquet(data_dir)

    stream = windowed.parquet_stream(spark, data_dir, events.schema, max_files=1)
    agg = windowed.streaming_rollup_partials(stream, minutes=1)
    windowed.run_available_now(agg, "t_rollup_finals", str(tmp_path / "ckpt"))
    finals = spark.table("t_rollup_finals")
    assert finals.count() > 0

    rolled = rollup.reaggregate(finals, 10).toPandas()
    direct = rollup.windowed_partials(events, 10).toPandas()
    # streaming append emits only closed windows; restrict the batch
    # expectation to the coarse windows fully covered by emitted fines
    emitted = set(rolled["window_start"])
    direct = direct[direct["window_start"].isin(emitted)]
    key = ["window_start", "key"]
    got = rolled.sort_values(key, ignore_index=True)
    want = direct.sort_values(key, ignore_index=True)
    # a coarse window at the tail may be partially covered (trailing
    # fine windows unemitted) -> compare only coarse windows whose
    # fine coverage is complete, i.e. counts match
    merged = got.merge(want, on=key, suffixes=("_s", "_b"))
    full = merged[merged["n_s"] == merged["n_b"]]
    assert len(full) > 0
    pd.testing.assert_frame_equal(
        full[["v_sum_s", "v_min_s", "v_max_s"]].rename(
            columns=lambda c: c[:-2]
        ),
        full[["v_sum_b", "v_min_b", "v_max_b"]].rename(
            columns=lambda c: c[:-2]
        ),
        check_exact=False,
        rtol=0,
        atol=1e-9,
    )


def test_ewma_hand_computed_and_bounded(spark):
    """Three points, lam=0.5, lookback=2: weights fold oldest-first
    exactly; the window caps history at lookback+1 values."""
    import datetime as dt

    from ts_data_pipeline_spark.operators import tsstats

    base = dt.datetime(2024, 1, 1)
    rows = [(i, 1, base + dt.timedelta(minutes=i), float(v))
            for i, v in enumerate([10.0, 20.0, 40.0, 80.0])]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: r.ewma
        for r in tsstats.ewma(df, lam=0.5, lookback=2).collect()
    }
    # t0: [10] -> 10; t1: (0.5*10+20)/1.5; t2: (0.25*10+0.5*20+40)/1.75
    # t3 (window caps at 3 values): (0.25*20+0.5*40+80)/1.75
    assert got[0] == 10.0
    assert got[1] == round(25 / 1.5, 4)
    assert got[2] == round(52.5 / 1.75, 4)
    assert got[3] == round(105 / 1.75, 4)


def test_autocorrelation_perfect_on_linear_series(spark):
    """A strictly increasing linear series has ACF ~ 1 at every lag;
    an alternating series has ACF -1 at lag 1 and +1 at lag 2."""
    import datetime as dt

    from ts_data_pipeline_spark.operators import tsstats

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append((i, "lin", base + dt.timedelta(minutes=i), float(i)))
        rows.append((100 + i, "alt", base + dt.timedelta(minutes=i),
                     1.0 if i % 2 == 0 else -1.0))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    got = {
        (r.key, r.lag): r.acf
        for r in tsstats.autocorrelation(df, lags=[1, 2]).collect()
    }
    assert got[("lin", 1)] == 1.0 and got[("lin", 2)] == 1.0
    assert got[("alt", 1)] == -1.0 and got[("alt", 2)] == 1.0


def test_streaming_rollup_into_versioned_table(spark, tmp_path):
    """Composition: the streaming finest-grain partials maintained in
    the versioned upsert table (continuous aggregate with a durable,
    atomically-versioned store). Emitted finals are append-once per
    (window, key), so the upsert is a pure keyed insert; the final
    table must equal the batch partials restricted to closed windows."""
    from pyspark.sql import Window

    from ts_data_pipeline_spark.streaming import upsert_sink, windowed

    events = io.load(spark, SF_DIR, "events").select(
        "ts", "event_type", "value"
    )
    data_dir = str(tmp_path / "data")
    chunks = events.withColumn("chunk", F.ntile(3).over(Window.orderBy("ts")))
    for i in (1, 2, 3):
        chunks.filter(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "append"
        ).parquet(data_dir)

    stream = windowed.parquet_stream(spark, data_dir, events.schema, max_files=1)
    agg = windowed.streaming_rollup_partials(stream, minutes=1).withColumn(
        "upsert_key",
        F.concat_ws("|", F.col("window_start").cast("string"), "key"),
    )
    table_dir = str(tmp_path / "table")
    q = (
        agg.writeStream.foreachBatch(
            upsert_sink.upsert_writer(
                table_dir, key_col="upsert_key", ts_col="window_start"
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    table = upsert_sink.read_table(spark, table_dir)
    got = {
        (r.window_start, r.key): (r.n, round(r.v_sum, 6))
        for r in table.collect()
    }
    assert got
    batch = {
        (r.window_start, r.key): (r.n, round(r.v_sum, 6))
        for r in rollup.windowed_partials(events, 1).collect()
    }
    # every stored row matches the batch value exactly; only trailing
    # (unclosed) windows may be absent
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch[k])
    assert len(got) >= len(batch) * 0.9


def test_refresh_coarse_recomputes_only_affected_windows(spark):
    """Late data lands in two fine windows: the incremental refresh
    must emit exactly the affected coarse (window, key) groups, with
    values equal to a full recompute of those groups."""
    events = io.load(spark, SF_DIR, "events")
    fine = rollup.windowed_partials(events, 1)
    # pretend the first two fine windows of 'click' changed
    changed = (
        fine.filter(F.col("key") == "click")
        .orderBy("window_start")
        .limit(2)
        .select("window_start", "key")
    )
    out = rollup.refresh_coarse(fine, changed, 10).collect()
    full = {
        (r.window_start, r.key): (r.n, r.v_sum, r.v_min, r.v_max)
        for r in rollup.reaggregate(fine, 10).collect()
    }
    # expected coarse windows: floor each changed fine window with the
    # SAME expression the operator uses
    expect_windows = {
        (r.cw, r.key)
        for r in changed.select(
            F.timestamp_seconds(
                (F.unix_timestamp("window_start") / 600).cast("bigint") * 600
            ).alias("cw"),
            "key",
        ).collect()
    }
    got_keys = {(r.window_start, r.key) for r in out}
    assert got_keys == expect_windows
    for r in out:
        assert (r.n, r.v_sum, r.v_min, r.v_max) == full[(r.window_start, r.key)]


def test_histogram_degenerate_range_all_one_bin(spark):
    from ts_data_pipeline_spark.operators import tsstats

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0)], "event_type string, value double"
    )
    rows = tsstats.value_histogram(df, n_bins=10).collect()
    assert {r.bin for r in rows} == {0}
    assert sum(r.n for r in rows) == 3


def test_funnel_conversion_hand_computed(spark):
    """view->purchase within 60m: conversion only via the FIRST
    later purchase; same-ts later-id purchase counts; outside-window
    purchase does not."""
    import datetime as dt

    from ts_data_pipeline_spark.operators import tsstats

    t = lambda m: dt.datetime(2024, 1, 1, 10) + dt.timedelta(minutes=m)
    rows = [
        (1, 1, t(0), "view"),      # converts via purchase at t(30)
        (2, 1, t(30), "purchase"),
        (3, 1, t(31), "view"),     # no later purchase -> not converted
        (4, 2, t(0), "view"),      # purchase 90m later -> outside window
        (5, 2, t(90), "purchase"),
        (6, 3, t(5), "purchase"),  # purchase BEFORE the view never counts
        (7, 3, t(6), "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r.event_id: (r.converted, r.converted_at)
        for r in tsstats.funnel_conversions(df, "view", "purchase", 60).collect()
    }
    assert got[1] == (True, t(30))
    assert got[3] == (False, None)
    assert got[4] == (False, t(90))  # found but outside the window
    assert got[7] == (False, None)


def test_cohort_retention_counts(spark):
    """Two cohorts a week apart; second-week activity of the first
    cohort shows as periods_later=1."""
    import datetime as dt

    from ts_data_pipeline_spark.operators import tsstats

    d = lambda day, u: (u * 100 + day, u, dt.datetime(2024, 1, day, 12))
    rows = [d(1, 1), d(1, 2), d(9, 1), d(9, 3)]  # u3 first active wk2
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r.cohort_period, r.periods_later): r.n_active
        for r in tsstats.cohort_retention(df, period_days=7).collect()
    }
    base = min(p for p, _ in got)
    assert got[(base, 0)] == 2       # u1, u2 in cohort week 0
    assert got[(base, 1)] == 1       # only u1 returned
    assert got[(base + 1, 0)] == 1   # u3's own cohort


def test_session_paths_hand_computed(spark):
    """Two sessions for one user (split by the gap), one for another:
    paths keep event order within a session."""
    import datetime as dt

    from ts_data_pipeline_spark.operators import tsstats

    t = lambda m: dt.datetime(2024, 1, 1, 10) + dt.timedelta(minutes=m)
    rows = [
        (1, 1, t(0), "view"), (2, 1, t(1), "purchase"),   # session 1
        (3, 1, t(90), "view"),                            # session 2 (gap)
        (4, 2, t(0), "view"), (5, 2, t(2), "purchase"),   # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r.path: (r.n_sessions, r.rank)
        for r in tsstats.session_paths(df, gap_minutes=30.0).collect()
    }
    assert got == {"view>purchase": (2, 1), "view": (1, 2)}
