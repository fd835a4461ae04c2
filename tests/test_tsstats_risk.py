"""CUSUM changepoint + drawdown/volatility operator pins.

The CUSUM closed form (cum - min(0, running_min(cum))) must equal
Page's clamped recursion row for row, and both operators must plan as
INCREMENTAL running frames over ONE per-key exchange — never a
shrinking/lookahead frame (the O(n^2) class fixed this round in
funnel/asof/interp).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ts_data_pipeline_spark.operators import tsstats


def _events(spark, values, key="k"):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), key, float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_cusum_matches_clamped_recursion(spark):
    vals = [50, 50, 120, 130, 140, 10, 5, 50, 300, 2, 2, 2, 2, 90]
    df = _events(spark, vals)
    out = (
        tsstats.cusum_changepoints(
            df, target=50.0, slack=5.0, threshold=100.0
        )
        .orderBy("ts")
        .collect()
    )
    sp = sn = 0.0
    for row, v in zip(out, vals):
        sp = max(0.0, sp + (v - 55.0))
        sn = max(0.0, sn + (45.0 - v))
        assert abs(row["s_pos"] - round(sp, 4)) < 1e-9
        assert abs(row["s_neg"] - round(sn, 4)) < 1e-9
        assert row["alarm_pos"] == (sp > 100.0)
        assert row["alarm_neg"] == (sn > 100.0)


def test_cusum_summary_counts_and_first_alarm(spark):
    # One engineered positive drift: three +100 deviations in a row.
    vals = [50.0] * 5 + [150.0, 160.0, 170.0] + [50.0] * 5
    df = _events(spark, vals)
    got = tsstats.cusum_summary(
        df, target=50.0, slack=5.0, threshold=150.0
    ).collect()
    assert len(got) == 1
    r = got[0]
    # S+ after the burst: 95 + 105 + 115 = 315 (minus 5 slack each).
    assert r["max_s_pos"] == 315.0
    assert r["n_alarms_pos"] > 0 and r["n_alarms_neg"] == 0
    # First alarm is the second burst row (95 + 105 = 200 > 150).
    assert r["first_alarm_ts"] == dt.datetime(2024, 1, 1, 0, 6)


def test_drawdown_features_semantics(spark):
    vals = [10.0, 8.0, 12.0, 4.0, 12.0, 20.0]
    df = _events(spark, vals)
    out = (
        tsstats.drawdown_features(
            df, key_col="event_type", vol_window=2
        )
        .orderBy("ts")
        .collect()
    )
    assert [r["run_max"] for r in out] == [10, 10, 12, 12, 12, 20]
    assert [r["drawdown"] for r in out] == [0.0, 2.0, 0.0, 8.0, 0.0, 0.0]
    assert [r["at_peak"] for r in out] == [True, False, True, False, True, True]
    # Trailing stddev over frame (-2, 0): row 3 sees [8, 12, 4].
    import statistics

    assert out[3]["roll_vol"] == round(statistics.stdev([8, 12, 4]), 4)


def test_risk_windows_plan_incremental_single_exchange(spark):
    """Both operators: no lookahead frame, and ALL window passes share
    one per-key exchange + sort (chained Window operators)."""
    df = _events(spark, [float(i % 7) for i in range(50)])
    for op in (
        tsstats.cusum_changepoints(df),
        tsstats.drawdown_features(df, key_col="event_type"),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString().lower()
        assert "unboundedfollowing" not in plan
        assert plan.count("exchange hashpartitioning") == 1


def test_cusum_closed_form_identity_property():
    """Property: the window-expressible closed form
    ``cum_t - min(0, running_min(cum))`` equals Page's clamped
    recursion for ANY series — the algebraic fact the operator rests
    on, fuzzed over adversarial float series (no Spark round-trip;
    the Spark expression of the same algebra is pinned above)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            max_size=60,
        ),
        st.floats(-100, 100, allow_nan=False),
    )
    def check(deviations, drift):
        ds = [d + drift for d in deviations]
        s_rec, cum, run_min = 0.0, 0.0, 0.0
        for d in ds:
            s_rec = max(0.0, s_rec + d)
            cum += d
            run_min = min(run_min, cum)
            s_closed = cum - min(0.0, run_min)
            # different arithmetic, same value up to accumulation ulps
            assert abs(s_closed - s_rec) <= 1e-6 * max(
                1.0, abs(cum), abs(s_rec)
            ), (ds, s_rec, s_closed)

    check()


def test_funnel_path_chain_semantics(spark):
    """Multi-stage funnel: greedy earliest at-or-after matching,
    chain death propagation (a dead stage nulls all later stages and
    never resurrects an earlier event), horizon checked on the FINAL
    stage timestamp."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        # u1: view@0 -> click@5 -> purchase@8 : completes (within 10)
        (0, 1, m(0), "view"), (1, 1, m(5), "click"), (2, 1, m(8), "purchase"),
        # u1: view@6 -> no further click: dies at stage 1, and must
        # NOT match the purchase@8 directly (stage order enforced)
        (3, 1, m(6), "view"),
        # u2: purchase BEFORE the click — chain must not go backward:
        # view@0 -> click@4 -> (purchase@2 is before click) -> dies
        (10, 2, m(0), "view"), (11, 2, m(2), "purchase"), (12, 2, m(4), "click"),
        # u3: completes but outside the horizon (purchase@30)
        (20, 3, m(0), "view"), (21, 3, m(1), "click"), (22, 3, m(30), "purchase"),
        # u4: two views share the same click (greedy reuse is fine)
        (30, 4, m(0), "view"), (31, 4, m(1), "view"),
        (32, 4, m(2), "click"), (33, 4, m(3), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["event_id"]: r
        for r in tsstats.funnel_path(df, ["view", "click", "purchase"], 10)
        .collect()
    }
    assert len(got) == 6  # one row per view
    assert got[0]["completed"] and got[0]["ts_2_purchase"] == m(8)
    assert not got[3]["completed"] and got[3]["ts_1_click"] is None
    assert got[3]["ts_2_purchase"] is None  # death propagates
    assert not got[10]["completed"] and got[10]["ts_1_click"] == m(4)
    assert got[10]["ts_2_purchase"] is None  # no backward chain
    assert not got[20]["completed"]  # chain exists but beyond horizon
    assert got[20]["ts_2_purchase"] == m(30)  # witness still reported
    assert got[30]["completed"] and got[31]["completed"]
    assert got[30]["ts_1_click"] == got[31]["ts_1_click"] == m(2)
    # stage timestamps are monotone wherever non-null
    for r in got.values():
        if r["ts_2_purchase"] is not None:
            assert r["ts"] <= r["ts_1_click"] <= r["ts_2_purchase"]


def test_seasonal_anomalies_judge_against_own_hour(spark):
    """Seasonal decomposition (operators/tsstats.py): a value normal
    for 9 AM but extreme for 3 AM must be flagged only in the 3 AM
    slot — the flat all-day z-score would either flag both or
    neither; and slots below min_n or with zero variance never
    score."""
    import datetime as dt

    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import tsstats

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    # 40 days: 9 AM runs hot (mean 100, sd ~2), 3 AM runs cold
    # (mean 10, sd ~2); day 39 injects value 100 into BOTH slots
    for day in range(40):
        v9 = 100.0 + (day % 5 - 2)
        v3 = 10.0 + (day % 5 - 2)
        if day == 39:
            v9, v3 = 100.0, 100.0  # normal at 9, wild at 3
        rows.append(Row(event_id=eid, event_type="m",
                        ts=base + dt.timedelta(days=day, hours=9),
                        value=v9)); eid += 1
        rows.append(Row(event_id=eid, event_type="m",
                        ts=base + dt.timedelta(days=day, hours=3),
                        value=v3)); eid += 1
    # a tiny slot (hour 23, n=2 < min_n) with a huge outlier
    rows.append(Row(event_id=9000, event_type="m",
                    ts=base + dt.timedelta(hours=23), value=1.0))
    rows.append(Row(event_id=9001, event_type="m",
                    ts=base + dt.timedelta(days=1, hours=23),
                    value=99999.0))
    df = spark.createDataFrame(rows)

    prof = {(r.key, r.hod): (r.n, r.mu, r.sd)
            for r in tsstats.seasonal_hour_profile(df).collect()}
    assert prof[("m", 9)][0] == 40 and prof[("m", 3)][0] == 40

    got = {r.event_id: (r.hod, r.z)
           for r in tsstats.seasonal_anomalies(df).collect()}
    flagged_hours = {h for h, _ in got.values()}
    assert 3 in flagged_hours          # the 3 AM injection flags
    assert 9 not in flagged_hours      # the same value at 9 AM is normal
    assert 23 not in flagged_hours     # n=2 < min_n: never scored
    assert all(abs(z) >= 3.0 for _, z in got.values())


def test_time_weighted_avg_hold_semantics(spark):
    """TWA (operators/tsstats.py::time_weighted_avg): a value that
    HELD for most of the bucket dominates a burst of ticks — exact
    hand-computed holds; bucket-end clipping; single-sample bucket
    reports the sample's value; NULL values drop."""
    import datetime as dt

    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import tsstats

    h = dt.datetime(2024, 1, 1, 10, 0)
    s = lambda k: h + dt.timedelta(seconds=k)
    rows = [
        # key A, bucket 10:00: v=10 holds 0..3000s, then ten v=100
        # ticks one second apart, last tick holds to bucket end
        Row(event_id=0, event_type="A", ts=s(0), value=10.0),
    ] + [
        Row(event_id=1 + i, event_type="A", ts=s(3000 + i), value=100.0)
        for i in range(10)
    ] + [
        # key A next bucket: single sample at the midpoint -> twa
        # equals the sample (coverage = bucket_end - its ts)
        Row(event_id=50, event_type="A", ts=s(3600 + 1800), value=42.0),
        # key B: a NULL value is dropped entirely
        Row(event_id=60, event_type="B", ts=s(0), value=None),
        Row(event_id=61, event_type="B", ts=s(100), value=7.0),
    ]
    out = {
        (r.key, r.bucket): (r.n, r.coverage_us, r.weighted_sum, r.twa)
        for r in tsstats.time_weighted_avg(
            spark.createDataFrame(rows), bucket_minutes=60
        ).collect()
    }
    b0 = int(s(0).timestamp() * 1_000_000) // 3_600_000_000
    # bucket 0: 10 holds 3000s, nine 100-ticks hold 1s each, the
    # last 100-tick holds 3600-3009=591s; coverage 3600s
    n, cov, wsum, twa = out[("A", b0)]
    assert n == 11 and cov == 3_600_000_000
    expect = 10.0 * 3000e6 + 100.0 * 9e6 + 100.0 * 591e6
    assert wsum == expect, (wsum, expect)
    assert abs(twa - expect / 3600e6) < 1e-4
    # bucket 1: single midpoint sample -> twa == its value
    n1, cov1, _, twa1 = out[("A", b0 + 1)]
    assert n1 == 1 and cov1 == 1_800_000_000 and twa1 == 42.0
    # key B: the NULL row vanished; the 7.0 holds to bucket end
    nb, covb, _, twab = out[("B", b0)]
    assert nb == 1 and twab == 7.0 and covb == 3_500_000_000


def test_counter_increase_reset_semantics(spark):
    """Counter increase (operators/tsstats.py::counter_increase):
    monotonic deltas sum; a reset (value drops) contributes the
    post-reset value (restarted-from-zero estimator) and increments
    n_resets; the first-ever sample contributes nothing; boundary
    deltas attach to the bucket of the LATER sample."""
    import datetime as dt

    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import tsstats

    h = dt.datetime(2024, 1, 1, 10, 0)
    m = lambda k: h + dt.timedelta(minutes=k)
    rows = [
        Row(event_id=0, event_type="c", ts=m(0), value=100.0),
        Row(event_id=1, event_type="c", ts=m(10), value=150.0),  # +50
        Row(event_id=2, event_type="c", ts=m(20), value=30.0),   # RESET +30
        Row(event_id=3, event_type="c", ts=m(30), value=80.0),   # +50
        # next bucket: boundary delta 80 -> 90 lands HERE
        Row(event_id=4, event_type="c", ts=m(70), value=90.0),   # +10
    ]
    out = {
        (r.key, r.bucket): (r.n_samples, r.n_resets, r.increase)
        for r in tsstats.counter_increase(
            spark.createDataFrame(rows), bucket_minutes=60
        ).collect()
    }
    b0 = int(h.timestamp() * 1_000_000) // 3_600_000_000
    assert out[("c", b0)] == (4, 1, 130.0)       # 50 + 30 + 50
    assert out[("c", b0 + 1)] == (1, 0, 10.0)    # boundary delta kept


def test_heartbeat_gaps_detects_silence(spark):
    """Gap scan (operators/tsstats.py::heartbeat_gaps): only
    silences beyond the threshold report, bounds are the flanking
    samples, and the trailing open interval never reports."""
    import datetime as dt

    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import tsstats

    h = dt.datetime(2024, 1, 1, 10, 0)
    m = lambda k: h + dt.timedelta(minutes=k)
    rows = [
        Row(event_id=0, event_type="g", ts=m(0)),
        Row(event_id=1, event_type="g", ts=m(10)),   # 10 min: fine
        Row(event_id=2, event_type="g", ts=m(100)),  # 90 min: GAP
        Row(event_id=3, event_type="g", ts=m(105)),
    ]
    got = [
        (r.key, r.gap_start, r.gap_end, r.gap_us)
        for r in tsstats.heartbeat_gaps(
            spark.createDataFrame(rows), gap_minutes=30
        ).collect()
    ]
    assert got == [("g", m(10), m(100), 90 * 60_000_000)]


def test_bucket_floor_semantics_negative_epoch(spark):
    """ADVICE r7: pre-1970 timestamps must land in the FLOOR bucket
    on BOTH engines. Spark's old (ts/b).cast('bigint') truncated
    toward zero, and DuckDB's integer `//` ALSO truncates (measured:
    -1 // 3600 = 0) — both now use the exact pmod-floor formula, so
    a sample at 1969-12-31 23:59 belongs to bucket -1, not 0, and
    the two engines agree on it."""
    import datetime as dt

    import duckdb
    import pandas as pd
    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import tsstats

    t = lambda k: dt.datetime(1969, 12, 31, 23, 0) + dt.timedelta(minutes=k)
    rows = [
        Row(event_id=0, event_type="n", ts=t(0), value=5.0),    # -60 min
        Row(event_id=1, event_type="n", ts=t(30), value=9.0),   # -30 min
        Row(event_id=2, event_type="n", ts=t(90), value=12.0),  # +30 min
    ]
    df = spark.createDataFrame(rows)

    twa = {
        (r.key, r.bucket) for r in
        tsstats.time_weighted_avg(df, bucket_minutes=60).collect()
    }
    inc = {
        (r.key, r.bucket) for r in
        tsstats.counter_increase(df, bucket_minutes=60).collect()
    }
    # floor: the two pre-epoch samples -> bucket -1, the post -> 0
    assert twa == {("n", -1), ("n", 0)}
    assert inc == {("n", -1), ("n", 0)}

    # cross-engine: the DuckDB twins on the same rows agree exactly
    pdf = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "event_type": ["n", "n", "n"],
            "ts": [t(0), t(30), t(90)],
            "value": [5.0, 9.0, 12.0],
        }
    )
    con = duckdb.connect()
    con.register("events", pdf)
    for fn, sql in (
        (tsstats.time_weighted_avg, tsstats.time_weighted_avg_sql()),
        (tsstats.counter_increase, tsstats.counter_increase_sql()),
    ):
        got = sorted(
            tuple(r) for r in fn(df, bucket_minutes=60)
            .toPandas().itertuples(index=False)
        )
        want = sorted(
            tuple(r) for r in con.execute(sql).df().itertuples(index=False)
        )
        assert got == want, (fn.__name__, got, want)
    con.close()
