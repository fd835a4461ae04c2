"""Streaming CEP twins of the batch alerting operators: funnel
(A-followed-by-B within a horizon), rolling z-score anomalies, and
CUSUM drift — the "conversion tracking", "live alert escalation",
and "drift monitoring" primitives, as stateful Structured Streaming
operators.

Both follow the engine's established stateful pattern
(streaming/custom_state.py): ``applyInPandasWithState`` keyed on the
entity, event-time watermark for lateness, buffer-until-final
emission, and an event-time timeout so finals flush when the
watermark advances without new per-key data. The batch operators
(operators/tsstats.funnel_conversions, operators/quality.
rolling_zscore_anomalies) are the oracles: tests/test_streaming.py
pins that every emitted final byte-matches the batch computation of
the same input over the finalized region.

Emission contracts (what a stream CAN finalize):

- ``streaming_funnel`` decides each from-event exactly when the
  watermark passes ``from.ts + within`` — at that instant every
  qualifying to-event is on hand (later arrivals would be late
  beyond the watermark). ``converted_at`` is reported only for
  conversions INSIDE the horizon; the batch operator additionally
  reports the unbounded next to-event for non-conversions, which no
  finite-state stream can finalize (it may lie arbitrarily far in
  the future). The conversion verdict itself is identical.
- ``streaming_zscore_alerts`` finalizes rows strictly below the
  watermark in (ts, id) order, maintaining the trailing ``lookback``
  values per key — the same preceding-rows-only baseline as the
  batch window frame (the current point never contaminates its own
  baseline). Rows arriving after their position was finalized are
  dropped, the same T2 guarantee as the windowed aggregates.

Scale: state per key is bounded — the funnel holds only from-events
inside their open horizon plus to-events younger than
``within`` past the watermark; the z-score holds ``lookback`` values
plus the unfinalized tail. Both are sharded by the groupBy key into
the executor state store, identical placement to the built-in
stateful aggs. The Python hop prices in Arrow batch transfer; the
batch operators remain the default for offline scans (UDFs are the
slow path — these exist because emission TIMING is the product
feature, not the arithmetic).
"""

from __future__ import annotations

import bisect
import json
import math
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("js", T.StringType())])


def _arm_timeout(state: GroupState, want_ms: int, wm: int) -> None:
    """Event-time timeouts must be strictly above the watermark, and
    fire only when the watermark strictly exceeds them — arm 1 ms
    early (same boundary reasoning as custom_state.py) and clamp."""
    state.setTimeoutTimestamp(max(want_ms - 1, wm + 1))


def streaming_funnel(
    events: DataFrame,
    from_event: str,
    to_event: str,
    within_minutes: int,
    *,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    grace: str = "1 second",
) -> DataFrame:
    """Streaming funnel conversion: for each ``from_event``, emit a
    FINAL verdict (converted within ``within_minutes``?) exactly when
    the watermark passes its decision horizon.

    Output: (event_id, key, ts, converted_at, converted) — the batch
    funnel's shape; ``converted_at`` only for in-horizon conversions
    (see module docstring). Matching is the batch convention: the
    first to-event strictly after the from-event in (ts, id) order.
    """
    within_us = within_minutes * 60_000_000
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField("converted_at", T.TimestampType()),
            T.StructField("converted", T.BooleanType()),
        ]
    )

    def fold(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = (
            json.loads(state.get[0])
            if state.exists
            else {"u": "us", "froms": [], "tos": []}
        )
        # All event times are kept at MICROSECOND precision (the
        # batch operator orders by the full timestamp; truncating to
        # the watermark's ms grain would reorder sub-ms neighbors and
        # change baselines/matches). Only the watermark itself is ms.
        # The "u" tag versions the state format: a checkpoint written
        # by the earlier ms-grain code is converted on load instead
        # of silently reinterpreting ms ints as us (1970-era times).
        scale = 1 if st.get("u") == "us" else 1000
        froms = [(i, t * scale) for i, t in st["froms"]]  # [(id, ts_us)]
        # witnesses are kept as a (ts, id) list that is sorted ONCE
        # per micro-batch — appends during ingest, one
        # O((T+A) log (T+A)) sort before the decision loop, then each
        # due from-event finds its first qualifying witness by binary
        # search. That is (F+T)·log T-ish per hot-key micro-batch
        # instead of the F×T Python-level scan a key with F open
        # froms and T in-horizon witnesses used to pay (VERDICT r6
        # #4; an insort-per-arrival variant would quietly reintroduce
        # O(A·T) list shifting). The stored layout stays [(id, ts)]
        # for checkpoint compatibility.
        tos = [(t * scale, i) for i, t in st["tos"]]  # [(ts_us, id)]
        wm = state.getCurrentWatermarkMs() * 1000  # us
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                ts_us = int(rec[ts_col].value // 1_000)
                rid = int(rec[id_col])
                if rec[type_col] == from_event:
                    if ts_us + within_us < wm:
                        continue  # horizon STRICTLY passed: late, drop
                    froms.append((rid, ts_us))
                elif rec[type_col] == to_event:
                    if ts_us + within_us < wm:
                        continue  # can no longer convert any open from
                    tos.append((ts_us, rid))
        tos.sort()
        # decide every from whose horizon the watermark has passed;
        # the to-events it may match are still in state (their evict
        # horizon is >= this from's decision horizon — eviction below
        # happens only after all due decisions).
        rows = []
        still_open = []
        for fid, fts in sorted(froms, key=lambda p: (p[1], p[0])):
            if fts + within_us >= wm:
                # at equality the horizon-closing instant's events are
                # not yet provably late (late means ts < watermark):
                # a witness AT the horizon may still arrive — decide
                # only strictly past (review finding, round 6)
                still_open.append((fid, fts))
                continue
            # first witness strictly after (fts, fid): tos is sorted
            # by (ts, id), so the element at the bisect point is the
            # MINIMUM qualifying candidate; if even that one is past
            # the horizon, every later one is too
            idx = bisect.bisect_right(tos, (fts, fid))
            hit = (
                tos[idx]
                if idx < len(tos) and tos[idx][0] <= fts + within_us
                else None
            )
            rows.append(
                {
                    id_col: fid,
                    "key": key[0],
                    ts_col: pd.Timestamp(fts, unit="us"),
                    "converted_at": (
                        pd.Timestamp(hit[0], unit="us") if hit else pd.NaT
                    ),
                    "converted": hit is not None,
                }
            )
        keep_tos = [(tid, tts) for tts, tid in tos if tts + within_us >= wm]
        if still_open or keep_tos:
            horizons = [fts + within_us for _, fts in still_open] + [
                tts + within_us for _, tts in keep_tos
            ]
            state.update(
                (json.dumps({"u": "us", "froms": still_open,
                             "tos": keep_tos}),)
            )
            # arm at the horizon's floor-ms + 1 (then _arm_timeout's
            # -1 sets exactly floor(h/1000)): event-time timeouts fire
            # when the watermark STRICTLY exceeds the set instant, so
            # this fires at the first watermark that STRICTLY passes
            # the horizon — matching the strict decision rule
            _arm_timeout(state, min(horizons) // 1000 + 1, wm // 1000)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(rows, columns=list(out_schema.fieldNames()))

    return (
        events.withWatermark(ts_col, grace)
        .withColumn("_key", F.col(key_col).cast("string"))
        .groupBy("_key")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_zscore_alerts(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback: int = 20,
    z_threshold: float = 3.0,
    min_history: int = 5,
    grace: str = "1 second",
) -> DataFrame:
    """Streaming rolling z-score alerting: emit each anomalous point
    (|z| >= threshold vs the trailing ``lookback`` points of its own
    key) as soon as the watermark finalizes its position in the
    per-key timeline.

    Identical arithmetic to operators/quality.rolling_zscore_anomalies
    (sample stddev over the preceding <=lookback rows, >= min_history
    required, z rounded 4 dp) — pinned in tests/test_streaming.py.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("n_hist", T.LongType()),
            T.StructField("z", T.DoubleType()),
        ]
    )

    def fold(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = (
            json.loads(state.get[0])
            if state.exists
            else {"u": "us", "buf": [], "hist": []}
        )
        # microsecond event times (see the funnel note: the batch
        # twin orders by the full timestamp, so the ms-grain watermark
        # must not truncate the ordering key); "u" tags the state
        # format so a ms-era checkpoint converts instead of being
        # reinterpreted
        scale = 1 if st.get("u") == "us" else 1000
        buf = [(t * scale, i, v) for t, i, v in st["buf"]]
        hist = [(t * scale, i, v) for t, i, v in st["hist"]]
        wm = state.getCurrentWatermarkMs() * 1000  # us
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                ts_us = int(rec[ts_col].value // 1_000)
                if ts_us < wm:
                    continue  # position already finalized: late, drop
                # NULL values must survive as None, not become NaN:
                # the batch frame counts a null row as a SLOT in the
                # trailing window but excludes it from count/avg/std
                # (Spark aggregates skip nulls) — a NaN would instead
                # poison mu/sd and silently suppress every alert for
                # the next `lookback` rows.
                raw = rec[value_col]
                val = (
                    None
                    if raw is None
                    or (isinstance(raw, float) and math.isnan(raw))
                    else float(raw)
                )
                buf.append((ts_us, int(rec[id_col]), val))
        rows = []
        pending = []
        for ts_us, rid, val in sorted(buf, key=lambda p: (p[0], p[1])):
            if ts_us >= wm:
                pending.append((ts_us, rid, val))
                continue
            vals = [v for _, _, v in hist[-lookback:] if v is not None]
            n = len(vals)  # == batch count(value) over the row frame
            # n >= 2 mirrors the batch twin exactly: stddev_samp over
            # one value is NULL there (no z, row filtered); here the
            # n-1 divisor would raise instead.
            if val is not None and n >= min_history and n >= 2:
                mu = sum(vals) / n
                var = sum((v - mu) ** 2 for v in vals) / (n - 1)
                sd = math.sqrt(var)
                if sd > 0:
                    z = round((val - mu) / sd, 4)
                    if abs(z) >= z_threshold:
                        rows.append(
                            {
                                id_col: rid,
                                "key": key[0],
                                ts_col: pd.Timestamp(ts_us, unit="us"),
                                value_col: val,
                                "n_hist": n,
                                "z": z,
                            }
                        )
            hist.append((ts_us, rid, val))
            hist = hist[-lookback:]
        if pending or hist:
            state.update(
                (json.dumps({"u": "us", "buf": pending, "hist": hist}),)
            )
            if pending:
                # wake when the watermark passes the oldest pending row
                _arm_timeout(
                    state, min(p[0] for p in pending) // 1000 + 1, wm // 1000
                )
        elif state.exists:
            state.remove()
        yield pd.DataFrame(rows, columns=list(out_schema.fieldNames()))

    return (
        events.withWatermark(ts_col, grace)
        .withColumn("_key", F.col(key_col).cast("string"))
        .groupBy("_key")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_cusum_alerts(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    target: float = 50.0,
    slack: float = 5.0,
    threshold: float = 200.0,
    grace: str = "1 second",
) -> DataFrame:
    """Streaming CUSUM drift alerting: emit each finalized point whose
    two-sided CUSUM statistic exceeds ``threshold``, as soon as the
    watermark passes its position in the per-key timeline.

    The stateful twin of operators/tsstats.cusum_changepoints — and
    the case where streaming is the NATURAL form: Page's recursion
    ``S_t = max(0, S_{t-1} + d_t)`` needs exactly TWO floats of state
    per key (the batch operator must re-derive it through running
    window frames; the stream just carries it). Rows are finalized
    strictly below the watermark in (ts, id) order; late rows whose
    position was already folded into the statistic are dropped (T2).

    Matches the batch operator's conventions: null values leave the
    statistic unchanged (Spark's window SUM skips nulls) but still
    occupy a position and still alarm on the carried value; alarms
    compare the UNROUNDED statistic; emitted s values are rounded
    4 dp. The recursion and the batch closed form (cum − running min)
    are algebraically equal but not bit-equal — after deep
    excursions they can differ below ~1e-10, absorbed by the 4-dp
    convention (pinned in tests/test_streaming.py).

    Scale: O(1) state per key plus the unfinalized tail — the
    smallest state of any operator in this module; sharded by key
    into the state store like the built-in stateful aggs.
    """
    hi = float(target) + float(slack)
    lo = float(target) - float(slack)
    thr = float(threshold)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("s_pos", T.DoubleType()),
            T.StructField("s_neg", T.DoubleType()),
            T.StructField("alarm_pos", T.BooleanType()),
            T.StructField("alarm_neg", T.BooleanType()),
        ]
    )

    def fold(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = (
            json.loads(state.get[0])
            if state.exists
            else {"u": "us", "sp": 0.0, "sn": 0.0, "buf": []}
        )
        # microsecond event times; "u" tags the state format (see the
        # funnel note — the ms watermark grain must not truncate the
        # ordering key)
        sp, sn = float(st["sp"]), float(st["sn"])
        buf = [(t, i, v) for t, i, v in st["buf"]]
        wm = state.getCurrentWatermarkMs() * 1000  # us
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                ts_us = int(rec[ts_col].value // 1_000)
                if ts_us < wm:
                    continue  # position already finalized: late, drop
                raw = rec[value_col]
                val = (
                    None
                    if raw is None
                    or (isinstance(raw, float) and math.isnan(raw))
                    else float(raw)
                )
                buf.append((ts_us, int(rec[id_col]), val))
        rows = []
        pending = []
        for ts_us, rid, val in sorted(buf, key=lambda p: (p[0], p[1])):
            if ts_us >= wm:
                pending.append((ts_us, rid, val))
                continue
            if val is not None:
                sp = max(0.0, sp + (val - hi))
                sn = max(0.0, sn + (lo - val))
            if sp > thr or sn > thr:
                rows.append(
                    {
                        id_col: rid,
                        "key": key[0],
                        ts_col: pd.Timestamp(ts_us, unit="us"),
                        value_col: val,
                        "s_pos": round(sp, 4),
                        "s_neg": round(sn, 4),
                        "alarm_pos": sp > thr,
                        "alarm_neg": sn > thr,
                    }
                )
        if pending or sp > 0.0 or sn > 0.0:
            state.update(
                (json.dumps({"u": "us", "sp": sp, "sn": sn, "buf": pending}),)
            )
            if pending:
                _arm_timeout(
                    state, min(p[0] for p in pending) // 1000 + 1, wm // 1000
                )
        elif state.exists:
            state.remove()
        yield pd.DataFrame(rows, columns=list(out_schema.fieldNames()))

    return (
        events.withWatermark(ts_col, grace)
        .withColumn("_key", F.col(key_col).cast("string"))
        .groupBy("_key")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_funnel_path(
    events: DataFrame,
    stages: list[str],
    within_minutes: int,
    *,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    grace: str = "1 second",
) -> DataFrame:
    """Streaming multi-stage funnel — the CEP twin of
    operators/tsstats.funnel_path (MATCH_RECOGNIZE-lite): for every
    ``stages[0]`` event, emit a FINAL verdict when the watermark
    passes its horizon (start ts + within): the greedy at-or-after
    chain's per-stage timestamps while the chain stays inside the
    horizon, and ``completed`` = the full chain fit within it.

    Greedy earliest matching is decision-complete at the horizon:
    every event that could keep a chain inside [ts0, ts0+within] has
    event time <= ts0+within <= watermark, so it is either in state
    or provably late. Like the 2-stage twin, stage timestamps BEYOND
    the horizon (the batch operator's unbounded witnesses for
    incomplete chains) are not finalizable by a stream and are
    reported null; the completed verdict is identical — pinned
    against the batch operator in tests/test_streaming.py.

    State per key is bounded by one horizon's worth of events per
    stage (evicted once ts + within passes the watermark — no start
    deciding later can use them).
    """
    if len(stages) < 2:
        raise ValueError("streaming_funnel_path needs at least 2 stages")
    from bisect import bisect_left

    within_us = within_minutes * 60_000_000
    rest = stages[1:]
    stage_cols = [f"ts_{i}_{name}" for i, name in enumerate(rest, 1)]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
        ]
        + [T.StructField(c, T.TimestampType()) for c in stage_cols]
        + [T.StructField("completed", T.BooleanType())]
    )

    def fold(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = (
            json.loads(state.get[0])
            if state.exists
            else {"u": "us", "starts": [], "stg": [[] for _ in rest]}
        )
        starts = [(i, t) for i, t in st["starts"]]
        stg = [list(map(int, lst)) for lst in st["stg"]]
        wm = state.getCurrentWatermarkMs() * 1000  # us
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                ts_us = int(rec[ts_col].value // 1_000)
                if ts_us + within_us < wm:
                    continue  # late beyond every open horizon
                etype = rec[type_col]
                if etype == stages[0]:
                    starts.append((int(rec[id_col]), ts_us))
                for si, name in enumerate(rest):
                    if etype == name:
                        stg[si].append(ts_us)
        for lst in stg:
            lst.sort()
        rows = []
        still_open = []
        for sid, sts in sorted(starts, key=lambda p: (p[1], p[0])):
            if sts + within_us >= wm:
                # strict decision boundary — see streaming_funnel
                still_open.append((sid, sts))
                continue
            horizon = sts + within_us
            row = {
                id_col: sid,
                "key": key[0],
                ts_col: pd.Timestamp(sts, unit="us"),
                "completed": True,
            }
            prev = sts
            for col, lst in zip(stage_cols, stg):
                hit = None
                if prev is not None:
                    j = bisect_left(lst, prev)  # at-or-after
                    if j < len(lst) and lst[j] <= horizon:
                        hit = lst[j]
                row[col] = (
                    pd.Timestamp(hit, unit="us")
                    if hit is not None else pd.NaT
                )
                if hit is None:
                    row["completed"] = False
                prev = hit
            rows.append(row)
        stg = [
            [t for t in lst if t + within_us >= wm] for lst in stg
        ]
        if still_open or any(stg):
            horizons = [t + within_us for _, t in still_open] + [
                t + within_us for lst in stg for t in lst
            ]
            state.update(
                (json.dumps(
                    {"u": "us", "starts": still_open, "stg": stg}
                ),)
            )
            # strict-firing arm — see streaming_funnel
            _arm_timeout(state, min(horizons) // 1000 + 1, wm // 1000)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(rows, columns=list(out_schema.fieldNames()))

    return (
        events.withWatermark(ts_col, grace)
        .withColumn("_key", F.col(key_col).cast("string"))
        .groupBy("_key")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_heartbeat_alerts(
    events: DataFrame,
    gap_minutes: int = 60,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    grace: str = "1 second",
) -> DataFrame:
    """Dead-man's-switch: emit an alert the moment the watermark
    proves a key has been silent longer than ``gap_minutes`` — the
    streaming-NATIVE complement of the batch heartbeat_gaps scan
    (which can only report silences already broken by a later
    sample; the ongoing silence has no batch endpoint).

    This is the one operator in this module where the EVENT-TIME
    TIMEOUT is the signal itself rather than bookkeeping: state is
    just the key's latest sample time (+ whether the current silence
    already alerted); each batch re-arms the timeout at
    last_seen + gap, and the alert fires from the timeout path when
    no data arrived to push it forward. One alert per silence — a
    still-silent key does not re-alert every micro-batch; a new
    sample closes the silence and re-arms.

    Output: (key, last_seen, alert) with alert always true — the
    emitted SET is deterministic for a bounded replay: exactly the
    samples with no successor within gap (the batch gap starts) plus
    the trailing silence if the final watermark strictly passed
    last_seen + gap. State per key is two numbers — bounded harder
    than anything else in this module.
    """
    gap_us = gap_minutes * 60_000_000
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("last_seen", T.TimestampType()),
            T.StructField("alert", T.BooleanType()),
        ]
    )

    def fold(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = (
            json.loads(state.get[0])
            if state.exists
            else {"u": "us", "last": None, "alerted": False}
        )
        last = st["last"]
        alerted = bool(st["alerted"])
        wm = state.getCurrentWatermarkMs() * 1000  # us
        rows = []
        # fold arrivals in event-time order (a jumbled batch must not
        # fabricate or miss a gap); drop late rows (ts < watermark) —
        # the T2 contract shared with every operator in this module
        arrivals = sorted(
            int(rec[ts_col].value // 1_000)
            for pdf in pdfs
            for rec in pdf.to_dict("records")
        )
        for ts_us in arrivals:
            if ts_us < wm:
                continue
            if last is not None and ts_us > last:
                # a successor closing a silence > gap alerts for the
                # silence START exactly once — parity with the batch
                # gap set (unless the trailing-timeout path already
                # alerted this silence in an earlier batch)
                if ts_us - last > gap_us and not alerted:
                    rows.append(last)
            if last is None or ts_us > last:
                last, alerted = ts_us, False
        # ongoing silence: the timeout path (or any batch whose
        # watermark advanced far enough) proves no successor can
        # close the gap in time
        if last is not None and not alerted and wm > last + gap_us:
            rows.append(last)
            alerted = True
        state.update((json.dumps({"u": "us", "last": last,
                                  "alerted": alerted}),))
        if last is not None and not alerted:
            _arm_timeout(state, (last + gap_us) // 1000 + 1, wm // 1000)
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "last_seen": pd.Timestamp(t, unit="us"),
                    "alert": True,
                }
                for t in rows
            ],
            columns=list(out_schema.fieldNames()),
        )

    return (
        events.withWatermark(ts_col, grace)
        .withColumn("_key", F.col(key_col).cast("string"))
        .groupBy("_key")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
