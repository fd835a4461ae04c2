"""Event-channel Linear interpolation semantics (A6 x A8).

eventDataAggregation.ts:19-21 + interpolationType.ts:16 allow Linear
on event channels; it is well-defined exactly when the aggregated
value series is numeric — Count by construction. First/Last carry
string values, so Linear stays rejected there (the r10 documented
deviation, closed in r11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ts_data_pipeline_spark.plans.queryspec import (
    EventQuerySpec,
    evaluate_events,
)

_EVENTS_DDL = (
    "stream_id string, ts timestamp, event_id string, "
    "level string, value string, tags map<string,string>"
)


def _events(spark):
    from datetime import datetime

    rows = [
        ("1", datetime(2024, 1, 1, 0, 30), "error", "warn", "a", {}),
        ("1", datetime(2024, 1, 1, 0, 45), "error", "warn", "b", {}),
        # 01:00 and 02:00 buckets empty — interior gap of TWO buckets
        ("1", datetime(2024, 1, 1, 3, 30), "error", "warn", "c", {}),
    ]
    return spark.createDataFrame(rows, _EVENTS_DDL)


def _spec(**kw):
    base = dict(
        event_ids=["error"],
        interval="1 hour",
        from_ts="2024-01-01 00:00:00",
        to_ts="2024-01-01 05:00:00",
    )
    base.update(kw)
    return EventQuerySpec(**base)


def test_linear_count_fills_interior_gap_closed_form(spark):
    out = evaluate_events(
        _events(spark), _spec(aggregation="Count", interpolation="Linear")
    )
    got = {
        r["bucket"].hour: r["event_count"]
        for r in out.orderBy("bucket").collect()
    }
    # observed: 2 at 00h, 1 at 03h; gap hours 1,2 fill linearly
    # (2 -> 1 over 3 bucket-widths); hour 4 is past the last
    # observation -> stays null (not zero) under Linear.
    assert got[0] == 2.0 and got[3] == 1.0
    assert got[1] == pytest.approx(2 - 1 / 3, abs=1e-4)
    assert got[2] == pytest.approx(2 - 2 / 3, abs=1e-4)
    assert got[4] is None
    assert dict(out.dtypes)["event_count"] == "double"


def test_linear_rejected_for_string_valued_aggregations(spark):
    for agg in ("First", "Last"):
        with pytest.raises(ValueError, match="Linear event interpolation"):
            evaluate_events(
                _events(spark),
                _spec(aggregation=agg, interpolation="Linear"),
            ).collect()


def test_null_and_previous_still_zero_fill_counts(spark):
    out = evaluate_events(
        _events(spark), _spec(aggregation="Count", interpolation="Null")
    )
    got = {
        r["bucket"].hour: r["event_count"]
        for r in out.orderBy("bucket").collect()
    }
    assert got == {0: 2, 1: 0, 2: 0, 3: 1, 4: 0}


def test_event_linear_rejected_without_interval_too(spark):
    """r11 review: the Linear-requires-Count contract must hold for
    interval-less specs as well — the same contradictory spec must
    not silently ignore interpolation just because no bucketing was
    requested."""
    import pytest

    from ts_data_pipeline_spark.plans.queryspec import EventQuerySpec

    spec = EventQuerySpec(
        aggregation="First",
        interpolation="Linear",
    )
    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.plans import queryspec

    events = _io.load(spark, "/root/testdata/sf0.001", "events")
    with pytest.raises(ValueError, match="requires a numeric"):
        queryspec.evaluate_events(events, spec)
