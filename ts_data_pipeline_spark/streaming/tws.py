"""The user-reducer surface on Spark's CURRENT stateful API:
``transformWithStateInPandas`` (Spark 4.x StatefulProcessor).

``streaming/custom_state.py::keyed_window_reduce`` carries §2.8 on
``applyInPandasWithState`` — the older arbitrary-state API. This
module re-expresses the SAME semantics (event-time tumbling windows,
user initializer/reducer fold, watermark-gated append finals, late
rows dropped after eviction) as a ``StatefulProcessor``:

- per-key open windows live in a ValueState (JSON accumulator map —
  the state store shards by the groupBy key exactly as before);
- finals flush from ``handleInputRows`` when the watermark passed a
  window's end, and from an EVENT-TIME TIMER for keys that receive
  no further input (timers replace the old API's
  ``GroupStateTimeout.EventTimeTimeout`` + manual re-arm dance — the
  reason this API exists);
- the timer is armed at window_end - 1 ms: event-time timers fire
  when the watermark STRICTLY exceeds the registered instant, while
  the emission predicate (matching the built-in agg, pinned in
  tests/test_streaming.py) is window_end <= watermark.

Equivalence with the old-API path is pinned in
tests/test_custom_state.py — both must emit byte-identical finals on
the same chunked replay. ENV-GATED in this sandbox: the TWS state
protocol imports google.protobuf, which is not installed here (and
pip is unavailable) — the pin importorskips, exactly like the JVM
spark-avro connector gate; the applyInPandasWithState path remains
the executed default.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

Initializer = Callable[[], dict]
Reducer = Callable[[dict, dict], dict]


class _WindowReduceProcessor(StatefulProcessor):
    def __init__(
        self,
        initializer: Initializer,
        reducer: Reducer,
        key_col: str,
        ts_col: str,
        window_ms: int,
        field_names: list[str],
    ) -> None:
        self._init = initializer
        self._reduce = reducer
        self._key_col = key_col
        self._ts_col = ts_col
        self._window_ms = window_ms
        self._fields = field_names

    # -- state helpers ---------------------------------------------------
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._windows = handle.getValueState("windows", "js string")

    def _load(self) -> dict[int, dict]:
        if not self._windows.exists():
            return {}
        (js,) = self._windows.get()
        return {int(k): v for k, v in json.loads(js).items()}

    def _flush(self, key: Any, windows: dict[int, dict], wm: int):
        """Emit every closed window, persist/clear state, re-arm the
        timer for the oldest still-open window."""
        finals = sorted(w for w in windows if w + self._window_ms <= wm)
        rows = []
        for w in finals:
            acc = windows.pop(w)
            rows.append(
                {
                    "window_start": pd.Timestamp(w, unit="ms"),
                    "window_end": pd.Timestamp(w + self._window_ms, unit="ms"),
                    self._key_col: key[0],
                    **{n: acc.get(n) for n in self._fields},
                }
            )
        if windows:
            self._windows.update(
                (json.dumps({str(k): v for k, v in windows.items()}),)
            )
            oldest_end = min(windows) + self._window_ms
            self._handle.registerTimer(oldest_end - 1)
        else:
            self._windows.clear()
        if rows:
            yield pd.DataFrame(rows)

    # -- API hooks -------------------------------------------------------
    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        wm = timerValues.getCurrentWatermarkInMs()
        windows = self._load()
        for pdf in rows:
            for rec in pdf.to_dict("records"):
                ts_ms = int(rec[self._ts_col].value // 1_000_000)
                w_start = ts_ms - ts_ms % self._window_ms
                if w_start + self._window_ms <= wm and w_start not in windows:
                    continue  # late beyond eviction: dropped (T2)
                acc = windows.setdefault(w_start, self._init())
                windows[w_start] = self._reduce(acc, rec)
        yield from self._flush(key, windows, wm)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        yield from self._flush(
            key, self._load(), timerValues.getCurrentWatermarkInMs()
        )

    def close(self) -> None:
        pass


def tws_keyed_window_reduce(
    trades: DataFrame,
    initializer: Initializer,
    reducer: Reducer,
    *,
    key_col: str = "osym",
    ts_col: str = "ts",
    window_ms: int = 60_000,
    grace: str = "1 second",
    value_fields: Tuple[Tuple[str, str], ...] = (("trade_count", "long"),),
) -> DataFrame:
    """keyed_window_reduce on the transformWithStateInPandas API —
    identical semantics and output contract."""
    out_schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField(key_col, T.StringType()),
        ]
        + [
            T.StructField(n, T._parse_datatype_string(t))
            for n, t in value_fields
        ]
    )
    proc = _WindowReduceProcessor(
        initializer,
        reducer,
        key_col,
        ts_col,
        window_ms,
        [n for n, _ in value_fields],
    )
    return (
        trades.withWatermark(ts_col, grace)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
