"""Arbitrary user reducers over keyed tumbling windows (§2.8 parity).

The reference's window aggregation API takes *user-supplied Python
callables* — ``initializer`` seeds the per-(key, window) state and
``reducer`` folds each record into it
(/root/reference/option_trade_aggs/main.py:85-188, wired at
main.py:221-225). The declarative conditional-sum restatement
(operators/window_agg.py) covers the shipped reducer; THIS module is
the general form for reducers that are not expressible as SQL
aggregates, built on ``applyInPandasWithState``.

Semantics mirror the declarative path (T1-T3): event-time tumbling
windows, watermark grace, append-mode emit-final. State per key is a
dict of open windows -> opaque accumulator; windows whose end has
passed the watermark are emitted and evicted at batch boundaries, and
rows arriving after their window was evicted are dropped (the same
guarantee Spark gives the built-in aggregation — see
tests/test_streaming.py for the pinned behavior).

Scale: state lives in the executor state store sharded by the groupBy
key — identical placement to the built-in agg; the Python hop prices
in Arrow batch transfer, which is why the declarative path remains
the default (UDFs are the slow path, reducers only when semantics
demand them).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

Initializer = Callable[[], dict]
Reducer = Callable[[dict, dict], dict]

#: state: JSON-encoded {window_start_ms: accumulator-dict}
_STATE_SCHEMA = T.StructType([T.StructField("js", T.StringType())])


def keyed_window_reduce(
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
    """Fold a user reducer over keyed tumbling windows, emit finals.

    ``value_fields`` declares the accumulator's output columns
    (name, spark-type). The reducer sees each record as a plain dict
    (the reference's record shape) and returns the updated
    accumulator dict.
    """
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
    field_names = [n for n, _ in value_fields]

    def fold(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        windows: dict[int, dict] = (
            {int(k): v for k, v in json.loads(state.get[0]).items()}
            if state.exists
            else {}
        )
        wm = state.getCurrentWatermarkMs()
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                ts_ms = int(rec[ts_col].value // 1_000_000)
                w_start = ts_ms - ts_ms % window_ms
                if w_start + window_ms <= wm and w_start not in windows:
                    continue  # late beyond eviction: dropped (T2)
                acc = windows.setdefault(w_start, initializer())
                windows[w_start] = reducer(acc, rec)
        finals = sorted(w for w in windows if w + window_ms <= wm)
        rows = []
        for w in finals:
            acc = windows.pop(w)
            rows.append(
                {
                    "window_start": pd.Timestamp(w, unit="ms"),
                    "window_end": pd.Timestamp(w + window_ms, unit="ms"),
                    key_col: key[0],
                    **{n: acc.get(n) for n in field_names},
                }
            )
        if windows:
            state.update((json.dumps({str(k): v for k, v in windows.items()}),))
            # Wake this key when the watermark passes the oldest open
            # window so finals flush without new per-key data (T3).
            # Event-time timeouts fire only when the watermark STRICTLY
            # exceeds the set timestamp, but the emission predicate
            # (and the built-in agg, pinned by
            # test_append_emits_at_exact_watermark_boundary) closes a
            # window at watermark == window_end — so arm the timeout
            # 1 ms early or a boundary-equality window never flushes.
            state.setTimeoutTimestamp(min(windows) + window_ms - 1)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(rows, columns=list(out_schema.fieldNames()))

    return (
        trades.withWatermark(ts_col, grace)
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------
# S8/T11 — live pub/sub push sink with wildcard subscriptions
# ---------------------------------------------------------------------

class PushHub:
    """In-process analog of the dashboard hub (S8):
    ``SubscribeToParameter(topic, "*", "*")`` wildcard subscriptions
    receiving columnar batches
    (/root/reference/dashboard/src/services/quix.ts:100-146, wired
    with wildcards in /root/reference/dashboard/src/App.js:59-61).

    Each subscription gets, per micro-batch, the matching rows as a
    dict of parallel arrays — the reference's ``Data`` wire shape
    (dashboard/src/Models/data.ts:16-41).

    Driver-safety: the union of subscription predicates is pushed
    into the batch plan (non-matching rows never leave the
    executors), and the collect is capped at ``max_rows_per_batch``
    — a wildcard subscription on a hot topic truncates the batch
    (counted in ``truncated_batches``) instead of OOMing the driver.
    """

    def __init__(self, max_rows_per_batch: int = 10_000) -> None:
        self._subs: list[tuple[str, str, Callable[[dict], Any]]] = []
        self.max_rows_per_batch = max_rows_per_batch
        self.truncated_batches = 0

    def subscribe(
        self, stream_id: str, parameter_id: str, callback: Callable[[dict], Any]
    ) -> None:
        self._subs.append((stream_id, parameter_id, callback))

    def _match_predicate(self):
        from pyspark.sql import functions as F

        cond = None
        for stream_pat, param_pat, _ in self._subs:
            p = F.lit(True)
            if stream_pat != "*":
                p = p & (F.col("stream_id") == stream_pat)
            if param_pat != "*":
                p = p & (F.col("parameter_id") == param_pat)
            cond = p if cond is None else (cond | p)
        return cond

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """``writeStream.foreachBatch(hub.foreach_batch)`` handler."""
        if not self._subs:
            return
        cap = self.max_rows_per_batch
        rows = (
            batch_df.filter(self._match_predicate()).limit(cap + 1).collect()
        )
        if len(rows) > cap:
            self.truncated_batches += 1
            rows = rows[:cap]
        for stream_pat, param_pat, cb in self._subs:
            hit = [
                r
                for r in rows
                if (stream_pat == "*" or r["stream_id"] == stream_pat)
                and (param_pat == "*" or r["parameter_id"] == param_pat)
            ]
            if not hit:
                continue
            cols = hit[0].asDict().keys()
            cb({c: [r[c] for r in hit] for c in cols})
