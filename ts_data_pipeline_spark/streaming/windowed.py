"""Streaming windowed aggregation: the flagship pipeline under readStream.

Reproduces the ``option_trade_aggs`` streaming semantics (SURVEY
§2.6) on Structured Streaming:

- T1 event-time: windows key on the embedded ``ts`` column, never
  arrival time (option_trade_aggs/main.py:20-29,205).
- T2 late-data grace: ``withWatermark(ts, grace)`` ≙ ``grace_ms``
  (main.py:222).
- T3 emit-final: ``outputMode("append")`` emits one row per window
  after the watermark passes its end ≙ ``.final()`` (main.py:224).
  Documented difference: append emission additionally waits for a
  later batch to advance the watermark, so the trailing window(s) of
  a bounded run stay open (SURVEY §7 risk 3).
- T4/T7 durable state: the window state lives in the checkpointed
  state store ≙ changelog topics + state volume (quix.yaml:54-56);
  clearing state = deleting the checkpoint dir ≙ app.clear_state()
  (main.py:241).

The aggregation body is the exact batch expression set
(operators/window_agg.option_window_agg) — nothing is reimplemented
for streaming, which is the point of declaring the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ts_data_pipeline_spark.operators.window_agg import option_window_agg


def streaming_option_window_agg(
    trades: DataFrame, duration: str = "1 minute", grace: str = "1 second"
) -> DataFrame:
    """Watermarked tumbling-window conditional-sum agg (A1-A3 streaming).

    ``trades`` is a *streaming* DataFrame with the enriched-trade
    columns (osym, ts, premium, qty, side, otype, whale). The state
    per (osym, window) is one fixed-width row of 25 numeric
    accumulators — identical scale story to the batch partial agg, so
    1000 executors hold state sharded by the groupBy shuffle key.
    """
    return option_window_agg(trades.withWatermark("ts", grace), duration)


def parquet_stream(
    spark: SparkSession, path: str, schema: T.StructType, max_files: int | None = None
) -> DataFrame:
    """File-based replay stream (the batch-testable stand-in for the
    Kafka consumer S7): each parquet file becomes a micro-batch unit.

    The schema is normalized so no ``TIMESTAMP_NTZ`` field reaches the
    event-time surface — ``withWatermark`` hard-rejects NTZ, and a
    caller-supplied schema derived from an un-normalized read would
    otherwise propagate the driver testdata's NTZ encoding into the
    engine's own replay streams (VERDICT r03 item 2).
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    fields = [
        T.StructField(f.name, T.TimestampType(), f.nullable)
        if isinstance(f.dataType, T.TimestampNTZType)
        else f
        for f in schema.fields
    ]
    reader = spark.readStream.schema(T.StructType(fields))
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.parquet(path)


def stream_stream_time_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "quote_ts",
    lookback: str = "10 minutes",
    grace: str = "1 second",
) -> DataFrame:
    """Stream-stream inner join bounded by event time: each left row
    pairs with right rows at most ``lookback`` older (and not newer).

    The time-range condition lets Spark bound both sides' state by
    the watermark (without it, stream-stream join state grows
    forever) — state eviction horizon = lookback + grace on each
    side. This is the streaming form of the trade<->quote pairing the
    as-of join does in batch.
    """
    lw = left.withWatermark(left_ts, grace)
    rw = right.withWatermark(right_ts, grace)
    cond = (
        (lw[key] == rw[f"r_{key}"])
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return lw.join(rw, cond, "inner")


def run_available_now(
    df: DataFrame, query_name: str, checkpoint_dir: str
) -> StreamingQuery:
    """Drain all available input through the streaming plan into a
    memory sink (append mode) and return the finished query.

    availableNow + checkpoint gives the bounded-run equivalent of the
    reference's exactly-once processing guarantee (T4): re-running
    with the same checkpoint resumes, never double-counts.
    """
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_rollup_partials(
    events: DataFrame,
    minutes: int = 1,
    grace: str = "1 second",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Continuous-aggregate maintenance under Structured Streaming:
    the FINEST rollup grain (operators/rollup.windowed_partials) as a
    watermarked streaming agg. Append mode emits each (key, window)
    partial-state row exactly once when the watermark closes the
    window; coarser grains are then derived by batch
    ``rollup.reaggregate`` over the emitted finals — the raw stream
    is aggregated once, every other grain reads the tiny partials,
    the same lattice contract as batch (tests/test_rollup.py pins
    streaming finals -> reaggregate == batch direct coarse agg).

    State per (key, window) is one fixed-width (n, sum, min, max)
    row, sharded by the groupBy shuffle key — the same bounded-state
    story as the flagship streaming agg.
    """
    from ts_data_pipeline_spark.operators.rollup import windowed_partials

    return windowed_partials(
        events.withWatermark(ts_col, grace),
        minutes,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    grace: str = "1 second",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows under Structured Streaming: the native
    ``session_window`` with a watermark. Sessions are MERGING window
    state — late events can fuse two open sessions — so this is the
    one windowed shape that genuinely needs the engine's stateful
    merge rather than a gaps-and-islands batch rewrite. Append mode
    emits a session once the watermark passes its close (last event
    + gap); emitted finals byte-match the batch session_window over
    the same input (tests/test_streaming.py).

    State per key is the set of OPEN sessions (bounded by the
    watermark horizon), sharded by the groupBy key — the same
    bounded-state story as the tumbling-window aggs.
    """
    return (
        events.withWatermark(ts_col, grace)
        .groupBy(
            F.col(key_col).alias("key"),
            F.session_window(ts_col, gap).alias("_w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    grace: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key streaming dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key in state only until
    the watermark passes its event time + grace, then evicts it.

    This is the streaming twin of the ingest layer's batch
    first-occurrence dedup (operators/dedup.py::exact_dedup): an
    at-least-once upstream (Kafka redelivery, replayed file batches)
    becomes effectively-once downstream as long as redeliveries
    arrive within ``grace`` of the original. Plain
    ``dropDuplicates`` on a stream would keep EVERY key forever —
    state grows with the corpus; the watermarked form's state is
    bounded by (keys arriving within one grace horizon), the same
    eviction contract as the windowed aggregations.
    """
    return events.withWatermark(ts_col, grace).dropDuplicatesWithinWatermark(
        keys
    )
