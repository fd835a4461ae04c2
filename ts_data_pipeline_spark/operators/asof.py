"""As-of join and sessionization — time-series operators Spark lacks
natively, built as compositions of existing DataFrame ops.

The reference joins nothing (SURVEY §2.9), but its domain begs for
both: "the prevailing NBBO quote at each dark-pool print" is an as-of
join (the side-classification inputs in
/root/reference/darkpool_trades/main.py:71-78 presume exactly that
pairing), and stream Idle status detection
(/root/reference/dashboard/src/Models/streamStatus.ts:16) is
gap-based sessionization.

As-of join strategy (composition, no UDF): tag and union both
streams, sort per key by (ts, side-tag), and carry the last quote
forward with an ignore-nulls window — one shuffle on the key, one
sort, linear scan. This is the classic "union + LOCF" plan; unlike
the bucketize-and-filter alternative it is exact for arbitrary gaps.
At 100 TB both relations shuffle once on the join key — the same
cost as any co-partitioned join of the two.

Sessionization: lag + cumulative-sum over gap flags (the guide's
standard pattern); streaming would use session_window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    right_value_cols: list[str],
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row: the nearest right row on the same key —
    ``right.ts <= left.ts`` (backward, the default) or
    ``right.ts >= left.ts`` (forward). With ``tolerance`` (an
    INTERVAL string, e.g. ``'5 minutes'``) matches farther than the
    tolerance are nulled — pandas ``merge_asof`` semantics.

    Left rows keep all their columns; matched right values arrive as
    ``right_value_cols`` (null when no qualifying right row exists).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction!r}")
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c not in (key, ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_value_cols],
    )
    tagged_right = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts)],
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # The match is the nearest right ROW — so the fill carries ONE
    # struct of (right ts, right values), non-null only on right
    # rows. Filling columns independently (last non-null PER COLUMN)
    # would resurrect stale values from older rows whenever the
    # nearest row has a NULL in one column, which is not ASOF/
    # merge_asof semantics; the row struct also gives tolerance the
    # matched row's timestamp for free.
    # Backward: right rows sort BEFORE left rows at equal ts
    # (_is_left asc) and the fill looks back — a quote stamped
    # exactly at the trade time is visible (<= semantics). Forward:
    # same running-frame shape over the REVERSED ordering (ts desc),
    # with right rows again sorting before left rows at equal ts so
    # an equal-ts quote is visible (>= semantics). Both directions
    # are therefore incremental unboundedPreceding..0 frames — O(n)
    # per key. The naive forward form (first ignorenulls over
    # 0..unboundedFollowing) is an UnboundedFollowing frame that
    # Spark recomputes from scratch per row — O(n²) on a hot symbol;
    # tests/test_scale_patterns.py pins the physical frame.
    rstruct = F.when(
        F.col("_is_left") == 0,
        F.struct(
            F.col("_ts").alias("_rts"),
            *[F.col(f"_r_{c}").alias(c) for c in right_value_cols],
        ),
    )
    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        match = F.last(rstruct, ignorenulls=True).over(w)
        within = F.col("_ts") - F.col("_m._rts") <= F.expr(
            f"INTERVAL {tolerance}" if tolerance else "INTERVAL 0 SECONDS"
        )
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        match = F.last(rstruct, ignorenulls=True).over(w)
        within = F.col("_m._rts") - F.col("_ts") <= F.expr(
            f"INTERVAL {tolerance}" if tolerance else "INTERVAL 0 SECONDS"
        )
    filled = unioned.select("*", match.alias("_m"))
    keep_match = F.lit(True) if tolerance is None else within
    return (
        filled.filter(F.col("_is_left") == 1)
        .select(
            F.col("_k").alias(key),
            F.col("_ts").alias(ts),
            *[F.col(c) for c in lcols if c not in (key, ts)],
            *[
                F.when(keep_match, F.col(f"_m.{c}")).alias(c)
                for c in right_value_cols
            ],
        )
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    right_value_cols: list[str],
) -> DataFrame:
    """Grouped-map as-of join: ``applyInPandas`` + ``pd.merge_asof``
    per key (the guide's escape-hatch form; §2.8 grouped-map surface).

    Semantically identical to :func:`asof_join` (backward, <=) —
    pinned by tests/test_asof.py — but pays the Arrow hop, so the
    expression-only composition remains the default. Useful when the
    per-group logic grows beyond what merge semantics express
    (tolerance windows, nearest-direction switches, custom fill).
    """
    import pandas as pd

    left_tagged = left.withColumn("_side", F.lit("l"))
    right_sel = right.select(
        F.col(key),
        F.col(ts),
        *[F.col(c) for c in right_value_cols],
    ).withColumn("_side", F.lit("r"))
    out_fields = [f"{f.name} {f.dataType.simpleString()}"
                  for f in left.schema.fields]
    out_fields += [
        f"{right.schema[c].name} {right.schema[c].dataType.simpleString()}"
        for c in right_value_cols
    ]
    schema = ", ".join(out_fields)
    lcols = list(left.columns)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        l = pdf[pdf["_side"] == "l"][lcols].sort_values(ts)
        r = (
            pdf[pdf["_side"] == "r"][[key, ts, *right_value_cols]]
            .dropna(subset=[ts])
            .sort_values(ts)
        )
        if not len(l):
            return pd.DataFrame(columns=lcols + right_value_cols)
        merged = pd.merge_asof(l, r, on=ts, by=key, direction="backward")
        return merged[lcols + right_value_cols]

    unioned = left_tagged.unionByName(right_sel, allowMissingColumns=True)
    return unioned.groupBy(key).applyInPandas(merge, schema=schema)


def sessionize(
    df: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the inter-event
    gap exceeds ``gap_minutes``. Returns one row per session with
    bounds and size. lag -> gap flag -> cumulative sum = ordinal."""
    w = Window.partitionBy(key).orderBy(ts)
    gap_us = F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w))
    thresh = F.lit(int(gap_minutes * 60_000_000))
    flagged = df.select(
        F.col(key).alias("key"),
        F.col(ts).alias("ts"),
        F.when(gap_us.isNull() | (gap_us > thresh), 1).otherwise(0).alias("new_s"),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_s").over(
            Window.partitionBy("key").orderBy("ts").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return sess.groupBy("key", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Interval containment join: event rows landing inside
    [start, end] per key — Spark has no native range join, and the
    naive theta-join is a per-key cross product.

    Scale pattern (the guide's bucketize-and-filter): explode each
    interval into the time buckets it covers, equi-join events on
    (key, bucket(ts)), then apply the exact BETWEEN filter. The join
    is hash-based on (key, bucket); each event meets only intervals
    overlapping its own bucket, so work scales with actual overlap
    density rather than |events| x |intervals per key|.
    """
    extra = [c for c in intervals.columns if c not in (key, start_col, end_col)]
    ival = intervals.select(
        F.col(key).alias("_ik"),
        F.col(start_col).alias("_start"),
        F.col(end_col).alias("_end"),
        *[F.col(c) for c in extra],
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col(start_col)),
                F.date_trunc("hour", F.col(end_col)),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("_bucket"),
    )
    ev = events.withColumn("_bucket", F.date_trunc("hour", F.col(ts)))
    joined = ev.join(
        ival,
        (F.col(key) == F.col("_ik")) & (ev["_bucket"] == ival["_bucket"]),
    ).filter((F.col(ts) >= F.col("_start")) & (F.col(ts) <= F.col("_end")))
    return joined.drop("_ik", "_bucket")


def sessionize_sql(
    table: str = "events",
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: float = 30.0,
) -> str:
    thresh_us = int(gap_minutes * 60_000_000)
    return f"""
WITH flagged AS (
  SELECT {key} AS key, {ts} AS ts,
         CASE WHEN lag({ts}) OVER (PARTITION BY {key} ORDER BY {ts}) IS NULL
                OR epoch_us({ts}) - epoch_us(lag({ts}) OVER (
                     PARTITION BY {key} ORDER BY {ts})) > {thresh_us}
              THEN 1 ELSE 0 END AS new_s
  FROM {table}
),
sess AS (
  SELECT key, ts,
         -- DuckDB window SUM(int) yields HUGEINT -> pandas float64;
         -- cast to match Spark's LONG in the value hash.
         CAST(SUM(new_s) OVER (PARTITION BY key ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_no
  FROM flagged
)
SELECT key, session_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY key, session_no
"""


def temporal_dimension_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    key: str,
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Join each fact row to the dimension VERSION valid at its event
    time: ``valid_from <= ts < valid_to`` (open-ended current version
    = NULL valid_to). The warehouse temporal-join pattern over an
    SCD2 history (operators/catalog.scd2_apply builds one).

    Scale shape: dimensions are entity-bounded (streams, not rows),
    so the SCD2 history rides an explicit broadcast and the fact
    table never shuffles; the validity-range predicate is a residual
    filter on the broadcast hash join (key equality is the hash key).
    For a dimension too large to broadcast the same expression
    becomes a sort-merge join on the key with the range residual —
    still one shuffle, keyed on the natural join key.
    """
    f, d = facts.alias("f"), dim.alias("d")
    cond = (
        (F.col(f"f.{key}") == F.col(f"d.{key}"))
        & (F.col(f"f.{ts_col}") >= F.col(f"d.{valid_from}"))
        & (
            F.col(f"d.{valid_to}").isNull()
            | (F.col(f"f.{ts_col}") < F.col(f"d.{valid_to}"))
        )
    )
    return f.join(F.broadcast(d), cond, "inner").select(
        "f.*", *[F.col(f"d.{c}") for c in dim.columns if c != key]
    )
