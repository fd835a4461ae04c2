"""Time-series statistical features: EWMA smoothing and
autocorrelation — the trend/seasonality primitives of a TS analytics
engine, as pure expression trees.

- ``ewma``: exponentially-weighted moving average over a BOUNDED
  trailing window per key. True infinite-history EWMA is a recursion
  (not expressible as a window aggregate without UDAF state); the
  bounded form collects the trailing frame into an array and folds
  deterministic weights over it — weights below lambda^L are dropped,
  which for practical lambda (0.7-0.95) and L >= 20 is a sub-1e-3
  truncation. Frame state per row is L values, so task memory is
  bounded; the shuffle is the usual per-key window sort.
- ``autocorrelation``: Pearson correlation of the series with its
  own k-lagged self, per key and lag — the ACF values a seasonality
  detector reads. One per-key lag window + one corr aggregate per
  requested lag; group cardinality = keys x lags (tiny).

Both are ROUND(_, 4) on both engines — exact aggregates over
identical frames, fold-order differences absorbed by the rounding
convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_div_us(num: Column, den: int) -> Column:
    """FLOOR division of an integer-microsecond column by a literal —
    matching DuckDB's ``//`` semantics for negative (pre-1970)
    epochs, where ``(a / b).cast('bigint')`` truncates toward zero
    instead. Subtracting ``pmod`` (always nonnegative) first makes
    the numerator an exact multiple of ``den``, so the one double
    division is exact for |num| < 2^53 us (~year 2255) — no FP
    boundary sensitivity."""
    exact = num - F.pmod(num, F.lit(den))
    return (exact / F.lit(den)).cast("bigint")


def ewma(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lam: float = 0.8,
    lookback: int = 20,
) -> DataFrame:
    """Per-key trailing EWMA: weight lambda^age, age 0 = current row.

    ewma_t = sum_i lam^i * v_{t-i} / sum_i lam^i over the trailing
    ``lookback + 1`` frame (current row included).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-lookback, 0)
    )
    vals = F.collect_list(value_col).over(w)  # frame order: oldest first
    n = F.size(vals)
    # weight for 1-based position i (oldest first): lam^(n - i)
    num = F.aggregate(
        F.zip_with(
            vals,
            F.sequence(F.lit(1), n),
            lambda v, i: v * F.pow(F.lit(lam), (n - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.pow(F.lit(lam), (n - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col),
        F.col(key_col).alias("key"),
        F.col(ts_col),
        F.col(value_col),
        F.round(num / den, 4).alias("ewma"),
    )


def ewma_sql(
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lam: float = 0.8,
    lookback: int = 20,
    where: str = "TRUE",
) -> str:
    return f"""
WITH framed AS (
  SELECT {id_col}, {key_col} AS key, {ts_col}, {value_col},
         list({value_col}) OVER (
           PARTITION BY {key_col}
           ORDER BY {ts_col} ASC, {id_col} ASC
           ROWS BETWEEN {lookback} PRECEDING AND CURRENT ROW) AS vals
  FROM {table} WHERE {where}
)
SELECT {id_col}, key, {ts_col}, {value_col},
       ROUND(
         list_sum(list_transform(range(1, len(vals) + 1),
                  i -> vals[i] * pow({lam}, len(vals) - i)))
         / list_sum(list_transform(range(1, len(vals) + 1),
                    i -> pow({lam}, len(vals) - i))), 4) AS ewma
FROM framed
"""


def autocorrelation(
    df: DataFrame,
    lags: list[int],
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """ACF per key: corr(v_t, v_{t-k}) for each requested lag."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    lagged = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("v"),
        *[
            F.lag(value_col, k).over(w).alias(f"v_lag{k}")
            for k in lags
        ],
    )
    out = None
    for k in lags:
        acf = lagged.groupBy("key").agg(
            F.lit(k).alias("lag"),
            F.round(F.corr("v", f"v_lag{k}"), 4).alias("acf"),
            F.count(F.col(f"v_lag{k}")).alias("n_pairs"),
        )
        out = acf if out is None else out.unionByName(acf)
    return out


def autocorrelation_sql(
    lags: list[int],
    *,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    parts = []
    for k in lags:
        parts.append(f"""
SELECT key, {k} AS lag, ROUND(corr(v, v_lag), 4) AS acf,
       CAST(COUNT(v_lag) AS BIGINT) AS n_pairs
FROM (
  SELECT {key_col} AS key, {value_col} AS v,
         lag({value_col}, {k}) OVER (
           PARTITION BY {key_col}
           ORDER BY {ts_col} ASC, {id_col} ASC) AS v_lag
  FROM {table}
)
GROUP BY key""")
    return "\nUNION ALL\n".join(parts)


def value_histogram(
    df: DataFrame,
    n_bins: int = 20,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Fixed-width value histogram per key over the GLOBAL [min, max]
    range (shared bins across keys so distributions are comparable).

    Scale shape: the range is one 2-column aggregate row broadcast
    back onto the scan; bin assignment is a scan-side expression; the
    count is a (key, bin)-keyed partial/final agg — shuffle bounded
    by keys x bins. The max value lands in the last bin (right edge
    closed there, half-open everywhere else).
    """
    rng = df.agg(
        F.min(value_col).alias("vmin"), F.max(value_col).alias("vmax")
    )
    width = (F.col("vmax") - F.col("vmin")) / n_bins
    # degenerate range (all values equal): width 0 would put NaN into
    # the bin expression (and a cast error in the DuckDB twin) — every
    # row lands in bin 0 instead.
    bin_expr = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col) - F.col("vmin")) / width).cast("int"),
            F.lit(n_bins - 1),
        )
    )
    binned = df.crossJoin(F.broadcast(rng)).select(
        F.col(key_col).alias("key"),
        bin_expr.alias("bin"),
        F.col("vmin"),
        width.alias("w"),
    )
    return binned.groupBy("key", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first(F.col("vmin") + F.col("bin") * F.col("w")), 4).alias(
            "bin_lo"
        ),
    )


def value_histogram_sql(
    n_bins: int = 20,
    *,
    table: str = "events",
    key_col: str = "event_type",
    value_col: str = "value",
) -> str:
    return f"""
WITH rng AS (
  SELECT MIN({value_col}) AS vmin, MAX({value_col}) AS vmax FROM {table}
),
binned AS (
  SELECT {key_col} AS key,
         CASE WHEN vmax = vmin THEN 0
              ELSE LEAST(CAST(FLOOR(({value_col} - vmin)
                   / ((vmax - vmin) / {n_bins})) AS INT), {n_bins - 1})
         END AS bin,
         vmin, (vmax - vmin) / {n_bins} AS w
  FROM {table} CROSS JOIN rng
)
SELECT key, bin, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(vmin + bin * w), 4) AS bin_lo
FROM binned GROUP BY key, bin
"""


def funnel_conversions(
    df: DataFrame,
    from_event: str,
    to_event: str,
    within_minutes: int,
    *,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Funnel step conversion: for each ``from_event`` occurrence, did
    the same key produce a ``to_event`` within the window? (CEP-lite
    A-followed-by-B — the conversion/alert-escalation primitive.)

    Matched per the usual funnel convention: the FIRST qualifying
    to-event strictly after the from-event. Implementation is a
    per-key sort + min_by over a range-bounded self-pairing expressed
    as a window: to-event timestamps are carried on a per-key
    timeline and each from-event reads the next one ahead — one
    per-key window sort, no self-join blowup.

    Frame shape (the 100 TB detail): "next ahead" is computed over
    the REVERSED ordering (ts desc, id desc) as a running
    ``last(ignorenulls)`` over ``unboundedPreceding..-1``. Spark's
    unbounded-PRECEDING frame is incremental (one buffer update per
    row); the naive forward form — ``first`` over
    ``1..unboundedFollowing`` — is an UnboundedFollowing frame that
    recomputes from scratch per row, O(n²) on a hot key (a user with
    a 100k-event timeline would cost ~10¹⁰ frame evaluations).
    tests/test_scale_patterns.py pins the physical frame.
    """
    from pyspark.sql import Window

    # rows strictly AFTER the current one in (ts asc, id asc) order ==
    # rows strictly BEFORE it in (ts desc, id desc) order; the nearest
    # of them is the LAST non-null in the running frame.
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    next_to_ts = F.last(
        F.when(F.col(type_col) == to_event, F.col(ts_col)), ignorenulls=True
    ).over(w)
    horizon = F.col(ts_col) + F.expr(f"INTERVAL {within_minutes} MINUTES")
    return (
        df.withColumn("_next_to", next_to_ts)
        .filter(F.col(type_col) == from_event)
        .select(
            F.col(id_col),
            F.col(key_col).alias("key"),
            F.col(ts_col),
            F.col("_next_to").alias("converted_at"),
            (
                F.col("_next_to").isNotNull() & (F.col("_next_to") <= horizon)
            ).alias("converted"),
        )
    )


def funnel_conversions_sql(
    from_event: str,
    to_event: str,
    within_minutes: int,
    *,
    table: str = "events",
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    return f"""
WITH timeline AS (
  SELECT {id_col}, {key_col} AS key, {ts_col}, {type_col},
         -- first to-event strictly after this row on the key timeline
         (SELECT MIN(t2.{ts_col}) FROM {table} t2
          WHERE t2.{key_col} = t1.{key_col}
            AND t2.{type_col} = '{to_event}'
            AND (t2.{ts_col} > t1.{ts_col}
                 OR (t2.{ts_col} = t1.{ts_col} AND t2.{id_col} > t1.{id_col})))
           AS converted_at
  FROM {table} t1
)
SELECT {id_col}, key, {ts_col}, converted_at,
       converted_at IS NOT NULL
       AND converted_at <= {ts_col} + INTERVAL {within_minutes} MINUTE
         AS converted
FROM timeline WHERE {type_col} = '{from_event}'
"""


def cohort_retention(
    df: DataFrame,
    period_days: int = 7,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: keys grouped by their FIRST-activity period;
    for each later period, how many of the cohort were active.

    The classic growth-analytics triangle: one min-per-key pass
    (cohort assignment), one distinct (key, period) activity pass,
    one count per (cohort, period offset).

    Scale shape: ``first`` has one row PER USER — it grows with the
    corpus, so it must NOT be force-broadcast (at web scale that
    broadcast OOMs driver and executors). Both sides are keyed on
    ``key_col``, so the planner's shuffle join is one co-partitioned
    pass — and the preceding groupBy/distinct already partitioned
    both sides on that very key, so AQE can reuse the exchange.
    Small inputs still get a broadcast via AQE's size-based
    conversion; we just never force it.
    """
    secs = period_days * 86400
    # exact integer FLOOR (r8 review finding): the twin's
    # CAST(FLOOR(epoch/secs) AS BIGINT) floors, so a pre-1970 first
    # activity must floor here too — (a/b).cast('bigint') truncates
    # toward zero. Same pmod formula as _floor_div_us.
    period = lambda c: (  # noqa: E731
        (F.unix_timestamp(c) - F.pmod(F.unix_timestamp(c), F.lit(secs)))
        / F.lit(secs)
    ).cast("bigint")
    first = df.groupBy(key_col).agg(F.min(ts_col).alias("_first"))
    activity = df.select(
        key_col, period(F.col(ts_col)).alias("_p")
    ).distinct()
    return (
        activity.join(first, key_col)
        .select(
            period(F.col("_first")).alias("cohort_period"),
            (F.col("_p") - period(F.col("_first"))).alias("periods_later"),
            key_col,
        )
        .groupBy("cohort_period", "periods_later")
        .agg(F.count_distinct(key_col).alias("n_active"))
    )


def cohort_retention_sql(
    period_days: int = 7,
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    secs = period_days * 86400
    return f"""
WITH first AS (
  SELECT {key_col}, MIN({ts_col}) AS first_ts FROM {table} GROUP BY {key_col}
),
activity AS (
  -- FLOOR before the cast: DuckDB CAST(double AS BIGINT) rounds,
  -- Spark's cast truncates
  SELECT DISTINCT {key_col},
         CAST(FLOOR(epoch({ts_col}) / {secs}) AS BIGINT) AS p
  FROM {table}
)
SELECT CAST(FLOOR(epoch(f.first_ts) / {secs}) AS BIGINT) AS cohort_period,
       a.p - CAST(FLOOR(epoch(f.first_ts) / {secs}) AS BIGINT) AS periods_later,
       COUNT(DISTINCT a.{key_col}) AS n_active
FROM activity a JOIN first f USING ({key_col})
GROUP BY 1, 2
"""


def session_paths(
    df: DataFrame,
    gap_minutes: float = 30.0,
    top_n: int = 20,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Path analysis: the most common ordered event-type sequences
    per session ('view>view>purchase' style), with session boundaries
    from the gap rule.

    Scale shape: gaps-and-islands sessionization is two per-key
    window passes; the ordered path is a frame-ordered collect_list
    per (key, session) — state bounded by session length; path counts
    are a partial/final agg on the path string; the leaderboard is
    TakeOrderedAndProject.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    gap_us = int(gap_minutes * 60 * 1_000_000)
    new_s = (
        F.col(ts_col).cast("long") * 1_000_000
        - F.lag(F.col(ts_col).cast("long") * 1_000_000).over(w)
        > gap_us
    )
    sess = df.withColumn(
        "_sid",
        F.sum(
            F.when(new_s | F.lag(ts_col).over(w).isNull(), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = (
        sess.groupBy(key_col, "_sid")
        .agg(
            F.concat_ws(
                ">",
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col(id_col).alias("i"),
                            F.col(type_col).alias("e"),
                        )
                    )
                ).getField("e"),
            ).alias("path")
        )
    )
    top = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(top_n)
    )
    from pyspark.sql import Window as W2

    w2 = W2.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return top.withColumn("rank", F.row_number().over(w2))


def session_paths_sql(
    gap_minutes: float = 30.0,
    top_n: int = 20,
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    gap_us = int(gap_minutes * 60 * 1_000_000)
    return f"""
WITH flagged AS (
  SELECT {key_col}, {ts_col}, {id_col}, {type_col},
         CASE WHEN lag({ts_col}) OVER w IS NULL
                OR epoch_us({ts_col}) - epoch_us(lag({ts_col}) OVER w)
                   > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col}
               ORDER BY {ts_col} ASC, {id_col} ASC)
),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY {key_col}
            ORDER BY {ts_col} ASC, {id_col} ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
paths AS (
  SELECT {key_col}, sid,
         string_agg({type_col}, '>' ORDER BY {ts_col} ASC, {id_col} ASC)
           AS path
  FROM sess GROUP BY {key_col}, sid
),
top AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM paths GROUP BY path
  ORDER BY n_sessions DESC, path ASC LIMIT {top_n}
)
SELECT path, n_sessions,
       row_number() OVER (ORDER BY n_sessions DESC, path ASC) AS rank
FROM top
"""


def cusum_changepoints(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    target: float = 50.0,
    slack: float = 5.0,
    threshold: float = 200.0,
) -> DataFrame:
    """Two-sided CUSUM drift detection (Page 1954) per key: alarm
    when the cumulative deviation from a known in-control ``target``
    exceeds ``threshold``.

    The textbook form is a clamped recursion
    ``S_t = max(0, S_{t-1} + (x_t - target - slack))`` — not a window
    aggregate. It IS, however, exactly equal to the closed form
    ``S_t = cum_t - min(0, min_{j<=t} cum_j)`` over the running sum
    ``cum`` of the deviations, which is two INCREMENTAL running
    frames (``unboundedPreceding .. currentRow`` sum, then the same
    frame's min over the sum) — O(n) per key, never a shrinking or
    lookahead frame (the SCALE.md O(n^2) hazard class).

    ``target``/``slack`` are parameters, not data-derived: Page's
    CUSUM monitors against a KNOWN in-control mean, and a fixed
    reference keeps every gated value an exact 2-decimal rational
    (a data-derived mean is a per-key quotient — the cross-engine
    4-dp rounding-tie class the verify notes document).

    Scale shape: one per-key sort shuffle; both window passes use the
    same (partition, ordering) so Spark plans one exchange + sort
    with chained running-frame Window operators; per-row state is
    O(1). Generalizes the deviation pairing of the reference's
    telemetry alerting (reference: darkpool_trades/main.py:71-78).

    Numerical note (property-fuzzed in tests/test_tsstats_risk.py):
    the closed form subtracts two running quantities, so after a very
    long sustained drift |cum| grows while S stays near 0 and the
    absolute precision of S degrades to ulp(cum) — identical in both
    engines (same accumulation sequence) but worth a per-epoch reset
    (window the input) for billion-row single-key histories. The
    streaming twin (streaming/cep.py) carries the recursion directly
    and does not accumulate this term.
    """
    from pyspark.sql import Window

    run = (
        Window.partitionBy("key")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    stage = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    ).select(
        "*",
        F.sum(F.col("value") - F.lit(float(target) + float(slack)))
        .over(run)
        .alias("_cum_pos"),
        F.sum(F.lit(float(target) - float(slack)) - F.col("value"))
        .over(run)
        .alias("_cum_neg"),
    )
    s_pos = F.col("_cum_pos") - F.least(
        F.lit(0.0), F.min("_cum_pos").over(run)
    )
    s_neg = F.col("_cum_neg") - F.least(
        F.lit(0.0), F.min("_cum_neg").over(run)
    )
    return stage.select(
        "key",
        "event_id",
        "ts",
        "value",
        F.round(s_pos, 4).alias("s_pos"),
        F.round(s_neg, 4).alias("s_neg"),
        (s_pos > F.lit(float(threshold))).alias("alarm_pos"),
        (s_neg > F.lit(float(threshold))).alias("alarm_neg"),
    )


def cusum_summary(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    target: float = 50.0,
    slack: float = 5.0,
    threshold: float = 200.0,
) -> DataFrame:
    """Per-key drift report over :func:`cusum_changepoints`: alarm
    counts on each side, the peak statistics, and the first alarm
    time — the monitoring-dashboard row."""
    rows = cusum_changepoints(
        df,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        id_col=id_col,
        target=target,
        slack=slack,
        threshold=threshold,
    )
    return rows.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("alarm_pos").cast("bigint")).alias("n_alarms_pos"),
        F.sum(F.col("alarm_neg").cast("bigint")).alias("n_alarms_neg"),
        F.round(F.max("s_pos"), 4).alias("max_s_pos"),
        F.round(F.max("s_neg"), 4).alias("max_s_neg"),
        F.min(F.when(F.col("alarm_pos") | F.col("alarm_neg"), F.col("ts")))
        .alias("first_alarm_ts"),
    )


def cusum_summary_sql(
    *,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    target: float = 50.0,
    slack: float = 5.0,
    threshold: float = 200.0,
) -> str:
    hi = float(target) + float(slack)
    lo = float(target) - float(slack)
    return f"""
WITH cum AS (
  SELECT {key_col} AS key, {id_col} AS event_id, {ts_col} AS ts,
         SUM({value_col} - {hi}) OVER w AS cum_pos,
         SUM({lo} - {value_col}) OVER w AS cum_neg
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col}
               ORDER BY {ts_col} ASC, {id_col} ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT key, event_id, ts,
         cum_pos - LEAST(0, MIN(cum_pos) OVER w2) AS s_pos,
         cum_neg - LEAST(0, MIN(cum_neg) OVER w2) AS s_neg
  FROM cum
  WINDOW w2 AS (PARTITION BY key
                ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN s_pos > {float(threshold)} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarms_pos,
       CAST(SUM(CASE WHEN s_neg > {float(threshold)} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarms_neg,
       ROUND(MAX(s_pos), 4) AS max_s_pos,
       ROUND(MAX(s_neg), 4) AS max_s_neg,
       MIN(CASE WHEN s_pos > {float(threshold)}
                 OR s_neg > {float(threshold)} THEN ts END)
         AS first_alarm_ts
FROM s GROUP BY key
"""


def drawdown_features(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    vol_window: int = 20,
) -> DataFrame:
    """Per-key running-peak drawdown and trailing volatility — the
    risk-monitoring pair of a TS analytics engine.

    - ``run_max``: running maximum (incremental
      ``unboundedPreceding`` frame, O(n) per key — NOT the reversed
      lookahead form).
    - ``drawdown``: ``run_max - value``, distance below the peak so
      far. (A percentage drawdown is a quotient of 2-decimal values
      and can land on exact 4-dp rounding ties cross-engine, so the
      absolute form is what's gated; callers can divide downstream.)
    - ``roll_vol``: sample stddev over the trailing ``vol_window + 1``
      rows — a BOUNDED sliding frame, per-row cost O(L), per-row
      state O(L). The sqrt keeps gated values off the decimal grid,
      so 4-dp rounding is tie-free by construction.
    - ``at_peak``: the row sets a new running high (exact double
      equality against its own running max — both engines read the
      identical parquet double).

    Scale shape: one per-key sort shuffle; all three aggregates share
    the (partition, ordering) pair so one exchange + one sort feeds
    chained Window operators; no lookahead frames, no global window.
    """
    from pyspark.sql import Window

    base = (
        Window.partitionBy("key")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
    )
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    trail = base.rowsBetween(-vol_window, 0)
    run_max = F.max("value").over(run)
    return df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    ).select(
        "key",
        "event_id",
        "ts",
        "value",
        F.round(run_max, 4).alias("run_max"),
        F.round(run_max - F.col("value"), 4).alias("drawdown"),
        F.round(F.stddev_samp("value").over(trail), 4).alias("roll_vol"),
        (F.col("value") == run_max).alias("at_peak"),
    )


def drawdown_features_sql(
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    vol_window: int = 20,
    where: str = "TRUE",
) -> str:
    return f"""
SELECT {key_col} AS key, {id_col} AS event_id, {ts_col} AS ts,
       {value_col} AS value,
       ROUND(MAX({value_col}) OVER run, 4) AS run_max,
       ROUND(MAX({value_col}) OVER run - {value_col}, 4) AS drawdown,
       ROUND(STDDEV_SAMP({value_col}) OVER trail, 4) AS roll_vol,
       {value_col} = MAX({value_col}) OVER run AS at_peak
FROM {table} WHERE {where}
WINDOW run AS (PARTITION BY {key_col}
               ORDER BY {ts_col} ASC, {id_col} ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       trail AS (PARTITION BY {key_col}
                 ORDER BY {ts_col} ASC, {id_col} ASC
                 ROWS BETWEEN {vol_window} PRECEDING AND CURRENT ROW)
"""


def funnel_path(
    events: DataFrame,
    stages: list[str],
    within_minutes: int,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-stage funnel (MATCH_RECOGNIZE-lite): for every
    ``stages[0]`` event, greedily chain the earliest at-or-after
    match of each subsequent stage on the same key, and report the
    chain's per-stage timestamps plus whether it COMPLETED within
    ``within_minutes`` of the start.

    Greedy earliest matching is exact for the "does any chain exist"
    question: taking the earliest stage-i match only loosens every
    later constraint (exchange argument), so the greedy chain
    completes within the horizon iff any chain does — and its
    timestamps are the canonical (lexicographically smallest) witness.
    Stage timestamps are monotone, so only the FINAL timestamp needs
    the horizon check.

    Composition: k-1 chained FORWARD as-of joins (operators/asof.py)
    — each one union + per-key sort + reversed running
    ``last(ignorenulls)`` frame, O(n) per key per stage, never a
    lookahead frame (plans/lint.py-clean). Starts that die at stage i
    leave the chain (their remaining stages are null) and skip the
    later passes. Cost: k-1 key-partitioned shuffles of
    (alive starts + stage-i events) — linear in the number of stages,
    with the relation SHRINKING as stages kill starts.

    Generalizes the 2-stage :func:`funnel_conversions` (same
    semantics at k=2 modulo its strictly-after tie rule; at
    microsecond event time the distinction is unobservable).
    """
    if len(stages) < 2:
        raise ValueError("funnel_path needs at least 2 stages")
    from ts_data_pipeline_spark.operators import asof

    def stage_events(name: str) -> DataFrame:
        return events.filter(F.col(type_col) == name).select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("_prev"),
            F.col(ts_col).alias("_match"),
        )

    alive = events.filter(F.col(type_col) == stages[0]).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.col(ts_col).alias("_prev"),
    )
    stage_cols = [f"ts_{i}_{name}" for i, name in enumerate(stages[1:], 1)]
    dead: list[DataFrame] = []
    for i, name in enumerate(stages[1:], 1):
        col = stage_cols[i - 1]
        joined = asof.asof_join(
            alive,
            stage_events(name),
            key="key",
            ts="_prev",
            right_value_cols=["_match"],
            direction="forward",
        ).withColumnRenamed("_match", col)
        died = joined.filter(F.col(col).isNull())
        for later in stage_cols[i:]:
            died = died.withColumn(later, F.lit(None).cast("timestamp"))
        dead.append(died)
        alive = (
            joined.filter(F.col(col).isNotNull())
            .withColumn("_prev", F.col(col))
        )
    out = alive
    for d in dead:
        out = out.unionByName(d)
    final = F.col(stage_cols[-1])
    horizon = F.col("ts") + F.expr(f"INTERVAL {int(within_minutes)} MINUTES")
    return out.select(
        "event_id",
        "key",
        "ts",
        *stage_cols,
        (final.isNotNull() & (final <= horizon)).alias("completed"),
    )


def funnel_path_sql(
    stages: list[str],
    within_minutes: int,
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin: chained native forward ASOF joins (the inequality
    ``prev <= e.ts`` makes DuckDB pick the SMALLEST qualifying right
    timestamp — the at-or-after greedy match).

    Dead chains must be masked EXPLICITLY: DuckDB's ASOF JOIN with a
    NULL left timestamp does not null out — it matches the earliest
    right row (NULLS sort first in the inequality ordering), which
    would resurrect a chain that already died at an earlier stage
    with a match BEFORE the start event. The CASE guard keeps a null
    ``prev`` null through every later stage."""
    stage_cols = [f"ts_{i}_{name}" for i, name in enumerate(stages[1:], 1)]
    sql = (
        f"WITH c0 AS (SELECT {key_col} AS key, {id_col} AS event_id,"
        f" {ts_col} AS ts, {ts_col} AS prev FROM {table}"
        f" WHERE {type_col} = '{stages[0]}')"
    )
    for i, name in enumerate(stages[1:], 1):
        col = stage_cols[i - 1]
        sql += f""",
c{i} AS (
  SELECT c{i - 1}.* EXCLUDE (prev),
         CASE WHEN c{i - 1}.prev IS NULL THEN NULL ELSE e.ts END AS {col},
         CASE WHEN c{i - 1}.prev IS NULL THEN NULL ELSE e.ts END AS prev
  FROM c{i - 1} ASOF LEFT JOIN
       (SELECT {key_col} AS key, {ts_col} AS ts FROM {table}
        WHERE {type_col} = '{name}') e
    ON c{i - 1}.key = e.key AND c{i - 1}.prev <= e.ts
)"""
    cols = ", ".join(stage_cols)
    last = stage_cols[-1]
    return f"""{sql}
SELECT event_id, key, ts, {cols},
       {last} IS NOT NULL
         AND {last} <= ts + INTERVAL {int(within_minutes)} MINUTE
         AS completed
FROM c{len(stages) - 1}
"""


# ---------------------------------------------------------------------------
# Seasonal-naive decomposition: hour-of-day baseline + residual
# anomalies (the "same-hour-yesterday" detrending a telemetry engine
# runs before alerting on raw values)


def seasonal_hour_profile(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, hour-of-day) seasonal baseline: n / mean / sample
    stddev of the value. ONE map-side-combinable groupBy over at most
    |keys| x 24 groups — the profile relation is bounded by key
    cardinality, broadcastable at any corpus size (the same
    broadcast-stats shape as the quantization frames).

    The GATED columns are the carried state — n, ROUND(sum, 2),
    ROUND(sum of squares, 4): sums of 0.01-grid values sit on coarse
    grids where 1e-12 summation drift cannot reach a rounding
    boundary. mu/sd are emitted for consumers but deliberately NOT
    hash-gated: AVG over a power-of-two slot count divides the 2-dp
    grid exactly onto 4-dp HALVES (a (signup, hour-13, n=8) slot at
    sf0.001 landed on mean ...77875, where Spark and DuckDB round to
    opposite sides — the verify-skill tie class, hit live in r7).
    """
    return (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.hour(ts_col).cast("bigint").alias("hod"),
        )
        .agg(
            F.count(value_col).alias("n"),
            F.round(F.sum(value_col), 2).alias("v_sum"),
            F.round(F.sum(F.col(value_col) * F.col(value_col)), 4).alias(
                "v_sumsq"
            ),
            F.round(F.avg(value_col), 4).alias("mu"),
            F.round(F.stddev_samp(value_col), 4).alias("sd"),
        )
    )


def seasonal_hour_profile_sql(
    *,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    return f"""
SELECT {key_col} AS key, EXTRACT(hour FROM {ts_col}) AS hod,
       CAST(COUNT({value_col}) AS BIGINT) AS n,
       ROUND(SUM({value_col}), 2) AS v_sum,
       ROUND(SUM({value_col} * {value_col}), 4) AS v_sumsq,
       ROUND(AVG({value_col}), 4) AS mu,
       ROUND(stddev_samp({value_col}), 4) AS sd
FROM {table}
GROUP BY 1, 2
"""


def seasonal_anomalies(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    z_threshold: float = 3.0,
    min_n: int = 30,
) -> DataFrame:
    """Points anomalous AGAINST THEIR SEASONAL SLOT: z-score of each
    value vs its own (key, hour-of-day) baseline — a 9 AM spike is
    judged against 9 AMs, not the all-day mix that double-counts the
    diurnal cycle as variance (the failure mode of the flat rolling
    z-score on seasonal series; both operators ship because they
    catch different anomalies).

    Plan shape: the profile aggregate (|keys| x 24 rows) broadcasts
    back onto the scan — no window, no per-key sort, one shuffle
    total. Membership compares the ROUNDED z. mu and sd are each
    engine's own aggregates (summation order differs at ulp scale),
    but z divides by a sqrt, which keeps the true value OFF the
    decimal grid — a 4-dp rounding flip needs the true z within
    ~1e-12 of a half boundary, measure-zero on continuous values
    (the same accepted risk class as the rolling z-score gate; the
    GRID-valued quantities, where ties are systematic rather than
    accidental, are what seasonal_hour_profile refuses to gate).
    """
    prof = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.hour(ts_col).cast("bigint").alias("hod"),
        )
        .agg(
            F.count(value_col).alias("n"),
            F.avg(value_col).alias("mu"),
            F.stddev_samp(value_col).alias("sd"),
        )
        .filter((F.col("n") >= min_n) & (F.col("sd") > 0))
    )
    scored = df.select(
        F.col(id_col),
        F.col(key_col).alias("key"),
        F.col(ts_col),
        F.hour(ts_col).cast("bigint").alias("hod"),
        F.col(value_col),
    ).join(F.broadcast(prof), ["key", "hod"])
    z = F.round((F.col(value_col) - F.col("mu")) / F.col("sd"), 4)
    return (
        scored.withColumn("z", z)
        .filter(F.abs("z") >= z_threshold)
        .select(id_col, "key", ts_col, "hod", value_col, "n", "z")
    )


def seasonal_anomalies_sql(
    *,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    z_threshold: float = 3.0,
    min_n: int = 30,
) -> str:
    return f"""
WITH prof AS (
  SELECT {key_col} AS key, EXTRACT(hour FROM {ts_col}) AS hod,
         COUNT({value_col}) AS n, AVG({value_col}) AS mu,
         stddev_samp({value_col}) AS sd
  FROM {table}
  GROUP BY 1, 2
  HAVING COUNT({value_col}) >= {min_n} AND stddev_samp({value_col}) > 0
),
scored AS (
  SELECT e.{id_col}, p.key, e.{ts_col}, p.hod, e.{value_col},
         CAST(p.n AS BIGINT) AS n,
         ROUND((e.{value_col} - p.mu) / p.sd, 4) AS z
  FROM {table} e
  JOIN prof p ON e.{key_col} = p.key
             AND EXTRACT(hour FROM e.{ts_col}) = p.hod
)
SELECT {id_col}, key, {ts_col}, hod, {value_col}, n, z
FROM scored WHERE ABS(z) >= {float(z_threshold)}
"""


# ---------------------------------------------------------------------------
# Time-weighted average over irregular samples (the `time_weight`
# aggregate of purpose-built TS engines: a value holds until the next
# sample, so sparse slow-moving series don't get equal-weighted like
# dense bursts)


def time_weighted_avg(
    df: DataFrame,
    bucket_minutes: int = 60,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-(key, bucket) time-weighted average under LOCF hold
    semantics: each sample's value is weighted by how long it HELD —
    ``min(next sample ts, bucket end) - ts`` — so a value that stood
    for 50 minutes outweighs ten ticks in one second (the equal-
    weight AVG failure on irregular telemetry).

    Convention (documented, both engines identical): holds are
    clipped at the bucket end (no cross-bucket carry — the LOCF
    interpolation spine is the tool for gap-filling ACROSS buckets);
    the denominator is the COVERED span, bucket_end - first sample
    ts, so a bucket with one sample at its midpoint reports that
    sample's value, not half of it.

    Plan shape: one per-key window for lead(ts) (bounded offset, no
    lookahead frame — lead is physical offset 1, not an
    UnboundedFollowing recompute) + one map-side-combinable groupBy.
    All weights are exact integer microseconds.

    Gated columns are the CARRIED state — n, coverage_us,
    ROUND(weighted_sum, 2) (the 0.01-value x integer-us grid is
    coarse enough that summation drift cannot cross a boundary);
    ``twa`` is the derived division, emitted for consumers but NOT
    hash-gated (the seasonal-profile AVG half-tie lesson).
    """
    from pyspark.sql import Window

    bucket_us = bucket_minutes * 60_000_000
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    ts_us = F.unix_micros(F.col(ts_col))
    bucket = _floor_div_us(ts_us, bucket_us)
    rows = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(id_col),
            ts_us.alias("t"),
            bucket.alias("b"),
            F.col(value_col).alias("v"),
            F.lead(ts_us, 1).over(w).alias("t_next"),
        )
        .filter(F.col("v").isNotNull())
        .withColumn("b_end", (F.col("b") + 1) * bucket_us)
        .withColumn(
            "hold_us",
            F.least(F.coalesce("t_next", F.col("b_end")), F.col("b_end"))
            - F.col("t"),
        )
    )
    return (
        rows.groupBy("key", "b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("b_end") - F.min("t")).alias("coverage_us"),
            F.round(F.sum(F.col("v") * F.col("hold_us")), 2).alias(
                "weighted_sum"
            ),
        )
        .select(
            "key",
            F.col("b").alias("bucket"),
            "n",
            "coverage_us",
            "weighted_sum",
            F.round(
                F.col("weighted_sum") / F.col("coverage_us"), 4
            ).alias("twa"),
        )
    )


def time_weighted_avg_sql(
    bucket_minutes: int = 60,
    *,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`time_weighted_avg` — same integer-us
    holds, same clipping, same carried-state rounding. The bucket is
    exact integer FLOOR division (DuckDB's ``//`` truncates toward
    zero on integers, like Spark's double-cast did): subtract the
    nonnegative pmod first, then the ``//`` divides exactly — the
    same formula as the Spark side's ``_floor_div_us``."""
    bucket_us = bucket_minutes * 60_000_000
    b = (
        f"(epoch_us({ts_col}) - ((epoch_us({ts_col}) % {bucket_us})"
        f" + {bucket_us}) % {bucket_us}) // {bucket_us}"
    )
    return f"""
WITH pts AS (
  SELECT {key_col} AS key, {id_col},
         epoch_us({ts_col}) AS t,
         {b} AS b,
         {value_col} AS v,
         LEAD(epoch_us({ts_col}), 1) OVER (
           PARTITION BY {key_col}
           ORDER BY {ts_col} ASC, {id_col} ASC) AS t_next
  FROM {table}
),
held AS (
  SELECT key, b, v,
         (b + 1) * {bucket_us} AS b_end,
         LEAST(COALESCE(t_next, (b + 1) * {bucket_us}),
               (b + 1) * {bucket_us}) - t AS hold_us,
         t
  FROM pts WHERE v IS NOT NULL
)
SELECT key, b AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(b_end) - MIN(t) AS BIGINT) AS coverage_us,
       ROUND(SUM(v * hold_us), 2) AS weighted_sum,
       ROUND(ROUND(SUM(v * hold_us), 2) / (MAX(b_end) - MIN(t)), 4)
         AS twa
FROM held GROUP BY key, b
"""


# ---------------------------------------------------------------------------
# Counter semantics: per-bucket increase with reset detection, and
# heartbeat gap scanning (the rate()/absent() pair of metric engines)


def counter_increase(
    df: DataFrame,
    bucket_minutes: int = 60,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-(key, bucket) INCREASE of a monotonic counter with reset
    detection — the Prometheus ``increase()``/``rate()`` convention:
    a sample below its predecessor means the counter restarted, and
    the post-reset value counts in full (the true increase since the
    reset is unobservable; assuming a restart from zero is the
    standard estimator). Deltas are computed per key across the FULL
    timeline (a bucket's first sample diffs against the previous
    bucket's last — increases at boundaries are never dropped), then
    aggregated per bucket.

    Plan shape: one per-key lag window (bounded offset) + one
    map-side-combinable groupBy. Gated values: n_samples, n_resets
    (integers) and ROUND(increase, 2) — sums of 0.01-grid deltas stay
    on a coarse grid (carried-state convention).
    """
    from pyspark.sql import Window

    bucket_us = bucket_minutes * 60_000_000
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    ts_us = F.unix_micros(F.col(ts_col))
    rows = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(id_col),
            _floor_div_us(ts_us, bucket_us).alias("b"),
            F.col(value_col).alias("v"),
            F.lag(F.col(value_col), 1).over(w).alias("v_prev"),
        )
        .withColumn(
            "delta",
            F.when(F.col("v_prev").isNull(), F.lit(None).cast("double"))
            .when(F.col("v") >= F.col("v_prev"), F.col("v") - F.col("v_prev"))
            .otherwise(F.col("v")),  # reset: restarted-from-zero estimate
        )
        .withColumn(
            "is_reset",
            (F.col("v_prev").isNotNull()
             & (F.col("v") < F.col("v_prev"))).cast("bigint"),
        )
    )
    return (
        rows.groupBy("key", "b")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("is_reset").alias("n_resets"),
            F.round(F.coalesce(F.sum("delta"), F.lit(0.0)), 2).alias(
                "increase"
            ),
        )
        .select(
            "key", F.col("b").alias("bucket"), "n_samples", "n_resets",
            "increase",
        )
    )


def counter_increase_sql(
    bucket_minutes: int = 60,
    *,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    bucket_us = bucket_minutes * 60_000_000
    return f"""
WITH pts AS (
  SELECT {key_col} AS key, {id_col},
         (epoch_us({ts_col}) - ((epoch_us({ts_col}) % {bucket_us})
          + {bucket_us}) % {bucket_us}) // {bucket_us} AS b,
         {value_col} AS v,
         LAG({value_col}, 1) OVER (
           PARTITION BY {key_col}
           ORDER BY {ts_col} ASC, {id_col} ASC) AS v_prev
  FROM {table} WHERE {value_col} IS NOT NULL
),
d AS (
  SELECT key, b,
         CASE WHEN v_prev IS NULL THEN NULL
              WHEN v >= v_prev THEN v - v_prev
              ELSE v END AS delta,
         CASE WHEN v_prev IS NOT NULL AND v < v_prev
              THEN 1 ELSE 0 END AS is_reset
  FROM pts
)
SELECT key, b AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(is_reset) AS BIGINT) AS n_resets,
       ROUND(COALESCE(SUM(delta), 0), 2) AS increase
FROM d GROUP BY key, b
"""


def heartbeat_gaps(
    df: DataFrame,
    gap_minutes: int = 30,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Silence detection: every interval where a key produced NO
    sample for more than ``gap_minutes`` — the ``absent()``/
    dead-man's-switch scan of a metrics engine. One per-key lead
    window (bounded offset); gap bounds are exact microseconds.

    Output: (key, gap_start, gap_end, gap_us) — the silent interval
    between consecutive samples. The trailing open gap (after a key's
    last sample) is a STREAMING concern (no batch endpoint exists);
    the CEP timeout machinery is the tool there.
    """
    from pyspark.sql import Window

    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    ts_us = F.unix_micros(F.col(ts_col))
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("gap_start"),
            ts_us.alias("t"),
            F.lead(ts_us, 1).over(
                Window.partitionBy(key_col).orderBy(
                    F.col(ts_col).asc(), F.col(id_col).asc()
                )
            ).alias("t_next"),
            F.lead(F.col(ts_col), 1).over(w).alias("gap_end"),
        )
        .filter(
            F.col("t_next").isNotNull()
            & ((F.col("t_next") - F.col("t")) > gap_us)
        )
        .select(
            "key",
            "gap_start",
            "gap_end",
            (F.col("t_next") - F.col("t")).alias("gap_us"),
        )
    )


def heartbeat_gaps_sql(
    gap_minutes: int = 30,
    *,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH pts AS (
  SELECT {key_col} AS key, {ts_col} AS gap_start,
         epoch_us({ts_col}) AS t,
         LEAD(epoch_us({ts_col}), 1) OVER w AS t_next,
         LEAD({ts_col}, 1) OVER w AS gap_end
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col}
               ORDER BY {ts_col} ASC, {id_col} ASC)
)
SELECT key, gap_start, gap_end,
       CAST(t_next - t AS BIGINT) AS gap_us
FROM pts
WHERE t_next IS NOT NULL AND t_next - t > {gap_us}
"""


def m4_downsample(
    df: DataFrame,
    n_buckets: int = 100,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per (key, pixel
    bucket), the four extreme points — first/last by time and the
    min/max by value — which render a line chart PIXEL-EXACTLY at
    n_buckets horizontal resolution. The query every time-series
    dashboard (the reference's chart panels,
    /root/reference/dashboard/src/) runs before drawing anything.

    Shape: ONE map-side-combinable groupBy of struct-min/max
    aggregates — no window, no sort, no per-key sequential state (the
    reason M4 beats LTTB at scale: LTTB's chosen-point recursion is
    inherently sequential per series). The x-axis bounds are a 1-row
    broadcast (all series share the chart's time range). Buckets are
    exact BIGINT integer division (`DIV` here, `//` in the twin) on
    nonnegative deltas — no double-precision intermediate, so the
    engines agree even when span * n_buckets exceeds 2^53.

    Determinism: winners are lexicographic struct extremes —
    first = min(ts, id), last = max(ts, id), vmin = min(v, id),
    vmax = max(v, id) — id tie-breaks mirrored in the twin's
    row_number orderings. NULL values drop (they render nothing).
    """
    ts_us = F.unix_micros(F.col(ts_col))
    pts = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        ts_us.alias("t"),
        F.col(value_col).alias("v"),
    )
    bounds = pts.agg(
        F.min("t").alias("tmin"),
        (F.max("t") - F.min("t") + 1).alias("span"),
    )
    bucketed = pts.crossJoin(F.broadcast(bounds)).select(
        "key",
        "id",
        "t",
        "v",
        F.expr(f"((t - tmin) * CAST({n_buckets} AS BIGINT)) DIV span")
        .alias("bucket"),
    )
    return (
        bucketed.groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct("t", "id", "v")).alias("first"),
            F.max(F.struct("t", "id", "v")).alias("last"),
            F.min(F.struct("v", "id", "t")).alias("lo"),
            F.max(F.struct("v", "id", "t")).alias("hi"),
        )
        .select(
            "key",
            "bucket",
            "n",
            F.timestamp_micros(F.col("first.t")).alias("t_first"),
            F.col("first.v").alias("v_first"),
            F.timestamp_micros(F.col("last.t")).alias("t_last"),
            F.col("last.v").alias("v_last"),
            F.col("lo.v").alias("v_min"),
            F.timestamp_micros(F.col("lo.t")).alias("t_vmin"),
            F.col("hi.v").alias("v_max"),
            F.timestamp_micros(F.col("hi.t")).alias("t_vmax"),
        )
    )


def m4_downsample_sql(
    n_buckets: int = 100,
    *,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`m4_downsample` — the same four extremes
    via explicitly-ordered row_number windows (min/max over structs
    is the Spark spelling; the orderings below reproduce the struct
    lexicography: ties on the leading field break by id)."""
    return f"""
WITH pts AS (
  SELECT {key_col} AS key, {id_col} AS id,
         epoch_us({ts_col}) AS t, {value_col} AS v
  FROM {table} WHERE {value_col} IS NOT NULL
),
bounds AS (SELECT MIN(t) AS tmin, MAX(t) - MIN(t) + 1 AS span FROM pts),
bk AS (
  SELECT p.key, p.id, p.t, p.v,
         ((p.t - b.tmin) * {n_buckets}) // b.span AS bucket
  FROM pts p CROSS JOIN bounds b
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY key, bucket
           ORDER BY t ASC, id ASC) AS r_first,
         row_number() OVER (PARTITION BY key, bucket
           ORDER BY t DESC, id DESC) AS r_last,
         row_number() OVER (PARTITION BY key, bucket
           ORDER BY v ASC, id ASC) AS r_lo,
         row_number() OVER (PARTITION BY key, bucket
           ORDER BY v DESC, id DESC) AS r_hi,
         COUNT(*) OVER (PARTITION BY key, bucket) AS n
  FROM bk
)
SELECT key, bucket, CAST(MAX(n) AS BIGINT) AS n,
       MAX(CASE WHEN r_first = 1 THEN make_timestamp(t) END) AS t_first,
       MAX(CASE WHEN r_first = 1 THEN v END) AS v_first,
       MAX(CASE WHEN r_last = 1 THEN make_timestamp(t) END) AS t_last,
       MAX(CASE WHEN r_last = 1 THEN v END) AS v_last,
       MAX(CASE WHEN r_lo = 1 THEN v END) AS v_min,
       MAX(CASE WHEN r_lo = 1 THEN make_timestamp(t) END) AS t_vmin,
       MAX(CASE WHEN r_hi = 1 THEN v END) AS v_max,
       MAX(CASE WHEN r_hi = 1 THEN make_timestamp(t) END) AS t_vmax
FROM r GROUP BY key, bucket
"""
