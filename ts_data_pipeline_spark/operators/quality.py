"""Data-quality / observability operators (SURVEY §2.7, Q1-Q6).

Reference: the MarketDataMonitor in
/root/reference/darkpool_trades/metrics.py:90-183 — required-field
checks, latency, sequential price-gap detection, zero-price and
staleness counters, and a summary frame.

Spark-first restatement: the per-message mutable counters become
window functions (lag over event-time per key) feeding one grouped
aggregation — a single shuffle-light plan instead of a driver-side
deque. At 100 TB the lag window shuffles once by key and the final
agg reuses map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def data_quality_summary(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    price: str = "value",
    group: str = "event_type",
    gap_pct: float = 2.0,
    stale_us: int = 3_600_000_000,
    zero_eps: float = 0.02,
) -> DataFrame:
    """Q1-Q4 composite: per-group quality counters.

    - null/zero price counts (metrics.py:113-123),
    - price gap vs previous print > gap_pct (metrics.py:104-115),
    - inter-arrival staleness > stale_us (metrics.py:116-123),
    - max inter-arrival gap (latency-style summary, metrics.py:102).
    """
    w = Window.partitionBy(key).orderBy(ts)
    prev_price = F.lag(price).over(w)
    gap_us = F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w))
    enriched = events.select(
        F.col(group).alias("grp"),
        F.col(price).alias("price"),
        prev_price.alias("prev_price"),
        gap_us.alias("gap_us"),
    )
    return (
        enriched.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("price").isNull(), 1).otherwise(0)).alias("null_price_cnt"),
            F.sum(F.when(F.col("price") <= zero_eps, 1).otherwise(0)).alias("zero_price_cnt"),
            F.sum(
                F.when(
                    F.col("prev_price").isNotNull()
                    & (F.abs(F.col("price") / F.col("prev_price") - 1) > gap_pct),
                    1,
                ).otherwise(0)
            ).alias("gap_cnt"),
            F.sum(F.when(F.col("gap_us") > stale_us, 1).otherwise(0)).alias("stale_cnt"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


def data_quality_summary_sql(
    table: str = "events",
    key: str = "user_id",
    ts: str = "ts",
    price: str = "value",
    group: str = "event_type",
    gap_pct: float = 2.0,
    stale_us: int = 3_600_000_000,
    zero_eps: float = 0.02,
) -> str:
    """DuckDB oracle for data_quality_summary."""
    return f"""
WITH w AS (
  SELECT
    {group} AS grp,
    {price} AS price,
    lag({price}) OVER (PARTITION BY {key} ORDER BY {ts}) AS prev_price,
    epoch_us({ts}) - lag(epoch_us({ts})) OVER (PARTITION BY {key} ORDER BY {ts}) AS gap_us
  FROM {table}
)
SELECT
  grp,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN price IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price_cnt,
  CAST(SUM(CASE WHEN price <= {zero_eps} THEN 1 ELSE 0 END) AS BIGINT) AS zero_price_cnt,
  CAST(SUM(CASE WHEN prev_price IS NOT NULL
                 AND abs(price / prev_price - 1) > {gap_pct}
            THEN 1 ELSE 0 END) AS BIGINT) AS gap_cnt,
  CAST(SUM(CASE WHEN gap_us > {stale_us} THEN 1 ELSE 0 END) AS BIGINT) AS stale_cnt,
  MAX(gap_us) AS max_gap_us
FROM w
GROUP BY grp
"""


def consecutive_alert_runs(
    df: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    threshold: float = 40.0,
    min_run: int = 3,
) -> DataFrame:
    """Q5 — alert when >= ``min_run`` consecutive records alert.

    The reference counts consecutive alerting messages in a driver
    loop (/root/reference/darkpool_trades/metrics.py:136-161).
    Spark-first: gaps-and-islands — island id = row_number difference
    between the full per-key sequence and the per-(key, flag)
    sequence, then one grouped count per island. Two window passes
    over the same (key, ts) sort order -> a single shuffle by key.
    """
    flagged = df.select(
        F.col(key).alias("key"),
        F.col(ts).alias("ts"),
        (F.col(value) > threshold).cast("int").alias("alert"),
    ).withColumn("rn", F.row_number().over(Window.partitionBy("key").orderBy("ts")))
    w_flag = Window.partitionBy("key", "alert").orderBy("ts")
    islands = flagged.withColumn(
        "island", F.col("rn") - F.row_number().over(w_flag)
    )
    return (
        islands.filter(F.col("alert") == 1)
        .groupBy("key", "island")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
        )
        .filter(F.col("run_len") >= min_run)
        .select("key", "run_len", "run_start", "run_end")
    )


def consecutive_alert_runs_sql(
    table: str = "events",
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    threshold: float = 40.0,
    min_run: int = 3,
) -> str:
    return f"""
WITH flagged AS (
  SELECT {key} AS key, {ts} AS ts,
         CASE WHEN {value} > {threshold} THEN 1 ELSE 0 END AS alert,
         row_number() OVER (PARTITION BY {key} ORDER BY {ts}) AS rn
  FROM {table}
),
islands AS (
  SELECT key, ts, alert,
         rn - row_number() OVER (PARTITION BY key, alert ORDER BY ts) AS island
  FROM flagged
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS run_len,
       MIN(ts) AS run_start, MAX(ts) AS run_end
FROM islands WHERE alert = 1
GROUP BY key, island
HAVING COUNT(*) >= {min_run}
"""


def metrics_summary(
    df: DataFrame, *, group: str = "event_type", value: str = "value"
) -> DataFrame:
    """Q6 — describe-style summary frame per metric group.

    The reference keeps a rolling deque(1000) and summarizes it into
    a pandas frame (/root/reference/darkpool_trades/metrics.py:59,
    169-183); here it is one grouped aggregate over the full data —
    partial/final agg, no bounded driver buffer.
    """
    v = F.col(value)
    return df.groupBy(F.col(group).alias("grp")).agg(
        F.count(v).alias("n"),
        F.round(F.avg(v), 4).alias("mean"),
        F.round(F.stddev_samp(v), 4).alias("std"),
        F.min(v).alias("min"),
        # Exact interpolating median to match the oracle; at corpus
        # scale swap for percentile_approx(v, 0.5) — same plan shape,
        # bounded-memory sketch instead of a full sort per group.
        F.round(F.median(v), 4).alias("median"),
        F.max(v).alias("max"),
    )


def metrics_summary_sql(
    table: str = "events", group: str = "event_type", value: str = "value"
) -> str:
    return f"""
SELECT {group} AS grp,
       COUNT({value}) AS n,
       ROUND(AVG({value}), 4) AS mean,
       ROUND(stddev_samp({value}), 4) AS std,
       MIN({value}) AS min,
       ROUND(median({value}), 4) AS median,
       MAX({value}) AS max
FROM {table}
GROUP BY {group}
"""


def required_field_nulls(df: DataFrame, fields: list[str]) -> DataFrame:
    """Q1 — per-field null counts in one pass (metrics.py:100-101)."""
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.when(F.col(f).isNull(), 1).otherwise(0)).alias(f"null_{f}")
            for f in fields
        ],
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback: int = 20,
    z_threshold: float = 3.0,
    min_history: int = 5,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection (Q3/Q5 extension:
    the alerting scan of a live TS engine).

    Each point is scored against the trailing ``lookback`` points of
    ITS OWN key (rows between -lookback and -1 — the current point
    never contaminates its own baseline); |z| >= threshold rows are
    flagged. Points with fewer than ``min_history`` trailing samples
    are unscored (insufficient baseline, never "anomalous").

    Scale shape: one per-key window sort — the same shuffle class as
    the quality lag windows (SCALE.md): keys are numerous and small,
    so per-key state is bounded; no global sort. The z expression is
    engine-portable (stddev_samp over an identical frame, ROUND 4dp
    both sides).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-lookback, -1)
    )
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    hist = F.count(value_col).over(w)
    z = (F.col(value_col) - mu) / sd
    scored = df.select(
        F.col(id_col),
        F.col(key_col).alias("key"),
        F.col(ts_col),
        F.col(value_col),
        hist.alias("n_hist"),
        F.when(
            (hist >= min_history) & (sd > 0), F.round(z, 4)
        ).alias("z"),
    )
    return scored.filter(
        F.col("z").isNotNull() & (F.abs("z") >= z_threshold)
    )


def rolling_zscore_anomalies_sql(
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback: int = 20,
    z_threshold: float = 3.0,
    min_history: int = 5,
) -> str:
    return f"""
WITH scored AS (
  SELECT {id_col}, {key_col} AS key, {ts_col}, {value_col},
         COUNT({value_col}) OVER w AS n_hist,
         CASE WHEN COUNT({value_col}) OVER w >= {min_history}
                AND stddev_samp({value_col}) OVER w > 0
              THEN ROUND(({value_col} - AVG({value_col}) OVER w)
                         / stddev_samp({value_col}) OVER w, 4)
         END AS z
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col}
               ORDER BY {ts_col} ASC, {id_col} ASC
               ROWS BETWEEN {lookback} PRECEDING AND 1 PRECEDING)
)
SELECT * FROM scored WHERE z IS NOT NULL AND ABS(z) >= {z_threshold}
"""


def source_drift_kl(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Distribution drift per source: KL(P_source || P_corpus) over
    token unigram distributions, with add-alpha smoothing on the
    source side — "which feeds shifted vocabulary relative to the
    corpus?", the drift companion to :func:`snapshot_diff`'s row-level
    churn report.

    The naive smoothed KL needs a probability for every
    (source, term) pair INCLUDING absent terms — a dense
    |sources| × |vocab| cross, hopeless at web scale. The absent mass
    is instead folded in closed form: every absent term contributes
    the same ``p0 = alpha/denom``, so

        KL_s = sum_present p_st * ln(p_st/q_t)
             + p0 * [ (V - V_s) * ln(p0) - (L - L_s) ]

    where ``L = sum_vocab ln(q_t)`` and ``L_s`` its present-terms
    restriction — both plain aggregates. The plan therefore touches
    only REALIZED (source, term) rows: one (source, term) groupBy,
    one vocab-sized re-agg, a term-keyed join of the two (already
    co-partitioned), a per-source agg, and a 1-row scalar broadcast.
    Nothing is sources × vocab; nothing is driver-sized.

    Values are sums of ``ln`` of rational quotients — irrational, so
    the 4-dp rounding convention is tie-free by construction (the
    cross-engine hazard only bites decimal-grid values).
    """
    from ts_data_pipeline_spark.functions.text import toks_col

    a = F.lit(float(alpha))
    terms = docs.select(
        F.col(source_col).alias("source"),
        F.explode(toks_col(text_col)).alias("term"),
    )
    st = terms.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c_st")
    )
    corpus = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    scalars = corpus.agg(
        F.sum("c_t").alias("n_corpus"),
        F.count(F.lit(1)).alias("v_corpus"),
        F.sum(F.log("c_t")).alias("sum_ln_ct"),
    )
    per = (
        st.join(corpus, "term")
        .groupBy("source")
        .agg(
            F.sum("c_st").alias("n_tokens"),
            F.count(F.lit(1)).alias("v_present"),
            F.sum(
                (F.col("c_st") + a)
                * (F.log(F.col("c_st") + a) - F.log("c_t"))
            ).alias("_a_s"),
            F.sum(F.log("c_t")).alias("_b_s"),
        )
    )
    out = per.crossJoin(F.broadcast(scalars))
    denom = F.col("n_tokens") + a * F.col("v_corpus")
    ln_n = F.log("n_corpus")
    present = (
        F.col("_a_s")
        + (F.col("n_tokens") + a * F.col("v_present")) * (ln_n - F.log(denom))
    ) / denom
    p0 = a / denom
    l_all = F.col("sum_ln_ct") - F.col("v_corpus") * ln_n
    l_s = F.col("_b_s") - F.col("v_present") * ln_n
    absent = p0 * (
        (F.col("v_corpus") - F.col("v_present")) * F.log(p0) - (l_all - l_s)
    )
    return out.select(
        "source",
        "n_tokens",
        "v_present",
        F.round(present + absent, 4).alias("kl"),
    )


def source_drift_kl_sql(
    *,
    table: str = "documents",
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
) -> str:
    """DuckDB twin — same closed-form absent-mass algebra. The alpha
    literal is CAST AS DOUBLE (a bare 0.5 parses as DECIMAL and
    changes division semantics)."""
    a = f"CAST({float(alpha)} AS DOUBLE)"
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t != '')"
    return f"""
WITH terms AS (
  SELECT {source_col} AS source, unnest({toks}) AS term FROM {table}
),
st AS (
  SELECT source, term, CAST(COUNT(*) AS DOUBLE) AS c_st
  FROM terms GROUP BY source, term
),
corpus AS (SELECT term, SUM(c_st) AS c_t FROM st GROUP BY term),
scal AS (
  SELECT SUM(c_t) AS n_corpus,
         CAST(COUNT(*) AS DOUBLE) AS v_corpus,
         SUM(ln(c_t)) AS sum_ln_ct
  FROM corpus
),
per AS (
  SELECT source,
         SUM(c_st) AS n_tokens,
         CAST(COUNT(*) AS DOUBLE) AS v_present,
         SUM((c_st + {a}) * (ln(c_st + {a}) - ln(c_t))) AS a_s,
         SUM(ln(c_t)) AS b_s
  FROM st JOIN corpus USING (term) GROUP BY source
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(v_present AS BIGINT) AS v_present,
       ROUND(
         (a_s + (n_tokens + {a} * v_present)
                * (ln(n_corpus) - ln(n_tokens + {a} * v_corpus)))
           / (n_tokens + {a} * v_corpus)
         + ({a} / (n_tokens + {a} * v_corpus))
           * ((v_corpus - v_present)
                * ln({a} / (n_tokens + {a} * v_corpus))
              - ((sum_ln_ct - v_corpus * ln(n_corpus))
                 - (b_s - v_present * ln(n_corpus)))),
         4) AS kl
FROM per, scal
"""
