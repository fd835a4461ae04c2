"""Multi-resolution rollup: continuous-aggregate reaggregation.

The hypertable/continuous-aggregate pattern (TimescaleDB continuous
aggregates; Druid/Pinot rollup segments): maintain the FINEST grain
by aggregating raw events once, then derive every coarser grain by
re-aggregating the finer grain's partial states — never rescanning
the raw table. Reference analog: the per-minute option windows of
option_trade_aggs/main.py are the finest grain; dashboards consume
hourly/daily rollups of those windows, not the raw trade feed.

Why this matters at 100 TB: the raw table is petabyte-class, but the
1-min partials are ~5 orders of magnitude smaller (one row per
(key, minute)). Deriving the 10-min/1-h/1-d grains from partials
turns a full-corpus rescan per grain into a cheap agg over an
already-tiny relation. The algebra is exact for decomposable
aggregates: count/sum re-add, min/max re-min/re-max, avg is carried
as (sum, count) and derived only at presentation. The equality
``reaggregate(fine) == direct(coarse)`` is the registered DuckDB
oracle — the coarse grains in the suite row are COMPUTED via
reaggregation and CHECKED against direct aggregation of raw.

Plan shape: one groupBy(window(ts, fine), key) over raw (partial +
final hash agg), then per coarser grain one groupBy over the
partials relation. Each coarser agg's input is the previous grain's
output — Spark reuses the cached finest relation; nothing rescans
the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (label, minutes) grains, finest first. Each coarser grain must be
#: an integer multiple of the previous so fine windows nest exactly.
DEFAULT_GRAINS: tuple[tuple[str, int], ...] = (
    ("1m", 1),
    ("10m", 10),
    ("60m", 60),
)


def windowed_partials(
    events: DataFrame,
    minutes: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Finest-grain partial states from raw: one row per (key, window).

    Carries the decomposable state (n, v_sum, v_min, v_max) — avg is
    NOT materialized here; it is derived at presentation so the state
    stays re-aggregable without error.
    """
    # Group by the FULL window struct (not window.start): under
    # Structured Streaming only the struct form is recognized as an
    # event-time window, so append mode + watermark work on the same
    # expression (streaming/windowed.streaming_rollup_partials).
    return (
        events.groupBy(
            F.window(ts_col, f"{minutes} minutes").alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("v_sum"),
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
        )
        .select(
            F.col("w")["start"].alias("window_start"),
            "key",
            "n",
            "v_sum",
            "v_min",
            "v_max",
        )
    )


def reaggregate(partials: DataFrame, coarse_minutes: int) -> DataFrame:
    """Roll finer partials up to ``coarse_minutes`` windows.

    Exact for the carried state: counts and sums add, min/max fold.
    The coarse window start is the fine window start floored to the
    coarse width (valid because grains nest).
    """
    secs = coarse_minutes * 60
    # pmod-floor, not truncate-toward-zero: a pre-1970 fine window
    # must floor DOWN to its coarse start (r8 review sweep; the
    # tsstats._floor_div_us convention)
    u = F.unix_timestamp("window_start")
    coarse_start = F.timestamp_seconds(
        ((u - F.pmod(u, F.lit(secs))) / F.lit(secs)).cast("bigint") * secs
    ).alias("window_start")
    return partials.groupBy(coarse_start, "key").agg(
        F.sum("n").alias("n"),
        F.sum("v_sum").alias("v_sum"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
    )


def rollup_lattice(
    events: DataFrame,
    grains: tuple[tuple[str, int], ...] = DEFAULT_GRAINS,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """All grains in one labeled frame; each coarser grain derived
    from the previous grain's partials, raw scanned exactly once.

    The finest partials are cached: Spark unions do not dedupe common
    subplans, so without the cache every grain's branch would re-scan
    the raw table — exactly what the lattice exists to avoid. The
    cached relation is (keys x minutes)-sized, orders of magnitude
    smaller than raw, so it is the correct thing to pin at any scale
    (tests/test_rollup.py asserts the union's physical plan contains
    a single raw scan).
    """
    label0, min0 = grains[0]
    cur = windowed_partials(events, min0, key_col, ts_col, value_col).cache()
    levels = [(label0, cur)]
    for label, mins in grains[1:]:
        cur = reaggregate(cur, mins)
        levels.append((label, cur))

    def present(label: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(label).alias("grain"),
            "window_start",
            "key",
            "n",
            F.round("v_sum", 4).alias("v_sum"),
            F.round("v_min", 4).alias("v_min"),
            F.round("v_max", 4).alias("v_max"),
            # Derived presentation only — v_avg is NOT part of the
            # cross-engine hash gate (queries/suites.py): quotients of
            # 2-dp sums land on exact 4-dp decimal ties (e.g. 391.55/8
            # = 48.94375) where Spark's BigDecimal HALF_UP and
            # DuckDB's scaled-double round() disagree by 1 ulp of the
            # last digit. The re-aggregable state is (n, sum, min,
            # max); avg must always be derived from it, never carried.
            F.round(F.col("v_sum") / F.col("n"), 4).alias("v_avg"),
        )

    out = present(*levels[0])
    for label, df in levels[1:]:
        out = out.unionByName(present(label, df))
    return out


def rollup_lattice_sql(
    grains: tuple[tuple[str, int], ...] = DEFAULT_GRAINS,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    table: str = "events",
) -> str:
    """Oracle: every grain aggregated DIRECTLY from raw. Equality with
    the Spark side proves the reaggregation algebra is exact."""
    selects = []
    for label, mins in grains:
        selects.append(
            f"""SELECT '{label}' AS grain,
       time_bucket(INTERVAL '{mins} minutes', {ts_col}) AS window_start,
       {key_col} AS key,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM({value_col}), 4) AS v_sum,
       ROUND(MIN({value_col}), 4) AS v_min,
       ROUND(MAX({value_col}), 4) AS v_max,
       ROUND(SUM({value_col}) / COUNT(*), 4) AS v_avg
FROM {table}
GROUP BY 2, 3"""
        )
    return "\nUNION ALL\n".join(selects)


def refresh_coarse(
    fine_partials: DataFrame,
    changed_fine_windows: DataFrame,
    coarse_minutes: int,
) -> DataFrame:
    """Incremental continuous-aggregate refresh: recompute ONLY the
    coarse windows touched by changed fine partials.

    ``changed_fine_windows`` is a (window_start, key) relation naming
    fine windows whose state changed (late data, backfill,
    correction — e.g. the output of a snapshot diff on the partials
    table). Each maps to exactly one coarse window (grains nest), so
    the refresh re-aggregates ONLY fine partials belonging to
    affected (coarse_window, key) groups and emits replacement rows —
    merge them into the stored rollup with the versioned upsert sink
    (streaming/upsert_sink.py) keyed on (window_start, key).

    Scale shape: the affected-window set is invalidation-sized (tiny
    vs the partials table) and broadcasts into a semi-join; the
    re-aggregation touches coarse_minutes/fine_minutes partial rows
    per affected window, never the raw table and never the unaffected
    99.99% of the rollup.
    """
    secs = coarse_minutes * 60
    coarse_of = lambda c: F.timestamp_seconds(  # noqa: E731
        (
            (F.unix_timestamp(c) - F.pmod(F.unix_timestamp(c), F.lit(secs)))
            / F.lit(secs)
        ).cast("bigint")
        * secs
    )
    affected = (
        changed_fine_windows.select(
            coarse_of(F.col("window_start")).alias("cw"),
            F.col("key").alias("ck"),
        ).distinct()
    )
    touched = fine_partials.join(
        F.broadcast(affected),
        (coarse_of(F.col("window_start")) == F.col("cw"))
        & (F.col("key") == F.col("ck")),
        "left_semi",
    )
    return reaggregate(touched, coarse_minutes)
