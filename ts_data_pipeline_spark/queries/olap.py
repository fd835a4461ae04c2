"""OLAP shape queries: carried dims, rollup/cube, unpivot, token stats.

Rounds out the aggregate surface: A3's carried window dimensions made
explicit, grouping-set rollups over the documents catalog, the
wide->narrow unpivot (the inverse of pivot — the columnar Data
payload back to parameter_values rows), and the BPE-ish token
counting from the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import trades
from ts_data_pipeline_spark.registry import register


def window_agg_carried_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — non-key dimensions carried into the window aggregate.

    The reference's initializer copies per-key constants (usym /
    strike / expiry / otype / dtx) into the window state
    (option_trade_aggs/main.py:143-188). Declaratively that is an
    any-value aggregate per dimension in the same agg(); we use
    min/max (deterministic any-value for per-key-constant columns, so
    the oracle compare is exact) alongside the numeric sums.
    """
    t = trades.events_as_option_trades(io.load(spark, sf_dir, "events"))
    return (
        t.groupBy(F.window("ts", "1 hour"), "osym", "otype")
        .agg(
            F.min("side").alias("first_side"),      # carried dim
            F.max("whale").alias("any_whale"),      # carried flag
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("premium"), 4).alias("premium_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "osym", "otype", "first_side", "any_whale", "n", "premium_sum",
        )
    )


WINDOW_AGG_CARRIED_DIMS_SQL = f"""
WITH t AS (
  SELECT user_id AS osym, ts, value AS premium,
         {trades.SIDE_SQL} AS side, {trades.OTYPE_SQL} AS otype,
         value > {trades.WHALE} AS whale
  FROM events
)
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       osym, otype,
       MIN(side) AS first_side,
       MAX(whale) AS any_whale,
       COUNT(*) AS n,
       ROUND(SUM(premium), 4) AS premium_sum
FROM t
GROUP BY 1, 2, 3
"""


def rollup_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set rollup: doc counts/chars at (lang, source), (lang),
    and grand-total levels in one pass."""
    d = io.load(spark, sf_dir, "documents")
    return (
        d.rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


ROLLUP_DOC_STATS_SQL = """
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY ROLLUP (lang, source)
"""


def unpivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide per-user event-type sums back to the
    narrow (user, parameter, value) layout — columnar Data payload ->
    parameter_values rows. stack() is a single generator projection."""
    e = io.load(spark, sf_dir, "events")
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.round(F.sum("value"), 4))
    )
    return wide.select(
        "user_id",
        F.expr(
            "stack(3, 'click', click, 'view', view, 'purchase', purchase) "
            "AS (parameter_id, num_value)"
        ),
    ).filter(F.col("num_value").isNotNull())


UNPIVOT_EVENT_VALUES_SQL = """
WITH wide AS (
  SELECT user_id,
         ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
         ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 4) AS view,
         ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase
  FROM events GROUP BY user_id
)
SELECT user_id, parameter_id, num_value
FROM wide
UNPIVOT (num_value FOR parameter_id IN (click, view, purchase))
"""


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (build brief): whitespace tokens and a
    BPE-ish regex segmentation (letter runs / digit runs / single
    punctuation), plus chars-per-token."""
    d = io.load(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    bpe = F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(F.length("text") / F.greatest(bpe, F.lit(1)), 4).alias(
            "chars_per_token"
        ),
    )


TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> t != '')) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
         AS bpe_tokens,
       ROUND(CAST(length(text) AS DOUBLE) /
             greatest(len(regexp_extract_all(
               text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 1), 4)
         AS chars_per_token
FROM documents
"""


# Registered via suites (queries/suites.py): carried dims + unpivot
# in ``olap_pivot_suite``, rollup in ``quality_suite``, token stats
# in ``text_stats_suite``.


def cube_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: every combination of (lang, source) levels
    — the rollup's sibling covering the (source-only) margin the
    hierarchy skips — with grouping_id distinguishing aggregation
    level from genuinely-NULL dimension values."""
    d = io.load(spark, sf_dir, "documents")
    return d.cube("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        # must be computed inside the grouping aggregation
        F.grouping_id("lang", "source").alias("gid"),
    )


CUBE_DOC_STATS_SQL = """
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       GROUPING(lang, source) AS gid
FROM documents
GROUP BY CUBE (lang, source)
"""


#: Query rectangle for the registered zone-map gate: a mid-range
#: customer band x an orderkey band — selective in both dims.
ZORDER_RECT = dict(x_lo=100, x_hi=500, y_lo=1_000, y_hi=30_000)


def zorder_zone_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order zone map over orders (o_custkey x o_orderkey) with the
    skip decision for a fixed query rectangle (operators/layout.py —
    integer-exact quantization + Morton interleave, broadcast 1-row
    stats, one cell-bounded shuffle)."""
    from ts_data_pipeline_spark.operators import layout

    return layout.zone_map_prune(
        io.load(spark, sf_dir, "orders"),
        "o_custkey",
        "o_orderkey",
        **ZORDER_RECT,
    )


def zorder_zone_map_sql() -> str:
    from ts_data_pipeline_spark.operators import layout

    return layout.zone_map_prune_sql(
        "orders", "o_custkey", "o_orderkey", **ZORDER_RECT
    )
