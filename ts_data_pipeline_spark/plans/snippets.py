"""Data snippets: named saved selections over streams/parameters.

Contract: /root/reference/dashboard/src/Models/dataSnippet.ts:13-50 /
createDataSnippetRequest.ts:16-45 — a snippet stores stream ids,
parameter/event ids and a [from, to] time range; evaluating it
replays that selection as a query. SURVEY §1 maps this to a saved
query definition / temp view.

Spark-first: a snippet is a frozen QuerySpec prefix. ``materialize``
registers the selection as a temp view (the catalog object), and
``evaluate_snippet`` composes it with any further QuerySpec
aggregation — so saved selections and ad-hoc queries share one code
path and one optimizer view of the plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class DataSnippet:
    """dataSnippet.ts:13-50 (numeric-parameter subset)."""

    name: str
    stream_ids: Sequence[str] = field(default_factory=list)
    parameter_ids: Sequence[str] = field(default_factory=list)
    from_ts: Optional[str] = None  # inclusive
    to_ts: Optional[str] = None  # exclusive


def select_snippet(
    parameter_values: DataFrame,
    snippet: DataSnippet,
    *,
    stream_col: str = "stream_id",
    ts_col: str = "ts",
    parameter_col: str = "parameter_id",
) -> DataFrame:
    """Apply the snippet's saved selection (pure filters — the time
    and id predicates push down to the scan like any F4/F5 filter)."""
    df = parameter_values
    if snippet.stream_ids:
        df = df.filter(F.col(stream_col).isin(*snippet.stream_ids))
    if snippet.parameter_ids:
        df = df.filter(F.col(parameter_col).isin(*snippet.parameter_ids))
    ts = F.col(ts_col)
    if snippet.from_ts is not None:
        df = df.filter(ts >= F.lit(snippet.from_ts).cast("timestamp"))
    if snippet.to_ts is not None:
        df = df.filter(ts < F.lit(snippet.to_ts).cast("timestamp"))
    return df


def materialize(parameter_values: DataFrame, snippet: DataSnippet) -> DataFrame:
    """Register the snippet as a temp view named after it."""
    df = select_snippet(parameter_values, snippet)
    df.createOrReplaceTempView(f"snippet_{snippet.name}")
    return df


#: A deterministic saved-snippet catalog (what the reference persists
#: server-side and lists via getAllDataSnippetsRequest.ts). Fixed
#: definitions so listings are oracle-checkable at any SF.
BUILTIN_SNIPPETS: tuple[DataSnippet, ...] = (
    DataSnippet("replay-clicks", ["1", "2"], ["click"],
                "2024-01-02 00:00:00", "2024-01-10 00:00:00"),
    DataSnippet("replay-purchases", ["3", "4", "5"], ["purchase", "click"],
                "2024-01-05 00:00:00", "2024-01-15 00:00:00"),
    DataSnippet("error-audit", ["2", "4", "6", "8"], ["error"],
                "2024-01-01 00:00:00", "2024-01-20 00:00:00"),
    DataSnippet("signup-window", ["7"], ["signup", "view"],
                "2024-01-03 00:00:00", "2024-01-08 00:00:00"),
    DataSnippet("view-sweep", ["1", "3", "5", "7", "9"], ["view"],
                "2024-01-01 00:00:00", "2024-01-31 00:00:00"),
)


def snippets_catalog(spark) -> DataFrame:
    """The snippet catalog as a (tiny) DataFrame — always the
    broadcast side of any enrichment join."""
    rows = [
        (i + 1, s.name, list(s.stream_ids), list(s.parameter_ids),
         s.from_ts, s.to_ts)
        for i, s in enumerate(BUILTIN_SNIPPETS)
    ]
    df = spark.createDataFrame(
        rows,
        "snippet_id int, name string, stream_ids array<string>, "
        "parameter_ids array<string>, from_ts string, to_ts string",
    )
    return df.select(
        "snippet_id", "name", "stream_ids", "parameter_ids",
        F.col("from_ts").cast("timestamp").alias("from_ts"),
        F.col("to_ts").cast("timestamp").alias("to_ts"),
    )


def list_snippets(
    catalog: DataFrame,
    *,
    name: Optional[str] = None,
    parameter_ids: Optional[Sequence[str]] = None,
    stream_id: Optional[str] = None,
) -> DataFrame:
    """getAllDataSnippetsRequest.ts filters: case-insensitive Contains
    on name, case-sensitive ContainsAny on parameter ids, case-
    insensitive Equals on stream membership."""
    out = catalog
    if name is not None:
        out = out.filter(F.instr(F.lower(F.col("name")), name.lower()) > 0)
    if parameter_ids is not None:
        out = out.filter(
            F.arrays_overlap(
                F.col("parameter_ids"),
                F.array(*[F.lit(p) for p in parameter_ids]),
            )
        )
    if stream_id is not None:
        out = out.filter(
            F.array_contains(
                F.transform(F.col("stream_ids"), F.lower), stream_id.lower()
            )
        )
    return out


def snippet_row_counts(
    listed: DataFrame,
    parameter_values: DataFrame,
    *,
    stream_col: str = "stream_id",
    ts_col: str = "ts",
    parameter_col: str = "parameter_id",
) -> DataFrame:
    """Enrich a snippet listing with the observed selection size: for
    each snippet, how many rows / distinct streams its saved filters
    currently select. The snippet side is a handful of rows, so the
    containment join broadcasts it and the big side never shuffles;
    the counts come from one hash agg on snippet_id.
    """
    pv = parameter_values.select(
        F.col(stream_col).alias("_psid"),
        F.col(ts_col).alias("_pts"),
        F.col(parameter_col).alias("_ppid"),
    )
    cond = (
        F.array_contains(listed["stream_ids"], F.col("_psid"))
        & F.array_contains(listed["parameter_ids"], F.col("_ppid"))
        & (F.col("_pts") >= listed["from_ts"])
        & (F.col("_pts") < listed["to_ts"])
    )
    joined = F.broadcast(listed).join(pv, cond, "left")
    return (
        joined.groupBy("snippet_id", "name", "from_ts", "to_ts")
        .agg(
            F.count("_psid").alias("n_rows"),
            F.count_distinct("_psid").alias("n_streams"),
        )
        .orderBy("name")
    )
