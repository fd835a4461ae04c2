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
