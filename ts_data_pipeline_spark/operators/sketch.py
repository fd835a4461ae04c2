"""Frequency sketches: corpus heavy hitters, exact and bounded-memory.

Vocabulary/term-frequency analysis over a training corpus (stopword
discovery, boilerplate tokens, tokenizer-vocab candidates). Two
forms:

- ``exact_heavy_hitters``: explode -> groupBy(term) -> top-k. The
  per-term partial agg combines map-side, so the shuffle carries one
  row per (task, distinct term) — correct at any scale where the
  distinct-term cardinality is shuffle-safe (natural language: tens
  of millions of types; fine). The DuckDB-oracle-checkable baseline.
- ``misra_gries_heavy_hitters``: per-partition Misra-Gries counters
  capped at ``capacity`` entries (Arrow-batched ``mapInPandas``),
  then one tiny groupBy-sum merge. Shuffle volume is bounded by
  capacity x partitions REGARDLESS of vocabulary size — the shape for
  adversarial/unbounded token streams (URLs, hashes, code) where the
  distinct-term relation itself is too wide. Standard guarantee: any
  term with true frequency > n/capacity is present in the merged
  summary, and each merged count under-estimates the true count by
  at most n/capacity (per-partition decrements only ever subtract);
  pinned by ``tests/test_sketch.py`` against the exact counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _toks(text_col: str):
    # single definition of the package tokenization (functions/text.py)
    from ts_data_pipeline_spark.functions.text import toks_col

    return toks_col(text_col)


def exact_heavy_hitters(
    docs: DataFrame, k: int = 25, text_col: str = "text"
) -> DataFrame:
    """Top-k corpus terms by exact frequency (count desc, term asc)."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(_toks(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(k)
    w = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "term", "freq", "rank"
    )


def exact_heavy_hitters_sql(
    k: int = 25, table: str = "documents", text_col: str = "text"
) -> str:
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t != '')"
    return f"""
WITH counts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest({toks}) AS term FROM {table})
  GROUP BY term
),
top AS (SELECT * FROM counts ORDER BY freq DESC, term ASC LIMIT {k})
SELECT term, freq,
       row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
FROM top
"""


def misra_gries_heavy_hitters(
    docs: DataFrame,
    k: int = 25,
    capacity: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Bounded-memory heavy hitters: per-partition Misra-Gries
    summaries merged by a capacity-bounded groupBy-sum.

    Returns (term, freq_lb, rank) for the top-k surviving terms,
    where ``freq_lb`` is the summed lower-bound counter (true freq -
    freq_lb <= n/capacity). Candidate generation never shuffles more
    than capacity rows per input partition.
    """
    from pyspark.sql import Window

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                for term in str(text).lower().split(" "):
                    if not term:
                        continue
                    if term in counters:
                        counters[term] += 1
                    elif len(counters) < capacity:
                        counters[term] = 1
                    else:
                        # decrement-all step; drop zeros
                        dead = []
                        for t in counters:
                            counters[t] -= 1
                            if counters[t] == 0:
                                dead.append(t)
                        for t in dead:
                            del counters[t]
        yield pd.DataFrame(
            {"term": list(counters), "freq_lb": list(counters.values())}
        )

    partials = docs.select(text_col).mapInPandas(
        summarize, "term string, freq_lb long"
    )
    merged = partials.groupBy("term").agg(F.sum("freq_lb").alias("freq_lb"))
    top = merged.orderBy(F.col("freq_lb").desc(), F.col("term").asc()).limit(k)
    w = Window.orderBy(F.col("freq_lb").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "term", "freq_lb", "rank"
    )
