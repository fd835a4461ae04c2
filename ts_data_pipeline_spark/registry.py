"""Query registry: every implemented operator as a named query.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB oracle SQL string
over the same parquet tables. The driver's correctness gate runs
both sides at sf0.01 and compares row-count + schema +
order-insensitive value hash (__spark_entry__.py contract).

Conventions that keep the two sides hash-identical:
- every computed column is aliased to the same name on both sides;
- floating aggregates are ROUND(x, 4)-ed on both sides (sum order
  differs between engines; 4 dp is far coarser than double error at
  these magnitudes);
- integer sums are CAST(... AS BIGINT) in DuckDB (its SUM(int)
  returns HUGEINT, Spark returns LONG);
- first/last are min_by/max_by on a unique ordering key.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: Optional[str] = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def query(name: str, oracle: Optional[str] = None):
    """Decorator form of register()."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from ts_data_pipeline_spark import queries as _q  # noqa: F401

    _LOADED = True
