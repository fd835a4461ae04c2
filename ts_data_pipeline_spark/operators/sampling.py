"""Sampling and mixing operators for training-corpus construction.

A 100 TB training-data pipeline ends in a mix: per-source/per-language
quotas, quality-weighted inclusion, deterministic train/eval splits.
These are the canonical Spark forms:

- ``stratified_sample``: `sampleBy` — per-stratum Bernoulli sampling,
  executed scan-side (no shuffle at all; each task filters its rows).
- ``weighted_mix``: per-source fractions + union — the data-mixing
  recipe (e.g. upsample wiki, downsample crawl).
- ``hash_split``: deterministic train/eval assignment by key hash —
  stable across runs and machines (no RNG), the reproducible-split
  pattern; pure expression, zero shuffle.

Sampling is engine-specific (Spark's Bernoulli draw is not
reproducible in another engine), so these register rows-only where
exposed; statistical behavior is pinned by tests/test_sampling.py.
hash_split IS engine-portable (xxhash64) — oracle would need the same
hash in DuckDB (absent), so it is pytest-pinned instead.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: Mapping[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (quota enforcement per lang/source)."""
    return df.sampleBy(stratum_col, dict(fractions), seed=seed)


def weighted_mix(
    sources: Mapping[str, DataFrame], weights: Mapping[str, float], seed: int = 42
) -> DataFrame:
    """Mix corpora at given inclusion rates, tagging provenance.

    Each source is sampled at its weight then unioned — the standard
    mixture recipe. Weights > 1.0 are not duplicated here (epoch-level
    upsampling belongs to the training loader); they are capped at 1.
    """
    if not sources:
        raise ValueError("weighted_mix requires at least one source")
    parts = []
    for name, df in sources.items():
        frac = min(float(weights.get(name, 1.0)), 1.0)
        sampled = df if frac >= 1.0 else df.sample(fraction=frac, seed=seed)
        parts.append(sampled.withColumn("mix_source", F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    eval_permille: int = 10,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/eval split by key hash (no RNG).

    split = 'eval' iff xxhash64(salt, key) mod 1000 < eval_permille.
    Keyed hashing keeps all rows of one document/user on the same side
    (no leakage), survives reruns and repartitioning, and versioned
    salts allow re-splitting without touching data.
    """
    bucket = F.pmod(F.xxhash64(F.lit(salt), F.col(key_col)), F.lit(1000))
    return df.withColumn(
        "split",
        F.when(bucket < eval_permille, F.lit("eval")).otherwise(F.lit("train")),
    )
