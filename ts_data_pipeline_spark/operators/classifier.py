"""Trained linear quality classifier: distributed full-batch
gradient descent over hashed bag-of-words features.

The quality-filter story so far scores documents with a FIXED linear
model (functions/text.py::classifier_quality_score — deterministic
pseudo-weights standing in for fastText-style models). This module
TRAINS the linear model in-engine against a weak label (e.g. "is
from the wiki-like source", the same proxy DSIR uses), with the
least-squares objective so every update is pure arithmetic (the default step 1/21 ~ 0.048 is stable for the
~50-active-bucket documents here — unnormalized binary features
diverge by lr~0.5, measured. The denominator 21 is deliberate: with
a 2-5-smooth rate like 0.05, every quantity in the update is an
EXACT terminating decimal (counts / N / decimal rates), so the 6-dp
weight rounds land on true .5e-6 halves where the two engines'
double approximations fall on opposite sides — 72 gate rows
measurably diverged. A factor of 21 makes the products
non-terminating, pushing half-ties to measure zero) —
portable to the DuckDB oracle, unlike logistic GD whose exp() differs
in final ulps across libm implementations.

Per iteration (unrolled a FIXED number of times, like the k-means
trainer in operators/similarity.py):

    score_d = sum of w[b] over the doc's feature buckets   (1)
    err_d   = score_d - y_d                                (2)
    grad_b  = sum of err_d over docs containing b, / N     (3)
    w[b]    = round(w[b] - lr * grad_b, 6)                 (4)

Scale shape: features are (doc, bucket) rows — the exploded-token
relation collapsed by DISTINCT, shuffled once by doc for (1)-(2) and
once by bucket for (3); the weight relation is n_buckets+1 rows
(bias bucket -1), BROADCAST into (1). No iteration grows state: the
lineage is n_iter fixed rounds, weights re-rounded to 6 dp each round
so cross-engine float drift can never compound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_data_pipeline_spark.functions.portable_hash import (
    u32_md5_spark,
    u32_md5_sql,
)


def _features(docs: DataFrame, n_buckets: int, text_col: str,
              id_col: str) -> DataFrame:
    """Distinct (doc, bucket) presence features + a bias row (-1)
    per document."""
    from ts_data_pipeline_spark.functions.text import toks_col

    toks = docs.select(
        F.col(id_col), F.explode(toks_col(text_col)).alias("tok")
    )
    feats = toks.select(
        id_col,
        (u32_md5_spark("concat('lrf:', tok)") % n_buckets).alias("bucket"),
    ).distinct()
    bias = docs.select(id_col, F.lit(-1).cast("bigint").alias("bucket"))
    return feats.unionByName(bias)


def train_quality_lr(
    docs: DataFrame,
    label_expr: str,
    n_buckets: int = 256,
    n_iter: int = 3,
    lr: float = 1 / 21,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the linear model and score every document with it.

    Returns (doc_id, label, score, pred) where score is the trained
    linear output (ROUND 6 — the weights' own decimal grain, so the
    rounded sum has no half-ties; a coarser 4-dp gate measurably hit
    one at sf0.01) and pred = score >= 0.5. ``label_expr``
    is a SQL boolean over the docs table (the weak label).
    """
    feats = _features(docs, n_buckets, text_col, id_col).cache()
    labels = docs.select(
        F.col(id_col),
        F.when(F.expr(label_expr), F.lit(1.0)).otherwise(0.0).alias("y"),
    )
    n = docs.count()

    weights = feats.select("bucket").distinct().select(
        "bucket", F.lit(0.0).alias("w")
    )
    for _ in range(n_iter):
        scores = (
            feats.join(F.broadcast(weights), "bucket")
            .groupBy(id_col)
            .agg(F.sum("w").alias("s"))
        )
        errs = labels.join(scores, id_col, "left").select(
            id_col,
            (F.coalesce("s", F.lit(0.0)) - F.col("y")).alias("err"),
        )
        grads = (
            feats.join(errs, id_col)
            .groupBy("bucket")
            .agg((F.sum("err") / F.lit(float(n))).alias("g"))
        )
        weights = (
            weights.join(grads, "bucket", "left")
            .select(
                "bucket",
                F.round(
                    F.col("w") - lr * F.coalesce("g", F.lit(0.0)), 6
                ).alias("w"),
            )
        )
        # pin each round: bounded lineage, ONE materialization the
        # next round's two consumers (scores + update) both read
        weights = weights.localCheckpoint(eager=True)

    final = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    out = (
        labels.join(final, id_col, "left")
        .select(
            id_col,
            F.col("y").cast("bigint").alias("label"),
            F.coalesce("score", F.lit(0.0)).alias("score"),
            (F.coalesce("score", F.lit(0.0)) >= 0.5).alias("pred"),
        )
        # materialize the scored result WHILE feats is still cached,
        # so the unpersist below cannot leak the cached relation into
        # the session for its lifetime (one training call used to
        # leave feats pinned in executor storage forever) and the
        # returned frame no longer depends on feats' lineage
        .localCheckpoint(eager=True)
    )
    feats.unpersist()
    return out


def train_quality_lr_sql(
    label_expr: str,
    n_buckets: int = 256,
    n_iter: int = 3,
    lr: float = 1 / 21,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: the same fixed GD rounds unrolled as MATERIALIZED
    CTEs (each round's weights feed TWO consumers — without
    materialization DuckDB re-inlines the chain 2^n times)."""
    from ts_data_pipeline_spark.functions.text import toks_sql

    bucket = u32_md5_sql("concat('lrf:', tok)") + f" % {n_buckets}"
    toks = toks_sql(text_col)  # THE tokenization (single definition)
    parts = [
        f"""WITH feats AS MATERIALIZED (
  SELECT DISTINCT {id_col}, {bucket} AS bucket
  FROM (SELECT {id_col}, unnest({toks}) AS tok FROM {table})
  UNION
  SELECT {id_col}, CAST(-1 AS BIGINT) AS bucket FROM {table}
),
y AS MATERIALIZED (
  SELECT {id_col}, CASE WHEN {label_expr} THEN 1.0 ELSE 0.0 END AS y
  FROM {table}
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM {table}),
w0 AS MATERIALIZED (
  SELECT DISTINCT bucket, CAST(0.0 AS DOUBLE) AS w FROM feats
)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""s{i} AS MATERIALIZED (
  SELECT f.{id_col}, SUM(w.w) AS s
  FROM feats f JOIN w{i - 1} w ON f.bucket = w.bucket
  GROUP BY f.{id_col}
),
e{i} AS MATERIALIZED (
  SELECT y.{id_col}, COALESCE(s{i}.s, 0.0) - y.y AS err
  FROM y LEFT JOIN s{i} ON y.{id_col} = s{i}.{id_col}
),
g{i} AS MATERIALIZED (
  SELECT f.bucket, SUM(e.err) / (SELECT n FROM n) AS g
  FROM feats f JOIN e{i} e ON f.{id_col} = e.{id_col}
  GROUP BY f.bucket
),
w{i} AS MATERIALIZED (
  SELECT w.bucket, ROUND(w.w - CAST('{lr!r}' AS DOUBLE) * COALESCE(g.g, 0.0), 6) AS w
  FROM w{i - 1} w LEFT JOIN g{i} g ON w.bucket = g.bucket
)""")
    return (
        ",\n".join(parts)
        + f"""
SELECT y.{id_col},
       CAST(y.y AS BIGINT) AS label,
       COALESCE(fs.score, 0.0) AS score,
       COALESCE(fs.score, 0.0) >= 0.5 AS pred
FROM y LEFT JOIN (
  SELECT f.{id_col}, ROUND(SUM(w.w), 6) AS score
  FROM feats f JOIN w{n_iter} w ON f.bucket = w.bucket
  GROUP BY f.{id_col}
) fs ON y.{id_col} = fs.{id_col}
"""
    )
