"""Trained linear quality model (operators/classifier.py): the GD
rounds actually learn — fit improves over the zero model and the
scores separate the weak-label classes."""

from __future__ import annotations

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import classifier

SF = "/root/testdata/sf0.001"
# the length label is genuinely learnable from hashed BoW (feature
# count tracks document length); the wiki-source label in the
# registered gate is near-chance on this synthetic text — fine for
# hash parity, useless for an efficacy pin
LABEL = "n_chars > 300"


def test_lr_training_learns_the_weak_label(spark):
    rows = classifier.train_quality_lr(
        io.load(spark, SF, "documents"), LABEL
    ).collect()
    n = len(rows)
    pos = [r for r in rows if r.label == 1]
    neg = [r for r in rows if r.label == 0]
    assert pos and neg

    # fit beats the zero model: mse(score, y) < mse(0, y) = P(y=1)
    mse = sum((r.score - r.label) ** 2 for r in rows) / n
    zero_mse = len(pos) / n
    assert mse < zero_mse, (mse, zero_mse)

    # scores separate the classes in the right direction
    mean_pos = sum(r.score for r in pos) / len(pos)
    mean_neg = sum(r.score for r in neg) / len(neg)
    assert mean_pos > mean_neg, (mean_pos, mean_neg)

    # thresholded accuracy beats always-majority
    acc = sum(
        1 for r in rows if (r.pred and r.label == 1)
        or (not r.pred and r.label == 0)
    ) / n
    majority = max(len(pos), len(neg)) / n
    assert acc >= majority, (acc, majority)


def test_lr_more_rounds_do_not_worsen_fit(spark):
    docs = io.load(spark, SF, "documents")
    mses = []
    for it in (1, 3):
        rows = classifier.train_quality_lr(docs, LABEL, n_iter=it).collect()
        mses.append(sum((r.score - r.label) ** 2 for r in rows) / len(rows))
    assert mses[1] <= mses[0] + 1e-9, mses


def test_lr_training_leaves_no_cached_relation(spark):
    """The feature relation is cached for the GD rounds but must be
    unpersisted before the call returns (ADVICE r6: one training call
    used to pin feats in executor storage for the session lifetime).
    The returned frame is materialized first, so consumers never
    recompute against an uncached lineage mid-flight."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()
    rows = classifier.train_quality_lr(
        io.load(spark, SF, "documents"), LABEL, n_iter=1
    ).collect()
    assert rows  # the result itself is intact
    # .cache() registers in the CacheManager (localCheckpoint does
    # not): training must leave it exactly as empty as it found it
    assert cm.isEmpty()
