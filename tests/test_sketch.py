"""Heavy-hitter sketches (operators/sketch.py): exact baseline
behavior and the Misra-Gries bound guarantees."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ts_data_pipeline_spark.operators import sketch


def test_exact_heavy_hitters_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a a b b c"),
            Row(doc_id=2, text="b a  c"),
            Row(doc_id=3, text="d"),
        ]
    )
    rows = sketch.exact_heavy_hitters(docs, k=3).collect()
    assert [(r.term, r.freq, r.rank) for r in rows] == [
        ("a", 4, 1),
        ("b", 3, 2),
        ("c", 2, 3),
    ]


def _skewed_docs(spark, n_docs=200, n_noise_terms=100):
    """50% of all tokens are 'hot'; the rest cycle 100 noise terms."""
    rows = []
    for d in range(n_docs):
        noise = [f"w{(d * 7 + j) % n_noise_terms}" for j in range(10)]
        rows.append(Row(doc_id=d, text=" ".join("hot " + w for w in noise)))
    return spark.createDataFrame(rows)


def test_misra_gries_guarantees_vs_exact(spark):
    """With capacity far below the vocabulary: (a) every term with
    true freq > n/capacity survives the merge, (b) merged counters
    never exceed the true count, (c) undercount <= n/capacity."""
    docs = _skewed_docs(spark).repartition(8)
    capacity = 16
    exact = {
        r.term: r.freq
        for r in sketch.exact_heavy_hitters(docs, k=10_000).collect()
    }
    n = sum(exact.values())
    mg = sketch.misra_gries_heavy_hitters(docs, k=10_000, capacity=capacity)
    got = {r.term: r.freq_lb for r in mg.collect()}

    guaranteed = {t for t, f in exact.items() if f > n / capacity}
    assert "hot" in guaranteed
    assert guaranteed <= set(got), guaranteed - set(got)
    for t, lb in got.items():
        assert lb <= exact[t], (t, lb, exact[t])
        assert exact[t] - lb <= n / capacity, (t, lb, exact[t])
    # the dominant term ranks first in the sketch, as in the exact
    assert mg.filter("rank = 1").collect()[0].term == "hot"


def test_misra_gries_equals_exact_when_capacity_holds_vocab(spark):
    """capacity >= |vocab| -> no decrements ever fire; the merged
    sketch IS the exact count table."""
    docs = _skewed_docs(spark, n_docs=50, n_noise_terms=20).repartition(4)
    exact = {
        r.term: r.freq
        for r in sketch.exact_heavy_hitters(docs, k=10_000).collect()
    }
    got = {
        r.term: r.freq_lb
        for r in sketch.misra_gries_heavy_hitters(
            docs, k=10_000, capacity=1024
        ).collect()
    }
    assert got == exact
