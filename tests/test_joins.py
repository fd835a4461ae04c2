"""Physical join-strategy pins: a silent strategy flip fails here."""

from __future__ import annotations

import contextlib
import io as pyio

from tests.conftest import SF_DIR
from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import joins


def _plan(df) -> str:
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dim_join_broadcasts_and_prunes(spark):
    df = joins.dim_enrich_revenue(
        io.load(spark, SF_DIR, "lineitem"), io.load(spark, SF_DIR, "part")
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # Date-range predicate must reach the parquet scan.
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    # Column pruning: only the 4 lineitem columns used are read.
    assert "l_extendedprice" in plan and "l_tax" not in plan


def test_large_join_shuffles_on_key(spark):
    df = joins.segment_order_revenue(
        io.load(spark, SF_DIR, "customer"),
        io.load(spark, SF_DIR, "orders"),
        io.load(spark, SF_DIR, "lineitem"),
    )
    plan = _plan(df)
    # orders x lineitem resolves to a shuffle join (either merge or
    # hash variant depending on stats) — never a broadcast of the
    # unbounded fact table, never a nested loop.
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan  # AQE may legitimately broadcast at tiny SF
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_semi_anti_use_existence_joins(spark):
    cust = io.load(spark, SF_DIR, "customer")
    orders = io.load(spark, SF_DIR, "orders")
    anti = _plan(joins.customers_without_orders(cust, orders))
    semi = _plan(joins.customers_with_high_value_orders(cust, orders))
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi


def test_salted_join_value_identical_and_guarded(spark):
    """salted_join must be row-identical to the plain join for inner
    and left; the join keys must carry the salt (both exchanges
    partition on (key, _salt)); right/full are rejected."""
    import pytest

    from ts_data_pipeline_spark.operators import skew

    facts = spark.createDataFrame(
        [(k, v) for k in (1, 1, 1, 1, 2, 3, 7) for v in (10, 20)],
        "k long, v long",
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (9, "z")], "k long, name string"
    )
    plain = facts.join(dim, ["k"]).groupBy("k", "name").count()
    salted = (
        skew.salted_join(facts, dim, ["k"], salt_buckets=4)
        .groupBy("k", "name")
        .count()
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # left join: unmatched fact keys survive exactly once per row
    left = skew.salted_join(facts, dim, ["k"], salt_buckets=4, how="left")
    assert left.filter("k = 7").count() == 2
    assert left.filter("k = 7 and name is null").count() == 2
    # the physical join keys include the salt
    plan = (
        skew.salted_join(facts, dim, ["k"], salt_buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .lower()
    )
    assert "_salt" in plan
    with pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(facts, dim, ["k"], how="right")
    with pytest.raises(ValueError, match="reserved"):
        skew.salted_join(facts.withColumn("_salt", facts.k), dim, ["k"])


def test_bloom_prune_never_drops_matches_and_prunes_misses(spark):
    """Bloom runtime filter (operators/bloom.py): (a) the pruned
    fact retains EVERY true match (no false negatives), (b) with a
    selective build side most non-matching fact rows are pruned
    scan-side, (c) bloom_semi_join output == the plain semi join
    exactly, false positives removed by the exact join."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import bloom

    fact = spark.createDataFrame(
        [Row(k=i, payload=f"p{i}") for i in range(5000)]
    ).repartition(8)
    build = spark.createDataFrame([Row(bk=i * 100) for i in range(50)])

    words = bloom.bloom_build_words(build, "cast(bk as string)")
    assert len(words) == 65536 // 64

    pruned = bloom.bloom_prune(fact, words, "cast(k as string)")
    kept = {r.k for r in pruned.collect()}
    true_matches = {i * 100 for i in range(50)}
    assert true_matches <= kept  # no false negatives, ever
    # 3 hashes into 64k bits over 150 set bits: fp rate ~1e-8;
    # allow slack but require real pruning of the 4950 misses
    assert len(kept) < 200, len(kept)

    exact = fact.join(
        build, fact.k == build.bk, "left_semi"
    ).collect()
    via_bloom = bloom.bloom_semi_join(fact, build, "k", "bk").collect()
    assert sorted((r.k, r.payload) for r in via_bloom) == sorted(
        (r.k, r.payload) for r in exact
    )


def test_bloom_prune_stays_scan_side(spark):
    """The probe predicate must ride in the scan stage: no exchange,
    no join operator introduced by the prune itself."""
    import contextlib
    import io as _io

    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import bloom

    fact = spark.createDataFrame([Row(k=i) for i in range(100)])
    words = bloom.bloom_build_words(fact.limit(5), "cast(k as string)")
    pruned = bloom.bloom_prune(fact, words, "cast(k as string)")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bloom_build_ignores_null_keys(spark):
    """NULL build-side keys (ADVICE r6): md5(NULL) is NULL, so a NULL
    key used to surface as a w=None group and crash the dense-array
    fill with a TypeError. Inner/semi join semantics never match NULL,
    so the builder must simply skip them — and the probe result must
    equal the exact semi join over the same build side."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import bloom

    fact = spark.createDataFrame([Row(k=i) for i in range(200)])
    build = spark.createDataFrame(
        [Row(bk=10), Row(bk=None), Row(bk=20), Row(bk=None)]
    )
    words = bloom.bloom_build_words(build, "cast(bk as string)")
    assert len(words) == 65536 // 64
    via_bloom = sorted(
        r.k for r in bloom.bloom_semi_join(fact, build, "k", "bk").collect()
    )
    exact = sorted(
        r.k
        for r in fact.join(build, fact.k == build.bk, "left_semi").collect()
    )
    assert via_bloom == exact == [10, 20]


def test_semi_join_adaptive_picks_by_crossover(spark):
    """Adaptive bloom gate (VERDICT r6 #6): the helper must choose
    plain at local toy volumes (the measured crossover says bloom
    LOSES there), choose bloom when the estimated saved exchange
    crosses the breakeven, and return identical rows either way."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import bloom

    # pure decision rule, pinned at the measured operating points
    assert not bloom.bloom_pays(150_000, 0.198)       # the sf0.1 case
    assert bloom.bloom_pays(150_000_000, 0.198)       # cluster fact
    assert not bloom.bloom_pays(150_000_000, 0.999)   # nothing saved
    assert bloom.bloom_pays(2_000_000, 0.5)           # 1M saved: edge

    fact = spark.createDataFrame(
        [Row(k=i % 500, payload=i) for i in range(5000)]
    )
    build = spark.createDataFrame([Row(bk=i * 10) for i in range(50)])

    out_plain, dec_plain = bloom.semi_join_adaptive(fact, build, "k", "bk")
    assert dec_plain["use_bloom"] is False  # 5000 rows << breakeven
    out_bloom, dec_bloom = bloom.semi_join_adaptive(
        fact, build, "k", "bk", breakeven_saved_rows=100
    )
    assert dec_bloom["use_bloom"] is True
    assert 0.0 < dec_bloom["est_survivor_frac"] <= 0.2  # ~50/500
    rows_plain = sorted((r.k, r.payload) for r in out_plain.collect())
    rows_bloom = sorted((r.k, r.payload) for r in out_bloom.collect())
    exact = sorted(
        (r.k, r.payload)
        for r in fact.join(
            build, fact.k == build.bk, "left_semi"
        ).collect()
    )
    assert rows_plain == rows_bloom == exact
