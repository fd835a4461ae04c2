"""Physical-plan shape pins for the headline aggregations.

SCALE.md claims partial/final agg splits and codegen coverage; these
tests keep those plans from silently regressing.
"""

from __future__ import annotations

import contextlib
import io as pyio
import re

from tests.conftest import SF_DIR
from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import trades, window_agg
from ts_data_pipeline_spark.plans.queryspec import (
    GroupByTime, NumericAggregation, QuerySpec, evaluate,
)
from ts_data_pipeline_spark.queries.telemetry import events_as_parameter_values


def _plan(df, mode: str = "formatted") -> str:
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode) if mode != "simple" else df.explain()
    return buf.getvalue()


def test_flagship_splits_partial_final_agg(spark):
    df = window_agg.option_window_agg(
        trades.events_as_option_trades(io.load(spark, SF_DIR, "events"))
    )
    plan = _plan(df)
    # Two HashAggregate nodes: map-side partial + reduce-side final —
    # the shuffle carries one row per (key, window) per map task.
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, plan
    # Codegen subtree count is only visible pre-execution with AQE
    # off (adaptive plans report 0 until finalized).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df2 = window_agg.option_window_agg(
            trades.events_as_option_trades(io.load(spark, SF_DIR, "events"))
        )
        codegen = _plan(df2, "codegen")
        assert "WholeStageCodegen subtrees" in codegen
        assert "Found 0" not in codegen, codegen[:200]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # The 25 conditional sums never force a sort-based aggregate.
    assert "SortAggregate" not in plan


def test_dedup_embedding_cosine_has_no_allpairs_nested_loop(spark):
    """The registered cosine-dedup plan must generate candidates via
    the banded equi-join, not the all-pairs theta self-join. The only
    nested-loop allowed is the constant-size plane fan-out (a Cross
    against ~32 broadcast rows) — never an Inner BNLJ with the
    ``ia < ib`` pair condition."""
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import DEDUP_PLANE_IDS

    df = similarity.embedding_cosine_dups_bucketed(
        io.load(spark, SF_DIR, "embeddings"), DEDUP_PLANE_IDS
    )
    # Simple mode keeps the join type on the node line.
    plan = _plan(df, "simple")
    bnlj = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert bnlj and all("Cross" in l for l in bnlj), bnlj
    assert not re.search(r"BroadcastNestedLoopJoin\s+\w*\s*,?\s*Inner", plan), plan
    # The candidate pair join is hash- or merge-based on (band, bucket).
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", plan), plan


def test_queryspec_agg_splits_partial_final(spark):
    pv = events_as_parameter_values(io.load(spark, SF_DIR, "events"))
    spec = QuerySpec(
        numeric_aggregations=[
            NumericAggregation("purchase", "Sum"),
            NumericAggregation("purchase", "Count"),
            NumericAggregation("error", "Max"),
        ],
        group_by_time=GroupByTime("1 hour"),
    )
    plan = _plan(evaluate(pv, spec))
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, plan
    assert "SortAggregate" not in plan


def test_queryspec_time_filter_pushes_to_parquet_scan(spark):
    """QuerySpec from_ts/to_ts bounds must reach the parquet scan as
    PushedFilters on the raw ts column — the load-boundary timestamp
    normalization (io.normalize_timestamps) must not interpose a cast
    that strands the range filter above the scan. The reference's
    only range pushdown is the darkpool cursor
    (darkpool_trades/main.py:165-179); here the whole QuerySpec time
    window prunes row groups."""
    pv = events_as_parameter_values(io.load(spark, SF_DIR, "events"))
    spec = QuerySpec(
        numeric_aggregations=[NumericAggregation("purchase", "Sum")],
        group_by_time=GroupByTime("1 hour"),
        from_ts="2024-01-02 00:00:00",
        to_ts="2024-01-12 00:00:00",
    )
    plan = _plan(evaluate(pv, spec))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    pushed = m.group(1)
    assert re.search(r"GreaterThanOrEqual\(ts,2024-01-02", pushed), pushed
    assert re.search(r"LessThan\(ts,2024-01-12", pushed), pushed
    # Column pruning: the events scan reads only the columns the
    # projection needs, never the full table.
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert rs and "event_id" not in rs.group(1), rs.group(1) if rs else plan


def test_repetition_features_is_scan_shaped(spark):
    """The within-doc repetition signal must stay a pure projection:
    no Exchange (shuffle) anywhere in the plan."""
    from ts_data_pipeline_spark.functions import text as text_fns

    plan = _plan(
        text_fns.repetition_features(io.load(spark, SF_DIR, "documents"))
    )
    assert "Exchange" not in plan, plan


def test_keep_canonical_joins_are_equi(spark):
    """Survivor selection must compose hash/merge equi-joins only —
    an Inner nested-loop would mean the corpus is being cross-paired."""
    import re

    from ts_data_pipeline_spark.operators import dedup as dd

    docs = io.load(spark, SF_DIR, "documents")
    df = dd.keep_canonical(docs, dd.ngram_jaccard_pairs(docs))
    plan = _plan(df, "simple")
    assert not re.search(
        r"BroadcastNestedLoopJoin\s+\w*\s*,?\s*Inner", plan
    ), plan


def test_prefix_sum_windows_are_bucket_partitioned(spark):
    """sequence_pack and corpus_shuffle claim no corpus-wide
    single-partition window: the only unpartitioned window may run
    over the tiny per-bucket relation (post-agg), never over the
    document scan."""
    from ts_data_pipeline_spark.operators.sampling import corpus_shuffle, sequence_pack

    docs = io.load(spark, SF_DIR, "documents")
    for df in (sequence_pack(docs), corpus_shuffle(docs)):
        plan = _plan(df)
        # every Window over doc-grain input must be partitioned by bucket
        for m in re.finditer(r"Window \[[^\]]*windowspecdefinition\(([^)]*)\)", plan):
            spec = m.group(1)
            if "doc_id" in spec:  # doc-grain window
                assert spec.strip().startswith("bucket"), spec


def test_bigram_lm_score_joins_are_equi(spark):
    """The LM score join must be hash/merge equi on (w1, w2)/(w1) —
    never a nested-loop pairing of the corpus against the LM table.
    The only nested-loop allowed is the 1-row tercile-cuts crossJoin."""
    from ts_data_pipeline_spark.functions import text as text_fns

    df = text_fns.bigram_lm_perplexity(io.load(spark, SF_DIR, "documents"))
    plan = _plan(df, "simple")
    assert not re.search(
        r"BroadcastNestedLoopJoin\s+\w*\s*,?\s*Inner", plan
    ), plan
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", plan), plan
    # Count aggregations split partial/final (map-side combine).
    full = _plan(df)
    assert len(re.findall(r"\(\d+\) HashAggregate", full)) >= 2, full


def test_minhash_candidate_join_is_equi(spark):
    """The (band, bucket) candidate self-join must be hash/merge —
    never an Inner nested-loop (which would mean all-pairs), and the
    portable md5 signature math must stay a pure expression (no UDF
    nodes in the plan)."""
    from ts_data_pipeline_spark.operators import dedup as dd

    df = dd.minhash_lsh_pairs(io.load(spark, SF_DIR, "documents"))
    plan = _plan(df, "simple")
    assert not re.search(
        r"BroadcastNestedLoopJoin\s+\w*\s*,?\s*Inner", plan
    ), plan
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", plan), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_semdedup_cap_window_partitioned_by_cell(spark):
    """The degenerate-cell guard must ride the cell partitioning the
    pair join needs anyway: every Window in the capped plan is
    partitioned by cell (no single-partition window), and the pair
    join itself stays equi."""
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries import llmdata

    emb = io.load(spark, SF_DIR, "embeddings")
    df = similarity.semdedup(
        emb, llmdata.KMEANS_SEED_IDS, llmdata.KMEANS_ITERS, max_cell_size=64
    )
    plan = _plan(df)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    # The cap's count window is partitioned by cell; kmeans_assign's
    # best-cell pick is partitioned by vec_id. NO window may be
    # unpartitioned (first spec element an ordering/frame, not a
    # partition column) — that would move the corpus to one task.
    assert any(s.strip().startswith("cell") for s in specs), specs
    for spec in specs:
        head = spec.split(",")[0]
        assert "ASC" not in head and "DESC" not in head, spec
        assert not head.strip().startswith("specifiedwindowframe"), spec
    simple = _plan(df, "simple")
    assert not re.search(
        r"BroadcastNestedLoopJoin\s+\w*\s*,?\s*Inner", simple
    ), simple


def test_bpe_tokenize_broadcasts_vocab_map(spark):
    """Tokenizer application must broadcast the vocabulary-sized
    word -> token-count map to the corpus word explode (the corpus
    never shuffles for tokenization), and the per-doc count agg must
    split partial/final."""
    from ts_data_pipeline_spark.functions import text as text_fns

    df = text_fns.bpe_tokenize(
        io.load(spark, SF_DIR, "documents"), n_merges=2
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, plan


def test_classifier_quality_is_scan_shaped(spark):
    """The hashed-linear quality score must stay a pure projection —
    no Exchange (the weight lookup is hash math, not a join) and no
    Python eval node."""
    from ts_data_pipeline_spark.functions import text as text_fns

    plan = _plan(
        text_fns.classifier_quality_score(io.load(spark, SF_DIR, "documents"))
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval-split probe set must reach the corpus join as a
    broadcast — never by shuffling the corpus grams against it."""
    from ts_data_pipeline_spark.functions.text import decontaminate

    docs = io.load(spark, SF_DIR, "documents")
    plan = _plan(decontaminate(docs))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan


def test_dsir_plan_broadcasts_ratio_table(spark):
    """DSIR's n_buckets-row ratio table must ride a broadcast join
    back onto the exploded features — never a shuffled join of the
    corpus against the model, and never a cartesian product."""
    from ts_data_pipeline_spark.operators import sampling
    from ts_data_pipeline_spark.queries.llmdata import DSIR_TARGET_PREDICATE

    docs = io.load(spark, SF_DIR, "documents")
    plan = _plan(sampling.dsir_scores(docs, DSIR_TARGET_PREDICATE))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_heavy_hitters_plan_is_partial_agg_plus_topk(spark):
    """Exact heavy hitters: term counts split partial/final (map-side
    combine over the explode) and the global top-k plans as
    TakeOrderedAndProject, never a full Sort of the term table."""
    from ts_data_pipeline_spark.operators import sketch

    docs = io.load(spark, SF_DIR, "documents")
    plan = _plan(sketch.exact_heavy_hitters(docs, k=25))
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortAggregate" not in plan, plan


def test_histogram_plan_broadcasts_range_row(spark):
    """value_histogram's global range is one broadcast row; the count
    is a partial/final hash agg keyed (key, bin)."""
    from ts_data_pipeline_spark.operators import tsstats

    ev = io.load(spark, SF_DIR, "events")
    plan = _plan(tsstats.value_histogram(ev))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan


def test_brute_force_topk_uses_partial_window_group_limit(spark):
    """r15: the explicit repartition(query_id) barrier was removed
    from _exact_cosine_topk — the window's own exchange now admits
    the PARTIAL WindowGroupLimit below it (map-side top-k, so the
    shuffle carries ~k rows per task instead of every scored pair)
    and the sort is no longer capped at #queries partitions. Pin
    both: a WindowGroupLimit node present, and no RepartitionByExpression
    on query_id between the score projection and the window."""
    from ts_data_pipeline_spark.operators import similarity

    df = similarity.brute_force_topk(
        io.load(spark, SF_DIR, "embeddings"), list(range(4)), k=3
    )
    plan = _plan(df)
    assert "WindowGroupLimit" in plan, plan
    optimized = _plan(df, "extended")
    assert "RepartitionByExpression [query_id" not in optimized, optimized
