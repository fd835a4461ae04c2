"""BM25 lexical retrieval (operators/retrieval.py): scoring behavior
and the scan-shaped plan (no explode, broadcast stats, top-k via
TakeOrderedAndProject)."""

from __future__ import annotations

import contextlib
import io as pyio
import math

from pyspark.sql import Row

from tests.conftest import SF_DIR
from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import retrieval


def _plan(df) -> str:
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bm25_hand_computed(spark):
    """Four tiny docs, one-term query — scores match the closed form."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="cat dog"),
            Row(doc_id=2, text="cat cat cat dog"),
            Row(doc_id=3, text="dog dog"),
            Row(doc_id=4, text="cat"),
        ]
    )
    got = {
        r.doc_id: r.bm25
        for r in retrieval.bm25_topk(docs, ["cat"], k=4).collect()
    }
    n, avgdl, df_t, k1, b = 4, 9 / 4, 3, 1.2, 0.75
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))

    def score(tf, dl):
        return round(
            idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 4
        )

    assert got == {
        1: score(1, 2),
        2: score(3, 4),
        3: score(0, 2),
        4: score(1, 1),
    }
    # tf saturation + length normalization: the 3x-tf doc wins, the
    # shortest 1-tf doc beats the longer 1-tf doc.
    assert got[2] > got[4] > got[1] > got[3] == 0.0


def test_bm25_rank_is_deterministic_and_contiguous(spark):
    docs = io.load(spark, SF_DIR, "documents")
    rows = retrieval.bm25_topk(docs, ["spark", "join"], k=10).collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    keys = [(-r.bm25, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_bm25_plan_is_scan_shaped(spark):
    """Corpus-side hazards stay out of the plan: no Generate (explode)
    anywhere, the stats side joins back via BroadcastNestedLoopJoin
    on a 1-row build, and the global top-k is TakeOrderedAndProject,
    not a full Sort + single-partition window over the corpus."""
    docs = io.load(spark, SF_DIR, "documents")
    plan = _plan(retrieval.bm25_topk(docs, ["spark", "join"], k=10))
    assert "Generate" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_rrf_fusion_properties(spark):
    """RRF: a doc ranked by both rankers outranks docs found by only
    one at similar positions; ranks are contiguous and deterministic."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.queries.llmdata import BM25_QUERY_TERMS

    docs = io.load(spark, SF_DIR, "documents")
    emb = io.load(spark, SF_DIR, "embeddings")
    rows = retrieval.rrf_hybrid_topk(
        docs, emb, BM25_QUERY_TERMS, query_vec_id=3, k=10
    ).collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    both = [r for r in rows if r.lex_rank is not None and r.vec_rank is not None]
    only = [r for r in rows if r.lex_rank is None or r.vec_rank is None]
    # rrf of any doubly-ranked doc >= 2/(60+k_each); singly-ranked
    # docs cap at 1/(60+1)
    for r in both:
        assert r.rrf >= round(2 / (60 + 50), 6) - 1e-9
    for r in only:
        assert r.rrf <= round(1 / 61, 6) + 1e-9


def test_inverted_index_hand_computed(spark):
    """Postings, tf, df, and posting-list position on a tiny corpus;
    max_df prunes the stopword-like term entirely."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import retrieval

    docs = spark.createDataFrame(
        [
            Row(doc_id=10, text="the cat sat"),
            Row(doc_id=20, text="the the dog"),
            Row(doc_id=30, text="the cat"),
        ]
    )
    rows = retrieval.inverted_index(docs, max_df=2).collect()
    got = {(r.term, r.doc_id): (r.tf, r.df, r.plist_pos) for r in rows}
    assert got == {
        ("cat", 10): (1, 2, 1),
        ("cat", 30): (1, 2, 2),
        ("sat", 10): (1, 1, 1),
        ("dog", 20): (1, 1, 1),
        # 'the' has df=3 > max_df -> pruned
    }
