"""Lexical retrieval over the document corpus: BM25 scoring + top-k.

A training-data pipeline needs query-relevant corpus selection
(retrieval-based curation, eval-set mining, targeted upsampling);
BM25 (Robertson/Sparck Jones probabilistic idf with tf saturation
and length normalization) is the standard lexical scorer.

Scale design (100 TB):
- the per-term term frequency is a pure array expression
  (``size(filter(tokens, t = term))``) — NO explode, NO shuffle of
  the corpus; the scoring pass is scan-shaped and codegen'd;
- corpus statistics (N, avgdl, per-term document frequency) reduce
  to ONE row in a single aggregate pass, then ride a broadcast
  crossJoin back onto the scan — the big side never moves;
- the global top-k is ``orderBy(...).limit(k)``, which Spark plans
  as TakeOrderedAndProject: per-partition partial top-k, then a
  k-sized merge on the driver — no global sort, no single-partition
  window.

Tokenization matches the package convention exactly on both engines:
``filter(split(lower(text), ' '), t -> t != '')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks(text_col: str):
    # single definition of the package tokenization (functions/text.py)
    from ts_data_pipeline_spark.functions.text import toks_col

    return toks_col(text_col)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-terms query.

    idf_t = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   (Robertson)
    score = sum_t idf_t * tf_t*(k1+1) / (tf_t + k1*(1 - b + b*dl/avgdl))

    Ties (documents with identical term statistics are common) break
    on ascending id so the result is engine-reproducible.
    """
    toked = docs.select(
        F.col(id_col), _toks(text_col).alias("toks")
    ).withColumn("dl", F.size("toks"))

    # One aggregate pass -> 1 row: N, avgdl, df per query term.
    stat_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ]
    for i, t in enumerate(query_terms):
        stat_aggs.append(
            F.sum(
                (F.array_contains("toks", t)).cast("bigint")
            ).alias(f"df_{i}")
        )
    stats = toked.agg(*stat_aggs)

    scored = toked.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        # NB: the lambda must take exactly ONE parameter — F.filter
        # passes (element, index) to two-parameter lambdas, so a
        # `t=t` default would silently bind the index column.
        lit_t = F.lit(t)
        tf = F.size(F.filter("toks", lambda x: x == lit_t)).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        score = score + idf * tf * (k1 + 1.0) / denom
    scored = scored.select(
        F.col(id_col), F.round(score, 4).alias("bm25")
    )

    # TakeOrderedAndProject top-k; rank assigned over the k-row result.
    top = scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "bm25", "rank"
    )


def bm25_topk_sql(
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle: identical statistics, scoring, and tie-break."""
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t != '')"
    df_exprs = ",\n         ".join(
        f"SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS df_{i}"
        for i, t in enumerate(query_terms)
    )
    score_terms = " +\n           ".join(
        f"ln(1 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * len(list_filter(toks, x -> x = '{t}')) * ({k1} + 1)"
        f" / (len(list_filter(toks, x -> x = '{t}'))"
        f"    + {k1} * (1 - {b} + {b} * dl / avgdl))"
        for i, t in enumerate(query_terms)
    )
    return f"""
WITH toked AS (
  SELECT {id_col}, {toks} AS toks, len({toks}) AS dl FROM {table}
),
stats AS MATERIALIZED (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl,
         {df_exprs}
  FROM toked
),
scored AS (
  SELECT {id_col},
         ROUND({score_terms}, 4) AS bm25
  FROM toked CROSS JOIN stats
),
top AS (
  SELECT * FROM scored ORDER BY bm25 DESC, {id_col} ASC LIMIT {k}
)
SELECT {id_col}, bm25,
       row_number() OVER (ORDER BY bm25 DESC, {id_col} ASC) AS rank
FROM top
"""


def rrf_hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    k_each: int = 50,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: fuse the BM25
    lexical ranking with the embedding-cosine ranking (vec_id ==
    doc_id, the corpus convention) as

        rrf = sum_r 1 / (rrf_k + rank_r)

    over the rankers that returned the document (Cormack et al.;
    rrf_k=60 is the standard constant). The fusion needs only RANKS,
    never comparable scores — which is why RRF is the standard way to
    combine lexical and vector retrieval.

    Scale shape: each ranker is its own scale-safe top-``k_each``
    (BM25: scan-shaped tf + TakeOrderedAndProject; ANN: broadcast
    query + candidate ranking); the fusion itself joins two k_each-row
    relations — driver-free, broadcast-sized.
    """
    from ts_data_pipeline_spark.operators import similarity

    lex = bm25_topk(
        docs, query_terms, k=k_each, id_col=id_col, text_col=text_col
    ).select(F.col(id_col), F.col("rank").alias("lex_rank"))
    vec = (
        similarity.brute_force_topk(embeddings, [query_vec_id], k=k_each)
        .select(F.col("cand_id").alias(id_col), F.col("rank").alias("vec_rank"))
    )
    fused = (
        lex.join(vec, id_col, "full_outer")
        .select(
            id_col,
            "lex_rank",
            "vec_rank",
            F.round(
                F.coalesce(1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(
                    1.0 / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)
                ),
                6,
            ).alias("rrf"),
        )
    )
    top = fused.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))


def rrf_hybrid_topk_sql(
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    k_each: int = 50,
    rrf_k: int = 60,
) -> str:
    from ts_data_pipeline_spark.operators import similarity

    lex = bm25_topk_sql(query_terms, k=k_each)
    vec = similarity.brute_force_topk_sql([query_vec_id], k=k_each)
    return f"""
WITH lex AS (SELECT doc_id, rank AS lex_rank FROM ({lex})),
vec AS (SELECT cand_id AS doc_id, rank AS vec_rank FROM ({vec})),
fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         lex_rank, vec_rank,
         ROUND(COALESCE(CAST(1.0 AS DOUBLE) / ({rrf_k} + lex_rank), 0)
               + COALESCE(CAST(1.0 AS DOUBLE) / ({rrf_k} + vec_rank), 0), 6) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
),
top AS (SELECT * FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT {k})
SELECT doc_id, lex_rank, vec_rank, rrf,
       row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank
FROM top
"""


def inverted_index(
    docs: DataFrame,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialized inverted index: one posting row per (term, doc),
    with tf, df, and the doc's position in the term's posting list
    (doc_id ascending — the order a merge-based retriever consumes).

    Scale shape: tf is one groupBy(term, doc) with map-side combine.
    df is a groupBy(term) AGGREGATE joined back on term — NOT a
    whole-partition window, whose WindowExec would route a stopword's
    entire million-row posting set through one task; the aggregate's
    partial combine carries one row per (task, term), so the hot term
    costs one row per task. The df <= max_df filter then runs BEFORE
    the posting-position window, capping window-partition skew at
    max_df rows per term — unlike a collect_list index build, a
    stopword's posting list never exists in one task's memory.
    """
    from pyspark.sql import Window

    tf = (
        docs.select(F.col(id_col), F.explode(_toks(text_col)).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    pruned = tf.join(dfreq.filter(F.col("df") <= max_df), "term")
    pos = Window.partitionBy("term").orderBy(F.col(id_col).asc())
    return pruned.withColumn("plist_pos", F.row_number().over(pos)).select(
        "term",
        F.col(id_col),
        F.col("tf"),
        F.col("df").cast("bigint").alias("df"),
        F.col("plist_pos").cast("bigint").alias("plist_pos"),
    )


def inverted_index_sql(
    max_df: int = 100,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`inverted_index`."""
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t != '')"
    return f"""
WITH tf AS (
  SELECT term, {id_col}, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT {id_col}, unnest({toks}) AS term FROM {table})
  GROUP BY term, {id_col}
),
with_df AS (
  SELECT *, COUNT(*) OVER (PARTITION BY term) AS df FROM tf
)
SELECT term, {id_col}, tf, CAST(df AS BIGINT) AS df,
       CAST(row_number() OVER (PARTITION BY term ORDER BY {id_col} ASC)
            AS BIGINT) AS plist_pos
FROM with_df
WHERE df <= {max_df}
"""
