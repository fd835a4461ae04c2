"""Text analysis for training-data pipelines (north-star ops).

Language-ID heuristic, quality scoring, token counting, and document
fingerprinting — all pure Column expressions over the documents
table, so they vectorize JVM-side at any scale. (The reference has
no text operators; these extend the engine per the build brief.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny English stopword list for the heuristic scorer (public common
# words; the synthetic corpus is English-ish so this discriminates).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


def token_count(text: Column) -> Column:
    """Whitespace token count (empties removed)."""
    return F.size(F.filter(F.split(F.lower(text), " "), lambda t: t != ""))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality/feature vector.

    n_tokens, distinct tokens, avg token length, stopword ratio, a
    character-class ratio, a logistic quality score, a language-ID
    heuristic, and an md5 content fingerprint.
    """
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
        ).alias("tok"),
    )
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct(F.col("tok")).alias("n_distinct_tokens"),
        F.round(F.avg(F.length("tok")), 4).alias("avg_token_len"),
        F.sum(F.expr(f"CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END")).alias(
            "stop_cnt"
        ),
    )
    base = docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("fingerprint"),
        F.round(
            (
                F.length(text_col)
                - F.length(F.regexp_replace(F.col(text_col), "[aeiou]", ""))
            )
            / F.length(text_col),
            4,
        ).alias("vowel_ratio"),
    )
    out = per_doc.join(base, "doc_id")
    stop_ratio = F.round(F.col("stop_cnt") / F.col("n_tokens"), 4)
    quality = F.round(
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.exp(-(F.lit(0.01) * F.col("n_tokens") + F.lit(5.0) * stop_ratio - F.lit(2.0)))
        ),
        4,
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "avg_token_len",
        stop_ratio.alias("stop_ratio"),
        "vowel_ratio",
        quality.alias("quality_score"),
        F.when(stop_ratio > 0.05, F.lit("en")).otherwise(F.lit("other")).alias(
            "lang_guess"
        ),
        "fingerprint",
    )


def quality_features_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                    t -> t != '')) AS tok
  FROM documents
),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         COUNT(DISTINCT tok) AS n_distinct_tokens,
         ROUND(AVG(length(tok)), 4) AS avg_token_len,
         CAST(SUM(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) AS BIGINT)
           AS stop_cnt
  FROM toks GROUP BY doc_id
),
base AS (
  SELECT doc_id, md5(text) AS fingerprint,
         ROUND(CAST(length(text) -
               length(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)
               / length(text), 4) AS vowel_ratio
  FROM documents
)
SELECT p.doc_id, p.n_tokens, p.n_distinct_tokens, p.avg_token_len,
       ROUND(CAST(p.stop_cnt AS DOUBLE) / p.n_tokens, 4) AS stop_ratio,
       b.vowel_ratio,
       ROUND(1.0 / (1.0 + exp(-(0.01 * p.n_tokens +
             5.0 * ROUND(CAST(p.stop_cnt AS DOUBLE) / p.n_tokens, 4) - 2.0))), 4)
         AS quality_score,
       CASE WHEN ROUND(CAST(p.stop_cnt AS DOUBLE) / p.n_tokens, 4) > 0.05
            THEN 'en' ELSE 'other' END AS lang_guess,
       b.fingerprint
FROM per_doc p JOIN base b ON p.doc_id = b.doc_id
"""


def doc_fingerprints(docs: DataFrame, n: int = 3) -> DataFrame:
    """Content + shingle-range fingerprints per document.

    md5 of the full text plus lexicographic min/max of the shingle
    digests (a 1-permutation MinHash — engine-portable and exact).
    """
    from ts_data_pipeline_spark.operators.dedup import shingles_col

    sh = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_md5"),
        F.explode(shingles_col(n)).alias("sh"),
    )
    return sh.groupBy("doc_id", "content_md5").agg(
        F.min(F.md5(F.col("sh"))).alias("shingle_min"),
        F.max(F.md5(F.col("sh"))).alias("shingle_max"),
        F.count_distinct(F.col("sh")).alias("n_shingles"),
    )


def doc_fingerprints_sql(n: int = 3) -> str:
    from ts_data_pipeline_spark.operators.dedup import SHINGLES_SQL

    sh = SHINGLES_SQL.format(nm1=n - 1)
    return f"""
WITH sh AS (
  SELECT doc_id, md5(text) AS content_md5, unnest({sh}) AS sh
  FROM documents
)
SELECT doc_id, content_md5,
       MIN(md5(sh)) AS shingle_min,
       MAX(md5(sh)) AS shingle_max,
       COUNT(DISTINCT sh) AS n_shingles
FROM sh GROUP BY doc_id, content_md5
"""
