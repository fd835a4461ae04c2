"""End-to-end corpus ingest: one operator chain from raw incoming
documents to training-ready survivors, identical in batch and
Structured Streaming.

This is the composition layer over pieces that are each
oracle-checked on their own (normalize / repetition / PII /
incremental dedup): a single expression-only map stage computes every
gate signal, the verdict is a CASE cascade (first failing rule
wins, mirroring ``corpus_selection``), and the only non-map work is
the stream-static anti-join against the historical digest table plus
the in-batch dedup. Because every signal is scan-shaped, the whole
pipeline runs under a streaming watermark without extra state —
exactly the shape a 100 TB ingest firehose needs: map, one broadcast
probe (the digest table bucketed at scale), one keyed state op.

Reference: the ingestion direction of the reference's source
services (e.g. /root/reference/darkpool_trades/main.py transform →
validate → produce), re-expressed for corpus construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_signals(
    docs: DataFrame, *, text_col: str = "text", rep_n: int = 5
) -> DataFrame:
    """Per-document gate signals as pure expressions (no shuffle,
    no state): normalized text + length, repetition ratio, PII email
    count, and the content digest used for dedup."""
    from ts_data_pipeline_spark.functions.text import _PII_EMAIL
    from ts_data_pipeline_spark.operators.dedup import shingles_col

    t = F.col(text_col)
    cleaned = F.regexp_replace(t, "[\\x00-\\x1F\\x7F]", " ")
    norm = F.lower(F.trim(F.regexp_replace(cleaned, "\\s+", " ")))
    grams = shingles_col(rep_n, text_col=text_col)
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    rep = F.when(n_grams > 0, 1.0 - n_distinct / n_grams).otherwise(0.0)
    return docs.select(
        "*",
        norm.alias("text_norm"),
        F.length(norm).alias("n_chars_norm"),
        F.round(rep, 4).alias("rep_ratio"),
        F.size(F.regexp_extract_all(t, F.lit(_PII_EMAIL), 0)).alias("n_emails"),
        F.md5(norm).alias("digest"),
    )


def ingest_pipeline(
    new_docs: DataFrame,
    corpus_digests: DataFrame,
    *,
    text_col: str = "text",
    min_chars: int = 120,
    max_chars: int = 520,
    max_rep: float = 0.3,
    event_time_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Raw docs -> training-ready survivors.

    Gate order (first failure wins): too_short, too_long,
    repetitive, pii, duplicate-of-corpus (anti-join), duplicate
    in-batch. The same call works on a batch frame and a streaming
    one — pass ``event_time_col`` on the streaming side to bound the
    in-batch dedup state by the watermark.
    """
    sig = ingest_signals(new_docs, text_col=text_col)
    passed = sig.filter(
        (F.col("n_chars_norm") >= min_chars)
        & (F.col("n_chars_norm") <= max_chars)
        & (F.col("rep_ratio") < max_rep)
        & (F.col("n_emails") == 0)
    )
    fresh = passed.join(
        corpus_digests.select("digest"), "digest", "left_anti"
    )
    if event_time_col is not None:
        return fresh.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["digest"])
    return fresh.dropDuplicates(["digest"])


def ingest_report(
    new_docs: DataFrame,
    corpus_digests: DataFrame,
    *,
    text_col: str = "text",
    min_chars: int = 120,
    max_chars: int = 520,
    max_rep: float = 0.3,
) -> DataFrame:
    """Deterministic per-document ingest verdict (the auditable batch
    form): every doc gets its first failing gate, or 'ok' and whether
    it is the in-batch canonical copy (lowest doc_id per digest —
    NOT the arbitrary dropDuplicates winner, so the report is
    engine-stable and oracle-checkable)."""
    from pyspark.sql import Window

    sig = ingest_signals(new_docs, text_col=text_col)
    in_corpus = corpus_digests.select("digest").distinct().withColumn(
        "_dup_corpus", F.lit(True)
    )
    # No broadcast hint: the corpus digest set has one row PER CORPUS
    # DOCUMENT — it grows without bound, and the small side of this
    # join is the ingest BATCH. A shuffle join on digest (or AQE's
    # size-gated broadcast of whichever side is actually small) is
    # the shape that survives a web-scale corpus.
    j = sig.join(in_corpus, "digest", "left")
    gate = (
        F.when(F.col("n_chars_norm") < min_chars, "too_short")
        .when(F.col("n_chars_norm") > max_chars, "too_long")
        .when(F.col("rep_ratio") >= max_rep, "repetitive")
        .when(F.col("n_emails") > 0, "pii")
        .when(F.col("_dup_corpus"), "dup_corpus")
        .otherwise("ok")
    )
    w = Window.partitionBy("digest")
    return j.select(
        "doc_id",
        "digest",
        gate.alias("verdict"),
        (
            (gate == "ok") & (F.col("doc_id") == F.min("doc_id").over(w))
        ).alias("canonical"),
    )


def ingest_report_sql(
    min_chars: int = 120, max_chars: int = 520, max_rep: float = 0.3,
    corpus_pred: str = "doc_id % 7 = 0",
) -> str:
    """DuckDB oracle for ``ingest_report`` with the historical corpus
    modeled as the ``corpus_pred`` slice of the same table (mirrors
    the query wiring in queries/llmdata.py)."""
    from ts_data_pipeline_spark.functions.text import _PII_EMAIL
    from ts_data_pipeline_spark.operators.dedup import SHINGLES_SQL

    sh = SHINGLES_SQL.format(nm1=4)
    return f"""
WITH sig AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1F\\x7F]', ' ', 'g'),
             '\\s+', ' ', 'g')))) AS digest,
         len(lower(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1F\\x7F]', ' ', 'g'),
             '\\s+', ' ', 'g')))) AS n_chars_norm,
         ROUND(CASE WHEN len({sh}) > 0
               THEN 1.0 - CAST(len(list_distinct({sh})) AS DOUBLE) / len({sh})
               ELSE 0.0 END, 4) AS rep_ratio,
         len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails
  FROM documents WHERE NOT ({corpus_pred})
),
corpus AS (
  SELECT DISTINCT md5(lower(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1F\\x7F]', ' ', 'g'),
             '\\s+', ' ', 'g')))) AS digest
  FROM documents WHERE {corpus_pred}
),
v AS (
  SELECT s.doc_id, s.digest,
         CASE WHEN s.n_chars_norm < {min_chars} THEN 'too_short'
              WHEN s.n_chars_norm > {max_chars} THEN 'too_long'
              WHEN s.rep_ratio >= {max_rep} THEN 'repetitive'
              WHEN s.n_emails > 0 THEN 'pii'
              WHEN c.digest IS NOT NULL THEN 'dup_corpus'
              ELSE 'ok' END AS verdict
  FROM sig s LEFT JOIN corpus c ON s.digest = c.digest
)
SELECT doc_id, digest, verdict,
       verdict = 'ok' AND doc_id = MIN(doc_id)
           OVER (PARTITION BY digest) AS canonical
FROM v
"""


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff: per-document change verdict between two
    corpus versions — 'added' (key only in new), 'removed' (key only
    in old), 'changed' (key in both, content digest differs),
    'unchanged'. The incremental-refresh primitive: a nightly crawl
    re-processes ONLY added+changed documents instead of the full
    corpus, and removed keys propagate as deletes
    (streaming/upsert_sink.delete_keys).

    Scale shape: one full-outer equi-join on the key — both sides
    shuffle once on the natural key; comparison is digest equality
    (md5 computed scan-side), so text never moves twice.
    """
    # Presence is tracked with explicit markers, NOT digest nullness:
    # md5(NULL) is NULL, so a doc present in both snapshots with NULL
    # text would otherwise be misclassified added/removed — and
    # 'removed' propagates as a compliance DELETE downstream.
    # coalesce to a sentinel so NULL-text vs NULL-text compares equal.
    o = old.select(
        F.col(key_col).alias("k"),
        F.coalesce(F.md5(F.col(text_col)), F.lit("<null>")).alias("od"),
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.coalesce(F.md5(F.col(text_col)), F.lit("<null>")).alias("nd"),
        F.lit(True).alias("in_new"),
    )
    return (
        o.join(n, "k", "full_outer")
        .select(
            F.col("k").alias(key_col),
            F.when(F.col("in_old").isNull(), "added")
            .when(F.col("in_new").isNull(), "removed")
            .when(F.col("od") != F.col("nd"), "changed")
            .otherwise("unchanged")
            .alias("change"),
        )
    )


def snapshot_diff_report_sql(
    old_sql: str, new_sql: str, key_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB oracle for the aggregated diff report over two
    (SQL-defined) snapshot relations."""
    return f"""
WITH o AS (SELECT {key_col} AS k,
                  COALESCE(md5({text_col}), '<null>') AS od,
                  TRUE AS in_old
           FROM ({old_sql})),
n AS (SELECT {key_col} AS k,
             COALESCE(md5({text_col}), '<null>') AS nd,
             TRUE AS in_new
      FROM ({new_sql})),
d AS (
  SELECT COALESCE(o.k, n.k) AS k,
         CASE WHEN o.in_old IS NULL THEN 'added'
              WHEN n.in_new IS NULL THEN 'removed'
              WHEN o.od <> n.nd THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM o FULL OUTER JOIN n ON o.k = n.k
)
SELECT change, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(k) AS BIGINT) AS min_id, CAST(MAX(k) AS BIGINT) AS max_id
FROM d GROUP BY change
"""
