"""Sampling and mixing operators for training-corpus construction.

A 100 TB training-data pipeline ends in a mix: per-source/per-language
quotas, quality-weighted inclusion, deterministic train/eval splits.
These are the canonical Spark forms:

- ``stratified_sample``: `sampleBy` — per-stratum Bernoulli sampling,
  executed scan-side (no shuffle at all; each task filters its rows).
- ``weighted_mix``: per-source keep-rates + union — the data-mixing
  recipe (e.g. upsample wiki, downsample crawl). Inclusion is a
  DETERMINISTIC keyed-hash draw (md5-derived uniform, same pattern as
  ``importance_resample``), not Bernoulli RNG: the same doc survives
  on every run, every engine, every cluster size — which is what a
  reproducible corpus recipe needs, and what makes the op
  oracle-checkable in DuckDB (``weighted_mix_sql_predicate``).
- ``hash_split``: deterministic train/eval assignment by key hash —
  stable across runs and machines (no RNG), the reproducible-split
  pattern; pure expression, zero shuffle. Also md5-keyed, so the
  split too is portable to the DuckDB oracle.

``stratified_sample`` (``sampleBy``) remains the one engine-specific
Bernoulli path — kept for quota enforcement where per-stratum rates
come from Spark's native sampler; pinned by tests/test_sampling.py.
"""

from __future__ import annotations

import math
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: Mapping[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (quota enforcement per lang/source)."""
    return df.sampleBy(stratum_col, dict(fractions), seed=seed)


def weighted_mix(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    key_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Mix corpora at given inclusion rates, tagging provenance.

    Each source keeps a row iff its md5-derived uniform draw
    (keyed on salt + source name + key) clears the source's weight,
    then the survivors are unioned — the standard mixture recipe with
    a deterministic draw instead of Bernoulli RNG. Weights > 1.0 are
    not duplicated here (epoch-level upsampling belongs to the
    training loader); they are capped at 1.

    Scale shape: the draw is a scan-side expression (no shuffle, no
    RNG state); union is plan-level. Identical inclusion in DuckDB
    via ``weighted_mix_sql_predicate``.
    """
    if not sources:
        raise ValueError("weighted_mix requires at least one source")
    parts = []
    for name, df in sources.items():
        frac = min(float(weights.get(name, 1.0)), 1.0)
        if frac >= 1.0:
            sampled = df
        else:
            u = _u32_spark(
                f"concat('{salt}-{name}-', cast({key_col} as string))"
            )
            sampled = df.filter((u / F.lit(float(2 ** 32))) < F.lit(frac))
        parts.append(sampled.withColumn("mix_source", F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_mix_sql_predicate(
    name: str, frac: float, key_col: str = "doc_id", salt: str = "mix-v1"
) -> str:
    """DuckDB WHERE predicate reproducing weighted_mix's keep-draw for
    one source (TRUE when frac >= 1)."""
    frac = min(float(frac), 1.0)
    if frac >= 1.0:
        return "TRUE"
    u = _u32_sql(f"'{salt}-{name}-' || CAST({key_col} AS VARCHAR)")
    return f"(({u}) / 4294967296.0) < {frac!r}"


def hash_split(
    df: DataFrame,
    key_col: str,
    eval_permille: int = 10,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/eval split by key hash (no RNG).

    split = 'eval' iff u32(md5(salt || '-' || key)) mod 1000 <
    eval_permille. Keyed hashing keeps all rows of one document/user
    on the same side (no leakage), survives reruns and
    repartitioning, and versioned salts allow re-splitting without
    touching data. The md5 draw (not xxhash64) keeps the assignment
    portable to other engines — ``hash_split_sql_case`` is the exact
    DuckDB equivalent.
    """
    u = _u32_spark(f"concat('{salt}-', cast({key_col} as string))")
    bucket = F.pmod(u, F.lit(1000))
    return df.withColumn(
        "split",
        F.when(bucket < eval_permille, F.lit("eval")).otherwise(F.lit("train")),
    )


def hash_split_sql_case(
    key_col: str, eval_permille: int = 10, salt: str = "split-v1"
) -> str:
    """DuckDB CASE expression reproducing hash_split's assignment."""
    u = _u32_sql(f"'{salt}-' || CAST({key_col} AS VARCHAR)")
    return (
        f"CASE WHEN ({u}) % 1000 < {eval_permille} "
        f"THEN 'eval' ELSE 'train' END"
    )


def sequence_pack(docs: DataFrame, ctx: int = 512, bucket_size: int = 64) -> DataFrame:
    """Assign documents to fixed-size training sequences (the
    concat-then-chunk packing every pretraining run performs): global
    token offset per doc, the context chunk it starts in, its
    position inside that chunk, and how many chunk boundaries it
    straddles.

    The global offset is an exclusive prefix sum over doc order —
    naively a single-partition window (a 100 TB non-starter). Here it
    is the classic two-phase distributed prefix sum:

    1. per-bucket token sums (``doc_id // bucket_size`` — map-side
       combine, shuffle carries n/bucket_size rows);
    2. exclusive cumsum ACROSS buckets — a window over the tiny
       bucket table only (n/bucket_size rows, e.g. 100 TB / 1M-doc
       buckets => a few thousand rows);
    3. within-bucket exclusive cumsum — a window PARTITIONED by
       bucket, so every task sorts only bucket_size rows;
    4. offset = bucket base + within-bucket offset (broadcast join).

    Values are identical to the oracle's flat
    ``SUM() OVER (ORDER BY doc_id)`` — only the physical plan
    differs.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        (F.col("doc_id") / bucket_size).cast("bigint").alias("bucket"),
        F.size(F.expr("filter(split(lower(text), ' '), t -> t != '')")).alias("tokens"),
    )
    per_bucket = toks.groupBy("bucket").agg(F.sum("tokens").alias("bucket_tokens"))
    across = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bases = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(across), F.lit(0)).alias("base"),
    )
    within = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        toks.withColumn("intra", F.coalesce(F.sum("tokens").over(within), F.lit(0)))
        .join(F.broadcast(bases), "bucket")
        .select(
            "doc_id",
            "tokens",
            (F.col("base") + F.col("intra")).alias("tok_offset"),
        )
    )
    start = F.floor(F.col("tok_offset") / ctx)
    end = F.floor((F.col("tok_offset") + F.col("tokens") - 1) / ctx)
    return packed.select(
        "doc_id",
        "tokens",
        "tok_offset",
        start.alias("chunk_id"),
        (F.col("tok_offset") % ctx).alias("chunk_pos"),
        (end - start + 1).alias("chunks_spanned"),
    )


def sequence_pack_sql(ctx: int = 512, table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(lower(text), ' '), t -> t != '')) AS tokens
  FROM {table}
),
packed AS (
  SELECT doc_id, tokens,
         CAST(COALESCE(SUM(tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM toks
)
SELECT doc_id, tokens, tok_offset,
       CAST(FLOOR(tok_offset / {ctx}.0) AS BIGINT) AS chunk_id,
       tok_offset % {ctx} AS chunk_pos,
       CAST(FLOOR((tok_offset + tokens - 1) / {ctx}.0)
            - FLOOR(tok_offset / {ctx}.0) + 1 AS BIGINT) AS chunks_spanned
FROM packed
"""


def mixture_weights(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Temperature-scaled domain-mixture weights (the multilingual /
    multi-domain sampling recipe): raw token share per language plus
    the alpha-annealed share ``tokens^alpha / sum(tokens^alpha)`` that
    upsamples the tail without letting the head dominate.

    The per-language agg combines map-side; the normalizing window
    runs over the handful of language rows — cardinality is bounded
    by the domain count, not the corpus size, at any SF.
    """
    from pyspark.sql import Window

    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(F.expr("filter(split(lower(text), ' '), t -> t != '')"))
        ).alias("tokens"),
    )
    everything = Window.partitionBy()
    powed = F.pow(F.col("tokens").cast("double"), F.lit(alpha))
    return per.select(
        "lang",
        "n_docs",
        "tokens",
        F.round(F.col("tokens") / F.sum("tokens").over(everything), 6).alias("raw_share"),
        F.round(powed / F.sum(powed).over(everything), 6).alias("temp_share"),
    )


def mixture_weights_sql(alpha: float = 0.5, table: str = "documents") -> str:
    return f"""
WITH per AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(len(list_filter(string_split(lower(text), ' '), t -> t != ''))) AS BIGINT) AS tokens
  FROM {table} GROUP BY lang
)
SELECT lang, n_docs, tokens,
       ROUND(CAST(tokens AS DOUBLE) / SUM(tokens) OVER (), 6) AS raw_share,
       ROUND(POW(CAST(tokens AS DOUBLE), {alpha})
             / SUM(POW(CAST(tokens AS DOUBLE), {alpha})) OVER (), 6) AS temp_share
FROM per
"""


# The portable uniform draw — one definition repo-wide
# (functions/portable_hash.py), aliased to the historical local names.
from ts_data_pipeline_spark.functions.portable_hash import (  # noqa: E402
    u32_md5_spark as _u32_spark,
    u32_md5_sql as _u32_sql,
)


def importance_resample(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Rebalance the corpus toward its temperature mixture by
    DETERMINISTIC hash sampling: each language's keep-rate is
    ``min(1, temp_share/raw_share)`` (over-represented languages are
    down-sampled; the tail keeps everything), and a doc survives iff
    its md5-derived uniform draw clears the rate. No RNG — the same
    doc survives on every run, every engine, every cluster size.

    Scale shape: the per-language rate table is a handful of rows
    joined in via broadcast; the draw is a scan-side expression. The
    corpus never shuffles.
    """
    from ts_data_pipeline_spark.operators.sampling import mixture_weights

    rates = mixture_weights(docs, alpha).select(
        "lang",
        F.least(F.lit(1.0), F.col("temp_share") / F.col("raw_share")).alias("_rate"),
    )
    u = _u32_spark("concat('rs-', cast(doc_id as string))")
    return (
        docs.join(F.broadcast(rates), "lang")
        .select(
            "doc_id",
            "lang",
            F.round(F.col("_rate"), 6).alias("rate"),
            ((u / F.lit(float(2 ** 32))) < F.col("_rate")).alias("kept"),
        )
    )


def importance_resample_sql(alpha: float = 0.5, table: str = "documents") -> str:
    mix = mixture_weights_sql(alpha, table)
    u = _u32_sql("'rs-' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH mix AS ({mix}),
rates AS (
  SELECT lang, LEAST(1.0, temp_share / raw_share) AS _rate FROM mix
)
SELECT d.doc_id, d.lang,
       ROUND(r._rate, 6) AS rate,
       ({u} / 4294967296.0) < r._rate AS kept
FROM {table} d JOIN rates r USING (lang)
"""


def corpus_shuffle(docs: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    stable pseudo-random position (rank of its md5 draw, doc_id
    tie-break) — the pre-packing corpus shuffle, reproducible across
    runs and engines.

    The global rank is NOT a single-partition window: hash range
    buckets give per-bucket counts (tiny), an across-bucket exclusive
    cumsum over n_buckets rows yields each bucket's base, and a
    within-bucket row_number (window PARTITIONED by bucket) finishes
    the rank — the distributed-sort shape of the prefix-sum trick in
    sequence_pack, applied to counts.
    """
    from pyspark.sql import Window

    span = (2 ** 32) // n_buckets
    h = _u32_spark("concat('sh-', cast(doc_id as string))")
    hashed = docs.select(
        "doc_id", h.alias("h"), (h / span).cast("bigint").alias("bucket")
    )
    per_bucket = hashed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    across = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bases = per_bucket.select(
        "bucket", F.coalesce(F.sum("n").over(across), F.lit(0)).alias("base")
    )
    within = Window.partitionBy("bucket").orderBy("h", "doc_id")
    return (
        hashed.withColumn("rk", F.row_number().over(within) - 1)
        .join(F.broadcast(bases), "bucket")
        .select("doc_id", "h", (F.col("base") + F.col("rk")).alias("pos"))
    )


def corpus_shuffle_sql(table: str = "documents") -> str:
    u = _u32_sql("'sh-' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH h AS (SELECT doc_id, {u} AS h FROM {table})
SELECT doc_id, h,
       CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM h
"""


def source_quota_cap(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota-v1",
) -> DataFrame:
    """Cap any single source's share: keep at most ``cap`` documents
    per source, survivors chosen by deterministic md5-u32 rank.

    The standard anti-domination rule of web-corpus curation (no
    domain may exceed a fixed share of the mix). Survivor choice is a
    keyed-hash ORDER — u32(md5(salt||key)) ascending with key
    tie-break — so the same documents survive on every run, engine,
    and partitioning, and the DuckDB oracle reproduces the selection
    bit-for-bit (``source_quota_cap_sql``).

    Scale shape: one shuffle on ``source_col`` for the per-source
    rank window. Source cardinality is domain-scale (bounded), but a
    mega-source is a skewed partition; when one source holds a large
    fraction of a 100 TB corpus, switch to
    :func:`source_quota_threshold` (scan-shaped, EXPECTED cap) or
    :func:`source_quota_cap_hybrid` (exact cap for bounded sources,
    threshold form only for the mega ones).
    """
    from pyspark.sql import Window

    u = _u32_spark(f"concat('{salt}-', cast({key_col} as string))")
    # The draw is materialized as a column BEFORE the window: Spark's
    # sort re-evaluates un-materialized ordering expressions per
    # comparison, which would re-run the md5 O(n log n) times per
    # source (same hazard as the ANN rank windows, similarity.py).
    w = (
        Window.partitionBy(source_col).orderBy(
            F.col("_u").asc(), F.col(key_col).asc()
        )
    )
    return (
        docs.select(F.col(key_col), F.col(source_col), u.alias("_u"))
        .repartition(source_col)
        .withColumn("qrank", F.row_number().over(w))
        .drop("_u")
        .withColumn("kept", (F.col("qrank") <= cap).cast("boolean"))
    )


def source_quota_cap_sql(
    cap: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota-v1",
    table: str = "documents",
) -> str:
    u = _u32_sql(f"'{salt}-' || CAST({key_col} AS VARCHAR)")
    return f"""
SELECT {key_col}, {source_col}, qrank, qrank <= {cap} AS kept
FROM (
  SELECT {key_col}, {source_col},
         row_number() OVER (PARTITION BY {source_col}
           ORDER BY ({u}) ASC, {key_col} ASC) AS qrank
  FROM {table}
)
"""


def source_quota_threshold(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota-v1",
) -> DataFrame:
    """The SCAN-SHAPED quota (r14, VERDICT r13 ask #4): keep a doc
    iff ``u32(md5(salt||key)) < floor(cap * 2^32 / count(source))`` —
    the threshold form the :func:`source_quota_cap` docstring names
    for mega-source/mega-domain skew.

    Where the rank form windows ``row_number() OVER (PARTITION BY
    source)`` — one huge partition when a single eTLD+1 holds half a
    crawl — this form never groups raw rows by source at all: the
    only shuffle is the map-side-combinable per-source COUNT (a
    domain-cardinality relation), broadcast back onto a pure scan.
    The cost is an EXPECTED cap (each survivor kept independently
    with probability ~cap/n) instead of an exact one; the draw uses
    the SAME salted md5 as the rank form, so a doc that survives here
    is deterministic across runs, engines and partitionings.

    All-integer keep rule — ``_u < (cap * 2^32) div n`` with floor
    division on both engines — so there is no float boundary for the
    two engines to disagree on. ``cap * 2^32`` must fit in an int64:
    cap < 2^31, enforced."""
    if cap >= 2**31:
        raise ValueError(f"cap {cap} overflows the 2^32 scaling")
    num = cap * 4294967296
    u = _u32_spark(f"concat('{salt}-', cast({key_col} as string))")
    # NULL-safe join key: a NULL source is a legitimate group (the
    # rank form windows it like any other), but an equi-join would
    # silently drop its rows from the verdict — review finding r14.
    # eqNullSafe keeps the join broadcastable and the NULL group gets
    # counted and capped like the rest.
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_source")
    ).withColumnRenamed(source_col, "_csrc")
    return (
        docs.select(F.col(key_col), F.col(source_col), u.alias("_u"))
        .join(
            F.broadcast(counts),
            F.col(source_col).eqNullSafe(F.col("_csrc")),
        )
        .select(
            key_col,
            source_col,
            "n_source",
            F.expr(f"_u < {num} div n_source").alias("kept"),
        )
    )


def source_quota_threshold_sql(
    cap: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota-v1",
    table: str = "documents",
) -> str:
    # Same overflow guard as the Spark twin: beyond int64 DuckDB
    # would silently widen cap*2^32 to hugeint while Spark raises,
    # diverging the twins for identical parameters (advisor r14).
    if cap >= 2**31:
        raise ValueError(f"cap {cap} overflows the 2^32 scaling")
    u = _u32_sql(f"'{salt}-' || CAST({key_col} AS VARCHAR)")
    num = cap * 4294967296
    return f"""
SELECT t.{key_col}, t.{source_col}, counts.n_source,
       ({u}) < {num} // counts.n_source AS kept
FROM {table} t
JOIN (SELECT {source_col} AS _csrc, CAST(COUNT(*) AS BIGINT) AS n_source
      FROM {table} GROUP BY {source_col}) counts
  ON t.{source_col} IS NOT DISTINCT FROM counts._csrc
"""


def source_quota_cap_hybrid(
    docs: DataFrame,
    cap: int,
    mega_threshold: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota-v1",
) -> DataFrame:
    """Exact-cap rank window for ordinary sources, threshold form for
    MEGA sources (count > ``mega_threshold``) — the
    ``stratified_split_hybrid`` idiom applied to the quota: the rank
    window only ever sees partitions bounded by ``mega_threshold``
    rows, so a single domain holding half the corpus can no longer
    create the one-giant-partition window (AQE cannot split a window
    partition; the skill notes' incompressible-payload caveat), while
    every bounded source keeps the exact deterministic cap.

    Output is verdict-shaped like :func:`source_quota_threshold`
    (key, source, n_source, kept); the rank is an internal detail
    here because the two branches don't share one."""
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_source")
    ).withColumnRenamed(source_col, "_csrc")
    u = _u32_spark(f"concat('{salt}-', cast({key_col} as string))")
    # eqNullSafe for the same reason as source_quota_threshold: a
    # NULL source must get a verdict, not vanish from the join
    based = (
        docs.select(F.col(key_col), F.col(source_col), u.alias("_u"))
        .join(
            F.broadcast(counts),
            F.col(source_col).eqNullSafe(F.col("_csrc")),
        )
        .drop("_csrc")
    )
    small = based.filter(F.col("n_source") <= mega_threshold)
    mega = based.filter(F.col("n_source") > mega_threshold)
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(
        F.col("_u").asc(), F.col(key_col).asc()
    )
    num = cap * 4294967296
    small_v = (
        small.repartition(source_col)
        .withColumn("qrank", F.row_number().over(w))
        .select(
            key_col, source_col, "n_source",
            (F.col("qrank") <= cap).alias("kept"),
        )
    )
    mega_v = mega.select(
        key_col, source_col, "n_source",
        F.expr(f"_u < {num} div n_source").alias("kept"),
    )
    return small_v.unionByName(mega_v)


def source_quota_cap_hybrid_sql(
    cap: int,
    mega_threshold: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota-v1",
    table: str = "documents",
) -> str:
    if cap >= 2**31:  # mirror the Spark twin's guard (advisor r14)
        raise ValueError(f"cap {cap} overflows the 2^32 scaling")
    u = _u32_sql(f"'{salt}-' || CAST({key_col} AS VARCHAR)")
    num = cap * 4294967296
    return f"""
WITH qcounts AS (
  SELECT {source_col} AS _csrc, CAST(COUNT(*) AS BIGINT) AS n_source
  FROM {table} GROUP BY {source_col}
),
qbased AS (
  SELECT t.{key_col}, t.{source_col}, q.n_source, ({u}) AS _u
  FROM {table} t
  JOIN qcounts q ON t.{source_col} IS NOT DISTINCT FROM q._csrc
)
SELECT {key_col}, {source_col}, n_source,
       row_number() OVER (PARTITION BY {source_col}
         ORDER BY _u ASC, {key_col} ASC) <= {cap} AS kept
FROM qbased WHERE n_source <= {mega_threshold}
UNION ALL
SELECT {key_col}, {source_col}, n_source,
       _u < {num} // n_source AS kept
FROM qbased WHERE n_source > {mega_threshold}
"""


def dsir_scores(
    docs: DataFrame,
    target_predicate: str,
    *,
    n_buckets: int = 1024,
    smoothing: float = 0.5,
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "dsir-v1",
) -> DataFrame:
    """DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score every raw document by how
    target-like it is under hashed-bigram bag models.

    Two add-k-smoothed bucket distributions are fit — p_target over
    rows matching ``target_predicate`` and p_raw over all rows — and
    each document scores sum_f ln(p_target(b_f) / p_raw(b_f)) over
    its hashed-bigram features b_f. The paper resamples with Gumbel
    noise; the deterministic rank form (score desc, id asc) is the
    oracle-checkable selection used here.

    Scale shape: feature hashing is scan-side; both bucket models are
    ``n_buckets``-row aggregates over ONE shared exploded-feature
    pass; the per-doc score is explode -> broadcast join (the
    n_buckets-row ratio table) -> groupBy(doc) sum — one corpus
    shuffle keyed by the doc id with map-side combine. Output:
    (key, n_feats, dsir_score).
    """
    from ts_data_pipeline_spark.functions.portable_hash import U32_MD5_SPARK

    hashed = U32_MD5_SPARK.format(
        x=f"concat('{salt}-', concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
    )
    toks = f"filter(split(lower({text_col}), ' '), t -> t != '')"
    feats = (
        docs.withColumn("_t", F.expr(toks))
        .select(
            F.col(key_col),
            F.expr(target_predicate).cast("boolean").alias("_is_target"),
            # NB: guard the empty case explicitly — Spark's
            # sequence(1, 0) yields DESCENDING [1, 0], and
            # element_at(_, 0) throws (verify-skill gotcha).
            F.expr(
                "case when size(_t) < 2 then array() else transform("
                " sequence(1, size(_t) - 1),"
                f" i -> {hashed} % {n_buckets}"
                ") end"
            ).alias("_buckets"),
        )
        .withColumn("bucket", F.explode_outer("_buckets"))
        .drop("_buckets")
        # the exploded feature relation feeds BOTH the model fit and
        # the per-doc scoring join; cached so the tokenize+hash+
        # explode scan (the operator's dominant cost) runs once — the
        # "one shared pass" the docstring promises. Narrow rows
        # (key, bool, bucket); at 100 TB the same role is a staged
        # feature table.
        .cache()
    )

    counts = feats.groupBy("bucket").agg(
        F.count(F.when(F.col("_is_target"), 1)).alias("ct"),
        F.count(F.col(key_col)).alias("cr"),
    ).filter(F.col("bucket").isNotNull())
    totals = counts.agg(
        F.sum("ct").alias("t_total"), F.sum("cr").alias("r_total")
    )
    a, B = float(smoothing), int(n_buckets)
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + a) / (F.col("t_total") + a * B))
            - F.log((F.col("cr") + a) / (F.col("r_total") + a * B))
        ).alias("lam"),
    )
    return (
        feats.join(F.broadcast(ratios), "bucket", "left")
        .groupBy(key_col)
        .agg(
            F.count(F.col("lam")).alias("n_feats"),
            F.round(F.coalesce(F.sum("lam"), F.lit(0.0)), 4).alias("dsir_score"),
        )
    )


def dsir_scores_sql(
    target_predicate: str,
    *,
    n_buckets: int = 1024,
    smoothing: float = 0.5,
    table: str = "documents",
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "dsir-v1",
) -> str:
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t != '')"
    u = _u32_sql(f"'{salt}-' || gram")
    a, B = float(smoothing), int(n_buckets)
    return f"""
WITH docs_t AS (SELECT {key_col}, ({target_predicate}) AS _is_target,
                       {toks} AS t FROM {table}),
feats AS MATERIALIZED (
  SELECT {key_col}, _is_target,
         ({u}) % {n_buckets} AS bucket
  FROM (
    SELECT {key_col}, _is_target,
           unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                  i -> t[i] || ' ' || t[i + 1])) AS gram
    FROM docs_t
  )
),
counts AS (
  SELECT bucket,
         COUNT(CASE WHEN _is_target THEN 1 END) AS ct,
         COUNT(*) AS cr
  FROM feats GROUP BY bucket
),
totals AS (SELECT SUM(ct) AS t_total, SUM(cr) AS r_total FROM counts),
ratios AS (
  SELECT bucket,
         ln((ct + {a}) / (t_total + {a} * {B}))
         - ln((cr + {a}) / (r_total + {a} * {B})) AS lam
  FROM counts CROSS JOIN totals
),
scored AS (
  SELECT f.{key_col}, COUNT(r.lam) AS n_feats,
         ROUND(COALESCE(SUM(r.lam), 0.0), 4) AS dsir_score
  FROM feats f LEFT JOIN ratios r USING (bucket)
  GROUP BY f.{key_col}
),
alldocs AS (SELECT {key_col} FROM {table})
SELECT d.{key_col},
       COALESCE(s.n_feats, 0) AS n_feats,
       COALESCE(s.dsir_score, 0.0) AS dsir_score
FROM alldocs d LEFT JOIN scored s USING ({key_col})
"""


def dsir_select(
    scored: DataFrame,
    n_keep: int,
    *,
    score_col: str = "dsir_score",
    key_col: str = "doc_id",
    temperature: float = 1.0,
    salt: str = "dsir-gumbel-v1",
) -> DataFrame:
    """DSIR's Gumbel-top-k sampler, derandomized: keep the ``n_keep``
    documents with the largest ``score/temperature + G`` where
    G = -ln(-ln(u)) and u is the md5-keyed uniform draw — the exact
    Gumbel-max trick (top-k under perturbed scores == sampling
    without replacement proportional to softmax(score/T)), with the
    RNG replaced by the repo's deterministic keyed hash so the
    selection is reproducible and oracle-checkable.

    Scale shape: the perturbation is a scan-side expression; the
    global top-k is orderBy+limit (TakeOrderedAndProject), not a
    single-partition window.
    """
    from pyspark.sql import Window

    u = (
        _u32_spark(f"concat('{salt}-', cast({key_col} as string))")
        + F.lit(0.5)
    ) / F.lit(float(2**32))  # (0,1) open interval: never ln(0)
    g = -F.log(-F.log(u))
    pert = scored.select(
        F.col(key_col),
        F.col(score_col),
        F.round(F.col(score_col) / temperature + g, 4).alias("perturbed"),
    )
    top = pert.orderBy(
        F.col("perturbed").desc(), F.col(key_col).asc()
    ).limit(n_keep)
    w = Window.orderBy(F.col("perturbed").desc(), F.col(key_col).asc())
    return top.withColumn("sel_rank", F.row_number().over(w))


def dsir_select_sql(
    scored_sql: str,
    n_keep: int,
    *,
    score_col: str = "dsir_score",
    key_col: str = "doc_id",
    temperature: float = 1.0,
    salt: str = "dsir-gumbel-v1",
) -> str:
    u = _u32_sql(f"'{salt}-' || CAST({key_col} AS VARCHAR)")
    return f"""
WITH scored AS ({scored_sql}),
pert AS (
  SELECT {key_col}, {score_col},
         ROUND({score_col} / {float(temperature)!r}
               + (-ln(-ln((({u}) + 0.5) / 4294967296.0))), 4) AS perturbed
  FROM scored
),
top AS (
  SELECT * FROM pert ORDER BY perturbed DESC, {key_col} ASC LIMIT {n_keep}
)
SELECT {key_col}, {score_col}, perturbed,
       row_number() OVER (ORDER BY perturbed DESC, {key_col} ASC) AS sel_rank
FROM top
"""


def token_budget_select(
    scored_docs: DataFrame,
    token_budget: int,
    *,
    score_col: str = "score",
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
) -> DataFrame:
    """Fill a token budget with the best documents: greedy by score,
    keep while the running token total stays within budget.

    The curation endgame — "give me the best 10B tokens" — as a
    deterministic prefix-sum selection: order by (score desc, key
    asc), keep every document whose EXCLUSIVE prefix token sum is
    under the budget (so the straddling document is included; the
    result never undershoots a budget a single doc could fill).

    Scale shape: a naive SUM() OVER (ORDER BY score) is a
    single-partition window. This is the two-phase distributed prefix
    sum over RANGE partitioning by the sort key: repartitionByRange
    puts each task on a contiguous score slice, per-partition sums
    reduce to a partition-count-sized base table (window over THAT is
    trivial), and within-partition prefix sums sort only local rows.
    The result is identical to the flat window regardless of where
    the range boundaries land — bases only depend on the total
    ordering. (Same pattern as sequence_pack, but keyed by a
    data-dependent sort order instead of id buckets.)
    """
    from pyspark.sql import Window

    ordered = scored_docs.select(
        F.col(key_col),
        F.col(score_col).alias("_s"),
        F.col(tokens_col).alias("_t"),
    ).repartitionByRange(F.col("_s").desc(), F.col(key_col).asc())
    # Correctness needs per-partition bases and within-partition
    # prefix sums to observe ONE physical partition assignment; the
    # range exchange samples boundaries, so recomputing it in two
    # subtrees is not guaranteed bit-identical. localCheckpoint pins
    # the partitioning so both consumers read the same materialized
    # partitions.
    part = ordered.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    per_part = part.groupBy("_pid").agg(F.sum("_t").alias("_pt"))
    across = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = per_part.select(
        "_pid", F.coalesce(F.sum("_pt").over(across), F.lit(0)).alias("_base")
    )
    within = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_s").desc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        part.withColumn("_intra", F.coalesce(F.sum("_t").over(within), F.lit(0)))
        .join(F.broadcast(bases), "_pid")
        .select(
            key_col,
            F.col("_s").alias(score_col),
            F.col("_t").alias(tokens_col),
            (F.col("_base") + F.col("_intra")).alias("tokens_before"),
        )
        .withColumn("kept", F.col("tokens_before") < token_budget)
    )
    return out


def token_budget_select_sql(
    token_budget: int,
    scored_sql: str,
    *,
    score_col: str = "score",
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
) -> str:
    """Oracle: the flat single-window form of the same selection."""
    return f"""
WITH scored AS ({scored_sql})
SELECT {key_col}, {score_col}, {tokens_col},
       CAST(COALESCE(SUM({tokens_col}) OVER (
         ORDER BY {score_col} DESC, {key_col} ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS tokens_before,
       COALESCE(SUM({tokens_col}) OVER (
         ORDER BY {score_col} DESC, {key_col} ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         < {token_budget} AS kept
FROM scored
"""


def stratified_split(
    docs: DataFrame,
    fracs: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT-count stratified train/val/test split: within every
    stratum, rank documents by the deterministic md5 draw and cut at
    floor(n_stratum * cumulative_frac) boundaries.

    :func:`hash_split` gives EXPECTED proportions (each doc draws
    independently) — fine for train shards, wrong for small eval
    splits where a 5% stratum of 200 docs can easily come out 6 or 13
    instead of 10. Ranking makes every stratum's split size exact
    (floor boundaries; the last named split absorbs remainders), while
    the md5 draw keeps membership deterministic and engine-portable.

    Scale: one rank window PER STRATUM (partitionBy stratum) over the
    narrow (id, stratum, draw) relation plus a window count — strata
    are bounded by source cardinality, and skewed mega-strata are the
    documented threshold-fallback territory of source_quota_cap.
    Output: (doc_id, stratum, split).
    """
    from ts_data_pipeline_spark.functions.portable_hash import (
        u32_md5_spark as _u32,
    )
    from pyspark.sql import Window

    names = list(fracs)
    cums = []
    acc = 0.0
    for n in names[:-1]:
        acc += fracs[n]
        cums.append((n, acc))
    w_rank = Window.partitionBy("stratum").orderBy(
        F.col("draw").asc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy("stratum")
    ranked = (
        docs.select(
            F.col(id_col),
            F.col(stratum_col).alias("stratum"),
            _u32(f"concat('strat:', cast({id_col} as string))").alias(
                "draw"
            ),
        )
        .withColumn("rk", F.row_number().over(w_rank))
        .withColumn("n_s", F.count(F.lit(1)).over(w_all))
    )
    split = None
    for name, cum in cums:
        cond = F.col("rk") <= F.floor(F.col("n_s") * F.lit(cum))
        split = (
            F.when(cond, F.lit(name))
            if split is None
            else split.when(cond, F.lit(name))
        )
    split = (
        split.otherwise(F.lit(names[-1]))
        if split is not None
        else F.lit(names[-1])
    )
    return ranked.select(id_col, "stratum", split.alias("split"))


def stratified_split_sql(
    fracs: dict[str, float],
    table: str = "documents",
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`stratified_split`."""
    from ts_data_pipeline_spark.functions.portable_hash import u32_md5_sql

    draw = u32_md5_sql(f"concat('strat:', CAST({id_col} AS VARCHAR))")
    names = list(fracs)
    cases = []
    acc = 0.0
    for n in names[:-1]:
        acc += fracs[n]
        # CAST from the repr string: a bare literal parses as DECIMAL
        # in DuckDB and FLOOR(DECIMAL * n) can disagree with Spark's
        # double math at boundaries
        cases.append(
            f"WHEN rk <= FLOOR(n_s * CAST('{acc!r}' AS DOUBLE))"
            f" THEN '{n}'"
        )
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END" \
        if cases else f"'{names[-1]}'"
    return f"""
WITH ranked AS (
  SELECT {id_col}, {stratum_col} AS stratum,
         row_number() OVER (PARTITION BY {stratum_col}
           ORDER BY {draw} ASC, {id_col} ASC) AS rk,
         COUNT(*) OVER (PARTITION BY {stratum_col}) AS n_s
  FROM {table}
)
SELECT {id_col}, stratum, {case} AS split
FROM ranked
"""


def stratified_split_hybrid(
    docs: DataFrame,
    fracs: dict[str, float],
    mega_threshold: int = 10_000_000,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`stratified_split` with the documented MEGA-STRATUM
    fallback (VERDICT r6 #9, mirroring source_quota_cap's): strata
    under ``mega_threshold`` rows get the EXACT rank-cut; strata at
    or above it switch to the threshold form — split chosen by
    comparing the SAME deterministic md5 draw against
    floor(cum_frac * 2^32) — which is scan-shaped (no per-stratum
    sort of a partition too hot for one task) at the cost of
    EXPECTED rather than exact proportions. At mega scale the
    relative error is O(1/sqrt(n)) — a 10M-row stratum's 10% split
    lands within ~0.03% — which is precisely when exactness stops
    mattering and the sort stops being affordable.

    Routing is driven by a per-stratum count (aggregate bounded by
    source cardinality, broadcast back), so both engines route
    identically; membership stays deterministic because both paths
    read the same draw. Output: (doc_id, stratum, split) — the
    :func:`stratified_split` contract.
    """
    from pyspark.sql import Window

    names = list(fracs)
    cums = []
    acc = 0.0
    for n in names[:-1]:
        acc += fracs[n]
        cums.append((n, acc))
    counts = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_s")
    )
    base = docs.select(
        F.col(id_col),
        F.col(stratum_col).alias("stratum"),
        _u32_spark(f"concat('strat:', cast({id_col} as string))").alias(
            "draw"
        ),
    ).join(F.broadcast(counts), "stratum")

    # exact leg: rank-cut, windows only over sub-threshold strata
    w_rank = Window.partitionBy("stratum").orderBy(
        F.col("draw").asc(), F.col(id_col).asc()
    )
    exact = base.filter(F.col("n_s") < mega_threshold).withColumn(
        "rk", F.row_number().over(w_rank)
    )
    esplit = None
    for name, cum in cums:
        cond = F.col("rk") <= F.floor(F.col("n_s") * F.lit(cum))
        esplit = (
            F.when(cond, F.lit(name))
            if esplit is None
            else esplit.when(cond, F.lit(name))
        )
    esplit = (
        esplit.otherwise(F.lit(names[-1]))
        if esplit is not None
        else F.lit(names[-1])
    )

    # threshold leg: scan-shaped, no window — draw vs cumulative
    # u32-scaled boundaries (floor once, at full double precision)
    mega = base.filter(F.col("n_s") >= mega_threshold)
    tsplit = None
    for name, cum in cums:
        bound = int(math.floor(cum * 4294967296.0))
        cond = F.col("draw") < F.lit(bound)
        tsplit = (
            F.when(cond, F.lit(name))
            if tsplit is None
            else tsplit.when(cond, F.lit(name))
        )
    tsplit = (
        tsplit.otherwise(F.lit(names[-1]))
        if tsplit is not None
        else F.lit(names[-1])
    )

    return exact.select(id_col, "stratum", esplit.alias("split")).unionByName(
        mega.select(id_col, "stratum", tsplit.alias("split"))
    )


def stratified_split_hybrid_sql(
    fracs: dict[str, float],
    mega_threshold: int = 10_000_000,
    table: str = "documents",
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`stratified_split_hybrid` — same count
    routing, same rank-cut on small strata, same integer draw
    boundaries on mega strata."""
    draw = _u32_sql(f"concat('strat:', CAST({id_col} AS VARCHAR))")
    names = list(fracs)
    ecases, tcases = [], []
    acc = 0.0
    for n in names[:-1]:
        acc += fracs[n]
        ecases.append(
            f"WHEN rk <= FLOOR(n_s * CAST('{acc!r}' AS DOUBLE))"
            f" THEN '{n}'"
        )
        tcases.append(
            f"WHEN draw < {int(math.floor(acc * 4294967296.0))} THEN '{n}'"
        )
    ecase = ("CASE " + " ".join(ecases) + f" ELSE '{names[-1]}' END"
             if ecases else f"'{names[-1]}'")
    tcase = ("CASE " + " ".join(tcases) + f" ELSE '{names[-1]}' END"
             if tcases else f"'{names[-1]}'")
    return f"""
WITH counted AS (
  SELECT {id_col}, {stratum_col} AS stratum,
         {draw} AS draw,
         COUNT(*) OVER (PARTITION BY {stratum_col}) AS n_s
  FROM {table}
),
small AS (
  SELECT {id_col}, stratum,
         row_number() OVER (PARTITION BY stratum
           ORDER BY draw ASC, {id_col} ASC) AS rk, n_s
  FROM counted WHERE n_s < {mega_threshold}
)
SELECT {id_col}, stratum, {ecase} AS split FROM small
UNION ALL
SELECT {id_col}, stratum, {tcase} AS split
FROM counted WHERE n_s >= {mega_threshold}
"""
