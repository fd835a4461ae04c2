"""Deduplication operators for large-scale training-data pipelines.

Beyond reference parity (SURVEY §2.9 — north-star extensions): exact
dedup, n-gram Jaccard near-dup, SimHash signatures, and MinHash+LSH
candidate generation over a documents table.

Scale design (100 TB):
- exact dedup is one hash-partitioned window over md5(text) — a
  single shuffle keyed on the digest, no driver state;
- Jaccard runs on a blocking key (lang) + inverted shingle index —
  the pairwise join only materializes pairs that SHARE a shingle,
  never the full cross product;
- SimHash is a pure expression tree (64 conditional sums over
  exploded tokens), entirely whole-stage-codegen'd;
- MinHash+LSH shuffles once on (band, band_hash) buckets; candidate
  verification re-joins shingle sets only for bucket-mates.

All hash math is engine-portable (md5 hex digits), so EVERY operator
here — including the intentionally-approximate MinHash/LSH, whose
candidate set is a pure function of the portable hashes — is
DuckDB-oracle-checkable hash-exact; MinHash recall is additionally
pytest-checked against the exact Jaccard result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate grouping by content digest.

    Returns every row with its content hash, duplicate-group size and
    a ``keep`` flag (lowest id wins). One shuffle on the digest.
    """
    w = Window.partitionBy("text_hash")
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("keep", F.col(id_col) == F.min(id_col).over(w))
    )


EXACT_DEDUP_SQL = """
SELECT doc_id, md5(text) AS text_hash,
       COUNT(*) OVER (PARTITION BY md5(text)) AS group_size,
       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
FROM documents
"""


# ---------------------------------------------------------------------------
# Word shingles (shared by Jaccard / SimHash / MinHash)
# ---------------------------------------------------------------------------

def tokens_col(text_col: str = "text"):
    """Whitespace tokens, lowercased, empties removed."""
    return F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")


def shingles_col(n: int = 3, text_col: str = "text"):
    """Word n-gram shingles as an array column (1-based slice).

    The token array is bound once via a single-element-array
    ``transform`` (SQL has no let-binding) — the naive spelling
    re-evaluates split()/filter() for every output element, turning
    shingling into O(tokens^2) string work per document.

    Documents with fewer than ``n`` tokens yield an empty array: the
    naive ``sequence(1, greatest(size-n+1, 0))`` spelling produces a
    DESCENDING [1, 0] sequence there, and ``slice(toks, 0, n)`` throws
    INVALID_PARAMETER_VALUE.START at runtime (DuckDB's ``range(1, 1)``
    is empty, so the oracle would also silently diverge).

    ``size(toks)`` is let-bound once (a second single-element
    ``transform``) so the short-doc guard and the sequence bound share
    one evaluation on the hot path.
    """
    return F.expr(shingles_expr_sql(n, text_col))


def shingles_expr_sql(n: int = 3, text_col: str = "text") -> str:
    """The Spark-SQL string behind :func:`shingles_col` — exposed so
    batched selectExpr call sites (r16 plan-build cost) can embed it
    without an extra Column round trip."""
    return (
        f"transform(array(filter(split(lower({text_col}), ' '), t -> t != '')), "
        f"toks -> transform(array(size(toks)), "
        f"sz -> CASE WHEN sz < {n} THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE transform(sequence(1, sz - {n - 1}), "
        f"i -> concat_ws(' ', slice(toks, i, {n}))) END)[0])[0]"
    )


SHINGLES_SQL = (
    "list_transform(range(1, greatest(len(list_filter(string_split(lower(text), ' '), "
    "t -> t != '')) - {nm1}, 0) + 1), "
    "i -> array_to_string(list_filter(string_split(lower(text), ' '), "
    "t -> t != '')[i:i+{nm1}], ' '))"
)


def shingles_sql(n: int, text_col: str = "text") -> str:
    """Column-parameterized DuckDB twin of :func:`shingles_col`.

    :data:`SHINGLES_SQL` predates this and hardcodes ``text`` (its
    callers all shingle the documents table); new twins that accept a
    text column MUST route here — a generator that takes ``text_col``
    but emits the hardcoded constant silently shingles the wrong
    column whenever both exist (r9 review finding)."""
    return (
        f"list_transform(range(1, greatest(len(list_filter(string_split("
        f"lower({text_col}), ' '), "
        f"t -> t != '')) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_filter(string_split(lower({text_col}), ' '), "
        f"t -> t != '')[i:i+{n - 1}], ' '))"
    )


def _distinct_shingles(docs: DataFrame, n: int, cache: bool = True) -> DataFrame:
    """(doc_id, lang, shingle) distinct — the inverted-index input.

    Cached (MEMORY_AND_DISK) because every consumer — signature agg,
    per-doc counts, and both sides of the candidate self-join — scans
    it; without the cache Spark re-tokenizes the corpus once per
    branch of the DAG. At 100 TB the same role is played by
    materializing the inverted index to storage once and reusing it.
    """
    dist = (
        docs.select("doc_id", "lang", F.explode(shingles_col(n)).alias("sh"))
        .distinct()
    )
    return dist.cache() if cache else dist


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup (exact, via inverted shingle index)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.2,
    block_col: str | None = "lang",
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over word n-gram shingles.

    Candidate pairs come from the inverted index (docs sharing >=1
    shingle, optionally within the ``block_col`` blocking key) — at
    scale this is the standard join on shingle, skew-prone on
    stopword-ish shingles; AQE skew-join handles the hot shingles,
    and the blocking key bounds bucket width.
    """
    dist = _distinct_shingles(docs, n)
    counts = dist.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    a, b = dist.alias("a"), dist.alias("b")
    join_cond = (F.col("a.sh") == F.col("b.sh")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    if block_col is not None:
        join_cond = join_cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, join_cond)
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca, cb = counts.alias("ca"), counts.alias("cb")
    return (
        inter.join(ca, F.col("da") == F.col("ca.doc_id"))
        .join(cb, F.col("db") == F.col("cb.doc_id"))
        .select(
            "da",
            "db",
            F.round(
                F.col("i") / (F.col("ca.c") + F.col("cb.c") - F.col("i")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_sql(
    n: int = 3, threshold: float = 0.2, table: str = "documents"
) -> str:
    sh = SHINGLES_SQL.format(nm1=n - 1)
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, lang, unnest({sh}) AS sh FROM {table}
),
counts AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
  FROM sh a JOIN sh b
    ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da, db, ROUND(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 4) AS jaccard
FROM inter
JOIN counts ca ON inter.da = ca.doc_id
JOIN counts cb ON inter.db = cb.doc_id
WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash (64-bit, engine-portable md5 bit extraction)
# ---------------------------------------------------------------------------

def _hex_bit(hash_col: str, j: int, engine: str = "spark") -> str:
    """Expr for bit j (0..63) of the first 16 hex digits of md5.

    Integer-only math so both engines agree exactly; integer division
    is spelled ``div`` in Spark SQL and ``//`` in DuckDB.
    """
    pos = j // 4 + 1
    shift = 2 ** (j % 4)
    idiv = "div" if engine == "spark" else "//"
    locate = "instr" if engine == "spark" else "strpos"
    return (
        f"(({locate}('0123456789abcdef', substring({hash_col}, {pos}, 1)) - 1) "
        f"{idiv} {shift}) % 2"
    )


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (frequency-weighted tokens).

    bit_j(doc) = [ sum over token occurrences of (2*bit_j(md5(token))-1) > 0 ].
    Exposed as two 32-bit halves (hi, lo) to stay in signed-long range.
    Pure expression tree: explode -> 64 conditional sums -> bit packing.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens_col()).alias("tok"))
    toks = toks.withColumn("h", F.md5(F.col("tok")))
    sums = [
        F.sum(F.expr(f"2 * ({_hex_bit('h', j)}) - 1")).alias(f"s{j}")
        for j in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*sums)
    lo_expr = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN 1 ELSE 0 END) * {2 ** j}" for j in range(32)
    )
    hi_expr = " + ".join(
        f"(CASE WHEN s{j + 32} > 0 THEN 1 ELSE 0 END) * {2 ** j}" for j in range(32)
    )
    return agg.select(
        F.col(id_col),
        F.expr(f"CAST({hi_expr} AS BIGINT)").alias("simhash_hi"),
        F.expr(f"CAST({lo_expr} AS BIGINT)").alias("simhash_lo"),
    )


def simhash_sql() -> str:
    sums = ",\n    ".join(
        f"SUM(2 * ({_hex_bit('h', j, 'duckdb')}) - 1) AS s{j}" for j in range(64)
    )
    lo = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN 1 ELSE 0 END) * {2 ** j}" for j in range(32)
    )
    hi = " + ".join(
        f"(CASE WHEN s{j + 32} > 0 THEN 1 ELSE 0 END) * {2 ** j}" for j in range(32)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, md5(unnest(list_filter(string_split(lower(text), ' '),
                                        t -> t != ''))) AS h
  FROM documents
),
agg AS (
  SELECT doc_id,
    {sums}
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
       CAST({hi} AS BIGINT) AS simhash_hi,
       CAST({lo} AS BIGINT) AS simhash_lo
FROM agg
"""


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over near-dup pairs
# ---------------------------------------------------------------------------

def duplicate_clusters(
    pairs: DataFrame,
    *,
    a_col: str = "da",
    b_col: str = "db",
    max_iter: int = 20,
) -> DataFrame:
    """Assign every paired document its duplicate-cluster id — the
    minimum doc id reachable through the near-dup pair graph
    (connected components via min-label propagation).

    The iterative step is one equi-join + min-agg per round; rounds
    needed = graph diameter (near-dup clusters are shallow — a
    handful). Each round is fully distributed; the driver only checks
    the converged count. At 100 TB this is the standard large-graph
    CC loop (alternating large-star/small-star refines it further);
    labels and edges shuffle on the node id every round, nothing is
    ever collected.
    """
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().cache()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
        .cache()
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels["id"] == neigh["src"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["label"], F.coalesce(neigh["nlabel"], labels["label"])
                ).alias("label"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def duplicate_clusters_sql(pairs_sql: str) -> str:
    """DuckDB oracle: transitive closure by recursive CTE, cluster id
    = min reachable node (exact for the resultset-sized pair graph)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT da AS src, db AS dst FROM pairs
  UNION
  SELECT db AS src, da AS dst FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""


def incremental_dedup(
    new_docs: DataFrame,
    corpus_digests: DataFrame,
    *,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Ingest-time exact dedup of incoming documents against the
    already-ingested corpus: drop any doc whose content digest exists
    in the historical digest table, then drop in-batch repeats.

    Works identically on a batch frame and a streaming one — the
    anti-join is a stream-static equi-join (the digest table is the
    static side; at scale a bucketed/Z-ordered digest table makes it
    a co-located probe). In-batch dedup uses
    ``dropDuplicatesWithinWatermark`` when ``event_time_col`` is
    given (bounded state; the streaming path) and plain
    ``dropDuplicates`` otherwise (batch).
    """
    withd = new_docs.withColumn("digest", F.md5(F.col(text_col)))
    fresh = withd.join(
        corpus_digests.select("digest"), "digest", "left_anti"
    )
    if event_time_col is not None:
        return fresh.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["digest"])
    return fresh.dropDuplicates(["digest"])


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    a_col: str = "da",
    b_col: str = "db",
) -> DataFrame:
    """Survivor selection — the step a training pipeline actually runs
    after near-dup detection: keep exactly one document per duplicate
    cluster (the minimum id, i.e. the cluster label itself) and every
    unpaired document.

    One broadcast-sized left join of the corpus against the cluster
    labels (clusters are tiny relative to the corpus; Spark picks the
    broadcast side itself — labels only contain *paired* docs). The
    corpus never shuffles.
    """
    labels = duplicate_clusters(pairs, a_col=a_col, b_col=b_col)
    return (
        docs.select(id_col)
        .join(labels, docs[id_col] == labels["doc_id"], "left")
        .select(
            docs[id_col].alias("doc_id"),
            (F.col("cluster_id").isNull()
             | (F.col("cluster_id") == docs[id_col])).alias("kept"),
        )
    )


def keep_canonical_sql(pairs_sql: str, table: str = "documents") -> str:
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT da AS src, db AS dst FROM pairs
  UNION
  SELECT db AS src, da AS dst FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
labels AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id,
       (labels.cluster_id IS NULL OR labels.cluster_id = d.doc_id) AS kept
FROM {table} d LEFT JOIN labels ON d.doc_id = labels.id
"""


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate near-dup at scale; rows-only gate)
# ---------------------------------------------------------------------------

# Mersenne-prime modulus; shingle hashes are 32 bits (md5-derived)
# and permutation multipliers 31 bits so a*h+b stays < 2^63 — no
# overflow under ANSI arithmetic in Spark OR DuckDB (which raises on
# BIGINT overflow rather than wrapping).
_MH_PRIME = (1 << 61) - 1
_MH_PARAM_BITS = 1 << 31

# The shingle hash and band-signature combine use the repo's single
# engine-portable md5-u32 draw (functions/portable_hash.py). xxhash64
# would be ~2x faster JVM-side but exists only in Spark; md5 keeps
# the whole MinHash pipeline bit-identical in the DuckDB oracle.
from ts_data_pipeline_spark.functions.portable_hash import (  # noqa: E402
    U32_MD5_SPARK as _U32_MD5_SPARK,
    u32_md5_sql as _u32_md5_sql,
)


def _minhash_perms(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation params (public LCG constants)."""
    params = []
    a, b = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    for _ in range(k):
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (b * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        params.append((a % _MH_PARAM_BITS | 1, b % _MH_PARAM_BITS))
    return params


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """MinHash+LSH candidate pairs verified by exact Jaccard.

    shingle -> md5-u32 -> k permuted min-hashes -> band signatures ->
    bucket join on (band, signature) -> exact Jaccard verification of
    bucket-mates. The only shuffles are the signature groupBy (keyed
    by doc) and the bucket self-join (keyed by band signature) —
    never an all-pairs product. Approximate by construction (pairs
    whose signatures never collide in any band are missed), but every
    hash is engine-portable, so :func:`minhash_lsh_sql` reproduces
    the IDENTICAL candidate set and verdicts in DuckDB — the op is
    hash-exact oracle-checkable despite being approximate. Recall is
    additionally pytest-checked against ngram_jaccard_pairs.

    ``max_bucket_size`` guards the self-join against degenerate
    buckets: a band bucket holding w docs emits w*(w-1)/2 pairs, so
    one boilerplate-signature bucket of 10^5 docs would alone produce
    5x10^9 candidates. Buckets wider than the cap are dropped before
    the join (their members still pair through their other,
    non-degenerate bands — dropping a band bucket only lowers recall
    for that band, it never breaks precision because every emitted
    pair is exact-verified). Pass None to disable.
    """
    rows_per_band = num_hashes // bands
    # Signatures are computed entirely per-row with array expressions:
    # shingle array -> md5-u32 array -> one fold min per permutation.
    # Zero shuffles before the bucket join (the explode/distinct/
    # 32-agg groupBy alternative shuffles the whole inverted index
    # first — at 100 TB that is the difference between a narrow scan
    # and a corpus-wide shuffle). Cached: the signature/bucket path
    # and both candidate-verify sides re-read it.
    # The empty-shingle filter sits ABOVE the cache: filtering the
    # projection directly lets Catalyst push the deterministic
    # predicate below the Project, so the cached plan evaluates the
    # full shingle expression TWICE per row (once in the pushed
    # Filter's size(...)>0, once in the Project) — the r15 before-
    # plan shows exactly that (plans/r15, Filter (7) + Project (8)).
    # Caching the unfiltered projection and filtering the cached rows
    # computes shingles once; the filter then costs one size() over
    # an in-memory array. Same rows out (empty-array rows are cached
    # but never pass the filter).
    # Build-side note (r16): every projection/join below is a batched
    # selectExpr / single-expr form — the Column spelling of this
    # operator cost ~324 py4j round trips per plan build (~0.2-0.35 s
    # of every bench row, cProfile'd); the strings resolve to the
    # identical expression trees, so plans and results are unchanged.
    base = docs.selectExpr(
        "doc_id",
        f"array_distinct({shingles_expr_sql(n)}) AS sh_arr",
    ).cache().filter(F.size("sh_arr") > 0)
    # Each permutation min is a single aggregate fold (least over the
    # running acc) instead of array_min(transform(...)): the transform
    # spelling materializes one permuted copy of ``hs`` per
    # permutation (num_hashes arrays per row) before taking the min;
    # the fold keeps one scalar accumulator. Value-identical (min of
    # the same multiset; ``hs`` is non-empty and NULL-free here) and
    # measured -25% on the signature stage at sf0.1 (r15 A/B).
    # selectExpr batches all columns into one round trip — the
    # 32-column Column-API spelling alone cost ~0.2 s of driver time
    # per build (OPTIMIZATION_r15.md §driver).
    sig = base.selectExpr(
        "doc_id",
        "transform(sh_arr, s -> " + _U32_MD5_SPARK.format(x="s") + ") AS hs",
    ).selectExpr(
        "doc_id",
        *[
            f"aggregate(hs, {_MH_PRIME}L, "
            f"(acc, h) -> least(acc, (h * {a}L + {b}L) % {_MH_PRIME}L)) AS mh{i}"
            for i, (a, b) in enumerate(_minhash_perms(num_hashes))
        ],
    )
    # One posexplode projection emits all band signatures; the band
    # combine is the same portable md5-u32 over the '-'-joined
    # row signature values.
    band_hashes = [
        _U32_MD5_SPARK.format(
            x="concat_ws('-', "
            + ", ".join(
                f"cast(mh{band * rows_per_band + r} as string)"
                for r in range(rows_per_band)
            )
            + ")"
        )
        for band in range(bands)
    ]
    buckets = sig.selectExpr(
        "doc_id",
        f"posexplode(array({', '.join(band_hashes)})) AS (band, bucket)",
    )
    if max_bucket_size is not None:
        # One count window on the join key partitioning — the same
        # shuffle the self-join needs anyway — then drop oversized
        # buckets so no task ever faces a quadratic bucket. (No
        # ORDER BY -> whole-partition frame, same as the Column
        # count(1).over(Window.partitionBy(...)) spelling.)
        buckets = buckets.selectExpr(
            "doc_id", "band", "bucket",
            "count(1) OVER (PARTITION BY band, bucket) AS _bw",
        ).filter(F.col("_bw") <= max_bucket_size).drop("_bw")
    buckets = buckets.cache()  # tiny (bands x docs); read by both join sides
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            F.expr(
                "x.band = y.band AND x.bucket = y.bucket "
                "AND x.doc_id < y.doc_id"
            ),
        )
        .selectExpr("x.doc_id AS da", "y.doc_id AS db")
        .distinct()
    )
    # Exact verification of candidates only: set math on the shingle
    # arrays of the (few) bucket-mates — no inverted-index joins.
    return (
        cand.join(base.alias("a"), F.expr("da = a.doc_id"))
        .join(base.alias("b"), F.expr("db = b.doc_id"))
        .selectExpr(
            "da",
            "db",
            "size(array_intersect(a.sh_arr, b.sh_arr)) AS i",
            "size(a.sh_arr) AS ca",
            "size(b.sh_arr) AS cb",
        )
        .selectExpr(
            "da",
            "db",
            "round(i / (ca + cb - i), 4) AS jaccard",
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_sql(
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    max_bucket_size: int | None = 64,
) -> str:
    """DuckDB twin of :func:`minhash_lsh_pairs` — same md5-u32 shingle
    hashes, same permutations, same band combine, same bucket cap,
    same exact-Jaccard verification, so the (approximate) result set
    is bit-identical. CTEs are MATERIALIZED: sig/buckets are each
    consumed by multiple downstream references and inlining would
    re-derive the shingle table per reference."""
    rows_per_band = num_hashes // bands
    sh = SHINGLES_SQL.format(nm1=n - 1)
    perms = _minhash_perms(num_hashes)
    mh_cols = ",\n         ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {_MH_PRIME})) AS mh{i}"
        for i, (a, b) in enumerate(perms)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {band} AS band, {bucket} AS bucket FROM sig".format(
            band=band,
            bucket=_u32_md5_sql(
                " || '-' || ".join(
                    f"CAST(mh{band * rows_per_band + r} AS VARCHAR)"
                    for r in range(rows_per_band)
                )
            ),
        )
        for band in range(bands)
    )
    cap_cte = (
        f"""capped AS MATERIALIZED (
  SELECT doc_id, band, bucket FROM (
    SELECT b.*, COUNT(*) OVER (PARTITION BY band, bucket) AS w FROM buckets b
  ) WHERE w <= {max_bucket_size}
),"""
        if max_bucket_size is not None
        else "capped AS MATERIALIZED (SELECT * FROM buckets),"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, list_distinct({sh}) AS sh_arr FROM documents
),
hs AS MATERIALIZED (
  SELECT doc_id, sh_arr,
         list_transform(sh_arr, s -> {_u32_md5_sql('s')}) AS hs
  FROM base WHERE len(sh_arr) > 0
),
sig AS MATERIALIZED (
  SELECT doc_id,
         {mh_cols}
  FROM hs
),
buckets AS MATERIALIZED (
{band_selects}
),
{cap_cte}
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
  FROM capped x JOIN capped y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)
SELECT da, db,
       ROUND(CAST(len(list_intersect(a.sh_arr, b.sh_arr)) AS DOUBLE)
             / (len(a.sh_arr) + len(b.sh_arr)
                - len(list_intersect(a.sh_arr, b.sh_arr))), 4) AS jaccard
FROM cand
JOIN hs a ON cand.da = a.doc_id
JOIN hs b ON cand.db = b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.sh_arr, b.sh_arr)) AS DOUBLE)
            / (len(a.sh_arr) + len(b.sh_arr)
               - len(list_intersect(a.sh_arr, b.sh_arr))), 4) >= {threshold}
"""


def span_dedup(docs: DataFrame, width: int = 10) -> DataFrame:
    """Cross-document span-level dedup (C4-style "remove any span
    that occurs more than once in the corpus", re-expressed over
    aligned ``width``-word windows so membership is deterministic).

    Every document is chunked into word-aligned spans; a span is KEPT
    only at its first corpus occurrence (lowest (doc_id, pos)), every
    later occurrence is dropped. Output is the per-document survival
    report: span counts, kept/removed, and the fraction of the doc
    that survives — the actual reassembly is a filter+concat away.

    Scale shape: one corpus-wide shuffle, hash-partitioned on the
    span text (the honest cost of global span dedup); the
    first-occurrence choice is ``min(struct(doc_id, pos))``, which
    combines map-side, so the exchange carries one row per DISTINCT
    span per map partition, not one per occurrence. No windows over
    unpartitioned data, no driver collect.
    """
    spans = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(array(filter(split(lower(text), ' '), t -> t != '')), "
                f"toks -> transform(sequence(0, CAST(ceil(size(toks) / {width}.0) AS INT) - 1), "
                f"i -> concat_ws(' ', slice(toks, i * {width} + 1, {width}))))[0]"
            )
        ).alias("pos", "span"),
    )
    first = spans.groupBy("span").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_at")
    )
    kept = (
        spans.join(first, "span")
        .select(
            "doc_id",
            (
                (F.col("doc_id") == F.col("first_at.doc_id"))
                & (F.col("pos") == F.col("first_at.pos"))
            ).cast("int").alias("is_first"),
        )
    )
    n_spans = F.count(F.lit(1))
    n_kept = F.sum("is_first")
    return kept.groupBy("doc_id").agg(
        n_spans.alias("n_spans"),
        n_kept.alias("n_kept"),
        (n_spans - n_kept).alias("n_removed"),
        F.round(n_kept / n_spans, 4).alias("keep_ratio"),
    )


def span_dedup_sql(width: int = 10) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t != '') AS t
  FROM documents
),
spans AS (
  SELECT doc_id,
         unnest(list_transform(range(0, CAST(ceil(len(t) / {width}.0) AS INT)),
                i -> struct_pack(pos := i,
                                 span := array_to_string(t[i * {width} + 1 : i * {width} + {width}], ' ')))) AS u
  FROM toks
),
s AS (SELECT doc_id, u.pos AS pos, u.span AS span FROM spans),
f AS (
  SELECT span, MIN(struct_pack(doc_id := doc_id, pos := pos)) AS first_at
  FROM s GROUP BY span
),
k AS (
  SELECT s.doc_id,
         CASE WHEN s.doc_id = f.first_at.doc_id
               AND s.pos = f.first_at.pos THEN 1 ELSE 0 END AS is_first
  FROM s JOIN f USING (span)
)
SELECT doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(is_first) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(is_first) AS BIGINT) AS n_removed,
       ROUND(CAST(SUM(is_first) AS DOUBLE) / COUNT(*), 4) AS keep_ratio
FROM k GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Substring-level dedup: duplicated-span detection (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better")


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicated SPANS inside documents: maximal merged runs of
    k-token shingles whose corpus-wide occurrence count is
    >= ``min_df`` — the substring granularity document-level dedup
    (exact/MinHash/SimHash) cannot see: boilerplate headers, license
    blocks, templated paragraphs repeated across otherwise-distinct
    documents (and verbatim self-repetition within one document).

    This is the scalable shingle-DF approximation of Lee et al.'s
    suffix-array ExactSubstr dedup: a duplicated substring of length
    >= k contains only duplicated k-shingles, so merged runs of
    duplicated shingles are a superset cover of every exact duplicate
    >= k tokens (boundary shingles can extend a span by < k tokens on
    either end — the standard overcount of the shingle method; no
    duplicate is ever missed).

    Shapes for 100 TB:
    - shingling is scan-side (the let-bound slice expressions of
      :func:`shingles_col`, positions via posexplode);
    - occurrence counting is a map-side-combinable groupBy on the
      md5(shingle) key (32-hex fixed width) joined back to the
      positions — deliberately NOT a window count: WindowExec
      buffers the whole peer group on one task, so a boilerplate
      shingle occurring 10^8 times would funnel every occurrence
      into a single straggler/OOM, while the groupBy partial-
      aggregates map-side and the join-back is AQE-skew-splittable;
    - span merging is a per-document running max/sum (both
      unboundedPreceding frames — linter-clean), one shuffle keyed
      on the document id.

    Output: (doc_id, span_id, start_tok, end_tok, dup_tokens), spans
    numbered 1.. in token order. Every value is integer-exact —
    hash-gateable with no rounding anywhere.
    """
    sh = (
        docs.select(
            F.col(id_col),
            F.posexplode(shingles_col(k, text_col)).alias("pos", "s"),
        )
        .select(id_col, "pos", F.md5(F.col("s")).alias("h"))
    )
    dup_keys = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h")
    )
    flagged = sh.join(dup_keys, "h").select(id_col, "pos")
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    w_prev = w_doc.rowsBetween(Window.unboundedPreceding, -1)
    merged = (
        flagged
        .withColumn("prev_end", F.max(F.col("pos") + (k - 1)).over(w_prev))
        .withColumn(
            "brk",
            F.when(
                F.col("prev_end").isNull()
                | (F.col("pos") > F.col("prev_end") + 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("span_id", F.sum("brk").over(w_doc))
    )
    return (
        merged.groupBy(id_col, "span_id")
        .agg(
            F.min("pos").cast("bigint").alias("start_tok"),
            (F.max("pos") + (k - 1)).cast("bigint").alias("end_tok"),
        )
        .withColumn(
            "dup_tokens", F.col("end_tok") - F.col("start_tok") + 1
        )
        .select(id_col, "span_id", "start_tok", "end_tok", "dup_tokens")
    )


def duplicated_spans_sql(
    k: int = 8,
    min_df: int = 2,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`duplicated_spans` — same tokenization
    (toks_sql convention), same md5 shingle keys, same window count,
    same running-max interval merge."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split(lower({text_col}), ' '), t -> t != '') AS t
  FROM {table}
),
idx AS (
  SELECT {id_col}, t,
         unnest(range(1, greatest(len(t) - {k - 1}, 0) + 1)) AS i
  FROM toks
),
sh AS (
  SELECT {id_col}, i - 1 AS pos,
         md5(array_to_string(t[i:i+{k - 1}], ' ')) AS h
  FROM idx
),
flagged AS (
  SELECT {id_col}, pos FROM (
    SELECT {id_col}, pos, COUNT(*) OVER (PARTITION BY h) AS df FROM sh
  ) WHERE df >= {min_df}
),
merged AS (
  SELECT {id_col}, pos,
         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY {id_col} ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS span_id
  FROM (
    SELECT {id_col}, pos,
           MAX(pos + {k - 1}) OVER (PARTITION BY {id_col} ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
    FROM flagged
  )
)
SELECT {id_col}, CAST(span_id AS BIGINT) AS span_id,
       CAST(MIN(pos) AS BIGINT) AS start_tok,
       CAST(MAX(pos) + {k - 1} AS BIGINT) AS end_tok,
       CAST(MAX(pos) + {k - 1} - MIN(pos) + 1 AS BIGINT) AS dup_tokens
FROM merged
GROUP BY {id_col}, span_id
"""


def substring_dedup_stats(
    docs: DataFrame,
    k: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document curation signal from :func:`duplicated_spans`:
    (doc_id, n_tokens, dup_tokens, n_spans). The drop/strip decision
    compares dup_tokens against n_tokens; the RATIO is deliberately
    not emitted — integer columns hash-gate exactly, a rounded
    division of two exact integers lands on .5-ulp ties where engines
    disagree (verify-skill convention: gate carried state, not
    derived ratios)."""
    spans = duplicated_spans(docs, k, min_df, id_col, text_col)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("dup_tokens").alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return (
        docs.select(
            F.col(id_col),
            F.size(tokens_col(text_col)).cast("bigint").alias("n_tokens"),
        )
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        )
    )


def substring_dedup_stats_sql(
    k: int = 8,
    min_df: int = 2,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`substring_dedup_stats`."""
    spans = duplicated_spans_sql(k, min_df, table, id_col, text_col)
    return f"""
WITH spans AS ({spans}),
per_doc AS (
  SELECT {id_col}, CAST(SUM(dup_tokens) AS BIGINT) AS dup_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_spans
  FROM spans GROUP BY {id_col}
)
SELECT d.{id_col},
       CAST(len(list_filter(string_split(lower(d.{text_col}), ' '),
                            t -> t != '')) AS BIGINT) AS n_tokens,
       COALESCE(p.dup_tokens, 0) AS dup_tokens,
       COALESCE(p.n_spans, 0) AS n_spans
FROM {table} d LEFT JOIN per_doc p ON d.{id_col} = p.{id_col}
"""


def pagerank(
    pairs: DataFrame,
    n_iter: int = 3,
    damping: float = 5 / 6,
    *,
    a_col: str = "da",
    b_col: str = "db",
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair graph — here,
    the near-dup graph: a document's centrality in its duplicate
    family ranks the "template" the family is stamped from (high PR)
    over its one-off variants, the signal boilerplate forensics and
    canonical-selection heuristics read.

    Engine-portable determinism (the kmeans/_pq_cb_trained playbook):
    a FIXED unrolled iteration count; every carried pr is
    ROUND(.., 6); ``damping`` defaults to 5/6 — deliberately
    non-2-5-smooth so iterated products never terminate on the
    decimal grid and a 6-dp re-round can never land on a true half
    (the LR-gate lesson); symmetrized edges mean every node has
    degree >= 1, so no dangling-mass term.

    Scale shape: the standard distributed power iteration — each
    round is one equi-join of the edge relation with the node-sized
    pr vector plus a map-side-combinable sum; nothing is collected
    (the node count is a scalar aggregate). Edges and degrees are
    cached across the fixed rounds (every iteration scans both — the
    _distinct_shingles justification).
    """
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .cache()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    n = deg.count()
    pr = deg.select(
        F.col("src").alias("id"),
        F.round(F.lit(1.0) / F.lit(n), 6).alias("pr"),
    )
    base = F.lit(1.0 - damping) / F.lit(n)
    for _ in range(n_iter):
        contrib = (
            edges.join(pr, edges["src"] == pr["id"])
            .join(deg, "src")
            .groupBy(F.col("dst").alias("cid"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("s"))
        )
        pr = (
            deg.select(F.col("src").alias("id"))
            .join(contrib, F.col("id") == F.col("cid"), "left")
            .select(
                "id",
                F.round(
                    base + F.lit(damping) * F.coalesce("s", F.lit(0.0)), 6
                ).alias("pr"),
            )
        )
    # Materialize the node-sized result while edges/deg are still
    # cached, then drop both — otherwise every invocation would pin
    # two cached relations in executor storage for the session
    # lifetime (the classifier.py train-call lesson).
    out = (
        pr.join(deg, pr["id"] == deg["src"])
        .select(F.col("id").alias("doc_id"), "deg", "pr")
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    deg.unpersist()
    return out


def pagerank_sql(
    pairs_sql: str, n_iter: int = 3, damping: float = 5 / 6
) -> str:
    """DuckDB twin of :func:`pagerank` — the same fixed rounds
    unrolled as a CTE chain, the same double literals emitted by repr
    (both engines iterate with bit-identical constants), the same
    6-dp carried rounding."""
    d = f"CAST('{damping!r}' AS DOUBLE)"
    omd = f"CAST('{1.0 - damping!r}' AS DOUBLE)"
    chain = f"""
WITH pairs AS MATERIALIZED ({pairs_sql}),
edges AS MATERIALIZED (
  SELECT da AS src, db AS dst FROM pairs
  UNION
  SELECT db AS src, da AS dst FROM pairs
),
deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
pr0 AS MATERIALIZED (
  SELECT d2.src AS id, ROUND(CAST(1 AS DOUBLE) / nn.n, 6) AS pr
  FROM deg d2, nn
)"""
    for i in range(1, n_iter + 1):
        chain += f""",
c{i} AS (
  SELECT e.dst AS id, SUM(p.pr / d2.deg) AS s
  FROM edges e
  JOIN pr{i - 1} p ON e.src = p.id
  JOIN deg d2 ON e.src = d2.src
  GROUP BY e.dst
),
pr{i} AS MATERIALIZED (
  SELECT d2.src AS id,
         ROUND({omd} / nn.n + {d} * COALESCE(c.s, 0), 6) AS pr
  FROM deg d2 CROSS JOIN nn LEFT JOIN c{i} c ON d2.src = c.id
)"""
    return chain + f"""
SELECT p.id AS doc_id, d2.deg, p.pr
FROM pr{n_iter} p JOIN deg d2 ON p.id = d2.src
"""
