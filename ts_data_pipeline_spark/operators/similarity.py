"""Vector similarity search over an embedding column (north-star op).

Brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH-bucketed variant as the scale path. Dot
products are left-fold ``aggregate(zip_with(...))`` expressions —
JVM-side, no UDF — and both variants end in a per-query top-k window.

Scale design (100 TB):
- queries are broadcast (small side) against the candidate corpus —
  no shuffle of the big side for the brute-force scan;
- the LSH variant buckets the corpus by hyperplane sign bits, so the
  per-query search touches ~corpus/2^planes vectors; bucketing is
  one narrow projection + shuffle on the bucket id;
- top-k is a window over (query, score) — partial top-k happens
  map-side via the rank filter pushed into the sort.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ts_data_pipeline_spark.operators import fsio


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    """SQL-string twin of :func:`dot` (r16 plan-build cost): the
    Column spelling costs ~25 py4j round trips per call (each
    higher-order lambda is several); interpolated into one selectExpr
    it costs none. Same fold, same 0.0 double seed, same resolved
    expression tree — value-identical by construction."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _exact_cosine_topk(
    candidates: DataFrame,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """THE exact-scan ranking body: queries (from ``embeddings``)
    broadcast against a caller-shaped candidate relation, rounded
    cosine, per-query top-k. One definition behind
    :func:`brute_force_topk` and :func:`filtered_topk` so a rounding
    or tie-break tweak cannot desynchronize them (r8 review)."""
    # Norms are precomputed per side (one dot per row) so the pair
    # loop does a single dot product per (query, candidate) instead
    # of three — at corpus scale that is the dominant flop count.
    # Projections are selectExpr batches (r16): the Column spelling
    # of each side cost ~150 py4j round trips per build (dot() alone
    # is ~25); the strings resolve to the identical expression trees.
    q = embeddings.filter(F.col(id_col).isin(query_ids)).selectExpr(
        f"`{id_col}`",
        f"CAST(`{vec_col}` AS array<double>) AS v",
    ).selectExpr(
        f"`{id_col}` AS query_id",
        "v AS qv",
        f"sqrt({dot_sql('v', 'v')}) AS qn",
    )
    c = candidates.selectExpr(
        f"`{id_col}`",
        f"CAST(`{vec_col}` AS array<double>) AS v",
    ).selectExpr(
        f"`{id_col}` AS cand_id",
        "v AS cv",
        f"sqrt({dot_sql('v', 'v')}) AS cn",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .selectExpr(
            "query_id",
            "cand_id",
            f"round({dot_sql('qv', 'cv')} / (qn * cn), 6) AS cos_sim",
        )
    )
    # r15: the round-5 "lazy-sort boundary" repartition("query_id")
    # was REMOVED here after a two-SF A/B (sf0.1: 0.945 -> 0.818 s;
    # sf1: 1.799 -> 1.222 s; rows identical). Two reasons it now
    # hurts: (1) the window partitions by query_id — a handful of
    # distinct keys — so the explicit exchange caps the sort at
    # #queries tasks while 10x data grows per-task work (the measured
    # super-linear 14x sf1/sf0.1 slope); (2) the explicit exchange
    # blocks the partial WindowGroupLimit Spark 3.5+ plants BELOW the
    # window's own exchange, which keeps only ~k rows per map task so
    # the shuffle carries top-k candidates instead of every scored
    # pair. The round-5 hazard (HOF ordering key re-evaluated in the
    # sort) does not reproduce on this shape: cos_sim is a projected
    # attribute, materialized once when the sort copies rows in.
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query id against the full corpus."""
    return _exact_cosine_topk(
        embeddings, embeddings, query_ids, k, id_col, vec_col
    )


def brute_force_topk_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         ROUND(list_dot_product(q.qv, c.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
  FROM emb c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= {k}
"""


def prefix_dim_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    d_prefix: int,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style truncated-dimension ANN (Kusupati et al.
    2022, "Matryoshka Representation Learning"): candidates are
    ranked by cosine over only the FIRST ``d_prefix`` dimensions —
    d_prefix/d of the full scan's flops and, with the prefix stored
    as its own column, d_prefix/d of its bytes — then the
    rerank_factor*k shortlist re-ranks on the full vector.

    With MRL-trained embeddings the prefix is a faithful coarse
    scorer by construction; on generic embeddings it is a lossy
    projection whose recall the bench publishes (the honest caveat).
    Scale shape: identical to brute force (queries broadcast, no
    corpus shuffle) with the candidate relation narrowed to the
    prefix; the rerank joins raw vectors only for the query-bounded
    shortlist (same tail as the PQ family — one definition).
    Determinism: ROUND(cos, 6) + ascending-id tie-break, mirrored in
    :func:`prefix_dim_topk_sql`.
    """
    emb = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    pref = emb.select(id_col, F.slice("v", 1, d_prefix).alias("p"))
    cands = _prefix_shortlist(pref, query_ids, k, rerank_factor, id_col)
    return _pq_exact_rerank(embeddings, cands, query_ids, k, id_col, vec_col)


def _prefix_shortlist(
    pref: DataFrame,
    query_ids: list[int],
    k: int,
    rerank_factor: int,
    id_col: str,
) -> DataFrame:
    """Coarse-scorer shortlist shared by the raw-prefix and
    PCA-rotated-prefix paths: cosine over the (id, p) low-dim
    relation, rerank_factor*k survivors per query. Zero-norm rows
    are guarded out on BOTH sides (a projected mean row is exactly
    zero under centering)."""
    q = pref.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("p").alias("qp"),
        F.sqrt(dot(F.col("p"), F.col("p"))).alias("qn"),
    ).filter(F.col("qn") > 0)
    c = pref.select(
        F.col(id_col).alias("cand_id"),
        F.col("p").alias("cp"),
        F.sqrt(dot(F.col("p"), F.col("p"))).alias("cn"),
    ).filter(F.col("cn") > 0)
    return _prefix_shortlist_from(q, c, k, rerank_factor)


def _prefix_shortlist_from(
    q: DataFrame, c: DataFrame, k: int, rerank_factor: int
) -> DataFrame:
    """The scoring core behind :func:`_prefix_shortlist`, split out
    so the stored-prefix index path can feed a RE-LITERALIZED query
    relation (one scan of the stored prefix table instead of two).
    ``q`` = (query_id, qp, qn), ``c`` = (cand_id, cp, cn), both
    zero-norm-guarded by the caller."""
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("qp"), F.col("cp")) / (F.col("qn") * F.col("cn")), 6
            ).alias("psim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("psim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("prk", F.row_number().over(w))
        .filter(F.col("prk") <= rerank_factor * k)
        .select("query_id", "cand_id")
    )


def pca_prefix_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    d_prefix: int,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    basis: tuple[list[list[float]], list[float]] | None = None,
    basis_path: str | None = None,
) -> DataFrame:
    """PCA-ROTATED Matryoshka prefix (VERDICT r8 #5): learn the
    top-``d_prefix`` principal basis of the corpus (the one-pass
    moment fit of ``operators/linalg.py::pca_components`` — Gram +
    mean in a single dimension-bounded aggregate, eigh on the driver
    over a d x d matrix), coarse-score in THAT basis, exact-rerank
    the shortlist on the full vector.

    Why: a raw d_prefix-dim slice assumes MRL-trained nested
    embeddings; on generic embeddings the energy is spread across
    all coordinates and the untrained prefix is a weak scorer
    (published r8: recall@10 0.35 at d=16). The PCA basis is the
    best d_prefix-dim linear approximation of the cloud in the
    L2 sense, so rotating before truncation recovers most of the
    recall at the same coarse-scan cost (the projection is a
    literal-matrix column expression — no UDF, no shuffle, and at
    rest the projected prefix can be stored as its own narrow
    column exactly like the raw slice).

    Not hash-gated: the rotation is an eigendecomposition (not
    SQL-expressible); recall vs exact brute force is published by
    bench and pinned by pytest, the same treatment as the HLL
    sketches. The raw-slice form stays the registered gate.

    ``basis`` (components, mean) reuses a basis fit once elsewhere —
    train-once/query-many, the same convention as the PQ family's
    ``codebook`` parameter (the top-16 basis is the first 16 rows of
    the top-32 one, so one k=32 fit serves both published prefixes).
    ``basis_path`` loads a PERSISTED basis sidecar
    (``linalg.pca_basis_write``, stored beside the vector index) —
    JSON float round-tripping is exact, so results are bit-identical
    to the in-memory basis (pinned by pytest).
    """
    from ts_data_pipeline_spark.operators import linalg

    if basis_path is not None:
        if basis is not None:
            raise ValueError("pass basis OR basis_path, not both")
        comps_all, _vals, mu_all = linalg.pca_basis_read(basis_path)
        basis = (comps_all, mu_all)
    if basis is not None:
        comps, mu = basis
        comps = comps[:d_prefix]
        if len(comps) < d_prefix:
            raise ValueError(
                f"basis has {len(comps)} components < d_prefix={d_prefix}"
            )
    else:
        if dim is None:
            # derive the width from the data (one bounded first-row
            # action) instead of defaulting to 64 — any other
            # dimensionality would silently fit/project against the
            # wrong width (r9 advisor finding)
            row = embeddings.select(F.size(vec_col).alias("d")).first()
            if row is None:
                raise ValueError("pca_prefix_topk: empty embeddings")
            dim = int(row["d"])
        comps, _vals, mu = linalg.pca_components(
            embeddings, vec_col, dim, k=d_prefix
        )
    pref = linalg.pca_project_array(embeddings, comps, mu, vec_col, id_col)
    cands = _prefix_shortlist(pref, query_ids, k, rerank_factor, id_col)
    return _pq_exact_rerank(embeddings, cands, query_ids, k, id_col, vec_col)


def prefix_dim_topk_sql(
    query_ids: list[int],
    d_prefix: int,
    k: int = 5,
    rerank_factor: int = 4,
) -> str:
    """DuckDB twin of :func:`prefix_dim_topk` — same slice, rounding,
    tie-breaks, zero-norm guards, and exact-rerank tail."""
    qs = ", ".join(str(i) for i in query_ids)
    shortlist = rerank_factor * k
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pref AS (SELECT vec_id, list_slice(v, 1, {d_prefix}) AS p FROM emb),
q AS (SELECT vec_id AS query_id, p AS qp FROM pref
      WHERE vec_id IN ({qs}) AND list_dot_product(p, p) > 0),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         ROUND(list_dot_product(q.qp, c.p)
               / (sqrt(list_dot_product(q.qp, q.qp))
                  * sqrt(list_dot_product(c.p, c.p))), 6) AS psim
  FROM pref c CROSS JOIN q
  WHERE c.vec_id <> q.query_id AND list_dot_product(c.p, c.p) > 0
),
cands AS (
  SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY psim DESC, cand_id ASC) AS prk
    FROM scored
  ) WHERE prk <= {shortlist}
)
SELECT query_id, cand_id, cos_sim, rank FROM (
  SELECT c.query_id, c.cand_id,
         ROUND(list_dot_product(e.v, q2.v)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q2.v, q2.v))), 6) AS cos_sim,
         row_number() OVER (PARTITION BY c.query_id
           ORDER BY ROUND(list_dot_product(e.v, q2.v)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q2.v, q2.v))), 6) DESC,
             c.cand_id ASC) AS rank
  FROM cands c
  JOIN emb e ON e.vec_id = c.cand_id
  JOIN emb q2 ON q2.vec_id = c.query_id
) WHERE rank <= {k}
"""


def pca_power_prefix_topk_sql(
    query_ids: list[int],
    dim: int,
    d_prefix: int,
    n_iter: int = 8,
    k: int = 5,
    rerank_factor: int = 4,
) -> str:
    """DuckDB twin of the PCA-ROTATED prefix query under the
    POWER-ITERATION basis (r11): the rotation itself is fit INSIDE
    SQL — 9-dp-rounded moments, max-diagonal seeds, ``n_iter``
    power steps with per-step coordinate rounding, rounded
    deflation (``linalg.pca_power_basis_sql_ctes``; cross-engine
    EXACT vs the Spark fit, pinned in tests/test_linalg.py) — then
    projection, coarse cosine over the d_prefix-dim rotation,
    zero-norm guards, ROUND(cos, 6)/asc-id tie-breaks, and the
    shared exact-rerank tail. This closes the r8-r10 caveat that
    the PCA rotation was 'not SQL-expressible' and pytest-only."""
    from ts_data_pipeline_spark.operators import linalg

    ctes, names = linalg.pca_power_basis_sql_ctes(dim, d_prefix, n_iter)
    comp_rows = " UNION ALL ".join(
        f"SELECT {ci} AS ci, v FROM {nm}" for ci, nm in enumerate(names)
    )
    qs = ", ".join(str(i) for i in query_ids)
    shortlist = rerank_factor * k
    return f"""{ctes},
compsq AS MATERIALIZED ({comp_rows}),
centered AS (
  SELECT e.vec_id,
         list_transform(range(1, {dim}+1), j -> e.v[j] - muv.m[j]) AS cv
  FROM emb e CROSS JOIN muv
),
pref AS MATERIALIZED (
  SELECT c.vec_id,
         list(list_dot_product(kc.v, c.cv) ORDER BY kc.ci) AS p
  FROM centered c CROSS JOIN compsq kc GROUP BY c.vec_id
),
q AS (SELECT vec_id AS query_id, p AS qp FROM pref
      WHERE vec_id IN ({qs}) AND list_dot_product(p, p) > 0),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         ROUND(list_dot_product(q.qp, c.p)
               / (sqrt(list_dot_product(q.qp, q.qp))
                  * sqrt(list_dot_product(c.p, c.p))), 6) AS psim
  FROM pref c CROSS JOIN q
  WHERE c.vec_id <> q.query_id AND list_dot_product(c.p, c.p) > 0
),
cands AS (
  SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY psim DESC, cand_id ASC) AS prk
    FROM scored
  ) WHERE prk <= {shortlist}
)
SELECT query_id, cand_id, cos_sim, rank FROM (
  SELECT c.query_id, c.cand_id,
         ROUND(list_dot_product(e.v, q2.v)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q2.v, q2.v))), 6) AS cos_sim,
         row_number() OVER (PARTITION BY c.query_id
           ORDER BY ROUND(list_dot_product(e.v, q2.v)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q2.v, q2.v))), 6) DESC,
             c.cand_id ASC) AS rank
  FROM cands c
  JOIN emb e ON e.vec_id = c.cand_id
  JOIN emb q2 ON q2.vec_id = c.query_id
) WHERE rank <= {k}
"""


def _sign_words(vec: Column, dim: int) -> Column:
    """Pack the sign bits of an array<double> into ceil(dim/32)
    BIGINT words, 32 bits per word (bit j of word w = 1 iff
    ``vec[w*32 + j] >= 0``). 32 — not 64 — bits per word so the
    packed value never touches the BIGINT sign bit: DuckDB raises on
    ``1::BIGINT << 63`` while Spark wraps, so the 64-bit packing is
    not twin-able. The per-bit terms are unrolled Python-side into a
    flat sum of ``when`` expressions — plain codegen-able arithmetic,
    no higher-order fold."""
    from functools import reduce
    from operator import add

    n_words = (dim + 31) // 32
    words = []
    for wi in range(n_words):
        lo, hi = wi * 32, min(dim, wi * 32 + 32)
        words.append(
            reduce(
                add,
                [
                    F.when(vec[i] >= 0, F.lit(1 << (i - lo)).cast("long"))
                    .otherwise(F.lit(0).cast("long"))
                    for i in range(lo, hi)
                ],
            )
        )
    return F.array(*words)


def _hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length array<bigint> sign
    signatures: popcount of the per-word XOR, summed."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )


#: Corpus size at which the plain dim-bit (axis-sign) signature is
#: measured to hold recall@10 = 0.99 (sf0.01, rf=32) — the anchor of
#: :func:`bsign_bits_rule`.
BSIGN_ANCHOR_N = 500

#: Signature-bit ceiling: 1024 bits = 16 bigint words = 128 bytes,
#: still half the 256-byte raw float vector. Beyond the cap, recall
#: maintenance shifts to rerank_factor / IVF partitioning (published
#: caveat, same spirit as the nprobe knob).
BSIGN_MAX_BITS = 1024


def bsign_bits_rule(n_rows: int, dim: int) -> int:
    """Signature bits as a function of corpus size — the measured
    rule that closes the r10 recall cliff (recall@10 0.99 at n=500
    falling to 0.83 at n=2000 on FIXED 64-bit signatures, because
    expected hamming gaps grow like theta*B/pi while their noise is
    ~sqrt(B)/2: more corpus rows pack into each resolvable hamming
    shell until the shortlist saturates).

    Rule: one dim-bit increment per 4x corpus growth above the
    measured anchor — ``bits = dim * (1 + ceil(log4(n / 500)))``,
    capped at :data:`BSIGN_MAX_BITS`. Linear-in-log-n matches the
    sign-LSH bound (Charikar 2002: O(log n / gamma^2) bits preserve
    top-k at margin gamma) and the two measured anchors: n=500 ->
    64 bits (recall@10 0.99), n=2000 -> 128 bits (0.92, vs 0.83 at
    64; 192 bits measures 0.96, 256 bits 0.99 — the rule takes the
    first width clearing 0.9, the same operating-point choice as
    nprobe). Pair-DIFFERENCE normals (see
    :func:`bsign_plane_pairs`) measure +0.05 recall over raw-vector
    normals at every width (raw corpus rows share a mean component,
    so their sign bits correlate; differences are mean-free)."""
    import math

    if n_rows <= BSIGN_ANCHOR_N:
        return dim
    growth = math.ceil(math.log(n_rows / BSIGN_ANCHOR_N, 4))
    return min(BSIGN_MAX_BITS, dim * (1 + growth))


def bsign_plane_pairs(n_extra: int, start_id: int = 100) -> list[tuple[int, int]]:
    """Deterministic data-derived hyperplane normals for the extra
    (beyond-dim) signature bits: bit ``dim + j`` is the sign of
    ``dot(v, emb[a_j] - emb[b_j])`` with ``(a_j, b_j) = (start +
    2j, start + 2j + 1)`` — consecutive corpus pairs, the same
    vectors-from-data convention as LSH_PLANE_IDS, but DIFFERENCED
    so the normals are mean-free (measured +0.05 recall@10 over raw
    rows at every width)."""
    return [(start_id + 2 * j, start_id + 2 * j + 1) for j in range(n_extra)]


def _bsign_planes_from(
    embeddings: DataFrame,
    plane_pairs: list[tuple[int, int]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The (pj, pv) hyperplane-normal relation: normal j =
    emb[a_j] - emb[b_j] (pair-difference — mean-free, see
    :func:`bsign_plane_pairs`). |pairs| rows, bounded broadcast."""
    spark = embeddings.sparkSession
    pair_rel = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(plane_pairs)],
        "pj INT, aid BIGINT, bid BIGINT",
    )
    base = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    return (
        pair_rel.join(
            base.select(F.col(id_col).alias("aid"), F.col("v").alias("av")),
            "aid",
        )
        .join(
            base.select(F.col(id_col).alias("bid"), F.col("v").alias("bv")),
            "bid",
        )
        .select("pj", F.zip_with("av", "bv", lambda x, y: x - y).alias("pv"))
    )


def _bsign_ext_words(
    emb: DataFrame,
    planes: DataFrame,
    n_extra: int,
    id_col: str,
) -> DataFrame:
    """Extra signature words from hyperplane-sign bits: ``emb`` =
    (id, v) with v array<double>, ``planes`` = (pj, pv); returns
    (id, es array<bigint>) — bit j of the extra block =
    sign(dot(v, pv_j)), packed 32 bits per word like
    :func:`_sign_words`.

    Shape: the plane relation is |pairs| rows (bounded broadcast),
    the corpus crossJoins it (scan x B narrow rows) and ONE hash
    aggregate packs the words map-side — no corpus shuffle beyond
    the per-id combine, no UDF."""
    n_words = (n_extra + 31) // 32
    base = emb.select(F.col(id_col), F.col("v"))
    bits = (
        base.crossJoin(F.broadcast(planes))
        .select(
            id_col,
            (F.col("pj") / 32).cast("int").alias("w"),
            F.when(
                dot(F.col("v"), F.col("pv")) >= 0,
                F.pow(F.lit(2.0), (F.col("pj") % 32)).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("b"),
        )
        .groupBy(id_col)
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("w") == wi, F.col("b"))), F.lit(0)
                )
                .cast("long")
                .alias(f"ew{wi}")
                for wi in range(n_words)
            ]
        )
    )
    return bits.select(
        id_col, F.array(*[f"ew{wi}" for wi in range(n_words)]).alias("es")
    )


def _bsign_signatures(
    embeddings: DataFrame,
    dim: int,
    plane_pairs: list[tuple[int, int]] | None,
    id_col: str,
    vec_col: str,
    planes: DataFrame | None = None,
) -> DataFrame:
    """(id, s) sign signatures: dim axis-sign bits, plus hyperplane
    bits for every plane pair (:func:`bsign_bits_rule` decides how
    many at a given corpus size). ``planes`` supplies a precomputed
    (pj, pv) normal relation (the index append path — deltas need
    not contain the pair ids); by default the normals derive from
    ``embeddings`` itself."""
    emb = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    sig = emb.select(id_col, _sign_words(F.col("v"), dim).alias("s"))
    if not plane_pairs:
        return sig
    if planes is None:
        planes = _bsign_planes_from(embeddings, plane_pairs, id_col, vec_col)
    ext = _bsign_ext_words(emb, planes, len(plane_pairs), id_col)
    return sig.join(ext, id_col).select(
        id_col, F.concat("s", "es").alias("s")
    )


def binary_sign_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_pairs: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """1-bit (sign) quantized ANN: each vector compresses to its
    coordinate sign bits (dim bits — 64x smaller than float32, 256
    bits/vector at d=256), candidates are shortlisted by HAMMING
    distance to the query signature (popcount over XOR — the
    cheapest comparison in the whole quantization family, no
    codebook, no training), then the rerank_factor*k survivors
    re-rank on exact cosine. The sign bits are the axis-aligned
    special case of hyperplane LSH (Charikar 2002, "Similarity
    estimation techniques from rounding algorithms":
    P[bit differs] = angle/pi per coordinate hyperplane), so
    expected hamming is monotone in angular distance.

    Scale shape: identical to the PQ flat scan — the coarse pass
    reads only the packed signature column (dim/8 bytes vs 4*dim;
    at rest it is its own narrow column exactly like the PQ codes
    relation), queries broadcast, no corpus shuffle, and the XOR+
    popcount pipeline is pure integer whole-stage-codegen arithmetic
    (measurably cheaper per candidate than the float dot of the MRL
    prefix at the same shortlist size). Determinism: sign is exact
    on the stored values (no float-rounding hazard), hamming ties
    break by ascending cand_id, the exact tail is the shared
    :func:`_pq_exact_rerank`. Twin: :func:`binary_sign_topk_sql`.

    ``plane_pairs`` appends hyperplane-sign bits beyond the dim
    axis bits — the corpus-size scaling knob (:func:`bsign_bits_rule`
    / the r10 recall cliff); the pairs must match the twin's.
    """
    if plane_pairs:
        # loud failure for absent pair ids (see bsign_index_write)
        _check_ids_present(
            embeddings,
            sorted({i for p in plane_pairs for i in p}),
            id_col,
            "bsign plane-pair",
        )
    sig = _bsign_signatures(embeddings, dim, plane_pairs, id_col, vec_col)
    q = sig.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("s").alias("qs")
    )
    c = sig.select(F.col(id_col).alias("cand_id"), F.col("s").alias("cs"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            _hamming(F.col("qs"), F.col("cs")).alias("hamm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamm").asc(), F.col("cand_id").asc()
    )
    cands = (
        scored.withColumn("hrk", F.row_number().over(w))
        .filter(F.col("hrk") <= rerank_factor * k)
        .select("query_id", "cand_id")
    )
    return _pq_exact_rerank(embeddings, cands, query_ids, k, id_col, vec_col)


def binary_sign_topk_sql(
    query_ids: list[int],
    dim: int,
    k: int = 5,
    rerank_factor: int = 4,
    plane_pairs: list[tuple[int, int]] | None = None,
    filter_pred: str | None = None,
) -> str:
    """DuckDB twin of :func:`binary_sign_topk` — same 32-bit word
    packing, hamming shortlist, tie-breaks, and exact-rerank tail.
    ``plane_pairs`` mirrors the hyperplane-bit extension: extra bit
    j = sign(dot(v, emb[a_j] - emb[b_j])), packed into further
    32-bit words appended after the axis words. ``filter_pred``
    mirrors ``bsign_query_index(filter_ids=...)``: candidates
    restricted BEFORE the hamming shortlist (queries unfiltered)."""
    qs = ", ".join(str(i) for i in query_ids)
    shortlist = rerank_factor * k
    n_words = (dim + 31) // 32
    filter_clause = (
        f"\n    AND c.vec_id IN (SELECT vec_id FROM embeddings"
        f" WHERE {filter_pred})"
        if filter_pred
        else ""
    )
    pairs = plane_pairs or []
    n_extra = len(pairs)
    ext_words = (n_extra + 31) // 32
    total_words = n_words + ext_words
    if pairs:
        pair_rows = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(pairs))
        ext_cte = f""",
planes AS (
  SELECT t.pj, list_transform(range(1, {dim} + 1),
           i -> a.v[i] - b.v[i]) AS pv
  FROM (VALUES {pair_rows}) t(pj, aid, bid)
  JOIN emb a ON a.vec_id = t.aid
  JOIN emb b ON b.vec_id = t.bid
),
extbits AS (
  -- every (vec_id, w) group exists: pj is contiguous from 0, so the
  -- cross join supplies rows for each word even when every bit is 0
  SELECT e.vec_id, p.pj // 32 AS w,
         CAST(SUM(CASE WHEN list_dot_product(e.v, p.pv) >= 0
              THEN CAST(pow(2.0, p.pj % 32) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS word
  FROM emb e CROSS JOIN planes p
  GROUP BY e.vec_id, p.pj // 32
),
extsig AS (
  SELECT vec_id, list(word ORDER BY w) AS es FROM extbits GROUP BY vec_id
),
fullsig AS (
  SELECT a.vec_id, list_concat(a.s, x.es) AS s
  FROM axsig a JOIN extsig x ON x.vec_id = a.vec_id
)"""
        sig_src = "fullsig"
    else:
        ext_cte = ""
        sig_src = "axsig"
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
axsig AS (
  SELECT vec_id,
         list_transform(range(0, {n_words}), w ->
           CAST(list_sum(list_transform(range(w * 32, least({dim}, w * 32 + 32)),
             i -> CASE WHEN v[i + 1] >= 0
                       THEN (CAST(1 AS BIGINT) << CAST(i - w * 32 AS INT))
                       ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS s
  FROM emb
){ext_cte},
q AS (SELECT vec_id AS query_id, s AS qs FROM {sig_src} WHERE vec_id IN ({qs})),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         CAST(list_sum(list_transform(range(0, {total_words}),
           w -> bit_count(xor(q.qs[w + 1], c.s[w + 1])))) AS BIGINT) AS hamm
  FROM {sig_src} c CROSS JOIN q
  WHERE c.vec_id <> q.query_id{filter_clause}
),
cands AS (
  SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY hamm ASC, cand_id ASC) AS hrk
    FROM scored
  ) WHERE hrk <= {shortlist}
)
SELECT query_id, cand_id, cos_sim, rank FROM (
  SELECT c.query_id, c.cand_id,
         ROUND(list_dot_product(e.v, q2.v)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q2.v, q2.v))), 6) AS cos_sim,
         row_number() OVER (PARTITION BY c.query_id
           ORDER BY ROUND(list_dot_product(e.v, q2.v)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q2.v, q2.v))), 6) DESC,
             c.cand_id ASC) AS rank
  FROM cands c
  JOIN emb e ON e.vec_id = c.cand_id
  JOIN emb q2 ON q2.vec_id = c.query_id
) WHERE rank <= {k}
"""


def prefix_index_write(
    embeddings: DataFrame,
    path: str,
    d_prefix: int,
    basis: tuple[list[list[float]], list[float]] | None = None,
    basis_path: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Persist the PCA-rotated prefix as its own narrow ``(id, p)``
    relation — projection AT REST. ``pca_prefix_topk`` pays the
    literal-matrix projection over the FULL vector column on every
    query (the measured ~3x-the-raw-slice query cost); storing the
    projected d_prefix-dim column once makes the coarse scan read
    d_prefix/d of the bytes and do zero projection work per query —
    the same store-the-derived-column move as the PQ codes and the
    sign signatures. The basis sidecar is copied into the index so
    the artifact is self-describing (appends project new rows under
    the SAME pinned rotation, the pinned-frame contract)."""
    import json

    from ts_data_pipeline_spark.operators import linalg

    if basis_path is not None:
        if basis is not None:
            raise ValueError("pass basis OR basis_path, not both")
        comps_all, vals, mu = linalg.pca_basis_read(basis_path)
        basis = (comps_all, mu)
    else:
        if basis is None:
            raise ValueError("prefix_index_write requires basis or basis_path")
        vals = []
    comps, mu = basis
    comps = comps[:d_prefix]
    if len(comps) < d_prefix:
        raise ValueError(
            f"basis has {len(comps)} components < d_prefix={d_prefix}"
        )
    pref = linalg.pca_project_array(embeddings, comps, mu, vec_col, id_col)
    spark = embeddings.sparkSession
    pref.write.mode("overwrite").parquet(fsio.join(path, "prefix"))
    # the sidecar must land ON the index's filesystem (r11 review:
    # the local-open form silently wrote hdfs://... as a LITERAL
    # local directory name)
    linalg.pca_basis_write(
        fsio.join(path, "_pca_basis.json"), comps, vals[:d_prefix], mu,
        spark=spark,
    )
    meta = {"d_prefix": d_prefix, "id_col": id_col}
    fsio.write_text(
        spark, fsio.join(path, "_prefix_meta.json"), json.dumps(meta)
    )
    return meta


def prefix_query_index(
    spark,
    path: str,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Query the persisted rotated-prefix relation: coarse cosine
    over the STORED narrow ``(id, p)`` table (query rows
    re-literalized — bounded collect — so the table is scanned once),
    exact full-vector re-rank on the shortlist. Value-identical to
    ``pca_prefix_topk`` under the same persisted basis (bit-exact
    projection round-trip; pytest-pinned).

    ``filter_ids`` mirrors ``ivfpq_query_index(filter_ids=...)``
    (r12): candidate pre-filter semi-joined onto the prefix scan
    before the coarse cosine, queries from the unfiltered relation —
    no k-deflation, work proportional to the filter's selectivity."""
    import json

    meta = json.loads(
        fsio.read_text(spark, fsio.join(path, "_prefix_meta.json"))
    )
    if meta["id_col"] != id_col:
        raise ValueError(
            f"index id_col {meta['id_col']!r} != requested {id_col!r}"
        )
    pref = spark.read.parquet(fsio.join(path, "prefix"))
    q_rel = pref.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("p").alias("qp"),
        F.sqrt(dot(F.col("p"), F.col("p"))).alias("qn"),
    ).filter(F.col("qn") > 0)
    q = spark.createDataFrame(q_rel.collect(), q_rel.schema)
    if filter_ids is not None:
        pref = pref.join(filter_ids.select(id_col), id_col, "left_semi")
    c = pref.select(
        F.col(id_col).alias("cand_id"),
        F.col("p").alias("cp"),
        F.sqrt(dot(F.col("p"), F.col("p"))).alias("cn"),
    ).filter(F.col("cn") > 0)
    cands = _prefix_shortlist_from(q, c, k, rerank_factor)
    return _pq_exact_rerank(embeddings, cands, query_ids, k, id_col, vec_col)


def bsign_index_write(
    embeddings: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_pairs: list[tuple[int, int]] | None = None,
) -> dict:
    """Persist the 1-bit signature relation as its own narrow table
    (``(id, s)`` — ceil(dim/32) bigint words per row, ~dim/8 bytes vs
    4*dim for the float vectors), the at-rest layout that makes the
    sign-quantized coarse scan CHEAP IN BYTES, not just in flops:
    :func:`binary_sign_topk` computes signatures on the fly and so
    still scans the full vector column; the index variant scans only
    this relation (measured in tests via plans/scanmetrics —
    the same plan-vs-measured upgrade the IVF cell pruning got in
    round 9). No training, no codebooks: the 'index build' is one
    narrow projection, and append = write more rows (signatures are
    row-independent under the PINNED plane pairs recorded in the
    meta sidecar — the same pinned-frame contract as the PQ
    codebooks).

    ``plane_pairs`` appends hyperplane-sign bits beyond the dim axis
    bits — pass :func:`bsign_plane_pairs` sized by
    :func:`bsign_bits_rule` so the signature resolution scales with
    the corpus (the r10 recall cliff)."""
    import json

    planes = None
    if plane_pairs:
        # validate the pair ids FIRST (the codebook/centroid
        # convention): _bsign_planes_from inner-joins pair ids against
        # the corpus, so an absent id would silently drop that plane —
        # the Spark path zero-fills the bit while the twin's extsig
        # lists shrink: silent recall loss plus cross-engine
        # divergence instead of a loud error (r11 ADVICE).
        _check_ids_present(
            embeddings,
            sorted({i for p in plane_pairs for i in p}),
            id_col,
            "bsign plane-pair",
        )
        # persist the normal VECTORS beside the signatures (the PCA
        # basis-sidecar convention): appends must sign deltas under
        # the same frame, and a delta need not contain the pair ids
        planes = _bsign_planes_from(embeddings, plane_pairs, id_col, vec_col)
        planes = embeddings.sparkSession.createDataFrame(
            planes.collect(), planes.schema  # bounded: |pairs| rows
        )
        planes.write.mode("overwrite").parquet(fsio.join(path, "planes"))
    sig = _bsign_signatures(
        embeddings, dim, plane_pairs, id_col, vec_col, planes=planes
    )
    sig.write.mode("overwrite").parquet(fsio.join(path, "signatures"))
    meta = {
        "dim": dim,
        "id_col": id_col,
        "n_bits": dim + len(plane_pairs or []),
        "n_words": (dim + 31) // 32 + (len(plane_pairs or []) + 31) // 32,
        "plane_pairs": [list(p) for p in (plane_pairs or [])],
    }
    fsio.write_text(
        embeddings.sparkSession,
        fsio.join(path, "_bsign_meta.json"),
        json.dumps(meta),
    )
    return meta


def bsign_index_append(
    spark,
    path: str,
    delta: DataFrame,
    vec_col: str = "embedding",
) -> int:
    """Incremental signature maintenance: sign new rows under the
    index's PINNED plane pairs (meta sidecar — the pinned-frame
    contract shared with the PQ codebooks) and append them; existing
    signature files are never rewritten. Idempotent under
    re-delivery like :func:`pq_index_append`: ids already present
    are anti-joined away. Returns the number of rows appended.

    The pinned pairs mean an append does NOT re-run
    :func:`bsign_bits_rule` — growing the corpus past the next rule
    threshold is a REBUILD decision (the signature width is a frame,
    not per-row state); callers watching corpus growth compare
    meta["n_bits"] against the rule's current answer."""
    import json

    meta = json.loads(
        fsio.read_text(spark, fsio.join(path, "_bsign_meta.json"))
    )
    id_col = meta["id_col"]
    pairs = [tuple(p) for p in meta.get("plane_pairs", [])]
    planes = (
        spark.read.parquet(fsio.join(path, "planes")) if pairs else None
    )
    sig_path = fsio.join(path, "signatures")
    existing = spark.read.parquet(sig_path).select(id_col)
    fresh = delta.join(existing, id_col, "left_anti").cache()
    try:
        sig = _bsign_signatures(
            fresh, meta["dim"], pairs or None, id_col, vec_col,
            planes=planes,
        ).cache()
        try:
            n = sig.count()
            if n:
                sig.write.mode("append").parquet(sig_path)
        finally:
            sig.unpersist()
    finally:
        fresh.unpersist()
    return n


def bsign_maintenance_decision(spark, path: str, n_rows: int) -> dict:
    """The signature-width analog of :func:`ivf_maintenance_decision`
    (r11): a bsign index pins its width at build time (the plane
    frame), but :func:`bsign_bits_rule` says what width the CURRENT
    corpus needs — appends grow the corpus under a frozen frame, so
    recall decays exactly the way the r10 cliff measured (0.99 at
    the 64-bit anchor -> 0.83 at 4x the corpus). REWIDEN (a rebuild
    with more plane pairs) is recommended when the rule's answer for
    ``n_rows`` exceeds the stored width; like compact/retrain, the
    decision is measured evidence, not a guess, and the evidence
    dict is audit-ready."""
    import json

    meta = json.loads(
        fsio.read_text(spark, fsio.join(path, "_bsign_meta.json"))
    )
    stored_bits = int(meta.get("n_bits", meta["dim"]))
    needed = bsign_bits_rule(n_rows, meta["dim"])
    return {
        "rewiden": needed > stored_bits,
        "evidence": {
            "rule": "bsign_bits_rule",
            "stored_bits": stored_bits,
            "needed_bits": needed,
            "n_rows": n_rows,
            "anchor_n": BSIGN_ANCHOR_N,
            "recall_calibration": {
                "anchor_recall_at_10": 0.99,   # n=500, 64 bits, rf=32
                "decayed_recall_at_10": 0.83,  # n=2000 on frozen 64
                "rewidened_recall_at_10": 0.92,  # n=2000 at rule's 128
            },
        },
    }


def bsign_query_index(
    spark,
    path: str,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Query the persisted sign-signature relation: hamming shortlist
    over the STORED (id, s) table — the coarse pass never touches the
    float vectors — then the shared exact re-rank joins raw vectors
    for the query-bounded shortlist only. Value-identical to
    :func:`binary_sign_topk` (same packing, same tie-breaks;
    pytest-pinned), so the registered gate's DuckDB twin covers this
    path's semantics too.

    ``filter_ids`` (single-column DataFrame of allowed candidate
    ids) mirrors ``ivfpq_query_index(filter_ids=...)`` — r12, so
    every deployed index leg takes tenancy/license filters: the
    semi-join lands on the signature scan BEFORE the hamming math,
    so the shortlist ranks over filtered candidates and never
    k-deflates; queries come from the unfiltered relation."""
    import json

    meta = json.loads(
        fsio.read_text(spark, fsio.join(path, "_bsign_meta.json"))
    )
    if meta["id_col"] != id_col:
        raise ValueError(
            f"index id_col {meta['id_col']!r} != requested {id_col!r}"
        )
    sig = spark.read.parquet(fsio.join(path, "signatures"))
    # RE-LITERALIZE the query signatures (bounded collect: |query_ids|
    # rows) so the stored relation is scanned ONCE — without this the
    # q and c branches each list the full signature file and the
    # measured coarse-pass bytes double (pinned in
    # tests/test_scale_patterns.py).
    q_rel = sig.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("s").alias("qs")
    )
    q = spark.createDataFrame(q_rel.collect(), q_rel.schema)
    if filter_ids is not None:
        sig = sig.join(filter_ids.select(id_col), id_col, "left_semi")
    c = sig.select(F.col(id_col).alias("cand_id"), F.col("s").alias("cs"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            _hamming(F.col("qs"), F.col("cs")).alias("hamm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamm").asc(), F.col("cand_id").asc()
    )
    cands = (
        scored.withColumn("hrk", F.row_number().over(w))
        .filter(F.col("hrk") <= rerank_factor * k)
        .select("query_id", "cand_id")
    )
    return _pq_exact_rerank(embeddings, cands, query_ids, k, id_col, vec_col)


def filtered_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    predicate: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attribute-FILTERED exact ANN: top-k restricted to candidates
    satisfying a row predicate — the filtered-vector-search shape
    every retrieval deployment needs (tenant, language, freshness,
    license filters).

    This is PRE-filtering: the predicate lands in the scan BEFORE any
    distance math, so a selective filter cuts the flop count (and at
    rest, with the attribute as a partition column, the I/O)
    proportionally — versus post-filtering, which computes distances
    for everything and then k-deflates below the requested k when the
    filter is selective. Queries come from the UNFILTERED corpus (a
    query row need not satisfy its own filter). Determinism and scale
    shape are :func:`brute_force_topk`'s — literally: both are the
    shared :func:`_exact_cosine_topk` body with differently-shaped
    candidate relations. Swap the scan for the IVF-partitioned index
    (``ivfpq_query_index(filter_ids=...)``) to compose filters with
    cell pruning.
    """
    return _exact_cosine_topk(
        embeddings.filter(predicate), embeddings, query_ids, k,
        id_col, vec_col,
    )


def filtered_topk_sql(
    query_ids: list[int], predicate_sql: str, k: int = 10
) -> str:
    """DuckDB twin of :func:`filtered_topk` — the brute-force twin
    with the candidate scan pre-filtered by ``predicate_sql``."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id IN ({ids})),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE {predicate_sql}),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         ROUND(list_dot_product(q.qv, c.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
  FROM c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= {k}
"""


def embedding_cosine_dups(
    embeddings: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, all-pairs).

    Every (a < b) pair with cosine >= threshold. Norms precomputed
    per row; the pair loop is one dot product. This exact variant is
    the oracle-checkable baseline; the 100 TB path prefilters
    candidates with the hyperplane buckets of ``lsh_bucketed_topk``
    (or an IVF coarse quantizer) so the self-join touches only
    bucket-mates — same verify expression, different candidate set.
    """
    emb = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select(
        id_col, "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("n")
    )
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("ia"),
            F.col(f"b.{id_col}").alias("ib"),
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_cosine_dups_sql(threshold: float = 0.45) -> str:
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         ROUND(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) *
                sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
)
SELECT ia, ib, cos_sim FROM pairs WHERE cos_sim >= {threshold}
"""


def embedding_cosine_dups_bucketed(
    embeddings: DataFrame,
    plane_ids: list[int],
    *,
    bits_per_band: int = 4,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-banded (scale path).

    Candidate generation replaces the all-pairs theta-join: each
    vector gets ``len(plane_ids)/bits_per_band`` band signatures from
    deterministic hyperplane sign bits; candidate pairs share a
    (band, bucket); the exact cosine verify runs only on candidates.
    Every join is an equi-join — no BroadcastNestedLoopJoin anywhere
    (pinned by tests/test_plan_shapes.py). Per-band bucket population
    is ~n / 2^bits_per_band, so verify work scales with bucket
    density, not n².

    Deterministic (planes are corpus rows), hence oracle-checkable
    against the same banded computation in DuckDB
    (:func:`embedding_cosine_dups_bucketed_sql`); recall against the
    exact all-pairs baseline is pinned in tests/test_llmdata.py.
    """
    assert len(plane_ids) % bits_per_band == 0
    emb = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    rank_expr = F.lit(None).cast("int")
    for i, pid in enumerate(sorted(plane_ids)):
        rank_expr = F.when(F.col("plane_id") == pid, F.lit(i)).otherwise(rank_expr)
    planes = emb.filter(F.col(id_col).isin(plane_ids)).select(
        F.col(id_col).alias("plane_id"), F.col("v").alias("pv")
    )
    # One narrow pass: (id, band, bucket) signatures — vectors are NOT
    # carried through the band fan-out.
    sig = (
        emb.crossJoin(F.broadcast(planes))
        .select(
            id_col,
            (rank_expr / bits_per_band).cast("int").alias("band"),
            (
                (dot(F.col("v"), F.col("pv")) >= 0).cast("long")
                * F.pow(F.lit(2), rank_expr % bits_per_band).cast("long")
            ).alias("bit"),
        )
        .groupBy(id_col, "band")
        .agg(F.sum("bit").alias("bucket"))
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("ia"), F.col(f"b.{id_col}").alias("ib")
        )
        .distinct()
    )
    # Exact verify on the candidate set only (two equi-joins back to
    # the vectors).
    withn = emb.select(
        id_col, "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("n")
    )
    ea = withn.select(
        F.col(id_col).alias("ia"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    eb = withn.select(
        F.col(id_col).alias("ib"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    return (
        cand.join(ea, "ia")
        .join(eb, "ib")
        .select(
            "ia",
            "ib",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_cosine_dups_bucketed_sql(
    plane_ids: list[int], *, bits_per_band: int = 4, threshold: float = 0.45
) -> str:
    plane_rank = ", ".join(
        f"({i}, {pid})" for i, pid in enumerate(sorted(plane_ids))
    )
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes AS (
  SELECT pr.rank AS prank, e.v AS pv
  FROM (VALUES {plane_rank}) AS pr(rank, plane_id)
  JOIN emb e ON e.vec_id = pr.plane_id
),
sig AS (
  SELECT e.vec_id, prank // {bits_per_band} AS band,
         CAST(SUM(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                  THEN CAST(power(2, prank % {bits_per_band}) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS bucket
  FROM emb e CROSS JOIN planes p
  GROUP BY e.vec_id, band
),
cand AS (
  SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
verified AS (
  SELECT c.ia, c.ib,
         ROUND(list_dot_product(ea.v, eb.v) /
               (sqrt(list_dot_product(ea.v, ea.v)) *
                sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos_sim
  FROM cand c
  JOIN emb ea ON ea.vec_id = c.ia
  JOIN emb eb ON eb.vec_id = c.ib
)
SELECT ia, ib, cos_sim FROM verified WHERE cos_sim >= {threshold}
"""


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    plane_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket.

    Random-hyperplane LSH with the planes drawn deterministically
    from the corpus itself (``plane_ids``): bucket(v) = sign bits of
    dot(v, plane_i). Deterministic and engine-portable, so unlike
    MinHash this variant IS oracle-checkable.
    """
    emb = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    # plane_rank is a literal CASE over the (small, driver-known)
    # plane id list — no global window over the big relation.
    rank_expr = F.lit(None).cast("int")
    for i, pid in enumerate(sorted(plane_ids)):
        rank_expr = F.when(F.col("plane_id") == pid, F.lit(i)).otherwise(rank_expr)
    planes = emb.filter(F.col(id_col).isin(plane_ids)).select(
        F.col(id_col).alias("plane_id"), F.col("v").alias("pv")
    )
    with_sign = (
        emb.crossJoin(F.broadcast(planes))
        .select(
            id_col,
            "v",
            rank_expr.alias("plane_rank"),
            (dot(F.col("v"), F.col("pv")) >= 0).cast("int").alias("bit"),
        )
    )
    bucketed = (
        with_sign.groupBy(id_col, "v")
        .agg(
            F.sum(
                F.col("bit") * F.pow(F.lit(2), F.col("plane_rank")).cast("long")
            ).alias("bucket")
        )
    )
    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        bucketed.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col(id_col) != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col(id_col).alias("cand_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def _kmeans_centroids(
    embeddings: DataFrame,
    seed_ids: list[int],
    n_iter: int,
    id_col: str,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """(cell, cv) TRAINED unit centroids: the spherical-k-means loop
    of :func:`kmeans_assign`, returning the centroids themselves
    (that function returns only the final assignment). One extra
    determinism layer the standalone gate doesn't need: each updated
    coordinate is ROUND(mean/norm, 6), because downstream consumers
    (the IVFPQ coarse quantizer) feed these values into FURTHER
    rounded comparisons where unrounded 1e-16 mean drift would get
    repeated chances to flip a 6th decimal between engines.

    Scale shape per round: one broadcast of the k-row centroid
    relation + two map-side-combinable aggregates over narrow
    (cell, pos, val) rows; fixed round count bounds the lineage. The
    finished centroid set (k rows, bounded by construction) is
    collected and re-literalized so the multiple downstream
    references (assign + probe ranks) cannot each replay the
    training loop."""
    norm = _unit_vectors(embeddings, id_col, vec_col)
    cents = norm.filter(F.col(id_col).isin(seed_ids)).select(
        F.col(id_col).alias("cell"), F.col("v").alias("cv")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cs").desc(), F.col("cell").asc()
    )
    for _ in range(n_iter):
        win = (
            norm.crossJoin(F.broadcast(cents))
            .selectExpr(
                f"`{id_col}`",
                "cell",
                f"round({dot_sql('v', 'cv')}, 6) AS cs",
            )
            .repartition(id_col)  # lazy-sort boundary (brute_force_topk)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(id_col, "cell")
        )
        # per-position means as dim fixed-width avg aggregates: one
        # codegen'd hash-agg shuffle per round (see _pq_cb_trained);
        # one-struct agg build (r16) — identical avg aggregates, one
        # expression parse instead of ~2*dim Column round trips
        assembled = (
            norm.join(win, id_col)
            .groupBy("cell")
            .agg(F.expr(
                "named_struct("
                + ", ".join(f"'mu{i}', avg(v[{i}])" for i in range(dim))
                + ") AS _m"
            ))
            .selectExpr(
                "cell",
                "array("
                + ", ".join(f"_m.mu{i}" for i in range(dim))
                + ") AS mv",
            )
        )
        # mn > 0 guard: a degenerate cluster whose member mean is the
        # ZERO vector would renormalize to null/NaN coordinates and
        # poison every downstream probe ranking — drop it like an
        # empty cluster (the sd > 0 pattern from seasonal_anomalies);
        # mirrored in the kc{i} CTE of ivfpq_topk_sql.
        cents = (
            assembled.selectExpr(
                "cell", "mv", f"sqrt({dot_sql('mv', 'mv')}) AS mn"
            )
            .filter(F.col("mn") > 0)
            .selectExpr(
                "cell",
                "transform(mv, x -> round(x / mn, 6)) AS cv",
            )
        )
    schema = cents.schema
    return embeddings.sparkSession.createDataFrame(cents.collect(), schema)


def _norm3(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, v, n): the double-cast vector with its L2 norm — the
    input relation of every coarse-quantizer ranking."""
    return embeddings.selectExpr(
        f"`{id_col}`", f"CAST(`{vec_col}` AS array<double>) AS v"
    ).selectExpr(f"`{id_col}`", "v", f"sqrt({dot_sql('v', 'v')}) AS n")


def _cell_ranked(norm: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """(id, ccid, cc, crk): every vector's centroids ranked by
    ROUND(cosine, 6) desc / ccid asc — THE single ranking body behind
    inline assignment (:func:`_ivf_assign`), index build, and
    index-time query probing, so no pair of consumers can ever place
    a vector in different cells."""
    paired = (
        norm.crossJoin(F.broadcast(cents))
        .selectExpr(
            f"`{id_col}`",
            "ccid",
            f"round({dot_sql('v', 'cv')} / (n * cn), 6) AS cc",
        )
        .repartition(id_col)  # lazy-sort boundary (see brute_force_topk)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cc").desc(), F.col("ccid").asc()
    )
    return paired.withColumn("crk", F.row_number().over(w))


def _coarse_cents(
    embeddings: DataFrame,
    centroid_ids: list[int],
    id_col: str,
    vec_col: str,
    coarse_train_iters: int,
    dim: int,
) -> DataFrame:
    """The (ccid, cv, cn) coarse-centroid relation: spherical-k-means
    trained when ``coarse_train_iters`` > 0, else the raw corpus
    rows — shared by inline search and index build."""
    if coarse_train_iters > 0:
        return _kmeans_centroids(
            embeddings, centroid_ids, coarse_train_iters, id_col, vec_col,
            dim,
        ).select(
            F.col("cell").alias("ccid"),
            F.col("cv"),
            F.sqrt(dot(F.col("cv"), F.col("cv"))).alias("cn"),
        )
    return _norm3(embeddings, id_col, vec_col).filter(
        F.col(id_col).isin(centroid_ids)
    ).select(
        F.col(id_col).alias("ccid"), F.col("v").alias("cv"),
        F.col("n").alias("cn"),
    )


def _unit_col(vec: str, norm: str):
    """v / |v| as an array expression (transform over the norm col)."""
    return F.transform(F.col(vec), lambda x: x / F.col(norm))


def _residual_vectors(
    norm: DataFrame, assign: DataFrame, cents: DataFrame, id_col: str
) -> DataFrame:
    """(id, cell, rv): UNIT-SPACE residuals r = v/|v| - c/|c| of each
    vector against its assigned coarse centroid — the IVFADC encode
    space (Jégou, Douze, Schmid 2011 §IV-A: PQ the residual, not the
    raw vector). Within a cell residuals are small and centered, so
    the per-subspace codebooks spend their codewords on LOCAL detail
    instead of re-describing cell means — on clustered corpora this
    is the difference between codes that can rank within-cluster
    neighbors and codes that cannot (measured in the bench clustered
    sweep: whole-corpus codebooks cap recall at the flat-PQ line).
    Unit space keeps residual L2 monotone in cosine (|u - c|^2 =
    2 - 2 cos), matching the exact re-rank's metric. Scale shape:
    one broadcast join against the nlist-row centroid relation —
    scan-shaped, corpus-size-independent."""
    cu = cents.select(
        F.col("ccid").alias("cell"), _unit_col("cv", "cn").alias("_cu")
    )
    return (
        norm.select(id_col, _unit_col("v", "n").alias("_u"))
        .join(assign, id_col)
        .join(F.broadcast(cu), "cell")
        .select(
            id_col,
            "cell",
            F.zip_with("_u", "_cu", lambda a, b: a - b).alias("rv"),
        )
    )


def _residual_qtab(
    norm_q: DataFrame,
    probe: DataFrame,
    cents: DataFrame,
    cb: DataFrame,
    m: int,
    dsub: int,
    id_col: str,
) -> DataFrame:
    """Per-(query, probed-cell) ADC table in residual space:
    (query_id, qcell, qsub, qcid, qd2). The residual-encoding dual of
    :func:`_pq_qtab` — each probed cell gets its OWN table because
    the query residual q/|q| - c/|c| differs per cell. Row count is
    |queries| x nprobe x m x ksub — broadcast-sized by construction
    (the same bound as the probe-pair collect)."""
    cu = cents.select(
        F.col("ccid").alias("qcell"), _unit_col("cv", "cn").alias("_cu")
    )
    qres = (
        norm_q.select(
            F.col(id_col).alias("p_qid"), _unit_col("v", "n").alias("_u")
        )
        .join(probe, "p_qid")
        .join(F.broadcast(cu), "qcell")
        .select(
            "p_qid",
            "qcell",
            F.zip_with("_u", "_cu", lambda a, b: a - b).alias("rq"),
        )
    )
    base = qres.select(
        "p_qid",
        "qcell",
        F.posexplode(_slices("rq", m, dsub)).alias("sub", "sv"),
    )
    # FULL squared distance, not the reduced cvv - 2ab form the flat
    # qtab uses: the dropped dot(sv, sv) term is constant per
    # (query, sub) there, but here the query residual DIFFERS per
    # probed cell, so dropping it would bias every cross-cell
    # comparison by |rq_cellA|^2 - |rq_cellB|^2 — at high cluster
    # separation that bias exceeds the signal and the shortlist
    # collapses into the wrong cell (observed: recall 0.0 before
    # this term).
    return base.join(F.broadcast(_with_cvv(cb)), "sub").select(
        F.col("p_qid").alias("query_id"),
        "qcell",
        F.col("sub").alias("qsub"),
        F.col("cid").alias("qcid"),
        F.round(
            dot(F.col("sv"), F.col("sv"))
            + F.col("cvv")
            - 2 * dot(F.col("sv"), F.col("cv")),
            6,
        ).alias("qd2"),
    )


def _ivf_assign(
    embeddings: DataFrame,
    centroid_ids: list[int],
    query_ids: list[int],
    nprobe: int,
    id_col: str,
    vec_col: str,
    coarse_train_iters: int = 0,
    dim: int = 64,
):
    """THE coarse-assignment lane, shared by ivf_topk and
    ivfpq_topk: returns (norm, assign, probe) where norm is
    (id, v, n), assign is (id, cell) and probe is (p_qid, qcell).
    Assignment cosine is ROUND(.., 6) with ascending-cid tie-break —
    the k-means convention — so the flat and the PQ-composed search
    can never place a vector in different cells (the drift the first
    cut of ivfpq shipped with). ``coarse_train_iters`` > 0 swaps the
    raw corpus-row centroids for spherical-k-means-trained ones
    (:func:`_kmeans_centroids`; cell labels stay the seed ids)."""
    norm = _norm3(embeddings, id_col, vec_col)
    cents = _coarse_cents(
        embeddings, centroid_ids, id_col, vec_col, coarse_train_iters, dim
    )
    ranked = _cell_ranked(norm, cents, id_col)
    assign = ranked.filter(F.col("crk") == 1).select(
        id_col, F.col("ccid").alias("cell")
    )
    probe = ranked.filter(
        F.col(id_col).isin(query_ids) & (F.col("crk") <= nprobe)
    ).select(F.col(id_col).alias("p_qid"), F.col("ccid").alias("qcell"))
    return norm, assign, probe


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    centroid_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into
    cosine cells around ``centroid_ids``, probe the query's ``nprobe``
    nearest cells, rank exact cosine within them.

    Centroids are corpus rows (deterministic; a production build
    would k-means them — the operator mechanics are identical). The
    corpus never shuffles for assignment (centroids broadcast); the
    candidate join is an equi-join on cell id. Per-query work drops
    from |corpus| to ~|corpus| * nprobe / |centroids|.
    """
    # Cell assignment: the shared rounded-cosine lane (_ivf_assign).
    # The ranking runs over a NARROW (id, ccid, cc) relation — the
    # vector column never rides the x|centroids| fan-out or the
    # assignment shuffle.
    norm, cells, probe = _ivf_assign(
        embeddings, centroid_ids, query_ids, nprobe, id_col, vec_col
    )
    assign = norm.join(cells, id_col)
    # Queries probe their nprobe nearest cells (tiny; vectors joined back).
    qprobe = (
        probe.select(
            F.col("p_qid").alias("query_id"), F.col("qcell")
        )
        .join(
            norm.filter(F.col(id_col).isin(query_ids)).select(
                F.col(id_col).alias("query_id"),
                F.col("v").alias("qv"),
                F.col("n").alias("qn"),
            ),
            "query_id",
        )
    )
    scored = (
        assign.join(F.broadcast(qprobe), F.col("cell") == F.col("qcell"))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("cand_id"),
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n")), 6
            ).alias("cos_sim"),
        )
        # No dedup needed: cell assignment (crk=1) is unique per vector.
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def _unit_vectors(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, v) with v = the embedding normalized to unit length."""
    raw = embeddings.selectExpr(
        f"`{id_col}`", f"CAST(`{vec_col}` AS array<double>) AS r"
    ).selectExpr(f"`{id_col}`", "r", f"sqrt({dot_sql('r', 'r')}) AS nrm")
    return raw.selectExpr(
        f"`{id_col}`", "transform(r, x -> x / nrm) AS v"
    )


def kmeans_assign(
    embeddings: DataFrame,
    seed_ids: list[int],
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means (Lloyd's) with deterministic corpus-row
    seeds and a FIXED unrolled iteration count — the training step
    that produces real IVF centroids (ivf_topk's docstring promise).

    Engine-portable determinism: the assignment key is the cosine
    ROUNDED to 6 dp with cell-id tie-break, so the 1e-15 summation-
    order drift of the centroid means (AVG over members) can never
    flip an assignment between engines; cluster labels are the seed
    ids, stable across iterations.

    Scale shape: centroids stay a k-row DataFrame (never collected),
    broadcast into each assignment; the update is posexplode ->
    groupBy(cell, pos) avg — a map-side partial agg over n*dim narrow
    rows. Rounds are a fixed constant (2-5 in practice), not
    data-dependent, so the lineage stays bounded.
    """
    norm = _unit_vectors(embeddings, id_col, vec_col).cache()
    cents = norm.filter(F.col(id_col).isin(seed_ids)).select(
        F.col(id_col).alias("cell"), F.col("v").alias("cv")
    )

    def _assign(c: DataFrame) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(
            F.col("cos_sim").desc(), F.col("cell").asc()
        )
        # Narrow (id, cell, cos_sim) ranking + join the winner back to
        # the cached unit vectors: v never rides the x|centroids|
        # fan-out, and the repartition materializes the interpreted
        # dot() scores before the sort (lazy-sort hazard, see
        # brute_force_topk).
        slim = (
            norm.crossJoin(F.broadcast(c))
            .selectExpr(
                f"`{id_col}`",
                "cell",
                f"round({dot_sql('v', 'cv')}, 6) AS cos_sim",
            )
            .repartition(id_col)
        )
        winners = (
            slim.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .drop("rk")
        )
        return norm.join(winners, id_col).select(
            id_col, "v", "cell", "cos_sim", F.lit(1).alias("rk")
        )

    for _ in range(n_iter):
        members = _assign(cents)
        means = (
            members.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
        )
        assembled = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("mv"))
        )
        # zero-norm guard (see _kmeans_centroids): drop clusters whose
        # member mean is the zero vector instead of emitting NaNs
        cents = (
            assembled.select(
                "cell", "mv",
                F.sqrt(dot(F.col("mv"), F.col("mv"))).alias("mn"),
            )
            .filter(F.col("mn") > 0)
            .select(
                "cell",
                F.transform("mv", lambda x: x / F.col("mn")).alias("cv"),
            )
        )

    return _assign(cents).select(id_col, "cell", "cos_sim")


def kmeans_assign_sql(seed_ids: list[int], n_iter: int = 2) -> str:
    """DuckDB oracle: the same fixed-round Lloyd's loop unrolled into
    one CTE chain per iteration (assign -> per-position mean ->
    reassemble -> renormalize)."""
    seeds = ", ".join(str(i) for i in seed_ids)
    parts = [
        f"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS r FROM embeddings),
norm AS (
  SELECT vec_id, list_transform(r, x -> x / nrm) AS v
  FROM (SELECT vec_id, r, sqrt(list_dot_product(r, r)) AS nrm FROM emb)
),
c0 AS (SELECT vec_id AS cell, v AS cv FROM norm WHERE vec_id IN ({seeds}))"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""a{i} AS (
  SELECT vec_id, v, cell FROM (
    SELECT n.vec_id, n.v, c.cell,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY ROUND(list_dot_product(n.v, c.cv), 6) DESC,
                      c.cell ASC) AS rk
    FROM norm n CROSS JOIN c{i - 1} c
  ) WHERE rk = 1
),
u{i} AS (
  SELECT cell, pos, AVG(val) AS m
  FROM (SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS pos
        FROM a{i})
  GROUP BY cell, pos
),
m{i} AS (SELECT cell, list(m ORDER BY pos) AS mv FROM u{i} GROUP BY cell),
c{i} AS (
  SELECT cell, list_transform(mv, x -> x / mn) AS cv
  FROM (SELECT cell, mv, sqrt(list_dot_product(mv, mv)) AS mn FROM m{i})
  WHERE mn > 0
)""")
    return (
        ",\n".join(parts)
        + f"""
SELECT vec_id, cell, cos_sim FROM (
  SELECT n.vec_id, c.cell,
         ROUND(list_dot_product(n.v, c.cv), 6) AS cos_sim,
         row_number() OVER (PARTITION BY n.vec_id
           ORDER BY ROUND(list_dot_product(n.v, c.cv), 6) DESC,
                    c.cell ASC) AS rk
  FROM norm n CROSS JOIN c{n_iter} c
) WHERE rk = 1
"""
    )


def ivf_topk_sql(
    query_ids: list[int], centroid_ids: list[int], k: int = 5, nprobe: int = 2
) -> str:
    qids = ", ".join(str(i) for i in query_ids)
    cids = ", ".join(str(i) for i in centroid_ids)
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id IN ({cids})),
paired AS (
  -- assignment cosine ROUND 6 + cid tie-break: the shared lane
  -- convention (_ivf_assign), identical in the ivfpq twin
  SELECT e.vec_id, e.v, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY ROUND(list_dot_product(e.v, c.cv) /
                              (sqrt(list_dot_product(e.v, e.v)) *
                               sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                            c.cid ASC) AS crk
  FROM emb e CROSS JOIN cents c
),
assign AS (SELECT vec_id, v, cid AS cell FROM paired WHERE crk = 1),
qprobe AS (
  SELECT vec_id AS query_id, v AS qv, cid AS cell
  FROM paired WHERE vec_id IN ({qids}) AND crk <= {nprobe}
),
scored AS (
  SELECT DISTINCT q.query_id, a.vec_id AS cand_id,
         ROUND(list_dot_product(q.qv, a.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(a.v, a.v))), 6) AS cos_sim
  FROM assign a JOIN qprobe q ON a.cell = q.cell
  WHERE a.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= {k}
"""


def lsh_bucketed_topk_sql(query_ids: list[int], plane_ids: list[int], k: int = 5) -> str:
    qids = ", ".join(str(i) for i in query_ids)
    pids = ", ".join(str(i) for i in sorted(plane_ids))
    plane_rank = ", ".join(
        f"({i}, {pid})" for i, pid in enumerate(sorted(plane_ids))
    )
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes AS (
  SELECT pr.rank AS plane_rank, e.v AS pv
  FROM (VALUES {plane_rank}) AS pr(rank, plane_id)
  JOIN emb e ON e.vec_id = pr.plane_id
),
bucketed AS (
  SELECT e.vec_id, ANY_VALUE(e.v) AS v,
         CAST(SUM(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                  THEN CAST(power(2, p.plane_rank) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM emb e CROSS JOIN planes p
  GROUP BY e.vec_id
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
      FROM bucketed WHERE vec_id IN ({qids})),
scored AS (
  SELECT q.query_id, b.vec_id AS cand_id,
         ROUND(list_dot_product(q.qv, b.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
  FROM bucketed b JOIN q
    ON b.bucket = q.qbucket AND b.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= {k}
"""


def semdedup(
    embeddings: DataFrame,
    seed_ids: list[int],
    n_iter: int = 2,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup of an embedding
    corpus via k-means cells — pairwise similarity is evaluated ONLY
    within a vector's cluster, never across the corpus.

    A vector is dropped when a same-cell partner with pairwise cosine
    >= threshold has higher survivor priority; following the paper,
    the survivor of a duplicate group is the member FARTHEST from its
    centroid (lowest assignment cosine, vec_id tie-break), keeping the
    least-redundant representative. Output: one row per vector with
    its cell, centroid similarity, and the keep/drop verdict.

    Scale shape: reuses :func:`kmeans_assign` (broadcast centroids,
    corpus unshuffled); the pair join is equi on the cell id so work
    is sum over cells of |cell|^2, controlled by the centroid count —
    the same knob the paper tunes — instead of n^2. With healthy
    centroids that is enough, but a pathological corpus (near-dup
    heavy, or bad seeds) can funnel most vectors into one cell and
    make a single task quadratic; ``max_cell_size`` guards that —
    cells wider than the cap are excluded from the pair join (their
    members are all kept, a pure recall sacrifice, same contract as
    minhash_lsh's ``max_bucket_size``). The count window runs on the
    cell partitioning the join needs anyway.
    """
    assign = kmeans_assign(embeddings, seed_ids, n_iter, id_col, vec_col)
    # _unit_vectors produces a plan identical to the one kmeans_assign
    # cached, so Spark's cache manager serves this from the same entry.
    norm = _unit_vectors(embeddings, id_col, vec_col)
    # Cached: consumed by both self-join sides and the final output —
    # uncached, the n_iter rounds of k-means lineage would recompute
    # up to 3x. One corpus-sized entry (id, cell, sim, unit vector);
    # MEMORY_AND_DISK default spills rather than OOMs at scale.
    a = assign.join(norm, id_col).select(id_col, "cell", "cos_sim", "v").cache()
    if max_cell_size is not None:
        cw = Window.partitionBy("cell")
        pair_src = (
            a.withColumn("_cw", F.count(F.lit(1)).over(cw))
            .filter(F.col("_cw") <= max_cell_size)
            .drop("_cw")
        )
    else:
        pair_src = a
    x, y = pair_src.alias("x"), pair_src.alias("y")
    dropped = x.join(
        y,
        (F.col("x.cell") == F.col("y.cell"))
        & (F.col(f"x.{id_col}") != F.col(f"y.{id_col}"))
        & (F.round(dot(F.col("x.v"), F.col("y.v")), 6) >= threshold)
        & (
            (F.col("y.cos_sim") < F.col("x.cos_sim"))
            | (
                (F.col("y.cos_sim") == F.col("x.cos_sim"))
                & (F.col(f"y.{id_col}") < F.col(f"x.{id_col}"))
            )
        ),
        "left_semi",
    ).select(F.col(f"x.{id_col}").alias(id_col))
    return (
        a.join(dropped.withColumn("_d", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cell",
            F.col("cos_sim").alias("centroid_sim"),
            F.coalesce(~F.col("_d"), F.lit(True)).alias("kept"),
        )
    )


def semdedup_sql(
    seed_ids: list[int],
    n_iter: int = 2,
    threshold: float = 0.45,
    max_cell_size: int | None = None,
) -> str:
    km = kmeans_assign_sql(seed_ids, n_iter)
    cap = (
        f"pair_src AS (SELECT * FROM (SELECT a.*, COUNT(*) OVER (PARTITION BY cell) AS _cw FROM a) WHERE _cw <= {max_cell_size}),"
        if max_cell_size is not None
        else "pair_src AS (SELECT * FROM a),"
    )
    return f"""
WITH emb2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS r FROM embeddings),
norm2 AS (
  SELECT vec_id, list_transform(r, x -> x / nrm) AS v
  FROM (SELECT vec_id, r, sqrt(list_dot_product(r, r)) AS nrm FROM emb2)
),
a AS (
  SELECT s.vec_id, s.cell, s.cos_sim, n.v
  FROM ({km}) s JOIN norm2 n ON s.vec_id = n.vec_id
),
{cap}
dropped AS (
  SELECT DISTINCT x.vec_id
  FROM pair_src x JOIN pair_src y
    ON x.cell = y.cell AND x.vec_id != y.vec_id
   AND ROUND(list_dot_product(x.v, y.v), 6) >= {threshold}
   AND (y.cos_sim < x.cos_sim
        OR (y.cos_sim = x.cos_sim AND y.vec_id < x.vec_id))
)
SELECT a.vec_id, a.cell, a.cos_sim AS centroid_sim,
       a.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
FROM a
"""


def sq8_quantize(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8 scalar quantization (SQ8): codes + dequantized vectors.

    Per-dimension corpus min/max define a uniform 256-level grid
    (one aggregate pass -> ONE broadcast row); codes and the
    reconstructed grid centers are pure array-expression trees over
    the scan. Output per row: the exact vector ``r``, ``codes``
    (0..255 per dimension), the dequantized ``xhat``, and both norms
    ``rn``/``hn``. At deployment this relation is materialized once —
    every subsequent search scans the 4x-smaller codes instead of
    raw floats. Reconstruction error is bounded by half a grid step
    per dimension (pinned in tests/test_llmdata.py).
    """
    # Batched build (r16): the Column spelling cost ~1.3 s per plan
    # build at dim=64 (2*dim min/max aggregates + 2*dim array items +
    # the two transforms, one py4j round trip each, cProfile'd). The
    # SQL strings below resolve to the identical expression trees —
    # every float literal is D-suffixed so no decimal/double drift.
    emb = embeddings.selectExpr(
        f"`{id_col}`", f"CAST(`{vec_col}` AS array<double>) AS r"
    )
    mnmx = ", ".join(
        f"'mn{i}', min(element_at(r, {i})), 'mx{i}', max(element_at(r, {i}))"
        for i in range(1, dim + 1)
    )
    stats = emb.agg(F.expr(f"named_struct({mnmx}) AS _s")).selectExpr(
        "array("
        + ", ".join(f"_s.mn{i}" for i in range(1, dim + 1))
        + ") AS mins",
        "array("
        + ", ".join(
            f"(_s.mx{i} - _s.mn{i}) / 255.0D" for i in range(1, dim + 1)
        )
        + ") AS scales",
    )
    return (
        emb.crossJoin(F.broadcast(stats))
        .selectExpr(
            "*",
            f"transform(sequence(1, {dim}), i -> "
            "CASE WHEN element_at(scales, i) = 0.0D THEN 0.0D "
            "ELSE round((element_at(r, i) - element_at(mins, i)) "
            "/ element_at(scales, i), 0) END) AS codes",
        )
        .selectExpr(
            "*",
            f"transform(sequence(1, {dim}), i -> element_at(mins, i) "
            "+ element_at(codes, i) * element_at(scales, i)) AS xhat",
        )
        .selectExpr(
            f"`{id_col}`",
            "r",
            "codes",
            "xhat",
            f"sqrt({dot_sql('r', 'r')}) AS rn",
            f"sqrt({dot_sql('xhat', 'xhat')}) AS hn",
        )
    )


def sq8_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via int8 scalar quantization (SQ8) + exact re-rank.

    The scale path for memory-bound vector search: per-dimension
    min/max over the corpus define a uniform 256-level grid; each
    vector compresses 4x (float32 -> one byte per dimension).
    Candidate generation scores the DEQUANTIZED vectors (grid cell
    centers reconstructed from codes), takes ``rerank_factor * k``
    candidates per query, then re-scores only those with the exact
    float vectors — the standard two-phase ADC + re-rank.

    Scale design (100 TB):
    - the grid statistics are one aggregate pass -> ONE row (2*dim
      min/max columns), broadcast back onto the scan; the corpus
      never shuffles;
    - quantize/dequantize are pure array-expression trees (sequence +
      transform + element_at), codegen'd, no UDF;
    - at deployment the codes table is materialized once (4x smaller
      scan for every query); here both phases run inline so the
      DuckDB oracle can replay the exact arithmetic;
    - per-query candidate top-m and final top-k are windows over the
      (tiny) query-partitioned score sets.

    Engine-portable determinism: codes are ``round((x - mn)/scale)``
    on identical doubles both sides; approximate and exact cosines
    are ROUND(..., 6) with ascending-id tie-break before any rank is
    assigned.
    """
    # Cached: three consumers (approx scoring, candidate vectors,
    # query vectors) — and at deployment this relation is exactly the
    # materialized-once codes table the module docstring describes.
    # Retention is same-plan keyed (one entry per distinct input, not
    # per call); long-lived sessions done with a corpus reclaim it via
    # unpersist/clearCache, like the other operator-level caches here.
    quantized = sq8_quantize(embeddings, dim, id_col, vec_col).cache()

    q = quantized.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("xhat").alias("qhat"),
        F.col("hn").alias("qhn"),
    )
    m = rerank_factor * k
    # NARROW approximate scores: the rank window sees 3 scalar
    # columns, never the fat xhat/r arrays. (The round-5
    # repartition("query_id") boundary that used to sit below the
    # window was removed in r15 with the rest of the low-cardinality
    # ANN barriers — see _exact_cosine_topk's note: the score is a
    # projected attribute, so the sort materializes it once, and the
    # explicit exchange both capped the sort at #queries partitions
    # and blocked the map-side partial WindowGroupLimit.)
    scored = (
        quantized.select(id_col, "xhat", "hn")
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("cand_id"),
            F.round(
                dot(F.col("xhat"), F.col("qhat")) / (F.col("hn") * F.col("qhn")),
                6,
            ).alias("approx_sim"),
        )
    )
    w_approx = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("cand_id").asc()
    )
    cands = (
        scored.withColumn("ark", F.row_number().over(w_approx))
        .filter(F.col("ark") <= m)
        .select("query_id", "cand_id")
    )
    # Exact re-rank: join the TINY candidate set (queries x m rows,
    # broadcast) back to the exact vectors — the corpus never carries
    # its arrays through any shuffle.
    cvecs = quantized.select(
        F.col(id_col).alias("cand_id"), "r", "rn"
    ).join(F.broadcast(cands), "cand_id")
    qvecs = quantized.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("r").alias("qr"),
        F.col("rn").alias("qrn"),
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        cvecs.join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("r"), F.col("qr")) / (F.col("rn") * F.col("qrn")), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w_exact))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def sq8_topk_sql(
    query_ids: list[int], dim: int, k: int = 5, rerank_factor: int = 4
) -> str:
    """DuckDB oracle: identical grid, codes, dequantized candidate
    scores, and exact re-rank."""
    ids = ", ".join(str(i) for i in query_ids)
    m = rerank_factor * k
    mins = ", ".join(f"MIN(r[{i}])" for i in range(1, dim + 1))
    scales = ", ".join(
        f"(MAX(r[{i}]) - MIN(r[{i}])) / 255.0" for i in range(1, dim + 1)
    )
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS r FROM embeddings),
stats AS MATERIALIZED (
  SELECT [{mins}] AS mins, [{scales}] AS scales FROM emb
),
quant AS MATERIALIZED (
  SELECT vec_id, r, xhat,
         sqrt(list_dot_product(r, r)) AS rn,
         sqrt(list_dot_product(xhat, xhat)) AS hn
  FROM (
    SELECT vec_id, r,
           list_transform(range(1, {dim + 1}), i ->
             mins[i] + (CASE WHEN scales[i] = 0 THEN 0
                             ELSE round((r[i] - mins[i]) / scales[i])
                        END) * scales[i]) AS xhat
    FROM emb CROSS JOIN stats
  )
),
q AS (
  SELECT vec_id AS query_id, r AS qr, xhat AS qhat, rn AS qrn, hn AS qhn
  FROM quant WHERE vec_id IN ({ids})
),
cands AS (
  SELECT * FROM (
    SELECT c.query_id, c.cand_id, c.r, c.rn, c.qr, c.qrn,
           row_number() OVER (PARTITION BY c.query_id
             ORDER BY c.approx_sim DESC, c.cand_id ASC) AS ark
    FROM (
      SELECT q.query_id, e.vec_id AS cand_id, e.r, e.rn, q.qr, q.qrn,
             ROUND(list_dot_product(e.xhat, q.qhat) / (e.hn * q.qhn), 6)
               AS approx_sim
      FROM quant e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ) c
  ) WHERE ark <= {m}
)
SELECT query_id, cand_id, cos_sim, rank FROM (
  SELECT query_id, cand_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
           ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM (
    SELECT query_id, cand_id,
           ROUND(list_dot_product(r, qr) / (rn * qrn), 6) AS cos_sim
    FROM cands
  )
) WHERE rank <= {k}
"""


def lsh_multiprobe_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    plane_ids: list[int],
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH top-k: besides its own bucket, each query
    probes the ``n_probe - 1`` neighboring buckets reached by
    flipping the sign bits with the SMALLEST margin |dot(q, plane)| —
    the bits most likely to differ for true neighbors (Lv et al.,
    multi-probe LSH). Recall approaches more-planes/more-tables
    quality without growing the bucket index or re-hashing the
    corpus: the corpus-side bucketing is IDENTICAL to
    ``lsh_bucketed_topk``; only the (tiny, broadcast) query probe
    list fans out.

    Engine-portable determinism: probe choice orders by
    ROUND(|margin|, 6) with plane-rank tie-break; candidates reached
    via several probes are de-duplicated before scoring.
    """
    emb = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    rank_expr = F.lit(None).cast("int")
    for i, pid in enumerate(sorted(plane_ids)):
        rank_expr = F.when(F.col("plane_id") == pid, F.lit(i)).otherwise(rank_expr)
    planes = emb.filter(F.col(id_col).isin(plane_ids)).select(
        F.col(id_col).alias("plane_id"), F.col("v").alias("pv")
    )
    with_sign = (
        emb.crossJoin(F.broadcast(planes))
        .select(
            id_col,
            "v",
            rank_expr.alias("plane_rank"),
            dot(F.col("v"), F.col("pv")).alias("margin"),
        )
        .withColumn("bit", (F.col("margin") >= 0).cast("int"))
    )
    bucketed = with_sign.groupBy(id_col, "v").agg(
        F.sum(
            F.col("bit") * F.pow(F.lit(2), F.col("plane_rank")).cast("long")
        ).alias("bucket")
    )

    # Query-side probe fan-out (|queries| x n_probe rows, broadcast).
    q_sign = with_sign.filter(F.col(id_col).isin(query_ids))
    q_base = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    w_m = Window.partitionBy(id_col).orderBy(
        F.round(F.abs("margin"), 6).asc(), F.col("plane_rank").asc()
    )
    flips = (
        q_sign.withColumn("mrank", F.row_number().over(w_m))
        .filter(F.col("mrank") <= n_probe - 1)
        .select(
            F.col(id_col).alias("query_id"),
            F.expr("cast(shiftleft(1L, plane_rank) as bigint)").alias("flip"),
        )
    )
    probes = q_base.join(flips, "query_id", "left").select(
        "query_id",
        "qv",
        F.when(F.col("flip").isNull(), F.col("qbucket"))
        .otherwise(
            F.col("qbucket").bitwiseXOR(F.col("flip"))
        )
        .alias("probe_bucket"),
    ).unionByName(
        q_base.select(
            "query_id", "qv", F.col("qbucket").alias("probe_bucket")
        )
    ).dropDuplicates(["query_id", "probe_bucket"])

    cands = (
        bucketed.join(
            F.broadcast(probes),
            (F.col("bucket") == F.col("probe_bucket"))
            & (F.col(id_col) != F.col("query_id")),
        )
        .select("query_id", F.col(id_col).alias("cand_id"), "qv", "v")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cands.select(
        "query_id",
        "cand_id",
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def lsh_multiprobe_topk_sql(
    query_ids: list[int],
    plane_ids: list[int],
    k: int = 5,
    n_probe: int = 3,
) -> str:
    """DuckDB oracle: same buckets, margins, probe set, and ranking."""
    qids = ", ".join(str(i) for i in query_ids)
    ranks = "\n".join(
        f"    WHEN plane_id = {pid} THEN {i}"
        for i, pid in enumerate(sorted(plane_ids))
    )
    pids = ", ".join(str(i) for i in sorted(plane_ids))
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes AS (
  SELECT vec_id AS plane_id, v AS pv,
         CASE
{ranks}
         END AS plane_rank
  FROM emb WHERE vec_id IN ({pids})
),
with_sign AS MATERIALIZED (
  SELECT e.vec_id, e.v, p.plane_rank,
         list_dot_product(e.v, p.pv) AS margin,
         CASE WHEN list_dot_product(e.v, p.pv) >= 0 THEN 1 ELSE 0 END AS bit
  FROM emb e CROSS JOIN planes p
),
bucketed AS MATERIALIZED (
  SELECT vec_id, v,
         CAST(SUM(bit * (1 << plane_rank)) AS BIGINT) AS bucket
  FROM with_sign GROUP BY vec_id, v
),
q_base AS (
  SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
  FROM bucketed WHERE vec_id IN ({qids})
),
flips AS (
  SELECT vec_id AS query_id,
         CAST((1 << plane_rank) AS BIGINT) AS flip
  FROM (
    SELECT vec_id, plane_rank,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY ROUND(ABS(margin), 6) ASC, plane_rank ASC) AS mrank
    FROM with_sign WHERE vec_id IN ({qids})
  ) WHERE mrank <= {n_probe - 1}
),
probes AS (
  SELECT DISTINCT query_id, qv, probe_bucket FROM (
    SELECT b.query_id, b.qv, xor(b.qbucket, f.flip) AS probe_bucket
    FROM q_base b JOIN flips f USING (query_id)
    UNION ALL
    SELECT query_id, qv, qbucket AS probe_bucket FROM q_base
  )
),
cands AS (
  SELECT DISTINCT c.query_id, c.cand_id, c.qv, c.v FROM (
    SELECT p.query_id, b.vec_id AS cand_id, p.qv, b.v
    FROM bucketed b JOIN probes p
      ON b.bucket = p.probe_bucket AND b.vec_id <> p.query_id
  ) c
)
SELECT query_id, cand_id, cos_sim, rank FROM (
  SELECT query_id, cand_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
           ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM (
    SELECT query_id, cand_id,
           ROUND(list_dot_product(qv, v) /
                 (sqrt(list_dot_product(qv, qv)) *
                  sqrt(list_dot_product(v, v))), 6) AS cos_sim
    FROM cands
  )
) WHERE rank <= {k}
"""


def brute_force_topk_pandas(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via an Arrow-batched pandas UDF (numpy
    matmul per batch) — the vectorized ESCAPE-HATCH twin of
    :func:`brute_force_topk`.

    Exists to measure, not to replace: the expression path keeps the
    whole scan in JVM codegen; this path pays Arrow serialization
    both ways but scores each batch as ONE numpy (batch x dim) @
    (dim x queries) matmul. bench.py's extras time both at sf0.1 so
    the "UDFs are the slow path / Arrow batching is the acceptable
    escape hatch" guidance is a measured number. Result values are
    pinned identical to the expression path (tests/test_llmdata.py);
    per-query top-k still runs JVM-side.

    Queries ride into the workers as a broadcast numpy matrix via
    closure capture — no shuffle of the corpus, same as the
    expression path.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    q_rows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )  # |queries| rows — driver-side by design, like any broadcast dim
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r["v"], dtype=np.float64) for r in q_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    @pandas_udf("array<double>")
    def cos_scores(vs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Qn.T  # (batch, queries)
        # HALF_UP (away from zero) to match the expression path's
        # F.round / BigDecimal semantics — np.round is banker's
        # half-to-even and can diverge on cosines landing exactly on
        # a 6-dp half. (Residual caveat: this is float half-up; a
        # value whose *binary* representation sits across the decimal
        # .5 boundary could still differ from exact-decimal rounding
        # — none occur in the pinned comparisons.)
        S6 = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6
        return pd.Series(list(S6))

    scored = (
        embeddings.select(
            F.col(id_col).alias("cand_id"),
            cos_scores(F.col(vec_col).cast("array<double>")).alias("scores"),
        )
        .select(
            "cand_id",
            F.posexplode("scores").alias("qidx", "cos_sim"),
        )
        .join(
            F.broadcast(
                embeddings.sparkSession.createDataFrame(
                    [(int(i), int(q)) for i, q in enumerate(q_ids)],
                    "qidx int, query_id long",
                )
            ),
            "qidx",
        )
        .filter(F.col("cand_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze, Schmid 2011 — "Product
# Quantization for Nearest Neighbor Search")


def _slices_sql(vec_col: str, m: int, dsub: int) -> str:
    """SQL string of :func:`_slices` — the Column spelling cost ~50
    py4j round trips per call at m=8 (r16 plan-build cost)."""
    return "array(" + ", ".join(
        f"transform(slice(`{vec_col}`, {s * dsub + 1}, {dsub}), "
        f"x -> CAST(x AS DOUBLE))"
        for s in range(m)
    ) + ")"


def _slices(vec_col: str, m: int, dsub: int) -> Column:
    """Array of m double-cast subvector slices of a float vector."""
    return F.expr(_slices_sql(vec_col, m, dsub))


def _with_cvv(cb: DataFrame) -> Column:
    """Codebook with a precomputed self-dot column: (sub, cid, cv,
    cvv=dot(cv,cv)). The PQ comparison quantity is the REDUCED form
    cvv - 2ab — dropping the dot(a,a) term, which is constant across
    the candidates of any argmin/ranking it feeds, and folding
    dot(b,b) into one value per codebook row. That turns three
    interpreted higher-order array folds per compared pair into ONE
    (the pairs relation is |corpus| x ksub per subspace — the hot
    loop); the twin evaluates the identical reduced shape
    (:data:`_PQ_D2R`), so rounded values cannot diverge through
    different factorizations."""
    return cb.selectExpr("*", f"{dot_sql('cv', 'cv')} AS cvv")


def _pq_base(df: DataFrame, m: int, dsub: int, id_col: str,
             vec_col: str) -> DataFrame:
    """(id, sub, sv) subvector rows — the single slicing definition."""
    return df.selectExpr(
        f"`{id_col}`",
        f"posexplode({_slices_sql(vec_col, m, dsub)}) AS (sub, sv)",
    )


def _pq_cb(embeddings: DataFrame, codebook_ids: list[int], m: int,
           dsub: int, id_col: str, vec_col: str) -> DataFrame:
    """Codebook relation (sub, cid, cv) from corpus rows."""
    return (
        _pq_base(embeddings, m, dsub, id_col, vec_col)
        .filter(F.col(id_col).isin(codebook_ids))
        .select("sub", F.col(id_col).alias("cid"), F.col("sv").alias("cv"))
    )


def _pq_cb_trained(
    embeddings: DataFrame,
    codebook_ids: list[int],
    m: int,
    dsub: int,
    id_col: str,
    vec_col: str,
    train_iters: int,
) -> DataFrame:
    """K-means-TRAINED subspace codebooks: Lloyd's algorithm run
    independently per subspace (the PQ training step of Jégou et al.
    2011), seeded from the deterministic ``codebook_ids`` corpus rows
    and unrolled for a FIXED ``train_iters`` rounds.

    Engine-portable determinism, two layers:
    - the assignment inside each round is :func:`_pq_enc_from` — the
      SAME 6-dp-rounded-L2 / cid-tie-break lane every encode path
      uses, so a membership can never flip between engines;
    - the updated centroid coordinates are ROUND(mean, 6) — unlike
      the standalone :func:`kmeans_assign` (whose only rounded
      quantity is the final cosine), PQ sums m per-subspace distances
      into one ADC total, so unrounded 1e-16 mean drift would get m
      chances per candidate to flip the 6th decimal of the sum.
    Cluster labels stay the seed corpus ids across rounds; a cluster
    that loses every member drops out identically in both engines
    (the codebook shrinks rather than diverges).

    Scale shape: each round is one broadcast join (codebook is
    m x ksub rows by construction) + two map-side-combinable
    aggregates over the narrow (id, sub, pos, val) relation — the
    exact shape MLlib's k-means uses, viable over the full corpus.
    Rounds are a fixed constant, so lineage stays bounded. The
    FINISHED codebook is collected and re-literalized: it is m x ksub
    rows — bounded by construction, corpus-size-independent (the same
    justification as the bloom sketch's collect) — and every
    downstream consumer references it at least twice (enc + qtab), so
    leaving it lazy would recompute the whole Lloyd loop per
    reference. Inline callers still re-train per query; the
    production path is pq_build_index(train_iters=...) — train ONCE,
    persist, and let every query hit the stored codebook.
    """
    cb = _pq_cb(embeddings, codebook_ids, m, dsub, id_col, vec_col)
    base = _pq_base(embeddings, m, dsub, id_col, vec_col)
    for _ in range(train_iters):
        win = _pq_enc_from(embeddings, cb, m, dsub, id_col, vec_col)
        # per-position means as dsub FIXED-WIDTH avg aggregates (dsub
        # is a compile-time constant): one codegen'd hash-agg shuffle
        # per round — no posexplode row blow-up, no second
        # reassembly shuffle. The DuckDB twin keeps the unnest/AVG
        # form; both are plain means, and ROUND(.., 6) absorbs the
        # summation-order ulp between them.
        # one-struct agg build (r16, same trick as the flagship):
        # identical avg aggregates, one expression parse instead of
        # 2*dsub Column round trips per training round
        mus = ", ".join(f"'mu{i}', avg(sv[{i}])" for i in range(dsub))
        cb = (
            base.join(win, [id_col, "sub"])
            .groupBy("sub", F.col("code").alias("cid"))
            .agg(F.expr(f"named_struct({mus}) AS _m"))
            .selectExpr(
                "sub",
                "cid",
                "array("
                + ", ".join(f"round(_m.mu{i}, 6)" for i in range(dsub))
                + ") AS cv",
            )
        )
    schema = cb.schema
    return embeddings.sparkSession.createDataFrame(cb.collect(), schema)


def pq_train_codebook(
    embeddings: DataFrame,
    codebook_ids: list[int],
    m: int = 8,
    dsub: int = 8,
    train_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Public train-once entry point: the Lloyd-trained (sub, cid,
    cv) codebook relation, with the SAME m/dsub defaults as
    :func:`pq_topk` / :func:`ivfpq_topk`. Callers sharing one
    codebook across several searches (e.g. the pq + ivfpq suite legs)
    train here once and pass the result via their ``codebook``
    parameter — hard-coding the subspace shape at call sites risks
    silently training a mismatched codebook if the defaults ever
    move."""
    return _pq_cb_trained(
        embeddings, codebook_ids, m, dsub, id_col, vec_col, train_iters
    )


def _pq_enc_from(rows: DataFrame, cb: DataFrame, m: int, dsub: int,
                 id_col: str, vec_col: str) -> DataFrame:
    """Encode rows against a given codebook: (id, sub, code) with
    code = the nearest codebook member's cid (6-dp rounded REDUCED
    L2: cvv - 2ab, see :func:`_with_cvv`; cid tie-break). ONE
    definition for inline search, index build, and index append."""
    return (
        _pq_base(rows, m, dsub, id_col, vec_col)
        .join(F.broadcast(_with_cvv(cb)), "sub")
        .selectExpr(
            f"`{id_col}`",
            "sub",
            "cid",
            f"round(cvv - 2 * {dot_sql('sv', 'cv')}, 6) AS d",
        )
        .groupBy(id_col, "sub")
        .agg(F.min(F.struct("d", "cid")).alias("mc"))
        .selectExpr(f"`{id_col}`", "sub", "mc.cid AS code")
    )


def _pq_qtab(embeddings: DataFrame, query_ids: list[int], cb: DataFrame,
             m: int, dsub: int, id_col: str, vec_col: str) -> DataFrame:
    """Query ADC table (query_id, qsub, qcid, qd2) against a given
    codebook — shared by inline and persisted-index search."""
    return (
        _pq_base(
            embeddings.filter(F.col(id_col).isin(query_ids)),
            m, dsub, id_col, vec_col,
        )
        .selectExpr(f"`{id_col}` AS query_id", "sub", "sv AS qv")
        .join(F.broadcast(_with_cvv(cb)), "sub")
        .selectExpr(
            "query_id",
            # distinct names: enc and qtab can share lineage, where
            # dataframe-qualified same-name refs degrade to a
            # trivially-true self-compare
            "sub AS qsub",
            "cid AS qcid",
            # reduced form (cvv - 2ab): the dropped dot(q,q) term is
            # constant per (query, sub), so the ADC sum over all m
            # subspaces shifts every candidate of a query by the same
            # amount — rankings and tie patterns are unchanged
            f"round(cvv - 2 * {dot_sql('qv', 'cv')}, 6) AS qd2",
        )
    )


def _pq_adc_cands(scored: DataFrame, id_col: str,
                  shortlist: int) -> DataFrame:
    """The shared ADC aggregation + shortlist stage: rows carrying
    (query_id, id, qd2) -> (query_id, cand_id). One definition so a
    rounding/tie-break tweak cannot desynchronize the three search
    paths (inline PQ, IVFPQ, persisted index)."""
    approx = (
        scored.filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("qd2"), 6).alias("ad2"))
    )
    w_approx = Window.partitionBy("query_id").orderBy(
        F.col("ad2").asc(), F.col(id_col).asc()
    )
    return (
        approx.withColumn("ark", F.row_number().over(w_approx))
        .filter(F.col("ark") <= shortlist)
        .select("query_id", F.col(id_col).alias("cand_id"))
    )


def _pq_enc_qtab(
    embeddings: DataFrame,
    query_ids: list[int],
    codebook_ids: list[int],
    m: int,
    dsub: int,
    id_col: str,
    vec_col: str,
    train_iters: int = 0,
    codebook: DataFrame | None = None,
):
    """Shared PQ machinery: (enc, qtab) — the compressed corpus
    relation (id, sub, code) and the query ADC table. Composition of
    the single-definition helpers above. ``train_iters`` > 0 swaps
    the sampled codebook for the k-means-trained one
    (:func:`_pq_cb_trained`); pass ``codebook`` (sub, cid, cv) to
    reuse an already-built one — e.g. so pq and ivfpq legs sharing
    identical training parameters train ONCE instead of twice."""
    if codebook is not None:
        cb = codebook
    elif train_iters > 0:
        cb = _pq_cb_trained(
            embeddings, codebook_ids, m, dsub, id_col, vec_col, train_iters
        )
    else:
        cb = _pq_cb(embeddings, codebook_ids, m, dsub, id_col, vec_col)
    enc = _pq_enc_from(embeddings, cb, m, dsub, id_col, vec_col)
    qtab = _pq_qtab(embeddings, query_ids, cb, m, dsub, id_col, vec_col)
    return enc, qtab


def _pq_exact_rerank(
    embeddings: DataFrame,
    cands: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-cosine re-rank of a (query_id, cand_id) shortlist —
    shared tail of both PQ search paths."""
    vecs = embeddings.selectExpr(
        f"`{id_col}`",
        f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE)) AS v",
    )
    cvecs = vecs.selectExpr(f"`{id_col}` AS cand_id", "v").join(
        F.broadcast(cands), "cand_id"
    )
    qvecs = vecs.filter(F.col(id_col).isin(query_ids)).selectExpr(
        f"`{id_col}` AS query_id", "v AS qv"
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        cvecs.join(F.broadcast(qvecs), "query_id")
        .selectExpr(
            "query_id",
            "cand_id",
            f"round({dot_sql('v', 'qv')} / (sqrt({dot_sql('v', 'v')}) * "
            f"sqrt({dot_sql('qv', 'qv')})), 6) AS cos_sim",
        )
        .withColumn("rank", F.row_number().over(w_exact))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    codebook_ids: list[int],
    m: int = 8,
    dsub: int = 8,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """ANN via product quantization + exact re-rank: the standard
    compressed-domain search for corpora whose raw vectors don't fit
    hot storage (FAISS's IVFPQ building block).

    The vector space is split into ``m`` subspaces of ``dsub`` dims;
    each subspace gets its own codebook. With ``train_iters=0`` the
    codebook is the deterministic subvectors of ``codebook_ids``
    corpus rows (sampled codebooks, the training-free PQ variant);
    ``train_iters>0`` runs per-subspace Lloyd's from those seeds
    (:func:`_pq_cb_trained`) — the trained variant that lifted
    measured recall@10 from 0.28 to 0.82 at the bench operating
    point (ksub=32, rerank_factor=16). A vector encodes as m small
    codes (m bytes at ksub <= 256 — 32x compression of a 64-dim
    float32 vector); a query scans CODES, not vectors, via its ADC
    table: approx ||q - x||^2 = sum_s qd2[s, code_s(x)].

    Scale shape (100 TB):
    - codebooks and ADC tables are m x |codebook| rows — broadcast-
      sized BY CONSTRUCTION, independent of corpus size;
    - encoding is one broadcast join + a min-struct aggregate (no
      window over the corpus, no shuffle of the vectors themselves);
    - the approximate scan carries (id, sub, code) rows — the
      compressed relation — through one map-side-combined sum;
    - only the rerank_factor*k shortlist rides a join back to the
      raw vectors (broadcast of query x shortlist ids).
    Determinism: every compared quantity is ROUND(.., 6) with
    ascending-id tie-breaks, mirrored in :func:`pq_topk_sql`.
    """
    enc, qtab = _pq_enc_qtab(
        embeddings, query_ids, codebook_ids, m, dsub, id_col, vec_col,
        train_iters, codebook,
    )
    scored = enc.join(
        F.broadcast(qtab),
        (F.col("sub") == F.col("qsub")) & (F.col("code") == F.col("qcid")),
    )
    cands = _pq_adc_cands(scored, id_col, rerank_factor * k)
    return _pq_exact_rerank(embeddings, cands, query_ids, k, id_col, vec_col)


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    centroid_ids: list[int],
    codebook_ids: list[int],
    m: int = 8,
    dsub: int = 8,
    k: int = 5,
    nprobe: int = 2,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    coarse_train_iters: int = 0,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """IVF + PQ composed — the actual FAISS IVFPQ shape: a coarse
    quantizer restricts each query to ``nprobe`` cells, PQ's ADC
    table scores only the CODES inside those cells, and the
    shortlist re-ranks exactly.

    This stacks the two independent cost reductions: IVF cuts the
    candidate count to ~|corpus| * nprobe / |centroids|; PQ makes
    each surviving candidate cost an m-term table lookup on an m-byte
    code instead of a d-dim float scan. At 100 TB both matter — the
    scan reads the codes table (32x smaller), and only the probed
    fraction of it. All broadcast relations (centroids, codebooks,
    ADC tables, probe pairs) are bounded by constructions independent
    of corpus size; the one corpus-sized relation in flight is
    (id, sub, code, cell).

    ``train_iters`` trains the PQ codebooks (:func:`_pq_cb_trained`);
    ``coarse_train_iters`` trains the coarse quantizer with spherical
    k-means from the ``centroid_ids`` seeds (:func:`_kmeans_centroids`).
    The recall ceiling of the COARSE stage is the binding constraint:
    cell-recall can't exceed what the probed corpus fraction covers,
    so the nlist/nprobe pair is the knob that sets it (bench publishes
    the measured point: 8 trained cells, nprobe=4 -> 0.66 recall@10).
    """
    _, assign, probe = _ivf_assign(
        embeddings, centroid_ids, query_ids, nprobe, id_col, vec_col,
        coarse_train_iters, dim=m * dsub,
    )

    enc, qtab = _pq_enc_qtab(
        embeddings, query_ids, codebook_ids, m, dsub, id_col, vec_col,
        train_iters, codebook,
    )
    # cell-restricted candidate space: codes of vectors whose cell is
    # probed by the query — the probe relation (queries x nprobe) is
    # broadcast; the join fans each code row only to the queries that
    # probe its cell
    in_cells = enc.join(assign, id_col).join(
        F.broadcast(probe), F.col("cell") == F.col("qcell")
    )
    scored = in_cells.join(
        F.broadcast(qtab),
        (F.col("sub") == F.col("qsub"))
        & (F.col("code") == F.col("qcid"))
        & (F.col("p_qid") == F.col("query_id")),
    )
    cands = _pq_adc_cands(scored, id_col, rerank_factor * k)
    return _pq_exact_rerank(embeddings, cands, query_ids, k, id_col, vec_col)


#: REDUCED comparison form (cvv - 2ab) — the same shape as
#: :func:`_with_cvv` on the Spark side: the dropped dot(a,a) term is
#: constant across the candidates of any ranking this feeds.
_PQ_D2R = "ROUND({bb} - 2 * list_dot_product({a}, {b}), 6)"


def _pq_cb_chain_sql(
    codebook_ids: list[int], train_iters: int, src: str = "subs"
) -> tuple[str, str]:
    """The (cb_chain, cb_final) CTE pair: seed codebooks from the
    ``src`` subvector relation's ``codebook_ids`` rows, then unroll
    ``train_iters`` per-subspace Lloyd rounds (assign -> per-position
    mean -> reassemble with ROUND(mu, 6)). Parameterized on ``src``
    so the residual twin trains on ``rsubs`` (residual subvectors)
    with the SAME text the raw twins emit over ``subs``."""
    cs = ", ".join(str(i) for i in codebook_ids)
    cb_chain = f"""cb0 AS (SELECT sub, vec_id AS cid, sv AS cv,
              list_dot_product(sv, sv) AS cvv FROM {src}
       WHERE vec_id IN ({cs}))"""
    for i in range(1, train_iters + 1):
        cb_chain += f""",
pw{i} AS (
  SELECT vec_id, sub, cid FROM (
    SELECT e.vec_id, e.sub, c.cid,
           row_number() OVER (PARTITION BY e.vec_id, e.sub
             ORDER BY {_PQ_D2R.format(bb="c.cvv", a="e.sv", b="c.cv")} ASC,
                      c.cid ASC) AS rk
    FROM {src} e JOIN cb{i - 1} c ON e.sub = c.sub
  ) WHERE rk = 1
),
pu{i} AS (
  SELECT sub, cid, pos, AVG(val) AS mu
  FROM (SELECT s.sub, w.cid, unnest(s.sv) AS val,
               generate_subscripts(s.sv, 1) AS pos
        FROM {src} s JOIN pw{i} w ON s.vec_id = w.vec_id AND s.sub = w.sub)
  GROUP BY sub, cid, pos
),
cb{i} AS (SELECT sub, cid, cv, list_dot_product(cv, cv) AS cvv FROM (
  SELECT sub, cid, list(ROUND(mu, 6) ORDER BY pos) AS cv
  FROM pu{i} GROUP BY sub, cid))"""
    cb_final = (
        f"cb AS (SELECT sub, cid, cv, cvv FROM cb{train_iters})"
        if train_iters > 0
        else "cb AS (SELECT sub, cid, cv, cvv FROM cb0)"
    )
    return cb_chain, cb_final


def _pq_sql_prefix(query_ids: list[int], codebook_ids: list[int],
                   m: int, dsub: int, train_iters: int = 0) -> str:
    """Shared CTE prefix (emb/subs/cb/enc/qtab) for both PQ twins —
    one definition, like :func:`_pq_enc_qtab` on the Spark side.
    ``train_iters`` > 0 unrolls the per-subspace Lloyd rounds of
    :func:`_pq_cb_trained` into one CTE chain per round (assign ->
    per-position mean -> reassemble with ROUND(mu, 6)), the same
    fixed-iteration mirroring as kmeans_assign_sql."""
    qs = ", ".join(str(i) for i in query_ids)
    cb_chain, cb_final = _pq_cb_chain_sql(codebook_ids, train_iters)
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
subs AS (
  SELECT vec_id, s.range AS sub,
         list_slice(v, s.range * {dsub} + 1, (s.range + 1) * {dsub}) AS sv
  FROM emb, range(0, {m}) s
),
{cb_chain},
{cb_final},
enc AS (
  SELECT vec_id, sub, cid AS code FROM (
    SELECT e.vec_id, e.sub, c.cid,
           row_number() OVER (PARTITION BY e.vec_id, e.sub
             ORDER BY {_PQ_D2R.format(bb="c.cvv", a="e.sv", b="c.cv")} ASC,
                      c.cid ASC) AS rk
    FROM subs e JOIN cb c ON e.sub = c.sub
  ) WHERE rk = 1
),
qtab AS (
  SELECT q.vec_id AS query_id, q.sub, c.cid,
         {_PQ_D2R.format(bb="c.cvv", a="q.sv", b="c.cv")} AS qd2
  FROM subs q JOIN cb c ON q.sub = c.sub
  WHERE q.vec_id IN ({qs})
)"""


def _pq_sql_tail(k: int, shortlist: int) -> str:
    """Shared shortlist + exact-rerank tail (expects an `approx` CTE
    with (query_id, cand_id, ad2))."""
    return f""",
cands AS (
  SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY ad2 ASC, cand_id ASC) AS ark
    FROM approx
  ) WHERE ark <= {shortlist}
)
SELECT query_id, cand_id, cos_sim, rank FROM (
  SELECT c.query_id, c.cand_id,
         ROUND(list_dot_product(e.v, q.v)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q.v, q.v))), 6) AS cos_sim,
         row_number() OVER (PARTITION BY c.query_id
           ORDER BY ROUND(list_dot_product(e.v, q.v)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q.v, q.v))), 6) DESC,
             c.cand_id ASC) AS rank
  FROM cands c
  JOIN emb e ON e.vec_id = c.cand_id
  JOIN emb q ON q.vec_id = c.query_id
) WHERE rank <= {k}
"""


def pq_topk_sql(
    query_ids: list[int],
    codebook_ids: list[int],
    m: int = 8,
    dsub: int = 8,
    k: int = 5,
    rerank_factor: int = 4,
    train_iters: int = 0,
) -> str:
    """DuckDB twin of :func:`pq_topk` — same slices, same expanded-
    form distances, same 6-dp rounding and tie-breaks, same unrolled
    Lloyd rounds when ``train_iters`` > 0."""
    return (
        _pq_sql_prefix(query_ids, codebook_ids, m, dsub, train_iters)
        + """,
approx AS (
  SELECT t.query_id, e.vec_id AS cand_id, ROUND(SUM(t.qd2), 6) AS ad2
  FROM enc e JOIN qtab t ON e.sub = t.sub AND e.code = t.cid
  WHERE e.vec_id != t.query_id
  GROUP BY t.query_id, e.vec_id
)"""
        + _pq_sql_tail(k, rerank_factor * k)
    )


def ivfpq_topk_sql(
    query_ids: list[int],
    centroid_ids: list[int],
    codebook_ids: list[int],
    m: int = 8,
    dsub: int = 8,
    k: int = 5,
    nprobe: int = 2,
    rerank_factor: int = 4,
    train_iters: int = 0,
    coarse_train_iters: int = 0,
    filter_pred: str | None = None,
) -> str:
    """DuckDB twin of :func:`ivfpq_topk` — the PQ prefix plus the
    coarse-cell assignment/probe restriction; ``coarse_train_iters``
    unrolls the spherical-k-means rounds of :func:`_kmeans_centroids`
    (unit vectors, ROUND(cos, 6)/cell-asc winners, per-position mean,
    renormalize with ROUND(x/mn, 6) coordinates).

    ``filter_pred`` mirrors ``ivfpq_query_index(filter_ids=...)``:
    the attribute PRE-filter semi-joins the encoded candidates
    BEFORE the ADC aggregation (so the shortlist is ranked over
    filtered candidates and never k-deflates), composing with the
    probe's cell restriction exactly like the Spark path. None emits
    the byte-identical unfiltered SQL."""
    qs = ", ".join(str(i) for i in query_ids)
    cents = _ivf_cents_sql(centroid_ids, coarse_train_iters)
    flt = (
        f"\n  JOIN (SELECT vec_id FROM embeddings WHERE {filter_pred}) fv"
        "\n    ON fv.vec_id = e.vec_id"
        if filter_pred
        else ""
    )
    return (
        _pq_sql_prefix(query_ids, codebook_ids, m, dsub, train_iters)
        + cents
        + f""",
rankedc AS (
  SELECT e.vec_id, c.ccid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY ROUND(list_dot_product(e.v, c.cv) / (e.n * c.cn), 6)
                    DESC, c.ccid ASC) AS crk
  FROM norm e CROSS JOIN cents c
),
assign AS (SELECT vec_id, ccid AS cell FROM rankedc WHERE crk = 1),
probe AS (SELECT vec_id AS p_qid, ccid AS qcell FROM rankedc
          WHERE crk <= {nprobe} AND vec_id IN ({qs})),
approx AS (
  SELECT t.query_id, e.vec_id AS cand_id, ROUND(SUM(t.qd2), 6) AS ad2
  FROM enc e{flt}
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN probe p ON p.qcell = a.cell
  JOIN qtab t ON e.sub = t.sub AND e.code = t.cid
             AND t.query_id = p.p_qid
  WHERE e.vec_id != t.query_id
  GROUP BY t.query_id, e.vec_id
)"""
        + _pq_sql_tail(k, rerank_factor * k)
    )


def _ivf_cents_sql(centroid_ids: list[int], coarse_train_iters: int) -> str:
    """The coarse-centroid CTE block (norm + cents, preceded by the
    spherical-k-means unroll when trained) — extracted so the
    residual twin shares the EXACT text :func:`ivfpq_topk_sql`
    emits."""
    ces = ", ".join(str(i) for i in centroid_ids)
    if coarse_train_iters > 0:
        km = f""",
unorm AS (
  SELECT vec_id, list_transform(v, x -> x / nrm) AS uv
  FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb)
),
kc0 AS (SELECT vec_id AS cell, uv AS cv FROM unorm WHERE vec_id IN ({ces}))"""
        for i in range(1, coarse_train_iters + 1):
            km += f""",
kw{i} AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, c.cell,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY ROUND(list_dot_product(n.uv, c.cv), 6) DESC,
                      c.cell ASC) AS rk
    FROM unorm n CROSS JOIN kc{i - 1} c
  ) WHERE rk = 1
),
ku{i} AS (
  SELECT cell, pos, AVG(val) AS mu
  FROM (SELECT w.cell, unnest(n.uv) AS val,
               generate_subscripts(n.uv, 1) AS pos
        FROM unorm n JOIN kw{i} w ON n.vec_id = w.vec_id)
  GROUP BY cell, pos
),
km{i} AS (SELECT cell, list(mu ORDER BY pos) AS mv FROM ku{i} GROUP BY cell),
kc{i} AS (
  SELECT cell, list_transform(mv, x -> ROUND(x / mn, 6)) AS cv
  FROM (SELECT cell, mv, sqrt(list_dot_product(mv, mv)) AS mn FROM km{i})
  WHERE mn > 0
)"""
        cents = (
            km
            + f""",
norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM emb),
cents AS (SELECT cell AS ccid, cv,
                 sqrt(list_dot_product(cv, cv)) AS cn
          FROM kc{coarse_train_iters})"""
        )
    else:
        cents = f""",
norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM emb),
cents AS (SELECT vec_id AS ccid, v AS cv, n AS cn FROM norm
          WHERE vec_id IN ({ces}))"""
    return cents


def ivfpq_residual_topk_sql(
    query_ids: list[int],
    centroid_ids: list[int],
    codebook_ids: list[int],
    m: int = 8,
    dsub: int = 8,
    k: int = 5,
    nprobe: int = 2,
    rerank_factor: int = 4,
    train_iters: int = 0,
    coarse_train_iters: int = 0,
) -> str:
    """DuckDB twin of the RESIDUAL (IVFADC) index search — the same
    coarse stage as :func:`ivfpq_topk_sql` (shared text via
    :func:`_ivf_cents_sql`), but codebooks train on and codes encode
    each vector's unit-space residual against its assigned centroid
    (:func:`_residual_vectors`), and the query ADC table is
    per-(query, probed cell) carrying the FULL |rq|^2 term
    (:func:`_residual_qtab` — the reduced form's dropped constant
    varies per cell). Value-identical to
    ``ivfpq_build_index(residual=True)`` + ``ivfpq_query_index``
    under the same training parameters."""
    qs = ", ".join(str(i) for i in query_ids)
    cb_chain, cb_final = _pq_cb_chain_sql(
        codebook_ids, train_iters, src="rsubs"
    )
    return (
        f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"""
        + _ivf_cents_sql(centroid_ids, coarse_train_iters)
        + f""",
rankedc AS (
  SELECT e.vec_id, c.ccid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY ROUND(list_dot_product(e.v, c.cv) / (e.n * c.cn), 6)
                    DESC, c.ccid ASC) AS crk
  FROM norm e CROSS JOIN cents c
),
assign AS (SELECT vec_id, ccid AS cell FROM rankedc WHERE crk = 1),
probe AS (SELECT vec_id AS p_qid, ccid AS qcell FROM rankedc
          WHERE crk <= {nprobe} AND vec_id IN ({qs})),
uvecs AS (SELECT vec_id, list_transform(v, x -> x / n) AS u FROM norm),
cunit AS (SELECT ccid, list_transform(cv, x -> x / cn) AS cu FROM cents),
res AS (
  SELECT a.vec_id, a.cell,
         list_transform(list_zip(u.u, c.cu), s -> s[1] - s[2]) AS rv
  FROM assign a
  JOIN uvecs u ON u.vec_id = a.vec_id
  JOIN cunit c ON c.ccid = a.cell
),
rsubs AS (
  SELECT vec_id, cell, s.range AS sub,
         list_slice(rv, s.range * {dsub} + 1, (s.range + 1) * {dsub}) AS sv
  FROM res, range(0, {m}) s
),
{cb_chain},
{cb_final},
enc AS (
  SELECT vec_id, cell, sub, cid AS code FROM (
    SELECT e.vec_id, e.cell, e.sub, c.cid,
           row_number() OVER (PARTITION BY e.vec_id, e.sub
             ORDER BY {_PQ_D2R.format(bb="c.cvv", a="e.sv", b="c.cv")} ASC,
                      c.cid ASC) AS rk
    FROM rsubs e JOIN cb c ON e.sub = c.sub
  ) WHERE rk = 1
),
qres AS (
  SELECT p.p_qid, p.qcell,
         list_transform(list_zip(u.u, c.cu), s -> s[1] - s[2]) AS rq
  FROM probe p
  JOIN uvecs u ON u.vec_id = p.p_qid
  JOIN cunit c ON c.ccid = p.qcell
),
qsubs AS (
  SELECT p_qid, qcell, s.range AS sub,
         list_slice(rq, s.range * {dsub} + 1, (s.range + 1) * {dsub}) AS sv
  FROM qres, range(0, {m}) s
),
qtab AS (
  SELECT q.p_qid AS query_id, q.qcell, q.sub, c.cid,
         ROUND(list_dot_product(q.sv, q.sv) + c.cvv
               - 2 * list_dot_product(q.sv, c.cv), 6) AS qd2
  FROM qsubs q JOIN cb c ON q.sub = c.sub
),
approx AS (
  SELECT t.query_id, e.vec_id AS cand_id, ROUND(SUM(t.qd2), 6) AS ad2
  FROM enc e
  JOIN qtab t ON e.cell = t.qcell AND e.sub = t.sub AND e.code = t.cid
  WHERE e.vec_id != t.query_id
  GROUP BY t.query_id, e.vec_id
)"""
        + _pq_sql_tail(k, rerank_factor * k)
    )


# ---------------------------------------------------------------------------
# PQ index lifecycle: build once, query many


def _pq_pack(enc: DataFrame, sorted_ids: list[int], id_col: str) -> DataFrame:
    """Pack (id, sub, code) rows into one codes array per vector,
    translating each code (a codebook member's corpus id) into its
    DENSE index in ``sorted_ids`` — raw ids are unbounded bigints;
    dense indexes fit smallint at any corpus scale. Shared by build
    and append so the two writers cannot pack differently."""
    ids = F.lit(sorted_ids)
    return (
        enc.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc"))
        .select(
            id_col,
            F.transform(
                "sc",
                lambda s: (F.array_position(ids, s["code"]) - 1).cast(
                    "smallint"
                ),
            ).alias("codes"),
        )
    )


def _check_ids_present(
    embeddings: DataFrame, ids: list[int], id_col: str, what: str
) -> None:
    """Fail a build whose seed rows are missing from the corpus — a
    silently smaller codebook/centroid set would encode every vector
    with different (and worse) codes than the caller specified."""
    present = (
        embeddings.filter(F.col(id_col).isin(ids))
        .select(id_col)
        .distinct()
        .count()
    )
    if present != len(set(ids)):
        raise ValueError(
            f"{what} rows missing from corpus: expected "
            f"{len(set(ids))}, found {present}"
        )


def pq_build_index(
    embeddings: DataFrame,
    path: str,
    codebook_ids: list[int],
    m: int = 8,
    dsub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
) -> dict:
    """Materialize the PQ index: packed code vectors + codebooks +
    meta sidecar. At deployment the encode pass runs ONCE; every
    query afterwards scans the codes table — m smallint codes per
    vector (vs d float32s raw), the compression that makes the
    compressed-domain scan pay at 100 TB.

    Layout: ``path/codes`` (id, codes array<smallint> ordered by
    subspace — DENSE 0..ksub-1 indexes into the sorted codebook-id
    list, NOT raw corpus ids, so smallint can never overflow however
    large the corpus ids grow), ``path/codebook`` (sub, cid, cv), and
    ``path/_pq_meta.json`` (m, dsub, codebook ids) so a reader needs
    no out-of-band knowledge (same self-describing contract as the
    Z-order sidecar).
    """
    import json

    _check_ids_present(embeddings, codebook_ids, id_col, "codebook")
    # The trained path is THE production deployment: Lloyd's runs
    # once here, the trained codebook persists next to the codes, and
    # pq_query_index / pq_index_append consume the STORED relation —
    # they are codebook-agnostic, so query and append never pay (or
    # even know about) the training cost.
    if train_iters > 0:
        cb = _pq_cb_trained(
            embeddings, codebook_ids, m, dsub, id_col, vec_col, train_iters
        )
    else:
        cb = _pq_cb(embeddings, codebook_ids, m, dsub, id_col, vec_col)
    enc = _pq_enc_from(embeddings, cb, m, dsub, id_col, vec_col)
    packed = _pq_pack(enc, sorted(set(codebook_ids)), id_col)
    spark = embeddings.sparkSession
    packed.write.mode("overwrite").parquet(fsio.join(path, "codes"))
    cb.write.mode("overwrite").parquet(fsio.join(path, "codebook"))
    _write_codes_ptr(spark, path, "codes")
    meta = {"m": m, "dsub": dsub, "codebook_ids": list(codebook_ids),
            "id_col": id_col, "train_iters": train_iters}
    fsio.write_text(spark, fsio.join(path, "_pq_meta.json"), json.dumps(meta))
    return meta


def pq_query_index(
    spark,
    path: str,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    rerank_factor: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted PQ index: the corpus is never re-encoded —
    the codes table unpacks (posexplode) straight into the ADC join.
    ``embeddings`` supplies only the query vectors and the exact
    re-rank lookups. Value-identical to the inline :func:`pq_topk`
    (pinned in tests/test_llmdata.py)."""
    import json

    meta = json.loads(
        fsio.read_text(spark, fsio.join(path, "_pq_meta.json"))
    )
    if meta.get("residual"):
        raise ValueError(
            "residual-encoded (IVFADC) index: codes live in per-cell "
            "residual space — a flat raw-space ADC table would mix "
            "spaces; query via ivfpq_query_index"
        )
    m, dsub, id_col = meta["m"], meta["dsub"], meta["id_col"]
    sorted_ids = sorted(set(meta["codebook_ids"]))

    # unpack and translate DENSE indexes back to codebook cids
    enc = (
        spark.read.parquet(_codes_dir(spark, path))
        .select(id_col, F.posexplode("codes").alias("sub", "cidx"))
        .select(
            id_col,
            "sub",
            F.element_at(
                F.lit(sorted_ids), F.col("cidx").cast("int") + 1
            ).alias("code"),
        )
    )
    cb = spark.read.parquet(fsio.join(path, "codebook"))
    qtab = _pq_qtab(embeddings, query_ids, cb, m, dsub, id_col, vec_col)
    scored = enc.join(
        F.broadcast(qtab),
        (F.col("sub") == F.col("qsub")) & (F.col("code") == F.col("qcid")),
    )
    cands = _pq_adc_cands(scored, id_col, rerank_factor * k)
    return _pq_exact_rerank(embeddings, cands, query_ids, k, id_col, vec_col)


def pq_index_append(
    spark,
    path: str,
    delta: DataFrame,
    vec_col: str = "embedding",
) -> int:
    """Incremental index maintenance: encode ONLY the delta vectors
    under the index's PINNED codebooks (meta sidecar) and append
    their packed codes — existing code files are never rewritten,
    the same delta-scoped I/O contract as the Z-order compaction and
    the upsert sink's buckets. Returns the number of rows appended.

    The pinned codebooks are the PQ analog of the pinned
    quantization frame: new vectors far from the training
    distribution encode with higher distortion (monitor recall; a
    full rebuild refreshes the codebooks), but existing codes keep
    their meaning, so old and new rows remain directly comparable
    under one ADC table.

    Idempotent under re-delivery: delta ids already present in the
    index are SKIPPED (anti-join against the existing ids) — a
    blind append after a partially-failed run would double every
    duplicate's ADC sum and silently corrupt rankings. Returns the
    number of rows actually appended.
    """
    import json

    meta = json.loads(
        fsio.read_text(spark, fsio.join(path, "_pq_meta.json"))
    )
    m, dsub, id_col = meta["m"], meta["dsub"], meta["id_col"]
    sorted_ids = sorted(set(meta["codebook_ids"]))
    cb = spark.read.parquet(fsio.join(path, "codebook"))

    codes = _codes_dir(spark, path)
    existing = spark.read.parquet(codes).select(id_col)
    # cache: the IVF branch references `fresh` from TWO subtrees
    # (encode + cell assignment), and even the flat branch's
    # count+write pair must observe ONE snapshot — a non-deterministic
    # delta source (sampled/changing table) would otherwise pair one
    # snapshot's codes with another's cells, or desync the returned n
    # from the written rows (r8 review finding).
    fresh = delta.join(existing, id_col, "left_anti").cache()
    try:
        if "ivf" in meta:
            # IVF-partitioned layout: delta rows assign to their
            # coarse cell under the PINNED stored centroids (the same
            # pinned-frame contract as the codebooks) and append into
            # the matching cell=<id>/ partitions — existing
            # partitions' files are never rewritten.
            cents = _read_cents(spark, path)
            assign = (
                _cell_ranked(_norm3(fresh, id_col, vec_col), cents, id_col)
                .filter(F.col("crk") == 1)
                .select(id_col, F.col("ccid").alias("cell"))
            )
            if meta.get("residual"):
                # IVFADC index: the delta encodes its RESIDUAL
                # against the pinned centroid, like the build did
                src = _residual_vectors(
                    _norm3(fresh, id_col, vec_col), assign, cents, id_col
                )
                enc = _pq_enc_from(src, cb, m, dsub, id_col, "rv")
            else:
                enc = _pq_enc_from(fresh, cb, m, dsub, id_col, vec_col)
            packed = _pq_pack(enc, sorted_ids, id_col).join(assign, id_col)
        else:
            enc = _pq_enc_from(fresh, cb, m, dsub, id_col, vec_col)
            packed = _pq_pack(enc, sorted_ids, id_col)
        packed = packed.cache()
        try:
            n = packed.count()
            if n:
                w = packed.write.mode("append")
                if "ivf" in meta:
                    w = w.partitionBy("cell")
                w.parquet(codes)
        finally:
            packed.unpersist()
    finally:
        fresh.unpersist()
    return n


# ---------------------------------------------------------------------------
# IVF-partitioned PQ index: codes laid out by coarse cell so a query
# READS only its probed partitions (VERDICT r7 ask #1 — the flat
# pq_query_index scans every packed code; at 100 TB the whole point
# of IVF is that the storage layout prunes)


#: Pointer file naming the LIVE codes directory of a persisted index.
#: Builds write it as "codes"; compaction commits a rewritten
#: ``codes_v<suffix>`` dir by atomically replacing this pointer
#: (fsio.replace_text) — never by renaming directories, which no
#: object store does atomically and which left a no-live-codes crash
#: window between the old rename pair (r10 advisor).
_CODES_PTR = "_codes_ptr.json"


def _write_codes_ptr(spark, path: str, name: str) -> None:
    import json

    fsio.replace_text(
        spark, fsio.join(path, _CODES_PTR), json.dumps({"live": name})
    )


def _codes_dir(spark, path: str) -> str:
    """Resolve the live codes directory of a persisted index:
    pointer-file indirection when present (post-compaction), the
    build-time ``codes/`` default otherwise (pre-r11 indexes)."""
    import json

    txt = fsio.read_text_or_recover(spark, fsio.join(path, _CODES_PTR))
    name = json.loads(txt)["live"] if txt else "codes"
    return fsio.join(path, name)


def _read_cents(spark, path: str) -> DataFrame:
    """The stored coarse-centroid relation (ccid, cv, cn) of an
    IVF-partitioned index — one reader shared by query and append so
    the two consumers derive cn identically."""
    return spark.read.parquet(fsio.join(path, "centroids")).select(
        F.col("cell").alias("ccid"),
        "cv",
        F.sqrt(dot(F.col("cv"), F.col("cv"))).alias("cn"),
    )


def ivfpq_index_stats(spark, path: str) -> dict:
    """Per-cell health of a persisted IVF(PQ) index — the inputs to
    the maintenance decisions: row/file/byte counts per
    ``codes/cell=<id>/`` partition, the row-imbalance factor
    (max/mean — skewed cells mean the coarse quantizer no longer fits
    the data), and the mean files-per-cell (appends only ever ADD
    files — :func:`pq_index_append` — so file counts grow without
    bound until compaction). One scan for the row counts (grouped on
    the partition column, so it prunes nothing but reads only
    footers + the id column) plus a filesystem walk for file/byte
    counts — through the Hadoop FileSystem API (operators/fsio), so
    the walk works wherever Spark itself reads the index (local,
    ``file://``, HDFS, object stores), not just driver-local disk
    (VERDICT r10 ask #7)."""
    codes = _codes_dir(spark, path)
    rows = {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(codes)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    files, bytes_ = {}, {}
    for entry in fsio.listdir(spark, codes):
        name = entry["name"]
        if not (entry["is_dir"] and name.startswith("cell=")):
            continue
        cell = int(name.split("=", 1)[1])
        fs = [
            f
            for f in fsio.listdir(spark, fsio.join(codes, name))
            if f["name"].endswith(".parquet")
        ]
        files[cell] = len(fs)
        bytes_[cell] = sum(f["size"] for f in fs)
    n_cells = len(rows)
    total = sum(rows.values())
    mean_rows = total / n_cells if n_cells else 0.0
    return {
        "n_cells": n_cells,
        "rows_total": total,
        "rows_max": max(rows.values(), default=0),
        "imbalance": round(max(rows.values(), default=0) / mean_rows, 4)
        if mean_rows
        else 0.0,
        "files_total": sum(files.values()),
        "files_per_cell_mean": round(
            sum(files.values()) / n_cells, 4
        )
        if n_cells
        else 0.0,
        "files_per_cell_max": max(files.values(), default=0),
        "bytes_total": sum(bytes_.values()),
        "rows_by_cell": rows,
        "files_by_cell": files,
    }


def ivfpq_index_compact(spark, path: str) -> dict:
    """Small-file compaction for an appended IVF(PQ) index: rewrite
    the codes relation so each cell partition holds ONE file again
    (``repartition("cell")`` hashes every row of a cell into the same
    task, so the partitioned write emits exactly one file per cell),
    leaving codebooks/centroids/meta untouched — codes are re-laid-
    out, never re-encoded, so query results are bit-identical
    (pytest-pinned) and the operation is pure I/O hygiene.

    Why it matters at 100 TB: every append adds >= 1 file per touched
    cell and a probe must open every file of every probed cell —
    after k appends a nprobe-cell query pays k*nprobe file opens +
    footer reads for the same bytes. Compaction restores the
    1-file-per-cell floor the build wrote. (On a cluster this write
    is the same cell-partitioned shuffle as the build's.)

    Commit protocol (r10 advisor: the old rename-pair swap had a
    crash window with NO live codes dir): the rewrite lands in a
    fresh ``codes_v<suffix>`` dir, a ROW-COUNT EQUALITY check gates
    it, and the COMMIT POINT is one atomic pointer-file replace
    (:data:`_CODES_PTR` via fsio.replace_text) — directories are
    never renamed. A crash before the pointer swap leaves the live
    index untouched (the orphan rewrite is swept by the next
    compact); a crash after it leaves only the superseded dir to
    sweep. All filesystem access goes through the Hadoop FileSystem
    API (operators/fsio), so the same code path serves local disk,
    ``file://`` URIs, HDFS and object stores. Returns before/after
    stats (files_total, bytes_total, rows_total).

    SINGLE MAINTENANCE WRITER assumption (r11 ADVICE): the entry
    sweep deletes every non-live ``codes*``/``codes_v*`` dir, so a
    SECOND concurrent compaction (or an append racing a compact)
    could have its in-flight ``codes_v*`` dir deleted before its
    pointer commit. Run compaction from one maintenance process per
    index — the same serialized-maintenance-window contract as the
    upsert sink's delete/GC path. (Readers are always safe: they
    resolve the pointer, which only ever names a fully written dir.)
    """
    import uuid

    def _sweep(live_name: str) -> None:
        # reclaim crash leftovers: every codes dir that is not live —
        # superseded lives ("codes", "codes_v*") and pre-r11 tmp
        # debris ("codes.compact.*", "codes.old.*")
        for entry in fsio.listdir(spark, path):
            n = entry["name"]
            if not entry["is_dir"] or n == live_name:
                continue
            if (
                n == "codes"
                or n.startswith("codes_v")
                or n.startswith("codes.compact.")
                or n.startswith("codes.old.")
            ):
                fsio.delete(spark, fsio.join(path, n))

    live = _codes_dir(spark, path)
    live_name = live.rstrip("/").rsplit("/", 1)[-1]
    _sweep(live_name)
    before = ivfpq_index_stats(spark, path)
    new_name = f"codes_v{uuid.uuid4().hex[:8]}"
    new = fsio.join(path, new_name)
    df = spark.read.parquet(live)
    df.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(new)
    n_new = spark.read.parquet(new).count()
    if n_new != before["rows_total"]:
        fsio.delete(spark, new)
        raise RuntimeError(
            f"compaction row-count mismatch: {n_new} != "
            f"{before['rows_total']} — live codes left untouched"
        )
    _write_codes_ptr(spark, path, new_name)  # THE commit point
    fsio.delete(spark, live)
    after = ivfpq_index_stats(spark, path)
    return {
        "rows_total": after["rows_total"],
        "files_before": before["files_total"],
        "files_after": after["files_total"],
        "bytes_before": before["bytes_total"],
        "bytes_after": after["bytes_total"],
        "files_per_cell_max_after": after["files_per_cell_max"],
    }


#: Maintenance decision thresholds: compact when the mean cell has
#: accumulated more than this many files (each probe pays
#: files-per-cell file opens per probed cell); flag retrain when the
#: largest cell exceeds this multiple of the mean (the coarse
#: quantizer no longer balances the corpus, so nprobe/nlist stops
#: predicting bytes read — the measured pruning fraction degrades
#: toward the hot cell's share).
IVF_COMPACT_FILES_PER_CELL = 2.0
IVF_RETRAIN_IMBALANCE = 4.0


def ivf_maintenance_decision(
    stats: dict,
    files_per_cell: float = IVF_COMPACT_FILES_PER_CELL,
    imbalance: float = IVF_RETRAIN_IMBALANCE,
) -> dict:
    """The ``bloom_pays``-style measured decision for index
    maintenance, off :func:`ivfpq_index_stats` evidence: COMPACT is
    cheap (I/O re-layout, results identical) and recommended as soon
    as appends have fragmented cells; RETRAIN is expensive (new
    centroids re-partition the corpus; a residual index also
    re-encodes) and recommended only when cell skew says the pinned
    quantizer has drifted off the data distribution."""
    return {
        "compact": stats["files_per_cell_mean"] > files_per_cell,
        "retrain": stats["imbalance"] > imbalance,
        "evidence": {
            "files_per_cell_mean": stats["files_per_cell_mean"],
            "files_per_cell_threshold": files_per_cell,
            "imbalance": stats["imbalance"],
            "imbalance_threshold": imbalance,
            "n_cells": stats["n_cells"],
            "rows_total": stats["rows_total"],
        },
    }


#: residual="auto" decision threshold: residual-encode when the
#: covariance spectrum's PARTICIPATION RATIO (sum(lambda))^2 /
#: sum(lambda^2) — the effective dimensionality of the cloud — falls
#: below this fraction of the ambient dimension. Measured calibration
#: (sf0.01 driver embeddings + operators/synth.py mixtures, d=64):
#: isotropic corpora sit at 0.88-0.97 (driver 0.88, sep0 0.97) where
#: residual encoding LOSES recall (r9: 0.69 vs raw 0.88); clustered
#: corpora sit at <= 0.49 (sep1 0.49, sep4 0.20) where it WINS
#: (sep4: 0.95 vs 0.75). 0.66 splits the measured regimes with
#: margin on both sides.
RESIDUAL_AUTO_PR_FRAC = 0.66


def residual_auto_decision(
    embeddings: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    threshold: float = RESIDUAL_AUTO_PR_FRAC,
) -> tuple[bool, dict]:
    """The ``bloom_pays``-style measured decision rule for IVFADC
    residual encoding (VERDICT r9 ask #3): estimate corpus anisotropy
    from the d x d covariance eigen-spectrum (the one-pass
    Gram+mean fit of ``linalg.pca_components`` — dimension-bounded
    collect, eigh on the driver) and residual-encode iff the
    spectrum's effective dimensionality is below ``threshold * dim``.

    Why this statistic: residual codebooks pay off exactly when
    coarse cells absorb real structure — i.e. when variance
    concentrates in few directions (cluster centers). The
    participation ratio measures that concentration scale-freely
    (invariant to global variance), unlike the raw top eigenvalue.

    Returns (use_residual, evidence) — evidence goes into the index
    meta sidecar so the decision is auditable at query time.
    """
    from ts_data_pipeline_spark.operators import linalg

    _comps, vals, _mu = linalg.pca_components(
        embeddings, vec_col, dim, k=dim
    )
    tot = sum(vals)
    pr = (tot * tot) / sum(v * v for v in vals) if tot > 0 else float(dim)
    pr_frac = pr / dim
    use_residual = pr_frac < threshold
    return use_residual, {
        "rule": "participation_ratio",
        "pr_frac": round(pr_frac, 4),
        "top_eig_share": round(vals[0] / tot, 4) if tot > 0 else None,
        "threshold": threshold,
        "dim": dim,
        "decision": "residual" if use_residual else "raw",
    }


def ivfpq_build_index(
    embeddings: DataFrame,
    path: str,
    codebook_ids: list[int],
    centroid_ids: list[int],
    m: int = 8,
    dsub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    coarse_train_iters: int = 0,
    residual: bool | str = False,
    cents: DataFrame | None = None,
) -> dict:
    """Materialize the IVFPQ index: packed code vectors PARTITIONED
    BY COARSE CELL (``codes/cell=<id>/``), plus codebooks, trained
    centroids, and the meta sidecar. Training (PQ Lloyd's per
    subspace + spherical k-means for the coarse quantizer) runs ONCE
    here; queries read the stored relations.

    ``residual=True`` builds a true IVFADC index (Jégou et al. 2011):
    codebooks are trained on, and codes encode, each vector's
    UNIT-SPACE RESIDUAL against its assigned coarse centroid
    (:func:`_residual_vectors`) instead of the raw vector. On
    clustered corpora this moves the recall ceiling: whole-corpus
    codebooks spend codewords re-describing cluster means and cannot
    rank within-cluster neighbors (the bench clustered sweep measures
    the flat-PQ cap), while residual codewords describe local detail.
    The flag is recorded in the meta sidecar; queries must go through
    :func:`ivfpq_query_index` (flat ADC over a residual index would
    mix spaces — :func:`pq_query_index` refuses).
    ``residual="auto"`` resolves the flag from the measured corpus
    anisotropy (:func:`residual_auto_decision`) and records the
    evidence under meta["residual_auto"].

    The cell-partitioned layout is what makes IVF pay at rest: a
    query's probed cells become literal values in the codes scan's
    filter, so Spark prunes at the PARTITION level
    (``PartitionFilters`` — pinned in tests/test_llmdata.py) and the
    job reads ~nprobe/nlist of the compressed corpus instead of all
    of it. Assignment uses the SAME rounded-cosine ranking lane as
    the inline search (:func:`_cell_ranked`), so the persisted index
    returns value-identical results to :func:`ivfpq_topk` under the
    same training parameters.

    ``embeddings`` is scanned by two subtrees (encode + cell
    assignment) and must be a DETERMINISTIC relation (a stored table
    — the normal build input); feed non-deterministic deltas through
    :func:`pq_index_append`, which snapshots them.
    """
    import json

    _check_ids_present(embeddings, codebook_ids, id_col, "codebook")
    _check_ids_present(embeddings, centroid_ids, id_col, "centroid")
    residual_auto: dict | None = None
    if residual == "auto":
        # measured decision (residual wins on clustered corpora,
        # loses on isotropic ones — r9 bench): estimate anisotropy
        # once at build time, record the evidence in the sidecar
        residual, residual_auto = residual_auto_decision(
            embeddings, m * dsub, vec_col
        )
    elif not isinstance(residual, bool):
        raise ValueError(
            f"residual must be True, False or 'auto', got {residual!r}"
        )
    if cents is None:
        cents = _coarse_cents(
            embeddings, centroid_ids, id_col, vec_col, coarse_train_iters,
            dim=m * dsub,
        )
        if coarse_train_iters == 0:
            # corpus-row centroids: literalize so the stored relation
            # does not re-scan the corpus (trained ones already are)
            cents = embeddings.sparkSession.createDataFrame(
                cents.collect(), cents.schema
            )
    # else: a precomputed (ccid, cv, cn) relation — e.g. _read_cents
    # of a sibling index built with the SAME centroid parameters, so
    # a residual twin skips retraining the identical coarse stage
    # (r9 review finding: the gate paid the spherical-k-means loop
    # twice per evaluation)
    assign = (
        _cell_ranked(_norm3(embeddings, id_col, vec_col), cents, id_col)
        .filter(F.col("crk") == 1)
        .select(id_col, F.col("ccid").alias("cell"))
    )
    if residual:
        # the encode source becomes the residual relation — lazy by
        # design: each Lloyd round re-derives one broadcast join
        # against the nlist-row centroids (scan-shaped) rather than
        # checkpointing a corpus-sized copy
        src = _residual_vectors(
            _norm3(embeddings, id_col, vec_col), assign, cents, id_col
        )
        src_vec = "rv"
    else:
        src, src_vec = embeddings, vec_col
    if train_iters > 0:
        cb = _pq_cb_trained(
            src, codebook_ids, m, dsub, id_col, src_vec, train_iters
        )
    else:
        cb = _pq_cb(src, codebook_ids, m, dsub, id_col, src_vec)
    enc = _pq_enc_from(src, cb, m, dsub, id_col, src_vec)
    packed = _pq_pack(enc, sorted(set(codebook_ids)), id_col).join(
        assign, id_col
    )
    spark = embeddings.sparkSession
    packed.write.mode("overwrite").partitionBy("cell").parquet(
        fsio.join(path, "codes")
    )
    _write_codes_ptr(spark, path, "codes")
    cb.write.mode("overwrite").parquet(fsio.join(path, "codebook"))
    cents.select(F.col("ccid").alias("cell"), "cv").write.mode(
        "overwrite"
    ).parquet(fsio.join(path, "centroids"))
    meta = {
        "m": m,
        "dsub": dsub,
        "codebook_ids": list(codebook_ids),
        "id_col": id_col,
        "train_iters": train_iters,
        "residual": bool(residual),
        **({"residual_auto": residual_auto} if residual_auto else {}),
        "ivf": {
            "nlist": len(set(centroid_ids)),
            "centroid_ids": list(centroid_ids),
            "coarse_train_iters": coarse_train_iters,
        },
    }
    fsio.write_text(spark, fsio.join(path, "_pq_meta.json"), json.dumps(meta))
    return meta


def ivfpq_query_index(
    spark,
    path: str,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    rerank_factor: int = 4,
    vec_col: str = "embedding",
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Search an IVF-partitioned persisted PQ index reading ONLY the
    probed cells' partitions.

    The probe set is computed against the STORED centroids (the same
    :func:`_cell_ranked` lane as build-time assignment), collected —
    bounded at |queries| x nprobe pairs BY CONSTRUCTION, the same
    justification as the codebook collect — and re-literalized, so
    the probed cell ids become LITERALS in the codes scan's filter.
    That is what turns IVF's logical restriction into physical I/O
    pruning: Catalyst pushes the IN-list to ``PartitionFilters`` and
    the scan lists only ``codes/cell=<probed>/`` directories. Every
    other stage (ADC table, shortlist, exact re-rank) is shared with
    the flat index path, so results are value-identical to
    :func:`ivfpq_topk` under the same training parameters (pinned in
    tests/test_llmdata.py).

    ``filter_ids`` (a single-column DataFrame of allowed candidate
    ids) composes attribute PRE-filtering with the cell pruning: the
    semi-join lands on the (id, cell, sub, code) relation straight
    off the pruned scan, BEFORE the ADC join, so a selective filter
    cuts the compressed-domain work proportionally and the shortlist
    never k-deflates — the filtered-vector-search shape at index
    scale (cf. :func:`filtered_topk` for the exact-scan form)."""
    import json

    meta = json.loads(
        fsio.read_text(spark, fsio.join(path, "_pq_meta.json"))
    )
    if "ivf" not in meta:
        raise ValueError(
            "not an IVF-partitioned index: build with ivfpq_build_index "
            "(pq_query_index searches flat indexes)"
        )
    m, dsub, id_col = meta["m"], meta["dsub"], meta["id_col"]
    sorted_ids = sorted(set(meta["codebook_ids"]))

    cents = _read_cents(spark, path)
    probe_pairs = [
        (int(r["p_qid"]), int(r["qcell"]))
        for r in _cell_ranked(
            _norm3(
                embeddings.filter(F.col(id_col).isin(query_ids)),
                id_col, vec_col,
            ),
            cents, id_col,
        )
        .filter(F.col("crk") <= nprobe)
        .select(F.col(id_col).alias("p_qid"), F.col("ccid").alias("qcell"))
        .collect()
    ]
    cells = sorted({c for _, c in probe_pairs})
    probe = spark.createDataFrame(
        probe_pairs, "p_qid BIGINT, qcell BIGINT"
    )

    enc = (
        spark.read.parquet(_codes_dir(spark, path))
        # literal IN-list on the partition column -> PartitionFilters
        .filter(F.col("cell").isin(cells))
        .select(id_col, "cell", F.posexplode("codes").alias("sub", "cidx"))
        .select(
            id_col,
            "cell",
            "sub",
            F.element_at(
                F.lit(sorted_ids), F.col("cidx").cast("int") + 1
            ).alias("code"),
        )
    )
    if filter_ids is not None:
        enc = enc.join(filter_ids.select(id_col), id_col, "left_semi")
    cb = spark.read.parquet(fsio.join(path, "codebook"))
    if meta.get("residual"):
        # IVFADC: per-(query, cell) residual ADC tables — the probe
        # restriction rides the qtab's qcell key, so no separate
        # probe join is needed
        qn = _norm3(
            embeddings.filter(F.col(id_col).isin(query_ids)),
            id_col, vec_col,
        )
        qtab_res = _residual_qtab(qn, probe, cents, cb, m, dsub, id_col)
        scored = enc.join(
            F.broadcast(qtab_res),
            (F.col("cell") == F.col("qcell"))
            & (F.col("sub") == F.col("qsub"))
            & (F.col("code") == F.col("qcid")),
        )
    else:
        qtab = _pq_qtab(
            embeddings, query_ids, cb, m, dsub, id_col, vec_col
        )
        scored = enc.join(
            F.broadcast(probe), F.col("cell") == F.col("qcell")
        ).join(
            F.broadcast(qtab),
            (F.col("sub") == F.col("qsub"))
            & (F.col("code") == F.col("qcid"))
            & (F.col("p_qid") == F.col("query_id")),
        )
    cands = _pq_adc_cands(scored, id_col, rerank_factor * k)
    return _pq_exact_rerank(embeddings, cands, query_ids, k, id_col, vec_col)
