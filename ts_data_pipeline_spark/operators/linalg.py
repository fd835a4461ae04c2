"""Distributed dense linear algebra for embedding columns: Gram /
covariance accumulation and PCA projection.

The 100 TB shape for second-moment statistics over N x d embeddings
(d small, N unbounded): never materialize pairs of ROWS — accumulate
the d x d Gram matrix with one pass and a shuffle bounded by the
DIMENSION, not the data.

    posexplode(vec) -> (i, v_i, vec)          # d rows per input row
    groupBy(i).agg(sum(v_i * vec[j]) for j)   # d sums per group

The partial aggregation combines map-side, so the exchange carries at
most d rows (of d doubles) per task regardless of N — the classic
map-side-combined moment accumulation. All arithmetic is double
(upcast from float32 before multiply) so the DuckDB oracle reproduces
sums to rounding precision.

Eigen-decomposition of the d x d result is driver-side numpy — d x d
is sketch-sized by construction (the same contract as broadcast join
stats); the expensive relation never leaves the executors. Projection
back onto the top-k components is a pure expression dot product with
the component matrix inlined as literals — no UDF, no shuffle.

Uses: embedding whitening before cosine dedup (SemDeDup-style
pipelines are sensitive to anisotropy), PCA-reduced ANN indexes,
feature decorrelation ahead of linear quality classifiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(emb: DataFrame, vec_col: str = "embedding",
                dim: int = 64) -> DataFrame:
    """(i, j, g) with g = sum over rows of v[i] * v[j] (0-based i, j).

    One pass, one dimension-bounded shuffle: d rows per input row
    from posexplode, d partial sums per group, d^2 output rows total.
    """
    ex = emb.select(
        F.posexplode(F.col(vec_col)).alias("i", "vi"),
        F.col(vec_col).alias("__v"),
    )
    agg = ex.groupBy("i").agg(
        *[
            F.sum(
                F.col("vi").cast("double")
                * F.element_at("__v", j + 1).cast("double")
            ).alias(f"g{j}")
            for j in range(dim)
        ]
    )
    pairs = agg.select(
        "i",
        F.posexplode(F.array(*[F.col(f"g{j}") for j in range(dim)])).alias(
            "j", "g"
        ),
    )
    return pairs.select(
        F.col("i").cast("bigint"),
        F.col("j").cast("bigint"),
        F.round(F.col("g"), 4).alias("g"),
    )


def gram_matrix_sql(table: str = "embeddings",
                    vec_col: str = "embedding",
                    dim: int = 64) -> str:
    """DuckDB twin: 1-based subscript pairs via constant-bound
    range() cross joins (this DuckDB lacks WITH ORDINALITY and
    column-parameter laterals; dim is a fixed engine parameter).
    Quadratic in d but exact — the oracle runs at oracle scale."""
    return f"""
WITH ex AS (
  SELECT r.range AS i1, CAST({vec_col}[r.range] AS DOUBLE) AS vi,
         {vec_col} AS vec
  FROM {table}, range(1, {dim} + 1) r
)
SELECT CAST(i1 - 1 AS BIGINT) AS i, CAST(j.range - 1 AS BIGINT) AS j,
       ROUND(SUM(vi * CAST(vec[j.range] AS DOUBLE)), 4) AS g
FROM ex, range(1, {dim} + 1) j
GROUP BY i1, j.range
"""


def mean_vector(emb: DataFrame, vec_col: str = "embedding",
                dim: int = 64) -> list[float]:
    """Column means, one dimension-bounded aggregate (d doubles to
    the driver — sketch-sized)."""
    row = emb.agg(
        *[
            F.avg(F.element_at(vec_col, j + 1).cast("double")).alias(
                f"m{j}"
            )
            for j in range(dim)
        ]
    ).collect()[0]
    return [row[f"m{j}"] for j in range(dim)]


def pca_components(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 2,
) -> tuple[list[list[float]], list[float], list[float]]:
    """Top-k principal components of the embedding cloud.

    Distributed part: Gram + mean (both dimension-bounded, above).
    Driver part: form covariance C = G/N - mean meanT (d x d numpy)
    and eigh it — O(d^3) on a sketch-sized matrix. Components have a
    deterministic sign fix (largest-|loading| coordinate positive) so
    results are reproducible across sessions/BLAS builds.

    Returns (components [k][d], eigenvalues [k], mean [d]).
    """
    import numpy as np

    # ONE pass: the same dimension-bounded aggregation that computes
    # the Gram rows also carries the row count (each i-group has
    # exactly N members) and the column sums — count/mean/Gram from
    # a single scan, at full double precision (no 4-dp gate rounding
    # feeding the eigensolver).
    ex = emb.select(
        F.posexplode(F.col(vec_col)).alias("i", "vi"),
        F.col(vec_col).alias("__v"),
    )
    rows = ex.groupBy("i").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vi").cast("double")).alias("s"),
        *[
            F.sum(
                F.col("vi").cast("double")
                * F.element_at("__v", j + 1).cast("double")
            ).alias(f"g{j}")
            for j in range(dim)
        ],
    ).collect()
    n = rows[0]["n"]
    g = np.zeros((dim, dim))
    mu = np.zeros(dim)
    for r in rows:
        i = r["i"]
        mu[i] = r["s"] / n
        for j in range(dim):
            g[i, j] = r[f"g{j}"]
    cov = g / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps, [float(vals[i]) for i in order], [float(x) for x in mu]


def pca_power_basis(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 16,
    n_iter: int = 8,
) -> tuple[list[list[float]], list[float]]:
    """Top-k principal basis by DETERMINISTIC power iteration with
    deflation — the CROSS-ENGINE-EXACT twin of the eigh fit (r11).

    Why a second fit exists: ``pca_components`` (Gram + LAPACK eigh)
    is the production basis, but an eigendecomposition cannot run in
    the DuckDB oracle, so PCA-rotated queries were pytest-only. This
    fit is hash-gateable because every step is reproducible in SQL:

    - moments: mu_j = ROUND(avg(v_j), 9), E_ij = ROUND(avg(v_i*v_j),
      9) — ONE dimension-bounded Spark aggregate; the 9-dp rounding
      absorbs engine/partial-agg summation-order ulp noise, so both
      engines start from the IDENTICAL covariance;
    - cov_ij = ROUND(E_ij - mu_i*mu_j, 9) (exact arithmetic on
      already-identical inputs);
    - per component: seed = unit vector at the max-diagonal index
      (MIN index on ties), ``n_iter`` power steps with coordinates
      ROUND(w/||w||, 9) after each normalize, eigenvalue
      ROUND(v'Cv, 9), deflation C -= lambda v v' rounded to 9 dp —
      all on the d x d matrix DRIVER-SIDE in pure sequential Python
      (dimension-bounded, the residual_auto_decision convention), so
      the arithmetic order matches DuckDB's sequential
      list_dot_product exactly.

    Returns (components [k][dim] — 9-dp coordinates, mu [dim]).
    Convergence is an accuracy concern only: both engines run the
    same fixed recipe, so twin equality holds even pre-convergence;
    recall vs the eigh basis is published separately.

    Tie-breaking caveat (r11 ADVICE): the cross-engine-EXACT claim
    rests on Python ``round`` (half-even), Spark ``F.round``
    (HALF_UP) and DuckDB ``ROUND`` (half-away on doubles) agreeing at
    the 9th decimal — they differ on EXACT .5e-9 boundary values.
    Such ties require the pre-rounded double to terminate at the
    10th decimal digit, which the corpus's non-2-5-smooth moment
    divisions (avg over n=500/2000-row corpora of irrational-ish
    dots) make astronomically unlikely but not impossible by
    construction; the gate would fail LOUDLY (hash mismatch), not
    silently, if a corpus ever landed on one. The repo-wide fix
    pattern (one explicit floor(x*1e9+0.5)/1e9 rule on all three
    sides) is documented here for that day rather than paid now —
    changing the rounding rule would re-derive every published
    basis."""
    # moments in the gram_matrix shape: posexplode -> d groups x
    # (d+1) aggregates — one dimension-bounded shuffle, never a
    # 4096-expression single-row agg
    ex = emb.select(
        F.posexplode(F.col(vec_col)).alias("i", "vi"),
        F.col(vec_col).alias("__v"),
    )
    rows = (
        ex.groupBy("i")
        .agg(
            F.round(F.avg(F.col("vi").cast("double")), 9).alias("m"),
            *[
                F.round(
                    F.avg(
                        F.col("vi").cast("double")
                        * F.element_at("__v", j + 1).cast("double")
                    ),
                    9,
                ).alias(f"e{j}")
                for j in range(dim)
            ],
        )
        .collect()
    )
    by_i = {int(r["i"]): r for r in rows}
    mu = [by_i[i]["m"] for i in range(dim)]
    C = [
        [
            round(by_i[i][f"e{j}"] - mu[i] * mu[j], 9)
            for j in range(dim)
        ]
        for i in range(dim)
    ]

    def matvec(M, x):
        return [
            sum(M[i][j] * x[j] for j in range(dim)) for i in range(dim)
        ]

    comps = []
    for _ in range(k):
        dmax = 0
        for i in range(1, dim):
            if C[i][i] > C[dmax][dmax]:
                dmax = i  # strict >: MIN index wins ties
        v = [1.0 if i == dmax else 0.0 for i in range(dim)]
        for _ in range(n_iter):
            w = matvec(C, v)
            nrm = sum(x * x for x in w) ** 0.5
            if nrm == 0.0:
                break  # space exhausted; keep the seed direction
            v = [round(x / nrm, 9) for x in w]
        w = matvec(C, v)  # hoisted: the generator form re-ran the
        # full matvec per coordinate — O(d^3) per component (r11
        # review); value-identical, the SQL twin computes the same
        # per-i dot products
        lam = round(sum(v[i] * w[i] for i in range(dim)), 9)
        comps.append(v)
        C = [
            [
                round(C[i][j] - lam * v[i] * v[j], 9)
                for j in range(dim)
            ]
            for i in range(dim)
        ]
    return comps, mu


def pca_power_basis_sql_ctes(
    dim: int = 64, k: int = 16, n_iter: int = 8
) -> tuple[str, list[str]]:
    """The DuckDB CTE chain computing the SAME basis as
    :func:`pca_power_basis` (starts with ``WITH``; expects a view
    ``embeddings(vec_id, embedding)``). Returns (cte_sql,
    [component CTE name per k] — each a single row ``(v)``); the
    mean lives in CTE ``muv`` as a single row ``(m)``. Every
    multiply-referenced CTE is MATERIALIZED (DuckDB inlines per
    reference — an unrolled chain would otherwise re-derive the
    upstream chain exponentially)."""
    sql = f"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pos AS (SELECT range AS i FROM range(1, {dim}+1)),
mu AS MATERIALIZED (
  SELECT i, ROUND(AVG(v[i]), 9) AS m
  FROM emb CROSS JOIN pos GROUP BY i
),
muv AS MATERIALIZED (SELECT list(m ORDER BY i) AS m FROM mu),
xp AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, ROUND(AVG(e.v[a.i] * e.v[b.i]), 9) AS xij
  FROM emb e CROSS JOIN pos a CROSS JOIN pos b
  GROUP BY a.i, b.i
),
cov0 AS MATERIALIZED (
  SELECT x.i, x.j, ROUND(x.xij - ma.m * mb.m, 9) AS c
  FROM xp x JOIN mu ma ON ma.i = x.i JOIN mu mb ON mb.i = x.j
),
c0 AS MATERIALIZED (
  SELECT list(cl ORDER BY i) AS C FROM (
    SELECT i, list(c ORDER BY j) AS cl FROM cov0 GROUP BY i
  )
)"""
    prev_c = "c0"
    names = []
    for kk in range(k):
        sql += f""",
seed{kk} AS MATERIALIZED (
  SELECT list_transform(range(1, {dim}+1), i ->
    CASE WHEN i = t.dmax THEN CAST(1.0 AS DOUBLE)
         ELSE CAST(0.0 AS DOUBLE) END) AS v
  FROM (
    SELECT MIN(p.i) AS dmax
    FROM pos p CROSS JOIN {prev_c} pc
    WHERE pc.C[p.i][p.i] = (
      SELECT MAX(pc2.C[p2.i][p2.i]) FROM pos p2 CROSS JOIN {prev_c} pc2
    )
  ) t
)"""
        prev_v = f"seed{kk}"
        for t in range(n_iter):
            sql += f""",
it{kk}_{t} AS MATERIALIZED (
  SELECT CASE WHEN t.nrm = 0 THEN t.pv
              ELSE list_transform(t.w, x -> ROUND(x / t.nrm, 9)) END AS v
  FROM (
    SELECT w, sqrt(list_dot_product(w, w)) AS nrm, pv FROM (
      SELECT list_transform(range(1, {dim}+1), i ->
        list_dot_product(pc.C[i], pv.v)) AS w, pv.v AS pv
      FROM {prev_v} pv CROSS JOIN {prev_c} pc
    )
  ) t
)"""
            prev_v = f"it{kk}_{t}"
        sql += f""",
lam{kk} AS MATERIALIZED (
  SELECT ROUND(list_sum(list_transform(range(1, {dim}+1), i ->
    pv.v[i] * list_dot_product(pc.C[i], pv.v))), 9) AS l
  FROM {prev_v} pv CROSS JOIN {prev_c} pc
),
c{kk + 1} AS MATERIALIZED (
  SELECT list_transform(range(1, {dim}+1), i ->
    list_transform(range(1, {dim}+1), j ->
      ROUND(pc.C[i][j] - lm.l * pv.v[i] * pv.v[j], 9))) AS C
  FROM {prev_v} pv CROSS JOIN {prev_c} pc CROSS JOIN lam{kk} lm
)"""
        prev_c = f"c{kk + 1}"
        names.append(prev_v)
    return sql, names


def pca_basis_write(
    path: str,
    components: list[list[float]],
    eigenvalues: list[float],
    mean: list[float],
    spark=None,
) -> None:
    """Persist a PCA basis as a JSON sidecar (the PQ-codebook
    train-once/query-many convention, VERDICT r9 ask #4): store it
    beside the vector index so queries load the rotation instead of
    re-running the Gram+eigh fit per call.

    JSON floats round-trip EXACTLY (shortest-repr encoding decodes
    to the identical double), so a reloaded basis projects
    bit-identically to the in-memory one — pinned by pytest.
    Atomic via temp + replace. ``spark`` routes the write through
    the Hadoop FS API (r11 — a sidecar beside a ``file://``/object-
    store index must land ON that filesystem, not silently on the
    driver's local disk); bare-path callers keep the POSIX form.
    """
    import json

    payload = json.dumps(
        {
            "components": components,
            "eigenvalues": eigenvalues,
            "mean": mean,
        }
    )
    if spark is not None:
        from ts_data_pipeline_spark.operators import fsio

        fsio.replace_text(spark, path, payload)
        return
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(payload)
    os.replace(tmp, path)


def pca_basis_read(
    path: str,
    spark=None,
) -> tuple[list[list[float]], list[float], list[float]]:
    """Load a persisted PCA basis: (components, eigenvalues, mean).
    ``spark`` reads through the Hadoop FS API (URI sidecars)."""
    import json

    if spark is not None:
        from ts_data_pipeline_spark.operators import fsio

        d = json.loads(fsio.read_text(spark, path))
    else:
        with open(path) as fh:
            d = json.load(fh)
    return d["components"], d["eigenvalues"], d["mean"]


def pca_project(
    emb: DataFrame,
    components: list[list[float]],
    mean: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project rows onto the components: centered dot products as
    pure expressions (components/mean inlined as literals — they are
    k x d and d floats, broadcast-sized by construction). Output
    (id, pc0..pc{k-1}); no UDF, no shuffle, scan-shaped."""
    out = [F.col(id_col)]
    for c_idx, comp in enumerate(components):
        terms = None
        for j, (w, m) in enumerate(zip(comp, mean)):
            t = (F.element_at(vec_col, j + 1).cast("double") - F.lit(m)) \
                * F.lit(w)
            terms = t if terms is None else terms + t
        out.append(terms.alias(f"pc{c_idx}"))
    return emb.select(*out)


def pca_project_array(
    emb: DataFrame,
    components: list[list[float]],
    mean: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Same projection as :func:`pca_project`, returned as ONE array
    column ``p`` and built from array expressions (``zip_with`` +
    ``aggregate`` over literal component arrays) instead of k chains
    of 2d scalar ops. Bit-identical results (pinned by test), but the
    expression tree is O(k*d) literal LEAVES feeding a handful of
    array operators rather than O(k*d) arithmetic NODES — at k=16,
    d=64 the scalar form spends ~8 s in codegen per query where this
    form runs in ~1 s. Use this for wide projections (rotated
    Matryoshka prefixes); the scalar form keeps its named pc{i}
    columns for the k<=8 consumers."""
    comp_lit = F.array(*[
        F.array(*[F.lit(float(w)) for w in comp]) for comp in components
    ])
    mean_lit = F.array(*[F.lit(float(m)) for m in mean])
    centered = emb.select(
        F.col(id_col),
        F.zip_with(
            F.col(vec_col).cast("array<double>"), mean_lit,
            lambda a, b: a - b,
        ).alias("_cv"),
    )
    return centered.select(
        id_col,
        F.transform(
            comp_lit,
            lambda comp: F.aggregate(
                F.zip_with(F.col("_cv"), comp, lambda a, w: a * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ).alias("p"),
    )


def whiten_project(
    emb: DataFrame,
    r: int = 8,
    eps: float = 1e-9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """PCA whitening onto the top-r components: coordinates are
    centered projections scaled by 1/sqrt(eigenvalue), so the output
    cloud has ~identity covariance on the retained subspace.

    Why it's in a training-data engine: cosine-threshold dedup
    (SemDeDup) and ANN recall both degrade on anisotropic embedding
    clouds — a handful of dominant directions swamp the similarity.
    Whitening equalizes them. Cost: the one-pass moment fit of
    :func:`pca_components` + a scan-shaped projection (literal
    component matrix, no UDF, no shuffle). Output: (id, wv array<double>).
    """
    import math

    comps, vals, mu = pca_components(emb, vec_col, dim, k=r)
    scaled = [
        [w / math.sqrt(max(v, 0.0) + eps) for w in comp]
        for comp, v in zip(comps, vals)
    ]
    # one projection-expression builder in this module: compose
    # pca_project with the eigen-scaled components
    proj = pca_project(emb, scaled, mu, vec_col, id_col)
    return proj.select(
        F.col(id_col),
        F.array(*[F.col(f"pc{i}") for i in range(r)]).alias("wv"),
    )
