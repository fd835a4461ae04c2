"""Distributed Gram/PCA (operators/linalg.py): numpy ground truth at
sf0.001, dimension-bounded plan shape."""

from __future__ import annotations

import contextlib
import io as _io

import numpy as np

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import linalg

SF = "/root/testdata/sf0.001"


def _matrix(emb_rows):
    return np.array([list(r.embedding) for r in emb_rows], dtype=np.float64)


def test_gram_matches_numpy(spark):
    emb = io.load(spark, SF, "embeddings")
    x = _matrix(emb.select("embedding").collect())
    want = x.T @ x
    got = np.zeros_like(want)
    for r in linalg.gram_matrix(emb).collect():
        got[r.i, r.j] = r.g
    assert np.allclose(got, want, atol=1e-3)  # 4-dp gate rounding
    # symmetric up to FP reduction order: g[i][j] and g[j][i] are
    # final-aggregated on different reducers, and the 4-dp rounding
    # can amplify a ~1e-12 merge-order wobble to one quantum
    assert np.allclose(got, got.T, atol=2e-4)


def test_gram_single_shuffle(spark):
    """The accumulation must shuffle once (partial -> final agg);
    posexplode and the final reshape stay in the same stages."""
    emb = io.load(spark, SF, "embeddings")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        linalg.gram_matrix(emb).explain("formatted")
    plan = buf.getvalue()
    import re

    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, plan
    assert "unboundedfollowing" not in plan.lower()


def test_pca_projection_matches_numpy(spark):
    emb = io.load(spark, SF, "embeddings")
    x = _matrix(emb.select("embedding").collect())
    mu = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]

    comps, got_vals, got_mu = linalg.pca_components(emb, k=2)
    assert np.allclose(got_mu, mu, atol=1e-6)
    for k_idx, idx in enumerate(order):
        assert abs(got_vals[k_idx] - vals[idx]) < 1e-3
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        # components from the 4-dp-rounded Gram: loose elementwise tol
        assert np.allclose(comps[k_idx], v, atol=1e-2), k_idx

    proj = linalg.pca_project(emb, comps, got_mu)
    rows = {r.vec_id: (r.pc0, r.pc1) for r in proj.collect()}
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    centered = x - mu
    want0 = centered @ np.array(comps[0])
    want1 = centered @ np.array(comps[1])
    for pos, vid in enumerate(ids):
        assert abs(rows[vid][0] - want0[pos]) < 1e-4
        assert abs(rows[vid][1] - want1[pos]) < 1e-4


def test_pca_project_is_scan_shaped(spark):
    emb = io.load(spark, SF, "embeddings")
    comps, _, mu = linalg.pca_components(emb, k=2)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        linalg.pca_project(emb, comps, mu).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_whitening_yields_identity_covariance(spark):
    """whiten_project: the retained-subspace covariance of the output
    is ~identity — dominant directions equalized (the property
    SemDeDup-style cosine dedup needs)."""
    emb = io.load(spark, SF, "embeddings")
    r = 4
    rows = linalg.whiten_project(emb, r=r).collect()
    w = np.array([list(x.wv) for x in rows])
    assert w.shape[1] == r
    cov = np.cov(w, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(r), atol=0.05), cov
