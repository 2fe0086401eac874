"""PCA operator tests: exactness against a plain-numpy mirror, model
canonicalization, and the no-Python-per-row projection contract."""

from __future__ import annotations

import numpy as np
import pytest

from data_spark.operators.decomposition import pca_fit, pca_project


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
    return mean, np.vstack(comps), evals[order] / evals.sum()


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    rows = df.select("vec_id", "embedding").collect()
    x = np.vstack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    ids = [r.vec_id for r in rows]
    return df, x, ids


def test_pca_fit_matches_numpy(emb):
    df, x, _ = emb
    model = pca_fit(df, k=2)
    mean, comps, explained = _numpy_pca(x, 2)
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["components"], comps, atol=1e-8)
    assert np.allclose(model["explained"], explained, atol=1e-9)


def test_pca_project_matches_numpy(emb):
    df, x, ids = emb
    model = pca_fit(df, k=2)
    got = {r.vec_id: (r.pc1, r.pc2) for r in pca_project(df, model).collect()}
    mean, comps, _ = _numpy_pca(x, 2)
    want = (x - mean) @ comps.T
    for i, vid in enumerate(ids):
        assert got[vid][0] == pytest.approx(want[i, 0], abs=1e-6)
        assert got[vid][1] == pytest.approx(want[i, 1], abs=1e-6)


def test_pca_explained_variance_ordered(emb):
    df, _, _ = emb
    model = pca_fit(df, k=3)
    e = model["explained"]
    assert e == sorted(e, reverse=True)
    assert all(0 <= v <= 1 for v in e)


def test_pca_fit_is_deterministic(emb):
    df, _, _ = emb
    m1 = pca_fit(df, k=2)
    m2 = pca_fit(df.repartition(7), k=2)
    # different partitioning must not change the model beyond float
    # accumulation noise in the partial sums
    assert np.allclose(m1["components"], m2["components"], atol=1e-8)


def test_pca_projection_plan_has_no_python_eval(emb):
    df, _, _ = emb
    model = pca_fit(df, k=2)
    plan = pca_project(df, model)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"projection fell back to Python: {marker}"


def test_pca_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises((ValueError, Exception)):
        pca_fit(df, k=2)


def test_pca_moments_gate_matches_fit_accumulation(spark, sf_small, emb):
    """v_pca_moments (the exact cross-engine gate, VERDICT r7 #6) and
    pca_fit accumulate the SAME sufficient statistics: covariance
    rebuilt from the gate's e6-snapped integer moments must match the
    fit's float64 covariance to snap precision — so a green gate row
    vouches for the distributed part of the PCA path, and the local
    eigensolve stays pinned by the numpy mirror above."""
    from data_spark.queries.analytics7 import v_pca_moments

    df, x, _ = emb
    n, d = x.shape
    rows = v_pca_moments(spark, sf_small).collect()
    assert len(rows) == d * (d + 1) // 2

    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        i, j = r.i - 1, r.j - 1
        assert r.n_vecs == n
        ss[i, j] = ss[j, i] = r.sum_prod / 1e12
        if i == j:
            s[i] = r.sum_i / 1e6
    mean = s / n
    cov_gate = ss / n - np.outer(mean, mean)

    xs = np.floor(x * 1e6 + 0.5)  # the snap the gate applies
    mean_s = xs.mean(axis=0) / 1e6
    cov_snap = (xs.T @ xs) / n / 1e12 - np.outer(mean_s, mean_s)
    assert np.allclose(cov_gate, cov_snap, atol=1e-12)

    # snap error is bounded: the gate's covariance agrees with the
    # float64 fit covariance to ~1e-6 per entry
    cov_fit = (x.T @ x) / n - np.outer(x.mean(axis=0), x.mean(axis=0))
    assert np.abs(cov_gate - cov_fit).max() < 2e-6
