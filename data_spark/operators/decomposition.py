"""Distributed PCA over an ``array<float>`` embedding column.

Fit: covariance accumulation is the textbook scale-out decomposition —
each Arrow batch contributes a partial (n, Σx, XᵀX) computed as ONE
numpy matmul (vectorized, d² floats per batch regardless of batch
size), the driver combines the partials (d=64 ⇒ 4 KB each; with 1000
executors that is megabytes, not data-scale) and eigensolves the d×d
covariance locally. This is the mapInPandas tier the engine reserves
for semantics the DataFrame algebra can't express (eigendecomposition);
everything data-sized stays distributed.

Transform: the k components are broadcast as literal arrays and the
projection is zip_with/aggregate dot products — whole-stage codegen,
no Python in the per-row path (same discipline as
operators/clustering.py).

Determinism: partials are combined in partition order, the
eigensolver's output is canonicalized (eigenvalue-descending order,
sign fixed so each component's largest-|coefficient| entry is
positive), so the fit is a pure function of the input. Exactness is
pytest-gated against a plain-numpy mirror (tests/test_decomposition.py)
— eigensolves are not SQL-expressible, so the gate query is rows-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_lit(vec_col: Column, lit_vec: list[float]) -> Column:
    """Dot product of an array column with a Python-side constant vector,
    evaluated inside codegen (no UDF)."""
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(float(v)) for v in lit_vec]),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pca_fit(
    df: DataFrame,
    k: int = 2,
    vec_col: str = "embedding",
) -> dict:
    """Fit PCA; returns {mean: [d], components: [k][d], explained: [k]}.

    One distributed pass producing per-batch moment partials, one local
    d×d eigensolve. ``explained`` is each component's share of total
    variance."""
    d = len(df.select(vec_col).first()[0])

    schema = "n long, s array<double>, ss array<double>"

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    parts = df.select(vec_col).mapInPandas(moments, schema=schema).collect()
    n = sum(p["n"] for p in parts)
    if n == 0:
        raise ValueError("pca_fit: empty input")
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for p in parts:  # collect() preserves partition order -> deterministic
        s += np.asarray(p["s"])
        ss += np.asarray(p["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    explained = []
    total = float(evals.sum()) or 1.0
    for idx in order:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v.tolist())
        explained.append(float(evals[idx]) / total)
    return {"mean": mean.tolist(), "components": comps, "explained": explained}


def pca_project(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project onto the fitted components: pc_i = (x - μ)·c_i, computed
    as x·c_i - μ·c_i (the scalar μ·c_i folds to a constant, so the
    per-row work is one codegen dot product per component)."""
    centered = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("__v"),
    )
    cols = [F.col(id_col)]
    for i, comp in enumerate(model["components"], start=1):
        shift = float(np.dot(model["mean"], comp))
        cols.append(
            (_dot_lit(F.col("__v"), comp) - F.lit(shift)).alias(f"pc{i}")
        )
    return centered.select(*cols)
