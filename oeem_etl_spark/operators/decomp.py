"""Distributed PCA over embedding columns (L-ext: the dimensionality
reduction pass that precedes ANN indexing / clustering in an
embedding-curation pipeline).

The 100 TB shape is the classic two-phase moment computation:

- **Fit** is ONE distributed pass that reduces the corpus to its
  sufficient statistics — per-Arrow-batch partials ``(n, Σx, XᵀX)`` via
  ``mapInPandas`` (BLAS does the Gram product per batch), then a
  driver-side combine of the tiny partials (each is 1 + d + d² doubles;
  at d = 64 that is ~33 KB per batch — bounded by batch count, never by
  rows). The d×d eigendecomposition is numpy on the driver: for
  embedding dims (≤ a few thousand) it is microseconds and NOT worth
  distributing.
- **Transform** is pure JVM expression: the component matrix enters the
  plan as ONE nested-array literal (the clustering.py Janino lesson —
  k·d scalar literal nodes would blow up analysis/codegen), and each
  projection is ``dot(vec, cⱼ) - mean·cⱼ`` — the mean-centering folds
  into a per-component constant so the row path is k dot products, no
  per-element subtraction, no Python.

Determinism: eigenvector SIGN is arbitrary in any eigensolver, so each
component is normalized to make its largest-|weight| entry positive;
float partial-sum order across batches can wiggle the last ulp (property
tests use tolerances, as with every float reduction).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = top components, descending
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    explained_ratio: np.ndarray  # (k,) eigenvalue / total variance


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """One-pass moment reduction + driver-side eigh. ``df`` needs only
    ``vec_col`` (``array<float>``); k ≤ d."""
    import pandas as pd

    def partials(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="n long, s array<double>, g array<double>")
        .collect()
    )
    assert rows, "pca_fit: empty input"
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: largest-|weight| entry of each component positive
    for j in range(comps.shape[0]):
        if comps[j, np.argmax(np.abs(comps[j]))] < 0:
            comps[j] = -comps[j]
    ev = np.maximum(evals[order], 0.0)
    total = max(float(evals.clip(min=0).sum()), 1e-300)
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=ev,
        explained_ratio=ev / total,
    )


def pca_transform(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    out_col: str = "proj",
    center: bool = True,
) -> DataFrame:
    """Project ``vec_col`` onto the model's components — JVM-side only.

    ``center=False`` projects without subtracting the mean: the right
    mode for cosine-similarity pipelines, where uncentered projection
    approximately preserves dot products (orthonormal basis) while
    centering would change every angle."""
    vec = F.col(vec_col)
    m: Column = F.lit([[float(v) for v in comp] for comp in model.components])
    consts: Column = F.lit(
        [float(model.mean @ comp) if center else 0.0 for comp in model.components]
    )
    dots = F.transform(
        m,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return df.withColumn(out_col, F.zip_with(dots, consts, lambda p, c0: p - c0))
