"""PCA matching sklearn's sign convention.

Replaces reference perform_PCA (velocyto/analysis.py:678-702) which uses
sklearn.decomposition.PCA: center features, SVD, then sklearn's
``svd_flip`` (v-based, sklearn >= 1.5) so component signs agree with the
reference to numerical tolerance.

Runs on host LAPACK: PCA is a cold path (called once per analysis) and
the XLA SVD pays a multi-minute remote compile on the axon TPU tunnel
for zero steady-state benefit.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _pca_impl(x) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """x: (samples, features). Returns (pcs, components, explained_var)."""
    x = np.asarray(x, dtype=np.float64)
    mu = np.mean(x, axis=0, keepdims=True)
    xc = x - mu
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    # svd_flip: flip so each row of Vt has a positive max-abs entry
    max_abs_cols = np.argmax(np.abs(vt), axis=1)
    signs = np.sign(vt[np.arange(vt.shape[0]), max_abs_cols])
    signs[signs == 0] = 1.0
    u = u * signs[None, :]
    vt = vt * signs[:, None]
    pcs = u * s[None, :]
    explained_var = (s ** 2) / (x.shape[0] - 1)
    return pcs, vt, explained_var


class PCA:
    """Minimal sklearn-compatible PCA facade used by the analysis layer."""

    def __init__(self, n_components: Optional[int] = None) -> None:
        self.n_components = n_components

    def fit_transform(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        pcs, comps, expl = _pca_impl(X)
        k = self.n_components or min(X.shape)
        self.components_ = comps[:k]
        self.explained_variance_ = expl[:k]
        self.explained_variance_ratio_ = expl[:k] / expl.sum()
        self.mean_ = X.mean(axis=0)
        return pcs[:, :k]

    def fit(self, X: np.ndarray) -> "PCA":
        self.fit_transform(X)
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        return (np.asarray(X) - self.mean_) @ self.components_.T
