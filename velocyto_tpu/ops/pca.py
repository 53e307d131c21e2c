"""PCA via XLA SVD, matching sklearn's sign convention.

Replaces reference perform_PCA (velocyto/analysis.py:678-702) which uses
sklearn.decomposition.PCA.  We center features, run
``jnp.linalg.svd`` and apply sklearn's ``svd_flip`` (u-based) so signs of
the components agree with the reference to numerical tolerance.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pca_impl(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x: (samples, features). Returns (pcs, components, explained_var)."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mu
    u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    # svd_flip (v-based, sklearn >= 1.5 PCA convention): flip so that each
    # row of Vt has a positive maximum-absolute entry
    max_abs_cols = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_abs_cols])
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
        X = jnp.asarray(X, dtype=jnp.float32)
        pcs, comps, expl = _pca_impl(X)
        pcs = np.asarray(pcs, dtype=np.float64)
        comps = np.asarray(comps, dtype=np.float64)
        expl = np.asarray(expl, dtype=np.float64)
        k = self.n_components or min(X.shape)
        self.components_ = comps[:k]
        self.explained_variance_ = expl[:k]
        total_var = expl.sum()
        self.explained_variance_ratio_ = expl[:k] / total_var
        self.mean_ = np.asarray(jnp.mean(X, axis=0))
        return pcs[:, :k]

    def fit(self, X: np.ndarray) -> "PCA":
        self.fit_transform(X)
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        return (np.asarray(X) - self.mean_) @ self.components_.T
