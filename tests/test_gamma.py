import numpy as np
import pytest
import scipy.optimize

from velocyto_tpu.ops import (fit_slope, fit_slope_offset, fit_slope_weighted,
                              fit_slope_weighted_offset, clusters_stats)


def _scipy_slope_weighted(y, x, w, limit_gamma=False, bounds=(0, 20)):
    if not np.any(x):
        return np.nan
    if not np.any(y):
        return 0.0
    if limit_gamma:
        if np.median(y) > np.median(x):
            high_x = x > np.percentile(x, 90)
            up_gamma = np.percentile(y[high_x], 10) / np.median(x[high_x])
            up_gamma = np.maximum(1.5, up_gamma)
        else:
            up_gamma = 1.5
        return scipy.optimize.minimize_scalar(
            lambda m: np.sum(w * (x * m - y) ** 2),
            bounds=(1e-8, up_gamma), method="bounded").x
    return scipy.optimize.minimize_scalar(
        lambda m: np.sum(w * (x * m - y) ** 2),
        bounds=bounds, method="bounded").x


def _scipy_slope_weighted_offset(y, x, w, limit_gamma=False):
    if not np.any(x):
        return (np.nan, 0)
    if not np.any(y):
        return (0, 0)
    if limit_gamma:
        if np.median(y) > np.median(x):
            high_x = x > np.percentile(x, 90)
            up_gamma = np.percentile(y[high_x], 10) / np.median(x[high_x])
            up_gamma = np.maximum(1.5, up_gamma)
        else:
            up_gamma = 1.5
    else:
        up_gamma = 20
    up_q = 2 * np.sum(y * w) / np.sum(w)
    m = scipy.optimize.minimize(
        lambda m: np.sum(w * (-y + x * m[0] + m[1]) ** 2),
        x0=(0.1, 1e-16), method="L-BFGS-B",
        bounds=[(1e-8, up_gamma), (0, up_q)]).x
    return m[0], m[1]


def test_fit_slope_nnls(rng):
    X = rng.rand(20, 50) * 5
    Y = 0.7 * X + rng.randn(20, 50) * 0.3
    X[3] = 0          # not any(x) -> nan
    Y[5] = 0          # not any(y) -> 0
    got = fit_slope(Y, X)
    for i in range(20):
        if i == 3:
            assert np.isnan(got[i])
        elif i == 5:
            assert got[i] == 0
        else:
            m, _ = scipy.optimize.nnls(X[i][:, None], Y[i])
            np.testing.assert_allclose(got[i], m[0], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("limit_gamma", [False, True])
def test_fit_slope_weighted(rng, limit_gamma):
    X = rng.rand(15, 60) * 5
    Y = 0.5 * X + np.abs(rng.randn(15, 60)) * 0.2
    W = rng.rand(15, 60) + 0.1
    got = fit_slope_weighted(Y, X, W, limit_gamma=limit_gamma)
    for i in range(15):
        exp = _scipy_slope_weighted(Y[i], X[i], W[i], limit_gamma)
        np.testing.assert_allclose(got[i], exp, rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("limit_gamma", [False, True])
def test_fit_slope_weighted_offset(rng, limit_gamma):
    X = rng.rand(15, 80) * 5
    Y = 0.6 * X + 0.4 + np.abs(rng.randn(15, 80)) * 0.2
    W = rng.rand(15, 80) + 0.1
    m, q, r2 = fit_slope_weighted_offset(Y, X, W, limit_gamma=limit_gamma)
    for i in range(15):
        em, eq = _scipy_slope_weighted_offset(Y[i], X[i], W[i], limit_gamma)
        # L-BFGS-B converges loosely; compare objectives rather than argmins
        w, x, y = W[i], X[i], Y[i]
        f_ours = np.sum(w * (x * m[i] + q[i] - y) ** 2)
        f_scipy = np.sum(w * (x * em + eq - y) ** 2)
        assert f_ours <= f_scipy * (1 + 1e-4) + 1e-6


def test_fit_slope_offset_ols(rng):
    X = rng.rand(10, 40) * 3
    Y = 1.2 * X + 0.5 + rng.randn(10, 40) * 0.1
    m, q = fit_slope_offset(Y, X)
    for i in range(10):
        A = np.vstack([X[i], np.ones_like(X[i])]).T
        coef, *_ = np.linalg.lstsq(A, Y[i], rcond=None)
        np.testing.assert_allclose(m[i], coef[0], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(q[i], coef[1], rtol=1e-3, atol=1e-4)


def test_clusters_stats(rng):
    U = rng.rand(8, 100)
    S = rng.rand(8, 100)
    cluster_ix = np.repeat([0, 1], 50)
    U_avg, S_avg = clusters_stats(U, S, np.array(["a", "b"]), cluster_ix,
                                  size_limit=40)
    np.testing.assert_allclose(U_avg[:, 0], U[:, :50].mean(1))
    np.testing.assert_allclose(S_avg[:, 1], S[:, 50:].mean(1))
    # small cluster falls back to the global mean
    U_avg2, _ = clusters_stats(U, S, np.array(["a", "b"]), cluster_ix,
                               size_limit=60)
    np.testing.assert_allclose(U_avg2[:, 0], U.mean(1))
