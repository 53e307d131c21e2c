"""Device-resident balanced-kNN (ops/knn_device.py) vs the host path.

The host path (ops/knn.py) is itself validated against sklearn and the
reference numba semantics; these tests pin the device chain to it
bit-for-bit: same candidate ordering (f64 re-score + tie-breaks), same
greedy balancing decisions, same smoothing weights.
"""
import numpy as np
import pytest
from scipy import sparse

import velocyto_tpu as vt
from velocyto_tpu.ops import knn_device as kd
from velocyto_tpu.ops.knn import knn_search, knn_balance
from velocyto_tpu.ops.smoothing import (connectivity_to_weights,
                                        convolve_by_sparse_weights)


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def test_knn_search_dev_matches_host(rng):
    x = rng.randn(300, 20)
    dist_h, idx_h = knn_search(x, 40)
    dist_d, idx_d = kd.knn_search_dev(x, 40)
    np.testing.assert_array_equal(np.asarray(idx_d), idx_h)
    np.testing.assert_allclose(np.asarray(dist_d), dist_h, rtol=1e-12)


def test_knn_search_dev_with_duplicates(rng):
    """Exact ties (duplicated points) keep sklearn index tie-breaking."""
    x = rng.randn(120, 8)
    x[40] = x[10]
    x[80] = x[10]
    dist_h, idx_h = knn_search(x, 100)      # large-k sort path
    dist_d, idx_d = kd.knn_search_dev(x, 100)
    np.testing.assert_array_equal(np.asarray(idx_d), idx_h)


def test_knn_search_dev_correlation_metric(rng):
    x = rng.randn(150, 30)
    dist_h, idx_h = knn_search(x, 20, metric="correlation")
    dist_d, idx_d = kd.knn_search_dev(x, 20, metric="correlation")
    np.testing.assert_array_equal(np.asarray(idx_d), idx_h)
    np.testing.assert_allclose(np.asarray(dist_d), dist_h, rtol=1e-10)


def _host_balance(dsi, dist, maxl, k, constraint=None):
    return knn_balance(dsi.astype(np.int64), dist, maxl=maxl, k=k,
                       constraint=constraint)


def test_balance_scan_matches_host(rng):
    n, sight, k, maxl = 200, 31, 12, 20
    x = rng.randn(n, 10)
    dist, dsi = knn_search(x, sight)
    dn_h, di_h, l_h = _host_balance(dsi, dist, maxl, k)
    import jax.numpy as jnp
    dn_d, di_d, l_d = kd.balance_knn_dev(
        jnp.asarray(dsi, jnp.int32), jnp.asarray(dist, jnp.float64),
        maxl=maxl, k=k)
    np.testing.assert_array_equal(np.asarray(di_d), di_h)
    np.testing.assert_array_equal(np.asarray(dn_d), dn_h)
    np.testing.assert_array_equal(np.asarray(l_d), l_h)


def test_balance_scan_exhausted_sight_self_fill(rng):
    """Tiny maxl exhausts sights -> the self-fill branch must match."""
    n, sight, k, maxl = 120, 15, 10, 2
    x = rng.randn(n, 6)
    dist, dsi = knn_search(x, sight)
    dn_h, di_h, l_h = _host_balance(dsi, dist, maxl, k)
    import jax.numpy as jnp
    dn_d, di_d, l_d = kd.balance_knn_dev(
        jnp.asarray(dsi, jnp.int32), jnp.asarray(dist, jnp.float64),
        maxl=maxl, k=k)
    np.testing.assert_array_equal(np.asarray(di_d), di_h)
    np.testing.assert_array_equal(np.asarray(dn_d), dn_h)
    np.testing.assert_array_equal(np.asarray(l_d), l_h)


def test_balance_scan_constrained(rng):
    n, sight, k, maxl = 150, 23, 8, 12
    x = rng.randn(n, 5)
    groups = rng.randint(0, 3, n)
    dist, dsi = knn_search(x, sight)
    dn_h, di_h, l_h = _host_balance(dsi, dist, maxl, k, constraint=groups)
    import jax.numpy as jnp
    dn_d, di_d, l_d = kd.balance_knn_dev(
        jnp.asarray(dsi, jnp.int32), jnp.asarray(dist, jnp.float64),
        maxl=maxl, k=k, constraint=groups)
    np.testing.assert_array_equal(np.asarray(di_d), di_h)
    np.testing.assert_array_equal(np.asarray(dn_d), dn_h)


def test_balance_scan_adversarial_shapes(rng):
    """Property sweep over the speculative batched scan's hard regimes:
    cap exactly at k (every acceptance can bind), cap at k+1 (crossings
    on nearly every window), duplicate points (tie groups + self beyond
    slot 0), n smaller than the batch width, and n not a multiple of
    the window -- each bit-equal to the host greedy loop."""
    import jax.numpy as jnp
    cases = [
        dict(n=300, sight=41, k=10, maxl=10),    # cap == k: max pressure
        dict(n=300, sight=41, k=10, maxl=11),    # cap == k+1
        dict(n=17, sight=9, k=4, maxl=5),        # n < batch width
        dict(n=257, sight=33, k=16, maxl=40),    # n % window != 0
    ]
    for case in cases:
        n, sight, k, maxl = (case[x] for x in ("n", "sight", "k", "maxl"))
        x = rng.randn(n, 4)
        # force duplicate points (exact ties, self not in slot 0)
        x[:: max(2, n // 8)] = x[0]
        dist, dsi = knn_search(x, min(sight, n))
        dn_h, di_h, l_h = _host_balance(dsi, dist, maxl, k)
        dn_d, di_d, l_d = kd.balance_knn_dev(
            jnp.asarray(dsi, jnp.int32), jnp.asarray(dist, jnp.float64),
            maxl=maxl, k=k)
        np.testing.assert_array_equal(np.asarray(di_d), di_h, err_msg=str(case))
        np.testing.assert_array_equal(np.asarray(dn_d), dn_h, err_msg=str(case))
        np.testing.assert_array_equal(np.asarray(l_d), l_h, err_msg=str(case))


def test_smooth_dev_multi_equals_separate(rng):
    """The fused S+U convolution must equal two separate passes."""
    import jax.numpy as jnp
    n, g, k = 80, 13, 6
    idx = np.stack([rng.choice(n, k, replace=False)
                    for _ in range(n)]).astype(np.int32)
    w = rng.rand(n, k).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    a = rng.rand(g, n).astype(np.float32)
    b = rng.rand(g + 3, n).astype(np.float32)
    sa, sb = kd.smooth_dev_multi(
        (jnp.asarray(a), jnp.asarray(b)), jnp.asarray(idx), jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(sa),
        np.asarray(kd.smooth_dev(jnp.asarray(a), jnp.asarray(idx),
                                 jnp.asarray(w))), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sb),
        np.asarray(kd.smooth_dev(jnp.asarray(b), jnp.asarray(idx),
                                 jnp.asarray(w))), rtol=1e-6, atol=1e-6)


def test_balanced_graph_and_weights_match_reference_chain(rng):
    """Full chain: graph csr + row-normalized weights equal the host
    BalancedKNN.kneighbors_graph -> connectivity_to_weights chain."""
    n, k, sight, maxl = 160, 9, 30, 14
    x = rng.randn(n, 12)
    bknn = vt.BalancedKNN(k=k, sight_k=sight, maxl=maxl, mode="distance")
    bknn.fit(x)
    knn_host = bknn.kneighbors_graph(mode="distance")
    conn = (knn_host > 0).astype(float)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        conn.setdiag(1)
    w_host = connectivity_to_weights(conn)

    g = kd.balanced_knn_graph_dev(x, k=k, sight_k=sight, maxl=maxl)
    knn_dev = kd.graph_to_csr(g)
    # same sparsity pattern and ordering; values to f64 sum-order ulps
    np.testing.assert_allclose(knn_dev.toarray(), knn_host.toarray(),
                               rtol=1e-12, atol=0)
    w_dev = kd.weights_to_csr(g, diag=1)
    np.testing.assert_allclose(w_dev.toarray(), w_host.toarray(),
                               rtol=1e-12)

    # compact on-device weights row-scatter to the same dense matrix
    nbr_idx, nbr_w = kd.compact_weights_dev(g, diag=1)
    dense = np.zeros((n, n))
    ii = np.asarray(nbr_idx)
    ww = np.asarray(nbr_w)
    for r in range(n):
        np.add.at(dense[r], ii[r], ww[r])
    np.testing.assert_allclose(dense, w_host.toarray(), rtol=1e-6,
                               atol=1e-9)


def test_smooth_dev_matches_convolve(rng):
    n, g_dim, k, sight, maxl = 140, 25, 7, 25, 12
    x = rng.randn(n, 10)
    data = rng.rand(g_dim, n)

    bknn = vt.BalancedKNN(k=k, sight_k=sight, maxl=maxl, mode="distance")
    bknn.fit(x)
    knn_host = bknn.kneighbors_graph(mode="distance")
    conn = (knn_host > 0).astype(float)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        conn.setdiag(1)
    w_host = connectivity_to_weights(conn)
    expected = convolve_by_sparse_weights(data, w_host)

    import jax.numpy as jnp
    g = kd.balanced_knn_graph_dev(x, k=k, sight_k=sight, maxl=maxl)
    nbr_idx, nbr_w = kd.compact_weights_dev(g, diag=1)
    got = kd.smooth_dev(jnp.asarray(data, jnp.float32), nbr_idx, nbr_w)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                               atol=1e-5)


def test_plain_graph_dev_matches_knn_distance_matrix(rng):
    n, k = 130, 11
    x = rng.randn(n, 9)
    host = vt.knn_distance_matrix(x, k=k, mode="distance")
    g = kd.knn_graph_dev(x, k=k)
    np.testing.assert_allclose(kd.graph_to_csr(g).toarray(),
                               host.toarray(), rtol=1e-12)
