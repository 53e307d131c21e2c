import numpy as np
from sklearn.decomposition import PCA as SkPCA

from velocyto_tpu.ops import PCA


def test_pca_matches_sklearn(rng):
    X = rng.randn(120, 30).astype(np.float64)
    pcs = PCA(n_components=10).fit_transform(X)
    sk = SkPCA(n_components=10).fit_transform(X)
    np.testing.assert_allclose(np.abs(pcs), np.abs(sk), rtol=1e-3, atol=1e-3)
    # sign convention should match too (svd_flip)
    np.testing.assert_allclose(pcs, sk, rtol=1e-3, atol=1e-3)


def test_pca_explained_variance(rng):
    X = rng.randn(100, 20)
    p = PCA()
    p.fit(X)
    sk = SkPCA().fit(X)
    np.testing.assert_allclose(p.explained_variance_ratio_,
                               sk.explained_variance_ratio_,
                               rtol=1e-4, atol=1e-6)


def test_pca_gram_path_equals_svd_path(rng):
    """Tall data takes the Gram-eigh path; must equal full SVD exactly."""
    from velocyto_tpu.ops.pca import _pca_impl, _GRAM_RATIO
    X = rng.randn(300, 40) * rng.gamma(2.0, 2.0, 40)[None, :]
    assert X.shape[0] > _GRAM_RATIO * X.shape[1]
    pcs_g, vt_g, ev_g, tv_g = _pca_impl(X)
    # force the SVD path by transposing trickery: call the SVD directly
    mu = X.mean(0, keepdims=True)
    u, s, vt = np.linalg.svd(X - mu, full_matrices=False)
    from velocyto_tpu.ops.pca import _svd_flip_vt
    u, vt = _svd_flip_vt(u, vt)
    np.testing.assert_allclose(pcs_g, u * s[None, :], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(vt_g[:40], vt, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(ev_g, s ** 2 / (X.shape[0] - 1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(tv_g, (s ** 2).sum() / (X.shape[0] - 1),
                               rtol=1e-10)


def test_pca_subset_components_match_full(rng):
    """The dsyevr top-k subset path must equal the full decomposition."""
    from velocyto_tpu.ops.pca import _pca_impl
    X = rng.randn(400, 60) * rng.gamma(2.0, 2.0, 60)[None, :]
    pcs_k, vt_k, ev_k, tv_k = _pca_impl(X, 10)
    pcs_f, vt_f, ev_f, tv_f = _pca_impl(X)
    np.testing.assert_allclose(pcs_k, pcs_f[:, :10], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(vt_k, vt_f[:10], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(ev_k, ev_f[:10], rtol=1e-10)
    np.testing.assert_allclose(tv_k, tv_f, rtol=1e-12)
