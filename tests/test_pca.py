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
