"""Direct parity: velocyto_tpu colDeltaCor kernels vs the REFERENCE's own
compiled OpenMP kernel (extracted + built from its generated
speedboosted.c, see tests/refkernel/build.py).

This closes the circularity of validating against a self-written numpy
oracle: the comparison target here is the reference's literal machine
code (built with its own -fopenmp -ffast-math flags per
/root/reference/setup.py:17-21).
"""
import numpy as np
import pytest

import refkernel
from velocyto_tpu.ops.coldeltacor import (col_delta_cor,
                                          col_delta_cor_partial,
                                          col_delta_cor_partial_compact)

pytestmark = pytest.mark.skipif(not refkernel.available(),
                                reason="reference kernel build unavailable")


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    g, n, nn = 90, 130, 24
    e = rng.gamma(2.0, 2.0, size=(g, n))
    d = rng.randn(g, n)
    ixs = np.stack([rng.choice(n, nn, replace=False)
                    for _ in range(n)]).astype(np.intp)
    return e, d, ixs


@pytest.mark.parametrize("transform,psc,atol", [
    ("linear", 0.0, 2e-4), ("sqrt", 0.0, 2e-4), ("sqrt", 1e-10, 2e-4),
    # log10 with tiny psc produces |A| ~ 10 with small spread; the f32
    # streaming moments lose ~3 digits to cancellation (verified: the f64
    # oracle matches the reference binary to 1e-13 on the same inputs)
    ("log10", 1e-10, 1.5e-3), ("log10", 1.0, 2e-4),
])
def test_dense_vs_reference_binary(data, transform, psc, atol):
    e, d, _ = data
    ref = refkernel.col_delta_cor(e, d, transform, psc)
    got = col_delta_cor(e, d, transform=transform, psc=psc)
    # the diagonal is the degenerate self-correlation (constant column ->
    # 0/0); the reference's own analysis layer zeroes it
    # (reference analysis.py:1604,1666), so it is excluded here
    np.fill_diagonal(ref, 0.0)
    np.fill_diagonal(got, 0.0)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=atol)


@pytest.mark.parametrize("transform,psc", [
    ("linear", 0.0), ("sqrt", 1e-10), ("log10", 1e-10),
])
def test_partial_vs_reference_binary(data, transform, psc):
    e, d, ixs = data
    ref = refkernel.col_delta_cor_partial(e, d, ixs, transform, psc)
    got = col_delta_cor_partial(e, d, ixs, transform=transform, psc=psc)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_partial_compact_vs_reference_binary(data):
    e, d, ixs = data
    ref_dense = refkernel.col_delta_cor_partial(e, d, ixs, "sqrt", 1e-10)
    compact = col_delta_cor_partial_compact(e, d, ixs, transform="sqrt",
                                            psc=1e-10)
    n = e.shape[1]
    ref_compact = ref_dense[np.arange(n)[:, None], ixs]
    np.testing.assert_allclose(compact, ref_compact, rtol=2e-4, atol=2e-4)
