"""End-to-end estimation pipeline on a synthetic loom file."""
import numpy as np
import pytest

import velocyto_tpu as vt
from velocyto_tpu.io import loom as loomio


@pytest.fixture(scope="module")
def synthetic_loom(tmp_path_factory):
    """Two-population synthetic dataset with a gamma-consistent U ~ 0.3 S."""
    rng = np.random.RandomState(0)
    genes, cells = 60, 150
    base = rng.gamma(2.0, 3.0, size=(genes, cells))
    S = rng.poisson(base).astype(np.uint16)
    U = rng.poisson(0.3 * base + 0.05).astype(np.uint16)
    A = rng.poisson(0.05 * base).astype(np.uint16)
    path = str(tmp_path_factory.mktemp("loom") / "synth.loom")
    ra = {"Gene": np.array([f"g{i}" for i in range(genes)]),
          "Accession": np.array([f"ENSG{i:08d}" for i in range(genes)]),
          "Chromosome": np.array(["1"] * genes),
          "Strand": np.array(["+"] * genes),
          "Start": np.arange(genes) * 1000,
          "End": np.arange(genes) * 1000 + 500}
    ca = {"CellID": np.array([f"sample:{i:04d}" for i in range(cells)])}
    loomio.create(path, {"": S.astype(np.float32), "spliced": S,
                         "unspliced": U, "ambiguous": A}, ra, ca,
                  {"velocyto.__version__": vt.__version__})
    return path


def test_loom_roundtrip(synthetic_loom):
    ds = loomio.connect(synthetic_loom)
    assert ds.layer["spliced"].shape == (60, 150)
    assert ds.layer[""].shape == (60, 150)
    assert "Gene" in ds.row_attrs
    assert ds.row_attrs["Gene"][0] == "g0"
    ds.close()


def test_full_estimation_pipeline(synthetic_loom, tmp_path):
    vlm = vt.VelocytoLoom(synthetic_loom)
    assert vlm.S.shape == (60, 150)

    vlm.normalize("both", size=True, log=True)
    assert hasattr(vlm, "S_sz") and hasattr(vlm, "U_norm")

    vlm.score_detection_levels(min_expr_counts=10, min_cells_express=5)
    vlm.filter_genes(by_detection_levels=True)

    vlm.perform_PCA(n_components=12)
    assert vlm.pcs.shape[1] == 12

    vlm.knn_imputation(k=10, balanced=True, b_sight=30, b_maxl=20,
                       n_pca_dims=10)
    assert vlm.Sx.shape == vlm.S.shape

    vlm.fit_gammas(limit_gamma=False, fit_offset=True)
    assert np.all(np.isfinite(vlm.gammas))
    # gamma should be ~0.3 on average for the synthetic model
    assert 0.1 < np.median(vlm.gammas) < 0.6

    vlm.predict_U()
    vlm.calculate_velocity()
    vlm.calculate_shift(assumption="constant_velocity")
    vlm.extrapolate_cell_at_t(delta_t=1)
    assert hasattr(vlm, "Sx_sz_t")

    # use PCA as the "embedding" to avoid a slow TSNE in CI
    vlm.ts = vlm.pcs[:, :2]
    vlm.estimate_transition_prob(hidim="Sx_sz", embed="ts",
                                 transform="sqrt", n_neighbors=30,
                                 knn_random=True, sampled_fraction=0.5)
    n = vlm.S.shape[1]
    assert vlm.corrcoef.shape == (n, n)
    assert not np.any(np.isnan(vlm.corrcoef))

    vlm.calculate_embedding_shift(sigma_corr=0.05, expression_scaling=True)
    assert vlm.delta_embedding.shape == (n, 2)
    assert np.all(np.isfinite(vlm.delta_embedding))

    vlm.calculate_grid_arrows(smooth=0.5, steps=(10, 10), n_neighbors=20)
    assert vlm.flow.shape == (100, 2)

    vlm.prepare_markov(sigma_D=1.0, sigma_W=0.5, direction="forward")
    vlm.run_markov(n_steps=50)
    assert vlm.diffused.shape == (n,)
    np.testing.assert_allclose(vlm.diffused.sum(), 1.0, rtol=1e-3)

    # snapshot / restore
    snap = str(tmp_path / "snap.hdf5")
    del vlm.pca  # non-picklable-friendly attrs can stay, PCA object pickles fine
    vlm.to_hdf5(snap)
    vlm2 = vt.load_velocyto_hdf5(snap)
    np.testing.assert_allclose(vlm2.gammas, vlm.gammas)
    np.testing.assert_allclose(vlm2.delta_embedding, vlm.delta_embedding)


def test_scaled_pair_bit_exact_vs_naive():
    """_scaled_pair (the out= normalize kernel) must be bit-identical to
    the naive numpy expressions it replaces, across the dtype
    combinations the pipeline produces and the nonfinite-factor edge
    (zero-size cells -> inf/nan factors zeroed, reference :570-620)."""
    from velocyto_tpu.analysis import _scaled_pair
    rng = np.random.RandomState(7)
    cases = []
    M32 = rng.poisson(2.0, (30, 50)).astype(np.float32)
    cases.append((M32, rng.uniform(0.5, 2.0, 50), 1))          # f32 x f64
    cases.append((M32, rng.uniform(0.5, 2.0, 50).astype(np.float32), 1.0))
    cases.append((M32.astype(np.uint16), 1, 1))                # size=False
    f_bad = rng.uniform(0.5, 2.0, 50)
    f_bad[3] = np.inf
    f_bad[7] = np.nan
    cases.append((M32, f_bad, 1))                              # zero-size cells
    for M, factor, pcount in cases:
        with np.errstate(divide="ignore", invalid="ignore"):
            want_sz = factor * M
        sz, norm = _scaled_pair(M, factor, pcount, True,
                                clean_nonfinite=True)
        if isinstance(want_sz, np.ndarray) and want_sz.dtype.kind == "f":
            want_sz[~np.isfinite(want_sz)] = 0
        want_norm = np.log2(want_sz + pcount)
        assert sz.dtype == want_sz.dtype and norm.dtype == want_norm.dtype
        np.testing.assert_array_equal(sz, want_sz)
        np.testing.assert_array_equal(norm, want_norm)
        # the no-cleanup variant (S path) must match the plain expression
        with np.errstate(divide="ignore", invalid="ignore"):
            want_raw = factor * M
            sz2, _ = _scaled_pair(M, factor, pcount, False)
        np.testing.assert_array_equal(sz2, want_raw)


def test_dev_scale_recipe_bit_exact_and_invalidated(synthetic_loom):
    """_get_dev("S_sz"/"U_sz") computed on device from the raw counts
    (upload-compression optimization) must be bit-identical to
    uploading the host scaled matrix, and the recipe must invalidate on
    reassignment, source reassignment, and the documented in-place
    mutation sites (adjust_totS_totU / normalize_median)."""
    import jax.numpy as jnp
    vlm = vt.VelocytoLoom(synthetic_loom)
    vlm.normalize("both", size=True, log=True)
    assert "S_sz" in vlm.__dict__.get("_dev_recipes", {})
    assert "U_sz" in vlm.__dict__["_dev_recipes"]
    for name in ("S_sz", "U_sz"):
        via_recipe = np.asarray(vlm._get_dev(name))
        direct = np.asarray(jnp.asarray(getattr(vlm, name), jnp.float32))
        if getattr(vlm, name).dtype == np.float32:
            np.testing.assert_array_equal(via_recipe, direct, err_msg=name)
        else:   # f64 host result: documented <= 1 ulp (f32) difference
            np.testing.assert_allclose(via_recipe, direct, rtol=1.3e-7,
                                       atol=0, err_msg=name)
    # zero-size-cell edge: an inf factor column must come back zeroed
    vlm2 = vt.VelocytoLoom(synthetic_loom)
    vlm2.U[:, 3] = 0
    vlm2.normalize("U", size=True, log=False)
    assert np.all(np.asarray(vlm2._get_dev("U_sz"))[:, 3] == 0)
    np.testing.assert_allclose(np.asarray(vlm2._get_dev("U_sz")),
                                vlm2.U_sz.astype(np.float32), rtol=1.3e-7)
    # invalidation: explicit reassignment of the target
    vlm.S_sz = vlm.S_sz * 2.0
    assert "S_sz" not in vlm.__dict__["_dev_recipes"]
    np.testing.assert_array_equal(np.asarray(vlm._get_dev("S_sz")),
                                  np.asarray(jnp.asarray(vlm.S_sz,
                                                         jnp.float32)))
    # and an f32 pipeline gets the exact-equality guarantee
    v32 = vt.VelocytoLoom.__new__(vt.VelocytoLoom)
    rng32 = np.random.RandomState(1)
    v32.S = rng32.poisson(2.0, (40, 60)).astype(np.float32)
    v32.U = rng32.poisson(1.0, (40, 60)).astype(np.float32)
    v32._normalize_S()
    v32._normalize_U()
    assert v32.S_sz.dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(v32._get_dev("S_sz")),
        np.asarray(jnp.asarray(v32.S_sz, jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(v32._get_dev("U_sz")),
        np.asarray(jnp.asarray(v32.U_sz, jnp.float32)))
    # invalidation: reassignment of the SOURCE
    vlm.normalize("U", size=True, log=False)
    assert "U_sz" in vlm.__dict__["_dev_recipes"]
    vlm.U = vlm.U * 1.0
    assert "U_sz" not in vlm.__dict__["_dev_recipes"]
    # invalidation: in-place mutation sites
    vlm3 = vt.VelocytoLoom(synthetic_loom)
    vlm3.normalize("both", size=True, log=True)
    vlm3.small_U_pop = vlm3.initial_Ucell_size < np.percentile(
        vlm3.initial_Ucell_size, 20)
    vlm3.adjust_totS_totU(skip_low_U_pop=True)
    np.testing.assert_allclose(np.asarray(vlm3._get_dev("U_sz")),
                                vlm3.U_sz.astype(np.float32), rtol=1.3e-7)


def test_transition_prob_validates_before_threads(synthetic_loom):
    """Bad parameters must raise BEFORE the sampling/randomization worker
    threads start (round-4 advisor: errors mid-flight abandoned daemon
    workers doing device uploads)."""
    import threading
    vlm = vt.VelocytoLoom(synthetic_loom)
    vlm.normalize("both", size=True, log=True)
    vlm.perform_PCA(n_components=8)
    vlm.knn_imputation(k=10, balanced=False)
    vlm.fit_gammas(limit_gamma=False, fit_offset=True)
    vlm.predict_U()
    vlm.calculate_velocity()
    vlm.calculate_shift(assumption="constant_velocity")
    vlm.extrapolate_cell_at_t(delta_t=1)
    vlm.ts = vlm.pcs[:, :2]
    before = threading.active_count()
    with pytest.raises(NotImplementedError, match="not a valid parameter"):
        vlm.estimate_transition_prob(hidim="Sx_sz", embed="ts",
                                     transform="bogus", n_neighbors=10)
    with pytest.raises(ValueError, match="ndims"):
        vlm.estimate_transition_prob(hidim="Sx_sz", embed="ts",
                                     transform="sqrt", ndims=3,
                                     n_neighbors=10)
    assert threading.active_count() == before, \
        "validation errors must not leave worker threads behind"


def test_embedding_shift_matches_dense_oracle(synthetic_loom):
    """The blocked XLA embedding-shift kernel vs the dense formula."""
    rng = np.random.RandomState(3)
    n = 40
    emb = rng.randn(n, 2)
    corr = rng.rand(n, n) * 0.2
    knn = (rng.rand(n, n) < 0.3).astype(float)
    np.fill_diagonal(knn, 1)
    sigma = 0.05
    P = np.exp(corr / sigma) * knn
    P /= P.sum(1)[:, None]

    # dense oracle (reference analysis.py:1704-1712 formula)
    unitary = emb.T[:, None, :] - emb.T[:, :, None]  # (2, n, n)
    with np.errstate(divide="ignore", invalid="ignore"):
        unitary /= np.linalg.norm(unitary, ord=2, axis=0)
        np.fill_diagonal(unitary[0], 0)
        np.fill_diagonal(unitary[1], 0)
    expected = (P * unitary).sum(2)
    expected -= (knn * unitary).sum(2) / knn.sum(1)[None, :]
    expected = expected.T

    import jax.numpy as jnp
    from velocyto_tpu.analysis import _embedding_shift_blocked
    got = np.asarray(_embedding_shift_blocked(
        jnp.asarray(emb, jnp.float32), jnp.asarray(P, jnp.float32),
        jnp.asarray(knn, jnp.float32), jnp.asarray(knn.sum(1), jnp.float32)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_embedding_shift_compact_equals_dense():
    """knn_random mode: the compact O(N*nn) embedding-shift path must
    reproduce the dense-matrix path (incl. expression scaling and the
    randomized control)."""
    import velocyto_tpu as vt
    rng = np.random.default_rng(5)
    n, g = 150, 60
    S = rng.poisson(rng.gamma(2., 2., (g, n))).astype(np.float32)
    U = rng.poisson(0.3 * S + 0.1).astype(np.float32)

    def build():
        v = vt.VelocytoLoom.__new__(vt.VelocytoLoom)
        v.S, v.U, v.A = S.copy(), U.copy(), np.zeros_like(S)
        v.initial_cell_size = S.sum(0)
        v.initial_Ucell_size = U.sum(0)
        v.ca = {"CellID": np.array([f"c{i}" for i in range(n)])}
        v.ra = {"Gene": np.array([f"g{i}" for i in range(g)])}
        v._normalize_S(relative_size=v.initial_cell_size,
                       target_size=v.initial_cell_size.mean())
        v._normalize_U(relative_size=v.initial_Ucell_size,
                       target_size=v.initial_Ucell_size.mean())
        v.S_norm = np.log2(v.S_sz + 1)
        v.perform_PCA(which="S_norm", n_components=10)
        v.knn_imputation(k=10, balanced=False, n_jobs=1)
        v.fit_gammas(weighted=True, weights="maxmin_diag", fit_offset=True,
                     limit_gamma=False)
        v.predict_U()
        v.calculate_velocity()
        v.calculate_shift(assumption="constant_velocity")
        v.extrapolate_cell_at_t(delta_t=1.)
        v.ts = np.ascontiguousarray(v.pcs[:, :2])
        v.estimate_transition_prob(hidim="Sx_sz", embed="ts",
                                   transform="sqrt", knn_random=True,
                                   sampled_fraction=0.5,
                                   calculate_randomized=True)
        return v

    v_compact = build()
    v_dense = build()
    # force the dense fallback: materialize the dense lazy views first
    # (the fallback path consumes them), then invalidate the compact state
    _ = v_dense.corrcoef, v_dense.corrcoef_random
    del v_dense._compact_ixs
    for k in ("_corr_dev", "_corr_rndm_dev", "_compact_corr",
              "_compact_corr_random"):
        v_dense.__dict__.pop(k, None)
    for expr in (False, True):
        v_compact.calculate_embedding_shift(sigma_corr=0.05,
                                            expression_scaling=expr)
        v_dense.calculate_embedding_shift(sigma_corr=0.05,
                                          expression_scaling=expr)
        np.testing.assert_allclose(v_compact.transition_prob,
                                   v_dense.transition_prob,
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(v_compact.transition_prob_random,
                                   v_dense.transition_prob_random,
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(v_compact.delta_embedding,
                                   v_dense.delta_embedding,
                                   rtol=1e-3, atol=2e-5)
        np.testing.assert_allclose(v_compact.delta_embedding_random,
                                   v_dense.delta_embedding_random,
                                   rtol=1e-3, atol=2e-5)
        if expr:
            np.testing.assert_allclose(v_compact.scaling, v_dense.scaling,
                                       rtol=1e-3, atol=2e-4)


def test_lazy_dense_corr_views(tmp_path):
    """estimate_transition_prob keeps only compact device state: the
    dense corrcoef/transition_prob are materialized on first attribute
    access, hasattr stays False for absent randomized state, and
    to_hdf5 materializes the dense views for snapshot parity."""
    import velocyto_tpu as vt
    rng = np.random.default_rng(11)
    n, g = 80, 40
    S = rng.poisson(rng.gamma(2., 2., (g, n))).astype(np.float32)
    U = rng.poisson(0.3 * S + 0.1).astype(np.float32)
    v = vt.VelocytoLoom.__new__(vt.VelocytoLoom)
    v.S, v.U, v.A = S, U, np.zeros_like(S)
    v.initial_cell_size = S.sum(0)
    v.initial_Ucell_size = U.sum(0)
    v.ca = {"CellID": np.array([f"c{i}" for i in range(n)])}
    v.ra = {"Gene": np.array([f"g{i}" for i in range(g)])}
    v._normalize_S(relative_size=v.initial_cell_size,
                   target_size=v.initial_cell_size.mean())
    v._normalize_U(relative_size=v.initial_Ucell_size,
                   target_size=v.initial_Ucell_size.mean())
    v.S_norm = np.log2(v.S_sz + 1)
    v.perform_PCA(which="S_norm", n_components=8)
    v.knn_imputation(k=8, balanced=False, n_jobs=1)
    v.fit_gammas(weighted=False)
    v.predict_U()
    v.calculate_velocity()
    v.calculate_shift(assumption="constant_velocity")
    v.extrapolate_cell_at_t(delta_t=1.)
    v.ts = np.ascontiguousarray(v.pcs[:, :2])
    v.estimate_transition_prob(hidim="Sx_sz", embed="ts", transform="sqrt",
                               knn_random=True, sampled_fraction=0.5,
                               calculate_randomized=False)
    # nothing dense materialized yet; no randomized state
    assert "corrcoef" not in v.__dict__
    assert not hasattr(v, "corrcoef_random")
    assert not hasattr(v, "transition_prob")   # no embedding shift yet
    v.calculate_embedding_shift(sigma_corr=0.05, expression_scaling=False)
    assert "transition_prob" not in v.__dict__
    # first touch materializes and caches
    tp = v.transition_prob
    assert "transition_prob" in v.__dict__ and tp.shape == (n, n)
    rows = np.arange(n)[:, None]
    np.testing.assert_allclose(tp[rows, v._compact_ixs].sum(1), 1.0,
                               rtol=1e-9)
    cc = v.corrcoef
    np.testing.assert_array_equal(cc[rows, v._compact_ixs],
                                  v._compact_corr)
    # snapshot: dense views dumped, reload equals
    p = str(tmp_path / "snap.hdf5")
    v2_pre = dict(v.__dict__)
    v.to_hdf5(p)
    v2 = vt.load_velocyto_hdf5(p)
    np.testing.assert_array_equal(v2.corrcoef, v.corrcoef)
    np.testing.assert_array_equal(v2.transition_prob, v.transition_prob)
    # unknown attributes still raise cleanly
    import pytest as _pytest
    with _pytest.raises(AttributeError):
        _ = v.definitely_not_an_attribute
