"""Golden-fixture generator: runs the REFERENCE velocyto.py analysis
pipeline (mounted read-only at /root/reference) on a deterministic
synthetic dataset and saves the outputs of every stage to golden.npz.

The reference's native/pysam/loompy dependencies are stubbed:
  - pysam/loompy: import-time stubs (the analysis layer never calls them
    when the VelocytoLoom is attribute-injected)
  - numba.jit: identity decorator (the pure-python loop bodies run as-is)
  - velocyto.speedboosted: the reference's OWN compiled OpenMP kernels,
    extracted from its generated speedboosted.c and built with its own
    flags (tests/refkernel/build.py).  Falls back to the numpy oracle in
    tests/oracles.py only if the native build is unavailable.

Run:  python tests/golden/generate.py    (writes tests/golden/golden.npz)
"""
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))          # tests/ (oracles)
from oracles import col_delta_cor_dense, col_delta_cor_partial  # noqa
import refkernel  # noqa  (the reference's compiled kernel, tests/refkernel)


def _install_stubs():
    # numpy >= 1.24 rejects generators in np.stack (reference :1562)
    _orig_stack = np.stack

    def _stack(arrays, *a, **k):
        if not isinstance(arrays, (list, tuple, np.ndarray)):
            arrays = list(arrays)
        return _orig_stack(arrays, *a, **k)

    np.stack = _stack
    # scipy >= 1.14 removed the `.A` alias the reference uses
    from scipy import sparse as _sp
    if not hasattr(_sp.csr_matrix, "A"):
        _sp.csr_matrix.A = property(lambda self: self.toarray())
        _sp.coo_matrix.A = property(lambda self: self.toarray())
        _sp.lil_matrix.A = property(lambda self: self.toarray())
    pysam = types.ModuleType("pysam")
    pysam.AlignedSegment = type("AlignedSegment", (), {})
    pysam.AlignmentFile = type("AlignmentFile", (), {})
    sys.modules["pysam"] = pysam
    loompy = types.ModuleType("loompy")
    loompy.connect = None
    loompy.create = None
    sys.modules["loompy"] = loompy
    numba = types.ModuleType("numba")

    def jit(*a, **k):
        if a and callable(a[0]):
            return a[0]
        return lambda f: f

    class _Ty:
        def __call__(self, *a):
            return None

        def __getitem__(self, x):
            return None

    numba.jit = jit
    numba.njit = jit
    for n in ("float64", "float32", "int64", "int32", "intp", "boolean",
              "void", "int_"):
        setattr(numba, n, _Ty())
    sys.modules["numba"] = numba

    sb = types.ModuleType("velocyto.speedboosted")
    use_native = refkernel.available()
    print("speedboosted backend:",
          "reference compiled kernel" if use_native else "numpy oracle")

    def _mk(transform, partial):
        # reference signatures: (emat, dmat, out[, ixs], threads[, psc])
        if partial:
            def f(e, d, out, ixs, threads, psc=0.0):
                if use_native:
                    out[:] = refkernel.col_delta_cor_partial(
                        e, d, ixs, transform=transform, psc=psc,
                        threads=threads)
                    return
                # reference layout: scatter corr into the (N, N) matrix at
                # the neighbor columns (speedboosted.pyx partial kernels)
                compact = col_delta_cor_partial(e, d, ixs,
                                                transform=transform, psc=psc)
                n = out.shape[0]
                out[np.arange(n)[:, None], np.asarray(ixs)] = compact
            return f

        def f(e, d, out, threads, psc=0.0):
            if use_native:
                out[:] = refkernel.col_delta_cor(e, d, transform=transform,
                                                 psc=psc, threads=threads)
                return
            out[:] = col_delta_cor_dense(e, d, transform=transform, psc=psc)
        return f

    sb._colDeltaCor = _mk("linear", False)
    sb._colDeltaCorSqrt = _mk("sqrt", False)
    sb._colDeltaCorLog10 = _mk("log10", False)
    sb._colDeltaCorpartial = _mk("linear", True)
    sb._colDeltaCorSqrtpartial = _mk("sqrt", True)
    sb._colDeltaCorLog10partial = _mk("log10", True)
    sys.modules["velocyto.speedboosted"] = sb


def synth_data(seed=0, n=120, g=80):
    rng = np.random.default_rng(seed)
    gamma_true = rng.uniform(0.2, 1.2, g)
    base = rng.gamma(2.0, 2.0, (g, n))
    S = rng.poisson(base).astype(np.float32)
    U = rng.poisson(0.5 * gamma_true[:, None] * base + 0.05).astype(
        np.float32)
    return S, U


def main():
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    import velocyto as rvcy

    S, U = synth_data()
    g, n = S.shape
    vlm = rvcy.VelocytoLoom.__new__(rvcy.VelocytoLoom)
    vlm.S = S.copy()
    vlm.U = U.copy()
    vlm.A = np.zeros_like(S)
    vlm.initial_cell_size = vlm.S.sum(0)
    vlm.initial_Ucell_size = vlm.U.sum(0)
    vlm.ca = {"CellID": np.array([f"c{i}" for i in range(n)])}
    vlm.ra = {"Gene": np.array([f"g{i}" for i in range(g)])}

    out = {"S": S, "U": U}
    vlm._normalize_S(relative_size=vlm.initial_cell_size,
                     target_size=np.mean(vlm.initial_cell_size))
    vlm._normalize_U(relative_size=vlm.initial_Ucell_size,
                     target_size=np.mean(vlm.initial_Ucell_size))
    out["S_sz"] = vlm.S_sz
    out["U_sz"] = vlm.U_sz

    vlm.S_norm = np.log2(vlm.S_sz + 1)
    vlm.perform_PCA(which="S_norm", n_components=20)
    out["pca_explained"] = vlm.pca.explained_variance_ratio_[:20]

    vlm.knn_imputation(k=10, balanced=False, n_jobs=1,
                       metric="euclidean")
    out["Sx"] = vlm.Sx
    out["Ux"] = vlm.Ux

    vlm.fit_gammas(limit_gamma=False, fit_offset=True,
                   use_imputed_data=True, use_size_norm=True,
                   weighted=True, weights="maxmin_diag")
    out["gammas"] = vlm.gammas
    out["q"] = vlm.q
    out["R2"] = getattr(vlm, "R2", np.zeros(g))

    vlm.predict_U()
    vlm.calculate_velocity()
    vlm.calculate_shift(assumption="constant_velocity")
    vlm.extrapolate_cell_at_t(delta_t=1.)
    out["Upred"] = vlm.Upred
    out["velocity"] = vlm.velocity
    out["delta_S"] = vlm.delta_S
    out["Sx_sz_t"] = vlm.Sx_sz_t

    vlm.ts = np.ascontiguousarray(vlm.pcs[:, :2])
    out["ts"] = vlm.ts
    vlm.estimate_transition_prob(hidim="Sx_sz", embed="ts",
                                 transform="sqrt", knn_random=False,
                                 n_neighbors=None, calculate_randomized=False)
    out["corrcoef"] = vlm.corrcoef
    vlm.calculate_embedding_shift(sigma_corr=0.05,
                                  expression_scaling=False)
    out["transition_prob"] = vlm.transition_prob
    out["delta_embedding"] = vlm.delta_embedding
    vlm.calculate_grid_arrows(smooth=0.5, steps=(10, 10), n_neighbors=20)
    out["flow_grid"] = vlm.flow_grid
    out["flow"] = vlm.flow

    # expression-scaled shift (full mode)
    vlm.calculate_embedding_shift(sigma_corr=0.05, expression_scaling=True,
                                  scaling_penalty=1.)
    out["delta_embedding_scaled"] = vlm.delta_embedding
    out["scaling"] = vlm.scaling

    # sampled knn_random mode (the production path): exact RNG parity
    vlm.estimate_transition_prob(hidim="Sx_sz", embed="ts",
                                 transform="sqrt", knn_random=True,
                                 sampled_fraction=0.5,
                                 calculate_randomized=False)
    out["knnr_corrcoef"] = vlm.corrcoef
    out["knnr_sampling_ixs"] = vlm.sampling_ixs
    out["knnr_embedding_knn"] = vlm.embedding_knn.toarray()
    vlm.calculate_embedding_shift(sigma_corr=0.05,
                                  expression_scaling=False)
    out["knnr_transition_prob"] = vlm.transition_prob
    out["knnr_delta_embedding"] = vlm.delta_embedding

    # ---- part 2: filtering / normalization family on a fresh object ----
    vlm2 = rvcy.VelocytoLoom.__new__(rvcy.VelocytoLoom)
    vlm2.S = S.copy()
    vlm2.U = U.copy()
    vlm2.A = np.zeros_like(S)
    vlm2.initial_cell_size = vlm2.S.sum(0)
    vlm2.initial_Ucell_size = vlm2.U.sum(0)
    vlm2.ca = {"CellID": np.array([f"c{i}" for i in range(n)])}
    vlm2.ra = {"Gene": np.array([f"g{i}" for i in range(g)])}
    vlm2.score_detection_levels(min_expr_counts=40, min_cells_express=10,
                                min_expr_counts_U=0, min_cells_express_U=0)
    out["detection_level_selected"] = vlm2.detection_level_selected
    vlm2.score_cv_vs_mean(N=30, min_expr_cells=2, max_expr_avg=35)
    out["cv_mean_score"] = vlm2.cv_mean_score
    out["cv_mean_selected"] = vlm2.cv_mean_selected
    # low-variability gene sets for the Anders-Huber size factor
    vlm2.score_cv_vs_mean(N=30, min_expr_cells=2, max_expr_avg=35,
                          sort_inverse=True, which="S")
    vlm2.score_cv_vs_mean(N=30, min_expr_cells=2, max_expr_avg=35,
                          sort_inverse=True, which="U")
    vlm2.robust_size_factor(pc=0.1, which="both")
    out["size_factor"] = vlm2.size_factor
    out["Usize_factor"] = vlm2.Usize_factor
    # re-score the variable genes for the downstream filter
    vlm2.score_cv_vs_mean(N=30, min_expr_cells=2, max_expr_avg=35)
    out["cv_mean_score2"] = vlm2.cv_mean_score
    vlm2.normalize_by_total(min_perc_U=0.5, skip_low_U_pop=True)
    out["nbt_S_sz"] = vlm2.S_sz
    out["nbt_U_sz"] = vlm2.U_sz
    vlm2.filter_genes(by_detection_levels=True, by_cv_vs_mean=True)
    out["filtered_S"] = vlm2.S
    out["filtered_genes"] = vlm2.ra["Gene"]

    # balanced kNN imputation (greedy balancing, hub-first order)
    vlm3 = rvcy.VelocytoLoom.__new__(rvcy.VelocytoLoom)
    vlm3.S = S.copy()
    vlm3.U = U.copy()
    vlm3.A = np.zeros_like(S)
    vlm3.initial_cell_size = vlm3.S.sum(0)
    vlm3.initial_Ucell_size = vlm3.U.sum(0)
    vlm3.ca = {"CellID": np.array([f"c{i}" for i in range(n)])}
    vlm3.ra = {"Gene": np.array([f"g{i}" for i in range(g)])}
    vlm3._normalize_S(relative_size=vlm3.initial_cell_size,
                      target_size=np.mean(vlm3.initial_cell_size))
    vlm3._normalize_U(relative_size=vlm3.initial_Ucell_size,
                      target_size=np.mean(vlm3.initial_Ucell_size))
    vlm3.S_norm = np.log2(vlm3.S_sz + 1)
    vlm3.perform_PCA(which="S_norm", n_components=20)
    vlm3.knn_imputation(k=10, balanced=True, b_sight=30, b_maxl=15,
                        n_jobs=1)
    out["bal_Sx"] = vlm3.Sx
    out["bal_Ux"] = vlm3.Ux
    out["bal_knn"] = vlm3.knn.toarray()

    # markov on the main vlm (full-mode transition probs already set)
    vlm.prepare_markov(sigma_D=np.std(vlm.ts), sigma_W=0.5 * np.std(vlm.ts),
                       direction="forward")
    out["markov_tr"] = np.asarray(vlm.tr.toarray()
                                  if hasattr(vlm.tr, "toarray") else vlm.tr)
    vlm.run_markov(n_steps=500)
    out["markov_diffused"] = vlm.diffused

    np.savez_compressed(os.path.join(HERE, "golden.npz"), **out)
    print("golden.npz written:",
          {k: np.asarray(v).shape for k, v in out.items()})


if __name__ == "__main__":
    main()
