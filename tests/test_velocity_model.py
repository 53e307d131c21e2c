"""Numeric golden for the fused flagship model (models/velocity.py):

1. velocity_step == the step-by-step VelocytoLoom chain on the same
   inputs (same graph, same sampled candidates, default arguments).
2. sharded velocity_step (8-virtual-device mesh) == unsharded, full step.

Previously only finiteness/shape were checked by the dryrun
(__graft_entry__.py); these tests catch numeric regressions in any fused
stage.
"""
import numpy as np
import pytest
from scipy import sparse

import velocyto_tpu as vt
from velocyto_tpu.models.velocity import (velocity_step, velocity_step_jit,
                                          make_sharded_velocity_step,
                                          example_inputs)
from velocyto_tpu.ops.smoothing import csr_to_compact
from velocyto_tpu.parallel import make_mesh

import jax.numpy as jnp


@pytest.fixture(scope="module")
def chain_state():
    """Run the step-by-step VelocytoLoom chain with default args and
    capture every intermediate + the exact inputs the fused model needs."""
    rng = np.random.default_rng(3)
    n, g = 96, 48
    gamma_true = rng.uniform(0.2, 1.2, g)
    base = rng.gamma(2.0, 2.0, (g, n))
    S = rng.poisson(base).astype(np.float32)
    U = rng.poisson(0.4 * gamma_true[:, None] * base + 0.1).astype(np.float32)

    v = vt.VelocytoLoom.__new__(vt.VelocytoLoom)
    v.S, v.U, v.A = S.copy(), U.copy(), np.zeros_like(S)
    v.initial_cell_size = S.sum(0)
    v.initial_Ucell_size = U.sum(0)
    v.ca = {"CellID": np.array([f"c{i}" for i in range(n)])}
    v.ra = {"Gene": np.array([f"g{i}" for i in range(g)])}
    v._normalize_S(relative_size=v.initial_cell_size,
                   target_size=np.mean(v.initial_cell_size))
    v._normalize_U(relative_size=v.initial_Ucell_size,
                   target_size=np.mean(v.initial_Ucell_size))
    v.S_norm = np.log2(v.S_sz + 1)
    v.perform_PCA(which="S_norm", n_components=10)
    v.knn_imputation(k=8, balanced=False, n_jobs=1)
    v.fit_gammas(weighted=True, weights="maxmin", fit_offset=True,
                 limit_gamma=False)
    v.predict_U()
    v.calculate_velocity()
    v.calculate_shift(assumption="constant_velocity")
    v.extrapolate_cell_at_t(delta_t=1.)
    v.ts = np.ascontiguousarray(v.pcs[:, :2])
    v.estimate_transition_prob(hidim="Sx_sz", embed="ts", transform="sqrt",
                               knn_random=True, sampled_fraction=0.5,
                               calculate_randomized=False)
    v.calculate_embedding_shift(sigma_corr=0.05, expression_scaling=False)

    # fused-model inputs extracted from the chain's state
    nbr_idx, nbr_w = csr_to_compact(sparse.csr_matrix(v.knn_smoothing_w))
    knn = sparse.csr_matrix(v.embedding_knn)
    nn = int(np.diff(knn.indptr)[0])
    assert (np.diff(knn.indptr) == nn).all()
    sample_ixs = knn.indices.reshape(n, nn).astype(np.int32)
    return v, (v.S_sz, v.U_sz, nbr_idx, nbr_w, v.ts, sample_ixs)


def _fused_args(chain_inputs):
    S_sz, U_sz, nbr_idx, nbr_w, ts, sample_ixs = chain_inputs
    return (jnp.asarray(S_sz, jnp.float32), jnp.asarray(U_sz, jnp.float32),
            jnp.asarray(nbr_idx, jnp.int32), jnp.asarray(nbr_w, jnp.float32),
            jnp.asarray(ts, jnp.float32), jnp.asarray(sample_ixs, jnp.int32))


def test_velocity_step_matches_chain(chain_state):
    v, chain_inputs = chain_state
    out = velocity_step_jit(*_fused_args(chain_inputs))

    np.testing.assert_allclose(np.asarray(out.gammas), v.gammas,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.q), v.q, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.velocity), v.velocity,
                               rtol=2e-3, atol=2e-2)

    # corr: compact (N, nn) vs the chain's dense scatter
    n = v.S.shape[1]
    sample_ixs = np.asarray(chain_inputs[5])
    chain_corr = v.corrcoef[np.arange(n)[:, None], sample_ixs]
    np.testing.assert_allclose(np.asarray(out.corr), chain_corr,
                               rtol=1e-3, atol=2e-3)

    # transition probs + embedding shift
    chain_p = v.transition_prob[np.arange(n)[:, None], sample_ixs]
    np.testing.assert_allclose(np.asarray(out.transition_prob), chain_p,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.delta_embedding),
                               v.delta_embedding, rtol=2e-3, atol=2e-4)


def test_velocity_step_sharded_matches_unsharded():
    mesh = make_mesh(n_cell_shards=4, n_gene_shards=2)
    args = example_inputs(g=64, n=128, k=8, nn=16, d=2)
    single = velocity_step_jit(*args)
    step = make_sharded_velocity_step(mesh)
    with mesh:
        sharded = step(*args)
    # gene-axis reductions cross shard boundaries: f32 summation order
    # differs, so agreement is to f32 accumulation tolerance
    for name, a, b in zip(single._fields, single, sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5, err_msg=name)
