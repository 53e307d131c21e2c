"""Benchmark: neighbor-sampled colDeltaCor (the estimation-stage hot kernel).

This is the kernel behind estimate_transition_prob -- the step the
reference documents as "can take a long time ... fully multithreaded"
(its OpenMP Cython kernel, speedboosted.pyx).  We measure cells/second on
the default JAX backend (the TPU chip when present) and compare against a
single-thread vectorized-numpy implementation of the identical math,
scaled by ncpu/2 to emulate the reference's default OpenMP thread count
(reference estimation.py:27-30).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""
import json
import multiprocessing
import sys
import time

import numpy as np

GENES = 2000
CELLS = 3072
NN = 512          # sampled neighbors per cell (reference: n_neighbors * sampled_fraction)
PSC = 1e-10
BASELINE_CELLS = 48


def numpy_baseline_cells_per_sec(e, d, ixs):
    """Single-thread numpy implementation of the same math (per-cell loop
    with vectorized inner ops, the natural CPU implementation)."""
    n = BASELINE_CELLS
    t0 = time.perf_counter()
    out = np.zeros((n, ixs.shape[1]))
    for c in range(n):
        cols = ixs[c]
        delta = e[:, cols] - e[:, c][:, None]
        a = np.sign(delta) * np.sqrt(np.abs(delta) + PSC)
        a[np.abs(delta) < 1e-16] = 0
        a_c = a - a.mean(0)[None, :]
        b = d[:, c]
        b_c = b - b.mean()
        num = a_c.T @ b_c
        den = np.sqrt((a_c ** 2).sum(0)) * np.sqrt((b_c ** 2).sum())
        with np.errstate(divide="ignore", invalid="ignore"):
            out[c] = num / den
    dt = time.perf_counter() - t0
    return n / dt


def main():
    import jax
    from velocyto_tpu.ops.coldeltacor import _partial_impl, _TRANSFORMS

    rng = np.random.RandomState(0)
    e = rng.gamma(2.0, 2.0, size=(GENES, CELLS)).astype(np.float64)
    d = rng.randn(GENES, CELLS).astype(np.float64)
    ixs = np.stack([rng.choice(CELLS, NN, replace=False)
                    for _ in range(CELLS)]).astype(np.int32)

    import jax.numpy as jnp
    e_rows = jnp.asarray(e.T, dtype=jnp.float32)
    d_rows = jnp.asarray(d.T, dtype=jnp.float32)
    ixs_j = jnp.asarray(ixs)
    tcode = _TRANSFORMS["sqrt"]

    # Repeat the kernel on-device (lax.fori_loop) so the measurement is
    # device throughput, not host->device dispatch: one host round trip
    # through the axon tunnel costs ~37 ms, comparable to the kernel
    # itself.  The tiny data-dependent perturbation (acc * 0) keeps XLA
    # from hoisting the kernel out of the loop.  Completion is forced
    # with a scalar reduction -- block_until_ready is unreliable on the
    # experimental axon platform.
    import functools

    @functools.partial(jax.jit, static_argnames=("reps",))
    def repeated(e_rows, d_rows, ixs_j, reps):
        def body(_, acc):
            out = _partial_impl(e_rows + acc * 0, e_rows, d_rows, ixs_j,
                                tcode, PSC)
            return acc + jnp.sum(out) * 1e-9
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    reps = 5
    _ = float(repeated(e_rows, d_rows, ixs_j, reps))   # warmup/compile
    t0 = time.perf_counter()
    _ = float(repeated(e_rows, d_rows, ixs_j, reps))
    dt = (time.perf_counter() - t0) / reps
    tpu_cells_per_sec = CELLS / dt

    base_st = numpy_baseline_cells_per_sec(e, d, ixs)
    ncpu = multiprocessing.cpu_count()
    base_mt = base_st * max(1, ncpu // 2)   # reference default thread count

    print(json.dumps({
        "metric": "coldeltacor_sqrt_partial_cells_per_sec",
        "value": round(tpu_cells_per_sec, 2),
        "unit": "cells/s (G=2000, nn=512)",
        "vs_baseline": round(tpu_cells_per_sec / base_mt, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
