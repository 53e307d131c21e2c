"""Shared measurement helpers for the bench drivers.

One home for the contention probes and the axon-tunnel sync workaround
so fixes apply everywhere at once (bench_attr / bench_knn50k /
bench_pipeline previously carried diverging copies).
"""
import time

import numpy as np


def sync(x):
    """Force device execution with an 8-byte reduction pull:
    jax.block_until_ready is unreliable through the axon tunnel."""
    import jax.numpy as jnp
    if hasattr(x, "block_until_ready"):
        x.block_until_ready()
    float(jnp.sum(x if getattr(x, "ndim", 1) else x[None]).astype(
        jnp.float32))
    return x


def mxu_probe() -> float:
    """D=50 MXU distance-matmul fingerprint in ms; contended device
    sessions measure 5-15x the clean ~2-3 ms."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prob(a, b):
        return jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)

    a = jnp.ones((2048, 50), jnp.float32)
    b = jnp.ones((8192, 50), jnp.float32)
    sync(prob(a, b))   # warm
    t0 = time.perf_counter()
    for _ in range(20):
        out = prob(a, b)
    sync(out)
    return (time.perf_counter() - t0) / 20 * 1e3


_HOST_PROBE = {}


def host_probe() -> float:
    """Host BLAS fingerprint (one small dgemm) in ms: the host cores are
    also shared, and host-side stalls (observed: an identical PCA stage
    swinging 3 s -> 34 s) are invisible to the device probe."""
    a = _HOST_PROBE.setdefault("a", np.random.RandomState(1).randn(512, 512))
    a @ a   # warm
    t0 = time.perf_counter()
    for _ in range(5):
        a @ a
    return (time.perf_counter() - t0) / 5 * 1e3
