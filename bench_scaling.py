"""Scaling-efficiency harness: sampled colDeltaCor sharded over the
cells axis for increasing device counts (SURVEY.md §7 phase 3).

On a TPU slice this measures real ICI-connected scaling; under
XLA_FLAGS=--xla_force_host_platform_device_count=N it validates the
sharded path's correctness (virtual CPU devices share the same cores,
so the "speedup" column is meaningless there and flagged as such).

Prints one JSON line per device count:
  {"devices": D, "cells_per_sec": X, "efficiency_vs_1": E}
"""
import json
import time

import numpy as np


def main() -> None:
    import jax
    from velocyto_tpu.parallel.mesh import make_mesh

    G, N, NN = 2000, 4096, 512
    rng = np.random.default_rng(0)
    e = rng.random((G, N), np.float32)
    d = rng.random((G, N), np.float32)
    ixs = np.stack([rng.choice(N, NN, replace=False)
                    for _ in range(N)]).astype(np.int32)

    import functools
    import jax.numpy as jnp
    from velocyto_tpu.ops.coldeltacor import make_partial_sharded

    all_devices = jax.devices()
    virtual = all_devices[0].platform == "cpu" and len(all_devices) > 1
    base = None
    counts = [c for c in (1, 2, 4, 8, 16, 32, 64)
              if c <= len(all_devices)]
    for n_dev in counts:
        mesh = make_mesh(devices=all_devices[:n_dev])
        fn = make_partial_sharded(mesh, "sqrt", 1e-10)

        # Repeat on-device so the measurement excludes dispatch/transfer
        # (the host round trip costs ~37 ms through the axon tunnel;
        # device->host pulls can be pathologically slow).  Completion is
        # forced by the scalar float() pull.
        @functools.partial(jax.jit, static_argnames=("reps",))
        def repeated(e_r, d_r, ixs_r, reps, fn=fn):
            def body(_, acc):
                out = fn(e_r + acc * 1e-30, e_r, d_r, ixs_r)
                return acc + jnp.sum(out) * 1e-9
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        e_r = jnp.asarray(e.T)
        d_r = jnp.asarray(d.T)
        ixs_r = jnp.asarray(ixs)
        reps = 3
        _ = float(repeated(e_r, d_r, ixs_r, reps))     # warmup/compile
        t0 = time.perf_counter()
        _ = float(repeated(e_r, d_r, ixs_r, reps))
        dt = (time.perf_counter() - t0) / reps
        cps = N / dt
        if base is None:
            base = cps
        eff = cps / (base * n_dev)
        rec = {"devices": n_dev, "cells_per_sec": round(cps, 1),
               "efficiency_vs_1": round(eff, 3)}
        if virtual:
            rec["note"] = "virtual CPU devices: timing not meaningful"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
