"""Worker for the two-process jax.distributed smoke test.

Each process owns half of an 8-device CPU mesh (4 local virtual devices)
and participates in collectives that CROSS the process boundary:

  * merge_feeder_counts -- the counting-merge psum
    (velocyto_tpu/parallel/counts.py)
  * the sharded partial colDeltaCor kernel
    (velocyto_tpu/ops/coldeltacor.py make_partial_sharded)
  * the RING-scheduled partial colDeltaCor -- ppermute expression-block
    rotation across the process boundary
    (velocyto_tpu/ops/coldeltacor.py make_partial_ring)
  * make_sharded_velocity_step -- the full jit'd training-step analogue
    with (GENES, CELLS) shardings, whose gene- and cell-axis reductions
    cross the boundary (velocyto_tpu/models/velocity.py)

All results are allgathered and written to a JSON file per process; the
pytest driver (test_distributed.py) asserts they equal the
single-process oracle.  Run as:

  python distributed_worker.py <pid> <nproc> <port> <outfile>
"""
import json
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outfile = sys.argv[3], sys.argv[4]

    # the production entry point for multi-host runs (parallel/mesh.py),
    # not a raw jax.distributed.initialize
    from velocyto_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
    import jax
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from velocyto_tpu.parallel.mesh import make_mesh, CELLS
    from velocyto_tpu.parallel.counts import merge_feeder_counts
    from velocyto_tpu.ops.coldeltacor import make_partial_sharded

    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == nproc * n_local, (n_global, n_local)

    mesh = make_mesh()

    # --- counting merge psum across the process boundary ---
    rng = np.random.RandomState(0)
    stacked = rng.poisson(1.0, (5, 16, 24)).astype(np.float32)
    merged = merge_feeder_counts(mesh, stacked)
    merged_np = np.asarray(multihost_utils.process_allgather(
        merged, tiled=True))

    # --- sharded partial colDeltaCor across the boundary ---
    n, g, nn = 48, 12, 8
    emat = rng.rand(g, n).astype(np.float32)
    dmat = rng.randn(g, n).astype(np.float32)
    ixs = np.stack([rng.choice(n, nn, replace=False)
                    for _ in range(n)]).astype(np.int32)
    e_rows = np.ascontiguousarray(emat.T)
    d_rows = np.ascontiguousarray(dmat.T)
    rows_sh = NamedSharding(mesh, P(CELLS, None))
    repl_sh = NamedSharding(mesh, P())
    fn = make_partial_sharded(mesh, "sqrt", 1e-10)
    corr = fn(jax.device_put(e_rows, repl_sh),
              jax.device_put(e_rows, rows_sh),
              jax.device_put(d_rows, rows_sh),
              jax.device_put(ixs, rows_sh))
    corr_np = np.asarray(multihost_utils.process_allgather(corr, tiled=True))

    # --- ring-scheduled partial colDeltaCor: the ppermute expression
    # rotation crosses the process boundary on every ring step ---
    from velocyto_tpu.ops.coldeltacor import col_delta_cor_partial_ring_dev
    ring = col_delta_cor_partial_ring_dev(mesh, emat, dmat, ixs,
                                          "sqrt", 1e-10)
    ring_np = np.asarray(multihost_utils.process_allgather(ring, tiled=True))

    # --- the full sharded velocity step (GENES x CELLS shardings) ---
    from velocyto_tpu.models.velocity import (make_sharded_velocity_step,
                                              example_inputs)
    S, U, nbr_idx, nbr_w, emb, sample_ixs = example_inputs(
        g=32, n=64, k=8, nn=16, seed=3)
    step = make_sharded_velocity_step(mesh)
    outs = step(S, U, nbr_idx, nbr_w, emb, sample_ixs)
    gammas_np = np.asarray(multihost_utils.process_allgather(
        outs.gammas, tiled=True))
    dembed_np = np.asarray(multihost_utils.process_allgather(
        outs.delta_embedding, tiled=True))

    with open(outfile, "w") as f:
        json.dump({
            "process_count": jax.process_count(),
            "n_global_devices": n_global,
            "n_local_devices": n_local,
            "merged_sum": float(merged_np.sum()),
            "merged": merged_np.tolist(),
            "corr": corr_np.tolist(),
            "ring": ring_np.tolist(),
            "vstep_gammas": gammas_np.tolist(),
            "vstep_delta_embedding": dembed_np.tolist(),
        }, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
