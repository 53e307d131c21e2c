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


def analyze_multichip(n_cells: int = 20000, n_genes: int = 2000,
                      nn: int = 1750, shards_list=(2, 4, 8, 16),
                      kernel_cells_per_sec: float = 90000.0,
                      ici_gbps: float = 45.0) -> dict:
    """Falsifiable multi-chip scaling model for the sampled colDeltaCor
    (BASELINE.md derived target #3: >=80% efficiency at N>=2 hosts),
    built from measurable single-chip quantities -- no multi-chip
    hardware required.

    Replicated layout (col_delta_cor_partial_sharded): zero steady-state
    collectives (one expression broadcast at setup), per-chip memory
    N*G*4 bytes; efficiency is bounded only by per-shard work imbalance
    of the row partition (rows are contiguous, sampled nn identical ->
    balance is exact up to the last-shard padding).  This is the layout
    the framework USES whenever the (N, G) expression fits per-chip HBM
    (~2M cells at G=2000 on 16 GB) -- i.e. the entire practically
    reachable regime -- and it meets the >=80% target at every P with
    margin (>=0.999 modeled).

    Ring layout (col_delta_cor_partial_ring): the beyond-HBM fallback;
    expression sharded, (P-1) ppermute steps each rotate an (N/P, G) f32
    chunk over ICI while every chip evaluates the sampled pairs whose
    neighbor lives in the resident chunk.  The ppermute is issued before
    the step's compute and shares no dependency with it, so XLA's async
    collective scheduler overlaps the transfer with the block-table
    evaluation; the model reports both the overlapped and the serial
    prediction.  Per-chip bytes sent = (P-1)/P * N*G*4.  The compute per
    step is the BLOCK-QUANTIZED table from _ring_plan (round 4): each
    (row, owner) group packs into q-entry blocks and only the
    per-(chip, owner) block count pads to the global max, so the
    padding inflation -- the work imbalance, measured here exactly --
    collapses from the old per-group-max tail (1.25x at P=8) to ~q/2
    per group (1.04x).

    Efficiency model:  eff(P) = T1 / (P * Tp),
      serial:     Tp = max_padded_work/rate + ring_bytes/BW
      overlapped: Tp = max(max_padded_work/rate, ring_bytes/BW)
      rate calibrated from the measured single-chip kernel throughput
      (kernel_cells_per_sec at this G, nn); BW = `ici_gbps` per-chip
      one-way on the single ring link actually used (v5e: 45 GB/s/link
      per the public per-link one-way figure -- the earlier 180 GB/s
      figure summed all four torus links, which a 1-D ring cannot use).

    Verdict on the >=80% target: BOTH layouts now clear it at every
    modeled P -- replicated at ~1.0, ring at 0.99/0.98/0.96/0.93 for
    P=2/4/8/16 overlapped (serial-comm predictions also clear 0.80
    through P=8).  Comm is ~2-16% of compute and fully hidden by the
    overlap; the residual ring deficit is the q-quantization waste plus
    the CLT-tight block-count max.
    """
    from velocyto_tpu.ops.coldeltacor import _ring_plan
    rng = np.random.default_rng(1)
    ixs = np.stack([rng.choice(n_cells, nn, replace=False)
                    for _ in range(n_cells)]).astype(np.int32)

    pair_work = n_cells * nn                      # sampled pairs total
    t1 = n_cells / kernel_cells_per_sec           # measured single chip
    out = {"model": {
        "N": n_cells, "G": n_genes, "nn": nn,
        "single_chip_cells_per_sec": kernel_cells_per_sec,
        "ici_gbps_assumed": ici_gbps,
    }, "replicated": {}, "ring": {}}
    for p in shards_list:
        rows = np.array_split(np.arange(n_cells), p)
        rep_work = [len(r) * nn for r in rows]
        out["replicated"][p] = {
            "collective_bytes_per_chip": 0,
            "setup_broadcast_bytes": n_cells * n_genes * 4,
            "work_imbalance": round(max(rep_work) * p / pair_work, 4),
            "predicted_efficiency": round(
                pair_work / (max(rep_work) * p), 4),
            "per_chip_expression_bytes": n_cells * n_genes * 4,
        }

        chunk = (n_cells + p - 1) // p
        qwidth = 16
        _qloc, _qrow, _inv, bmax = _ring_plan(ixs, p, chunk, q=qwidth)
        # every chip processes P owner tables of Bmax q-blocks per ring
        per_shard_padded = p * bmax * qwidth
        ring_bytes = (p - 1) / p * n_cells * n_genes * 4
        rate = pair_work / t1                     # pairs/s single chip
        t_comp = per_shard_padded / rate
        t_comm = ring_bytes / (ici_gbps * 1e9)
        tp_serial = t_comp + t_comm
        tp_overlap = max(t_comp, t_comm)
        out["ring"][p] = {
            "collective_bytes_per_chip": int(ring_bytes),
            "padding_inflation": round(
                p * per_shard_padded / pair_work, 4),
            "per_shard_padded_pairs": per_shard_padded,
            "block_q": qwidth,
            "per_chip_expression_bytes": chunk * n_genes * 4,
            "comm_fraction_of_compute": round(t_comm / t_comp, 4),
            "predicted_efficiency_serial": round(t1 / (p * tp_serial), 4),
            "predicted_efficiency": round(t1 / (p * tp_overlap), 4),
        }
    return out


def weak_scaling_virtual(cells_per_dev: int = 2048, genes: int = 512,
                         nn: int = 256, reps: int = 3) -> dict:
    """Compute-normalized weak-scaling MEASUREMENT of the ring-sharded
    sampled colDeltaCor on the virtual CPU mesh (run under
    JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8).

    Virtual devices share the host cores, so absolute wall time cannot
    show speedup; what IS measurable is the total-work overhead the ring
    layout adds at P shards -- block-quantization padding, partition
    imbalance, and the ppermute data movement all execute for real.
    Weak scaling holds cells-per-device fixed: ideal T(P) = P x T(1) on
    shared cores, so  eff_norm(P) = P*T1 / T(P)  isolates exactly the
    overhead terms the analytical model (analyze_multichip) predicts
    (0.96 modeled at P=8 for the production shape).  This measurement
    stands next to the model as evidence, not as a wall-clock claim."""
    import time
    import jax
    import jax.numpy as jnp
    from velocyto_tpu.parallel.mesh import make_mesh
    from velocyto_tpu.ops.coldeltacor import (col_delta_cor_partial_ring,
                                               col_delta_cor_partial_sharded)

    all_devices = jax.devices()
    rng = np.random.default_rng(0)
    out = {"cells_per_device": cells_per_dev, "genes": genes, "nn": nn,
           "backend": jax.default_backend(), "points": {},
           "reading": ("ring_vs_replicated_efficiency at P=1 isolates "
                       "the ring KERNEL's structural overhead (block-"
                       "table evaluation vs direct row gather) -- not a "
                       "layout cost; the P>=2 decline relative to P=1 "
                       "tracks the model's padding prediction "
                       "(model_compute_only_efficiency) plus real "
                       "ppermute data movement the compute-only model "
                       "excludes.  Virtual devices share 2 host cores, "
                       "so absolute times are not wall-clock claims.")}
    t1 = None
    for p in (1, 2, 4, 8):
        if p > len(all_devices):
            break
        n = cells_per_dev * p
        e = rng.random((genes, n), np.float32)
        d = rng.random((genes, n), np.float32)
        ixs = np.stack([rng.choice(n, nn, replace=False)
                        for _ in range(n)]).astype(np.int32)
        mesh = make_mesh(devices=all_devices[:p])

        def run():
            r = col_delta_cor_partial_ring(mesh, e, d, ixs, "sqrt", 1e-10)
            return float(np.asarray(r).sum())

        def run_rep():
            r = col_delta_cor_partial_sharded(mesh, e, d, ixs, "sqrt",
                                              1e-10)
            return float(np.asarray(r).sum())

        # shape-matched model prediction for THIS (small) test shape:
        # the block-quantization padding is exact and analytic, so the
        # measured ring-vs-replicated ratio has a falsifiable target
        # (at the small nn used here padding is relatively larger than
        # at the production shape, where the model gives 0.96 at P=8)
        from velocyto_tpu.ops.coldeltacor import _ring_plan
        chunk = (n + p - 1) // p
        _q, _r, _i, bmax = _ring_plan(ixs, p, chunk, q=16)
        model_eff = (n * nn) / (p * p * bmax * 16)

        run()                                  # compile + warm
        run_rep()
        best = min(_timed(run) for _ in range(reps))
        best_rep = min(_timed(run_rep) for _ in range(reps))
        if t1 is None:
            t1 = best
        eff = (p * t1) / best
        # ring vs the zero-collective replicated layout at the SAME P
        # and N: both pay identical virtual-device scheduling artifacts,
        # so the ratio isolates the ring's own overhead (padding +
        # ppermute data movement) -- the quantity the analytical model
        # predicts (>= 0.93 at P<=8 for the production shape)
        ratio = best_rep / best
        out["points"][p] = {"ring_seconds": round(best, 3),
                            "replicated_seconds": round(best_rep, 3),
                            "ring_vs_replicated_efficiency": round(ratio, 3),
                            "model_compute_only_efficiency":
                                round(model_eff, 3),
                            "weak_scaling_ideal_seconds": round(p * t1, 3),
                            "weak_scaling_eff_norm": round(eff, 3)}
        print(f"# weak-scaling P={p}: ring {best:.2f}s replicated "
              f"{best_rep:.2f}s ring-eff={ratio:.3f} "
              f"(model compute-only {model_eff:.3f}) "
              f"weak-eff={eff:.3f}", flush=True)
    return out


def _timed(fn) -> float:
    import time
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    import os
    if os.environ.get("VTPU_BENCH_WEAK_SCALING"):
        rec = {"weak_scaling_virtual_mesh": weak_scaling_virtual()}
        print(json.dumps(rec), flush=True)
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_scale.json")
        try:
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
        merged.update(rec)
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
    else:
        main()
        print(json.dumps({"multichip_analysis": analyze_multichip()}),
              flush=True)
