"""Reference-scale end-to-end estimation benchmark.

Runs the full VelocytoLoom pipeline at the reference's documented
operating point (reference doc/tutorial/analysis.rst:109,163-164:
knn_imputation k=500, b_sight=3000, b_maxl=1500; estimate_transition_prob
n_neighbors=3500, sampled_fraction=0.5) on a synthetic dataset of
VTPU_BENCH_PIPE_CELLS x VTPU_BENCH_PIPE_GENES (default 20000 x 2000),
records per-stage wall times, and writes BENCH_scale.json.

Measurement policy (round 5, declared up front):
  - run 0 is ALWAYS a warmup and never enters the statistic: it pays
    per-process costs the steady state does not (XLA program loads,
    first-touch page faults on every large buffer before the heap
    recycles them).  This replaces round 4's post-hoc "lower median on
    even counts" rule, which the round-4 review rightly flagged.
  - the headline is the TRUE median (statistics.median) of the clean
    measured runs (default VTPU_BENCH_PIPE_REPS=6 -> 1 warmup + 5
    measured), with min/max spread alongside.
  - a run is clean when the D=50 MXU matmul probe AND the host-BLAS
    probe bracketing it stay under threshold (the attached TPU executes
    identical cached programs 5-15x slower in contended session phases,
    and the host cores stall too).

Notes on measurement: stage times include host<->device transfer, which
on the axon development tunnel can be orders of magnitude slower than a
production PCIe host; the JSON records the backend so numbers are
interpretable.  Run with JAX_PLATFORM_NAME=cpu for a pure-host sanity
check.
"""
import json
import os
import time

import numpy as np

CELLS = int(os.environ.get("VTPU_BENCH_PIPE_CELLS", 20000))
GENES = int(os.environ.get("VTPU_BENCH_PIPE_GENES", 2000))
K = int(os.environ.get("VTPU_BENCH_PIPE_K", 500))
B_SIGHT = int(os.environ.get("VTPU_BENCH_PIPE_BSIGHT", 3000))
B_MAXL = int(os.environ.get("VTPU_BENCH_PIPE_BMAXL", 1500))
N_NEIGHBORS = int(os.environ.get("VTPU_BENCH_PIPE_NN", 3500))
SAMPLED_FRACTION = 0.5
RANDOMIZED = os.environ.get("VTPU_BENCH_PIPE_RANDOMIZED", "1") == "1"
REPS = int(os.environ.get("VTPU_BENCH_PIPE_REPS", 6))
PROBE_MS = float(os.environ.get("VTPU_BENCH_PROBE_MS", 8.0))


def synth(rng, n, g):
    gamma_true = rng.uniform(0.2, 1.2, g)
    # low-rank structure so the PCA/kNN stages see realistic manifolds
    k_lat = 12
    zl = rng.gamma(2.0, 1.0, (n, k_lat))
    wl = rng.gamma(2.0, 1.0, (k_lat, g))
    base = (zl @ wl) * rng.uniform(0.05, 0.6, g)[None, :]
    S = rng.poisson(base).astype(np.float32).T
    U = rng.poisson(0.4 * gamma_true[:, None] * base.T + 0.05).astype(
        np.float32)
    return S, U


from bench_common import host_probe, mxu_probe  # noqa: E402


def run_once(S, U):
    import velocyto_tpu as vt
    import jax.numpy as jnp

    stages = {}
    t_all = time.perf_counter()
    v = vt.VelocytoLoom.__new__(vt.VelocytoLoom)

    def stage(name, fn):
        t0 = time.perf_counter()
        out = fn()
        # device stages dispatch asynchronously: force execution with an
        # 8-byte reduction pull per device-backed array so the stage
        # table attributes time truthfully (jax.block_until_ready is
        # unreliable through the axon tunnel)
        for arr in (getattr(v, "_dev_state", None) or {}).values():
            float(jnp.sum(arr))
        dt = time.perf_counter() - t0
        stages[name] = round(dt, 2)
        print(f"# {name}: {dt:.1f}s", flush=True)
        return out

    v.S, v.U, v.A = S.copy(), U.copy(), np.zeros_like(S)
    v.initial_cell_size = v.S.sum(0)
    v.initial_Ucell_size = v.U.sum(0)
    v.ca = {"CellID": np.array([f"c{i}" for i in range(CELLS)])}
    v.ra = {"Gene": np.array([f"g{i}" for i in range(GENES)])}

    def _norm():
        # _normalize_S(log=True) computes S_norm = log2(S_sz + 1) itself
        v._normalize_S(relative_size=v.initial_cell_size,
                       target_size=np.mean(v.initial_cell_size))
        v._normalize_U(relative_size=v.initial_Ucell_size,
                       target_size=np.mean(v.initial_Ucell_size))
    stage("normalize", _norm)
    stage("pca", lambda: v.perform_PCA(which="S_norm", n_components=50))
    stage("knn_imputation(k=%d,sight=%d)" % (K, B_SIGHT),
          lambda: v.knn_imputation(k=K, balanced=True, b_sight=B_SIGHT,
                                   b_maxl=B_MAXL, n_jobs=16))
    stage("fit_gammas", lambda: v.fit_gammas())

    def _vel():
        v.predict_U()
        v.calculate_velocity()
        v.calculate_shift(assumption="constant_velocity")
        v.extrapolate_cell_at_t(delta_t=1.)
    stage("velocity", _vel)
    v.ts = np.ascontiguousarray(v.pcs[:, :2])
    stage("transition_prob(nn=%d,frac=%.1f,rand=%s)" % (
        N_NEIGHBORS, SAMPLED_FRACTION, RANDOMIZED),
        lambda: v.estimate_transition_prob(
            hidim="Sx_sz", embed="ts", transform="sqrt", knn_random=True,
            n_neighbors=N_NEIGHBORS, sampled_fraction=SAMPLED_FRACTION,
            calculate_randomized=RANDOMIZED))
    stage("embedding_shift",
          lambda: v.calculate_embedding_shift(sigma_corr=0.05,
                                              expression_scaling=False))
    stage("grid_arrows",
          lambda: v.calculate_grid_arrows(smooth=0.5, steps=(40, 40),
                                          n_neighbors=100))
    total = time.perf_counter() - t_all
    assert np.all(np.isfinite(v.delta_embedding)), "non-finite output"
    return total, stages


def main():
    import jax

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    S, U = synth(rng, CELLS, GENES)
    synth_s = round(time.perf_counter() - t0, 2)
    print(f"# synthesize: {synth_s}s", flush=True)

    # clean sessions measure the host dgemm probe at ~3-12 ms; a
    # co-running CPU hog shows 25-40+ ms while still passing the old
    # 120 ms threshold (observed r5: a concurrent counting bench pushed
    # host stages 3-4x with every run still "clean"), so gate tightly
    host_ms = float(os.environ.get("VTPU_BENCH_HOST_PROBE_MS", 18.0))
    runs = []
    for rep in range(REPS):
        p_before, h_before = mxu_probe(), host_probe()
        total, stages = run_once(S, U)
        p_after, h_after = mxu_probe(), host_probe()
        clean = max(p_before, p_after) <= PROBE_MS and \
            max(h_before, h_after) <= host_ms
        runs.append({"total": round(total, 1), "stages": stages,
                     "probe_ms": [round(p_before, 2), round(p_after, 2)],
                     "host_probe_ms": [round(h_before, 1),
                                       round(h_after, 1)],
                     "clean": clean,
                     "warmup": rep == 0})
        print(f"# run {rep}: {total:.1f}s probes "
              f"{p_before:.1f}/{p_after:.1f}ms host "
              f"{h_before:.0f}/{h_after:.0f}ms clean={clean}"
              f"{' (warmup, excluded)' if rep == 0 else ''}", flush=True)

    import statistics
    measured = [r for r in runs if not r["warmup"]]
    n_clean = len([r for r in measured if r["clean"]])
    clean_runs = [r for r in measured if r["clean"]] or measured
    run_label = (f"true median of {n_clean} clean runs, warmup run "
                 f"excluded" if n_clean
                 else f"median of {len(measured)} CONTENDED runs (no clean "
                      f"run this session -- not representative)")
    totals = sorted(r["total"] for r in clean_runs)
    median = round(float(statistics.median(totals)), 1)
    med_run = min(clean_runs, key=lambda r: abs(r["total"] - median))
    result = {
        "metric": "pipeline_seconds_end_to_end",
        "value": median,
        "unit": f"s ({CELLS} cells x {GENES} genes, k={K}, "
                f"b_sight={B_SIGHT}, nn={N_NEIGHBORS}; {run_label}, "
                f"spread {totals[0]}-{totals[-1]})",
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "stages": med_run["stages"],
        "synthesize_fixture_seconds": synth_s,
        "runs": runs,
        "min_total": totals[0],
        "max_total": totals[-1],
        "n_clean": n_clean,
        "cells_per_sec_end_to_end": round(CELLS / median, 1),
    }
    print(json.dumps(result))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_scale.json")
    # preserve auxiliary sections recorded by other benches
    # (counting_5M_reads, knn_50k, progression notes, ...)
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    if CELLS != 20000:
        # non-default scale points get their own section; the top-level
        # headline stays the canonical 20k operating point.  Never let a
        # session with no clean measured run (or a slower median under
        # visibly-elevated host probes) clobber a previous clean record.
        key = f"pipeline_{CELLS // 1000}k"
        if n_clean:
            merged[key] = result
        else:
            merged[f"{key}_last_contended_session"] = result
    elif n_clean or merged.get("value") is None:
        merged.setdefault("progression_rounds_s", {}).setdefault(
            "r5_runs", []).append(median)
        merged.pop("last_run", None)
        merged.update(result)
    else:
        # a fully-contended session must not clobber the clean headline
        merged["last_contended_session"] = result
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
