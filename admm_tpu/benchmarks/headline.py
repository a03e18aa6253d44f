"""Benchmark: ADMM iterations/sec/chip on LASSO with dense D (1500 x 5000).

The north-star metric from BASELINE.json ("ADMM iterations/sec/chip at
lasso n=5000").  The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` compares against a faithful single-process NumPy
implementation of the same iteration run on this host — a stand-in for
the reference's single-process MATLAB loop (admm.m:496-743), which uses
the same BLAS-bound operations.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "iter/s", "vs_baseline": N}
"""

import json
import time

import numpy as np


def _numpy_lasso_iters_per_sec(D, s, lam, rho, iters=50):
    """The reference's serial fat-lasso iteration in NumPy: Woodbury
    x-update via cached Cholesky (solvers/lasso.m:169-172,
    getProxOps.m:1198-1205) + soft-threshold z + dual update."""
    import scipy.linalg as sla

    m, n = D.shape
    Dts = D.T @ s
    G = D @ D.T / rho + np.eye(m)
    L = sla.cholesky(G, lower=True)
    x = np.zeros(n)
    z = np.zeros(n)
    u = np.zeros(n)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = Dts + rho * (z - u)
        w = sla.solve_triangular(L.T, sla.solve_triangular(L, D @ y, lower=True))
        x = y / rho - (D.T @ w) / rho**2
        v = x + u
        z = np.sign(v) * np.maximum(np.abs(v) - lam / rho, 0.0)
        u = u + x - z
    dt = time.perf_counter() - t0
    return iters / dt


def main(smoke: bool = False):
    import jax

    # Persistent compile cache (same as benchmarks/matrix.py): the
    # unroll=64 program costs minutes on the remote-compile relay the
    # first time; cached reruns start timing almost immediately.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from admm_tpu import ADMMConfig
    from admm_tpu.models.lasso import lasso

    m, n = (96, 320) if smoke else (1500, 5000)
    rng = np.random.default_rng(0)
    testx = rng.standard_normal(n) * (rng.random(n) < 0.1)
    D = rng.standard_normal((m, n)).astype(np.float32)
    D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
    s = (D @ testx + np.sqrt(0.001) * rng.standard_normal(m)).astype(np.float32)
    lam = float(0.1 * np.max(np.abs(D.T @ s)))

    # N = 16384 (was 4096 through round 4): round 5 measured a fixed
    # ~24 ms per-dispatch cost on the tunnel relay (t(N) = a*N + b,
    # docs/RESULTS.md), which ate ~21% of the N=4096 reading; a longer
    # block per dispatch amortizes it to ~6% and reflects production
    # use (long solves / batched dispatches).  The dispatch floor and
    # the dispatch-free marginal rate are reported alongside.
    iters = 100 if smoke else 16384
    # unroll=64: K exact iterations per device loop step — amortizes the
    # loop turnaround AND lets XLA keep the two stream matrices resident
    # in VMEM across sub-iterations (they fit: 60 MB < 128 MB VMEM),
    # cutting HBM traffic.  Measured sweep on this workload
    # (experiments/unroll_sweep.py, f32, best of 3 x 4096 iters):
    # K=16 29.4k, 32 33.4k, 64 35.8k iter/s (27.9 us/iter — at the
    # measured XLA 2-GEMV VMEM-resident floor of ~30 us; bf16 36.7k).
    # Semantics are bit-exact (ADMMConfig.unroll).
    cfg = ADMMConfig(maxiters=iters, domaxiters=True, unroll=64)

    # Warm-up (compile), then best-of-3 timed passes — SYMMETRIC with the
    # NumPy baseline below (VERDICT r2 weak #1: a single TPU pass vs a
    # best-of-3 baseline understated vs_baseline under host contention
    # and drove a 13% doc-vs-driver headline gap).  The warm-up's steps
    # are materialized to host: on the remote-compile relay,
    # block_until_ready can return while the compile is still in flight,
    # and a call timed behind it measures dispatch latency
    # (see benchmarks/matrix.py:_run_twice).
    np.asarray(lasso(D, s, lam, cfg).steps)
    results = [lasso(D, s, lam, cfg) for _ in range(3)]
    res = min(results, key=lambda r: r.runtime)
    iters_per_sec = iters / res.runtime

    # Per-solve dispatch floor (round 5): a trivial program's round
    # trip; marginal = dispatch-free per-iteration rate.
    trivial = jax.jit(lambda x: x + 1.0)
    xp = np.zeros((8,), np.float32)
    np.asarray(trivial(xp))
    floor_s = np.inf
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(xp))
        floor_s = min(floor_s, time.perf_counter() - t0)
    marginal = iters / max(res.runtime - floor_s, 1e-9)

    # bf16-stream perf mode (FatShiftSolver stream_dtype) — reported
    # separately, not the headline.
    import jax.numpy as jnp

    np.asarray(lasso(D, s, lam, cfg, stream_dtype=jnp.bfloat16).steps)
    res_bf16 = min((lasso(D, s, lam, cfg, stream_dtype=jnp.bfloat16)
                    for _ in range(3)), key=lambda r: r.runtime)
    bf16_iters_per_sec = iters / res_bf16.runtime

    # Best of 3 passes: the 1-vCPU host shares cores with background
    # work, and a contended numpy pass understates the baseline (seen:
    # 46-150 iter/s spread), which would overstate vs_baseline.
    baseline = max(
        _numpy_lasso_iters_per_sec(
            D.astype(np.float64), s.astype(np.float64), lam, cfg.rho,
            iters=20 if smoke else 50,
        )
        for _ in range(3)
    )

    # Secondary target (BASELINE.json): time-to-1e-6 residual, taken
    # per-element (RMS): pnorm <= 1e-6 * sqrt(n).  (The absolute 1e-6
    # 2-norm is below the f32 floor at n=5000.)  Both implementations run
    # the identical update sequence, so the trajectory and step count
    # match; only seconds/step differ.
    pnorm = np.asarray(res.pnorm)
    thresh = 1e-6 * np.sqrt(D.shape[1])
    hit = np.nonzero(pnorm <= thresh)[0]
    steps_1e6 = int(hit[0]) + 1 if len(hit) else None
    t_1e6 = None if steps_1e6 is None else steps_1e6 / iters_per_sec
    t_1e6_np = None if steps_1e6 is None else steps_1e6 / baseline

    print(
        json.dumps(
            {
                "metric": "lasso_n5000_admm_iterations_per_sec_per_chip",
                "platform": jax.devices()[0].platform,
                "value": round(iters_per_sec, 2),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_sec / baseline, 3),
                "maxiters_per_dispatch": iters,
                "dispatch_floor_ms": round(floor_s * 1e3, 3),
                "marginal_iter_s": round(marginal, 2),
                "numpy_baseline_iters_per_sec": round(baseline, 2),
                "bf16_stream_iters_per_sec": round(bf16_iters_per_sec, 2),
                "steps_to_rms_residual_1e-6": steps_1e6,
                "time_to_rms_residual_1e-6_s": None if t_1e6 is None else round(t_1e6, 4),
                "baseline_time_to_rms_residual_1e-6_s": (
                    None if t_1e6_np is None else round(t_1e6_np, 4)
                ),
            }
        )
    )


