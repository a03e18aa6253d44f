"""Covsel heavy-body tail (VERDICT r3 weak #6): NS drops 4.2k -> 1.4k
iter/s from n=256 -> 512 with no n >= 1024 row and no floor analysis.

The NS x-prox is ~3 n^3-GEMMs x ns_iters per ADMM iteration — pure MXU
work, so its floor is compute, not HBM.  Knobs probed here, interleaved
in one process:

  * n in {512, 1024}: eigh vs NS(highest) vs NS(matmul 'default', i.e.
    bf16-pass MXU mode — 3-8x the f32-highest GEMM rate) vs fewer NS
    steps (14: enough for the moderate kappa of W^2 + 4 rho I).
  * accuracy: final X of each variant vs the eigh path's (the exact
    spectral prox), host f64 relative Frobenius error.

Run on the TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/covsel_tail_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.models.covarianceselection import covarianceselection

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

rng = np.random.default_rng(0)
LAM = 0.1


def bench_n(n, iters):
    A = rng.standard_normal((4 * n, n)).astype(np.float32)
    cfg = lambda **kw: ADMMConfig(maxiters=iters, domaxiters=True, **kw)
    variants = {
        "eigh": lambda: covarianceselection(A, LAM, cfg()),
        "ns20_highest": lambda: covarianceselection(
            A, LAM, cfg(), prox_method="ns"),
        "ns14_highest": lambda: covarianceselection(
            A, LAM, cfg(), prox_method="ns", ns_iters=14),
        "ns20_bf16pass": lambda: covarianceselection(
            A, LAM, cfg(matmul_precision="default"), prox_method="ns"),
        "ns14_bf16pass": lambda: covarianceselection(
            A, LAM, cfg(matmul_precision="default"), prox_method="ns",
            ns_iters=14),
        # Mixed: leading NS steps in bf16-pass mode, trailing 3 at
        # highest — quadratic convergence squares the coarse noise away
        # while W^2 (forming A) stays at highest (ops/matfun.ns_sqrtm).
        "ns14_mixed11": lambda: covarianceselection(
            A, LAM, cfg(), prox_method="ns", ns_iters=14, ns_coarse=11),
    }
    finals = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        r = fn()
        finals[name] = np.asarray(r.xopt, np.float64)
        print(f"# warm n={n} {name}: steps {r.steps} "
              f"(compile+run {time.perf_counter() - t0:.1f}s)", flush=True)

    results = {k: [] for k in variants}
    for _ in range(3):
        for name, fn in variants.items():
            results[name].append(fn().runtime)

    ref = finals["eigh"]
    print(f"\n# n={n}, {iters} iters; interleaved best/median; "
          f"accuracy = rel-F error of final X vs eigh")
    for name, ts in results.items():
        best, med = min(ts), sorted(ts)[len(ts) // 2]
        err = (np.linalg.norm(finals[name] - ref)
               / max(np.linalg.norm(ref), 1e-30))
        print(f"n={n} {name:14s} best {iters / best:8.1f} iter/s "
              f"{best / iters * 1e3:8.3f} ms/iter  med "
              f"{med / iters * 1e3:8.3f}  relF_vs_eigh {err:.2e}",
              flush=True)


if __name__ == "__main__":
    bench_n(512, 200)
    bench_n(1024, 100)
