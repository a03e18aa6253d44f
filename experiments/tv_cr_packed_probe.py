"""TV cyclic-reduction: packed vs masked elimination (VERDICT r3 weak #6).

The masked CR streams full-length coefficient arrays at all 2 log2(n)
levels (~93 MB/iter at n = 65536 — measured at ~85% of that bound, i.e.
the bytes ARE the floor); the packed variant stores per-level strata so
each level moves half the previous one's floats (~4n total).  Interleaved
A/B on-chip at the BENCH_MATRIX TV shapes.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/tv_cr_packed_probe.py
"""

import time

import jax
import numpy as np

from admm_tpu import ADMMConfig, totalvariation

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

rng = np.random.default_rng(0)


def bench_n(n, iters):
    stair = np.repeat(rng.standard_normal(max(n // 64, 1)), 64)[:n]
    sig = (stair + 0.5 * rng.standard_normal(n)).astype(np.float32)
    cfg = ADMMConfig(maxiters=iters, domaxiters=True, unroll="auto")
    variants = {
        "cr_masked": lambda: totalvariation(sig, 0.5, cfg, solver="cr_masked"),
        "cr_hybrid": lambda: totalvariation(sig, 0.5, cfg, solver="cr"),
        "cr_packed": lambda: totalvariation(sig, 0.5, cfg, solver="cr_packed"),
    }
    finals = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        r = fn()
        finals[name] = np.asarray(r.xopt, np.float64)
        print(f"# warm n={n} {name}: steps {r.steps} "
              f"(compile+run {time.perf_counter() - t0:.1f}s)", flush=True)
    agree = max(
        np.linalg.norm(finals[k] - finals["cr_masked"])
        / np.linalg.norm(finals["cr_masked"]) for k in finals)
    results = {k: [] for k in variants}
    for _ in range(4):
        for name, fn in variants.items():
            results[name].append(fn().runtime)
    print(f"\n# n={n}, {iters} iters; max final relF vs masked {agree:.2e}")
    for name, ts in results.items():
        best, med = min(ts), sorted(ts)[len(ts) // 2]
        print(f"n={n} {name:10s} best {iters / best:9.1f} iter/s "
              f"{best / iters * 1e6:8.2f} us/iter  med "
              f"{med / iters * 1e6:8.2f} us/iter", flush=True)


if __name__ == "__main__":
    bench_n(8192, 500)
    bench_n(65536, 500)
