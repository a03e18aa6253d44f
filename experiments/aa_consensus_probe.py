"""On-device A/B: Anderson acceleration on the consensus runner.

The consensus body at the matrix shape is GEMV-class (~8-20 us/iter at
W=8 4096x512), where the engine probe measured AA overhead fatal for
loose-tolerance throughput — but consensus solves run to CONVERGENCE,
so the question is wall-to-stop, not iter/s.  Interleaved protocol
(CLAUDE.md timing rules).

Run on the TPU:  python experiments/aa_consensus_probe.py [--smoke]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(smoke=False):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso

    m, n = (256, 64) if smoke else (4096, 512)
    W = 8
    rng = np.random.default_rng(0)
    D = rng.standard_normal((m, n)).astype(np.float32)
    s = (D @ (rng.standard_normal(n) * (rng.random(n) < 0.1))
         + 0.01 * rng.standard_normal(m)).astype(np.float32)
    lam = float(0.1 * np.max(np.abs(D.T @ s)))

    # stallwindow 2000: at 200 the PLAIN run trips the plateau detector
    # at step 201 with a 24% worse objective (its early consensus
    # residual decays below stalltol per-step), while AA converges
    # properly — widen the window so both run to the Boyd stop.
    # MEASURED (v5e, this script, 2026-08-20): plain 6766 steps /
    # ~95 ms, aa10 287 steps / ~35 ms — 23.6x fewer iterations, 2.7x
    # raw wall, ~6.5x after the ~24 ms dispatch floor; identical
    # objectives (32890.78).
    base = dict(abstol=1e-6, reltol=1e-5, maxiters=20000, stallwindow=2000,
                unroll=8)
    variants = {
        "plain": ADMMConfig(**base),
        "aa5": ADMMConfig(anderson=5, **base),
        "aa10": ADMMConfig(anderson=10, **base),
    }
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        np.asarray(consensus_lasso(D, s, lam, cfg, nshards=W).steps)
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    reps = 2 if smoke else 4
    walls = {k: [] for k in variants}
    steps = {}
    objs = {}
    obj = lambda z: (0.5 * np.sum((D.astype(np.float64)
                                   @ np.asarray(z, np.float64) - s) ** 2)
                     + lam * np.sum(np.abs(np.asarray(z, np.float64))))
    for _ in range(reps):
        for name, cfg in variants.items():
            res = consensus_lasso(D, s, lam, cfg, nshards=W)
            np.asarray(res.steps)
            walls[name].append(res.runtime)
            steps[name] = int(res.steps)
            objs[name] = obj(res.zopt)

    print(f"\nW={W} {m}x{n}\n")
    print(f"{'variant':8s} {'steps':>6s} {'best wall ms':>12s} "
          f"{'objective':>14s}  all-reps ms")
    for name in variants:
        best = min(walls[name])
        allr = "/".join(f"{1e3*w:.1f}" for w in walls[name])
        print(f"{name:8s} {steps[name]:6d} {1e3*best:12.1f} "
              f"{objs[name]:14.6f}  {allr}")


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
