"""On-device A/B: Anderson acceleration on the SDP family.

AA's domain is heavy-body families: the lasso probe (aa_probe.py)
measured ~12-25 us/iter AA overhead — fatal for a 32 us GEMV body, but
noise for the SDP's NS/eigh projection body (~ms/iter at n >= 128).
CPU f64 measured 1032 -> 97 steps (10.6x) on a random SDP instance; this
probe checks the f32 on-device behavior: steps to convergence, wall
time, and the KKT objective gap vs the constructed optimum.

Run on the TPU:  python experiments/aa_sdp_probe.py [--smoke]
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

    from admm_tpu import ADMMConfig, sdp
    from admm_tpu.models.sdp import random_sdp_instance

    n, m = (16, 8) if smoke else (128, 256)
    rng = np.random.default_rng(0)
    C, A, b, Xs, ys, Ss = random_sdp_instance(n, m, max(3, n // 8), rng,
                                              dtype=np.float32)
    fstar = float(np.sum(C * Xs))

    base = dict(maxiters=500 if smoke else 8000, abstol=1e-5, reltol=1e-5,
                stallwindow=200, stalltol=1e-4)
    variants = {
        "plain_ns": (ADMMConfig(**base), dict(prox_method="ns")),
        "aa5_ns": (ADMMConfig(anderson=5, **base), dict(prox_method="ns")),
        "aa10_ns": (ADMMConfig(anderson=10, **base), dict(prox_method="ns")),
        "aa10_reg1e-6_ns": (ADMMConfig(anderson=10, aa_reg=1e-6, **base),
                            dict(prox_method="ns")),
        "plain_eigh": (ADMMConfig(**base), dict(prox_method="eigh")),
        "aa10_eigh": (ADMMConfig(anderson=10, **base),
                      dict(prox_method="eigh")),
    }

    for name, (cfg, kw) in variants.items():
        t0 = time.perf_counter()
        np.asarray(sdp(C, A, b, config=cfg, **kw).steps)
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    reps = 2 if smoke else 3
    rows = {k: [] for k in variants}
    gaps = {}
    steps = {}
    for rep in range(reps):
        for name, (cfg, kw) in variants.items():
            res = sdp(C, A, b, config=cfg, **kw)
            np.asarray(res.steps)
            rows[name].append(res.runtime)
            if rep == 0:
                X = np.asarray(res.zopt, np.float64)
                gaps[name] = abs(float(np.sum(np.asarray(C, np.float64) * X))
                                 - fstar) / (1 + abs(fstar))
                steps[name] = int(res.steps)

    print(f"\nn={n} m={m}  constructed optimum f*={fstar:.4f}\n")
    print(f"{'variant':18s} {'steps':>6s} {'best wall s':>11s} "
          f"{'rel obj gap':>11s}  all-reps s")
    for name in variants:
        best = min(rows[name])
        allr = "/".join(f"{w:.3f}" for w in rows[name])
        print(f"{name:18s} {steps[name]:6d} {best:11.3f} "
              f"{gaps[name]:11.2e}  {allr}")


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
