"""On-device A/B: Anderson acceleration at the headline lasso shape.

Interleaved single-process protocol (the lp_tail_probe3 pattern): per
variant, per rep — warm-up with HOST materialization, block inputs,
perf_counter right after block_until_ready.  Reports per-iteration cost
(fixed-N domaxiters wall) and steps/time to the RMS-1e-6 residual from
the pnorm trace (the headline's secondary metric).

Run on the TPU:  python experiments/aa_probe.py [--smoke]
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
    from admm_tpu.models.lasso import lasso

    m, n = (96, 320) if smoke else (1500, 5000)
    iters = 200 if smoke else 4096
    rng = np.random.default_rng(0)
    testx = rng.standard_normal(n) * (rng.random(n) < 0.1)
    D = rng.standard_normal((m, n)).astype(np.float32)
    D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
    s = (D @ testx + np.sqrt(0.001) * rng.standard_normal(m)).astype(np.float32)
    lam = float(0.1 * np.max(np.abs(D.T @ s)))

    base = dict(maxiters=iters, domaxiters=True, unroll=16)
    variants = {
        "plain": ADMMConfig(**base),
        "aa5": ADMMConfig(anderson=5, **base),
        "aa10": ADMMConfig(anderson=10, **base),
        "aa10_reg1e-6": ADMMConfig(anderson=10, aa_reg=1e-6, **base),
        "aa20": ADMMConfig(anderson=20, **base),
    }

    # Compile warm-up, host-materialized (CLAUDE.md relay gotcha).
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        np.asarray(lasso(D, s, lam, cfg).steps)
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    reps = 2 if smoke else 4
    walls = {k: [] for k in variants}
    pnorms = {}
    for rep in range(reps):
        for name, cfg in variants.items():
            res = lasso(D, s, lam, cfg)
            np.asarray(res.steps)
            walls[name].append(res.runtime)
            if rep == 0:
                pnorms[name] = np.asarray(res.pnorm)

    thresh = 1e-6 * np.sqrt(n)
    print(f"\n{'variant':16s} {'best iter/s':>12s} {'us/iter':>8s} "
          f"{'steps@1e-6':>10s} {'t@1e-6 ms':>10s}  all-reps iter/s")
    for name in variants:
        best = min(walls[name])
        ips = iters / best
        hit = np.nonzero(pnorms[name] <= thresh)[0]
        steps6 = int(hit[0]) + 1 if len(hit) else None
        t6 = None if steps6 is None else 1e3 * steps6 / ips
        allr = "/".join(f"{iters/w:,.0f}" for w in walls[name])
        print(f"{name:16s} {ips:12,.1f} {1e6*best/iters:8.2f} "
              f"{str(steps6):>10s} "
              f"{('%.2f' % t6) if t6 else '—':>10s}  {allr}")

    # Solution quality cross-check (f32): AA vs plain objective.
    obj = lambda z: 0.5 * np.sum((D @ np.asarray(z, np.float64) - s) ** 2) \
        + lam * np.sum(np.abs(np.asarray(z, np.float64)))
    r_p = lasso(D, s, lam, variants["plain"])
    r_a = lasso(D, s, lam, variants["aa10"])
    fp, fa = obj(r_p.zopt), obj(r_a.zopt)
    print(f"\nobjective plain {fp:.8f}  aa10 {fa:.8f}  "
          f"rel {(fa - fp) / (1 + abs(fp)):.2e}")


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
