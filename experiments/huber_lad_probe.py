"""Round-5 probe: huberfit vs lad 1.6x gap at the identical shape
(VERDICT round 4, weak #2).

Round-4 matrix: lad_f32 30,935 iter/s vs huberfit_f32 19,365 at
4096x512 — yet the two solvers share the x-prox (normal_equations_data
GEMV), the A=D wiring, and the body class; the z-proxes differ by 4
elementwise ops (ops/prox.huber_prox vs soft_threshold).

Interleaved A/B in ONE process (the lp_tail_probe3 pattern, CLAUDE.md
noise-band rule): plain lad, plain huberfit, and two bisecting hybrids
run through the CORE engine with mixed proxes:

  * lad_xf_huber_g : lad's data/objective but huber's z-prox
  * huber_cheap_g  : huber z-prox algebra reduced to the soft-threshold
                     only (drops the (rho v + .)/(1+rho) blend)

If the gap survives interleaving it is real and the hybrids localize
it; if not, the round-4 delta was tunnel/window noise.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from admm_tpu import ADMMConfig  # noqa: E402
from admm_tpu.engine import Hooks, admm  # noqa: E402
from admm_tpu.models._common import normal_equations_data  # noqa: E402
from admm_tpu.models.huberfit import huberfit  # noqa: E402
from admm_tpu.models.lad import lad  # noqa: E402
from admm_tpu.ops.prox import huber_prox, soft_threshold  # noqa: E402

f32 = np.float32
rng = np.random.default_rng(0)
m, n = 4096, 512
ITERS = 2000

D = rng.standard_normal((m, n)).astype(f32)
s = rng.standard_normal(m).astype(f32)
cfg = ADMMConfig(maxiters=ITERS, domaxiters=True)
DATA = normal_equations_data(jnp.asarray(D), jnp.asarray(s))


def _pf(x, z, u, rho, d):
    return d["Dplus"] @ (d["s"] + z - u)


def _pg_lad(x, z, u, rho, d):
    return soft_threshold(d["D"] @ x + u - d["s"], 1.0 / rho)


def _pg_huber(x, z, u, rho, d):
    return huber_prox(d["D"] @ x, u, d["s"], rho)


def _pg_huber_cheap(x, z, u, rho, d):
    # huber's v-build + threshold but without the blend/divide tail.
    v = d["D"] @ x + u - d["s"]
    return soft_threshold(v, 1.0 + 1.0 / rho)


def _mixed(pg):
    return admm(_pf, pg, cfg, A=jnp.asarray(D), B=-1.0, c=jnp.asarray(s),
                m=m, nA=n, nB=m, dtype=jnp.float32, data=DATA)


VARIANTS = {
    "lad_wrapper": lambda: lad(D, s, cfg),
    "huber_wrapper": lambda: huberfit(D, s, cfg),
    "engine_lad_g": lambda: _mixed(_pg_lad),
    "engine_huber_g": lambda: _mixed(_pg_huber),
    "engine_hubercheap_g": lambda: _mixed(_pg_huber_cheap),
}


def run():
    for name, fn in VARIANTS.items():
        t0 = time.perf_counter()
        res = fn()
        np.asarray(res.xopt)  # hard host sync after the compile
        print(f"warmup {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    times = {k: [] for k in VARIANTS}
    for rep in range(5):
        for name, fn in VARIANTS.items():
            res = fn()
            np.asarray(res.xopt)
            times[name].append(res.runtime)

    print(f"\nshape {m}x{n}, {ITERS} iters, 5 interleaved reps")
    for name in VARIANTS:
        best = min(times[name])
        print(f"{name:22s} best {ITERS/best:9.1f} iter/s   "
              f"all {[round(ITERS/t, 1) for t in times[name]]}")


if __name__ == "__main__":
    run()
