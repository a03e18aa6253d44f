"""Convergence-monitor fault-injection demo.

Mirrors reference examples/convergencechecking.m: run the model problem
with deliberately broken proximal operators (sign errors, flagged at
convergencechecking.m:198, 235) in all four combinations (ok/ok,
broken-f, broken-g, both) and show the H-norm divergence monitor
(admm.m:686-703) catching the broken ones while the correct pair
converges (convergencechecking.m:124-157).

Usage:  python examples/convergencechecking.py [m] [n]
"""

from __future__ import annotations

import sys

import numpy as np


def convergencechecking(m=64, n=48, seed=0, quiet=False):
    from admm_tpu import ADMMConfig, Hooks, admm
    from admm_tpu.models._common import bind_data
    from admm_tpu.models.model import make_prox_ops

    rng = np.random.default_rng(seed)
    P, Q = rng.standard_normal((m, n)), rng.standard_normal((m, n))
    r, s = rng.standard_normal(m), rng.standard_normal(m)

    cfg = ADMMConfig(convtest=True, maxiters=200, objevals=True)
    pf, pg, obj = bind_data(*make_prox_ops(P, Q, r, s, cfg))

    # The deliberate sign errors (convergencechecking.m:198, 235).
    bad_pf = lambda x, z, u, rho: pf(x, z, -u, rho)
    bad_pg = lambda x, z, u, rho: pg(x, z, -u, rho)

    combos = {
        "ok-f / ok-g": (pf, pg),
        "BROKEN-f / ok-g": (bad_pf, pg),
        "ok-f / BROKEN-g": (pf, bad_pg),
        "BROKEN-f / BROKEN-g": (bad_pf, bad_pg),
    }
    out = {}
    for name, (f_, g_) in combos.items():
        res = admm(f_, g_, cfg, A=1.0, B=-1.0, c=0.0, m=n, hooks=Hooks(obj=obj))
        out[name] = res
        if not quiet:
            status = "DIVERGED (caught by monitor)" if res.diverged else "converged"
            print(f"{name:>22}: {status} after {res.steps} steps, "
                  f"final Hnorm^2 {np.asarray(res.Hnormsq)[-1]:.3e}")
    assert not out["ok-f / ok-g"].diverged
    return out


if __name__ == "__main__":
    argv = [int(a) for a in sys.argv[1:3]]
    convergencechecking(*argv)
