"""Anderson acceleration + Ruiz preconditioning study (round-5 levers).

No reference analog (the reference's only acceleration is the
fast/accelerated momentum, admm.m:563-600, and its testers only
generate well-scaled data).  Two demonstrations:

1. Acceleration ladder on a tight-tolerance LASSO: plain vs fast vs
   Anderson windows — AA converges where both baselines burn the cap.
2. A badly row/column-scaled LP: plain ADMM stalls infeasible;
   ``precondition=True`` recovers the optimum, and AA stacks on top.

Usage:  python examples/acceleration.py
"""

from __future__ import annotations

import numpy as np


def acceleration_ladder(rows=200, cols=400, seed=0, quiet=False):
    from admm_tpu import ADMMConfig, lasso

    rng = np.random.default_rng(seed)
    D = rng.standard_normal((rows, cols))
    s = rng.standard_normal(rows)
    lam = 0.1 * np.max(np.abs(D.T @ s))
    tol = dict(abstol=1e-8, reltol=1e-8, maxiters=20000)
    obj = lambda z: (0.5 * np.sum((D @ np.asarray(z) - s) ** 2)
                     + lam * np.sum(np.abs(np.asarray(z))))

    out = {}
    for name, kw in (("plain", {}), ("fast", dict(fast=True)),
                     ("anderson m=5", dict(anderson=5)),
                     ("anderson m=10", dict(anderson=10)),
                     ("anderson m=20", dict(anderson=20))):
        res = lasso(D, s, lam, ADMMConfig(**tol, **kw))
        out[name] = (int(res.steps), obj(res.zopt))
        if not quiet:
            print(f"{name:14s} steps {out[name][0]:6d}  "
                  f"objective {out[name][1]:.8f}")
    return out


def badly_scaled_lp(m=40, n=120, spread=2.0, seed=0, quiet=False):
    from admm_tpu import ADMMConfig, linearprogram

    rng = np.random.default_rng(seed)
    D = rng.standard_normal((m, n))
    s = D @ np.abs(rng.standard_normal(n))
    b = np.abs(rng.standard_normal(n)) + 0.1
    G = 10.0 ** rng.uniform(-spread, spread, m)
    F = 10.0 ** rng.uniform(-spread, spread, n)
    Db, sb, bb = G[:, None] * D * F[None, :], G * s, F * b

    cfg = ADMMConfig(abstol=1e-8, reltol=1e-8, maxiters=40000)
    out = {}
    for name, kw in (
        ("plain (bad scaling)", dict()),
        ("precondition", dict(precondition=True)),
        ("precondition + AA", dict(precondition=True, anderson=10)),
    ):
        res = linearprogram(bb, Db, sb,
                            ADMMConfig(abstol=1e-8, reltol=1e-8,
                                       maxiters=40000,
                                       anderson=kw.pop("anderson", 0)),
                            **kw)
        x = np.asarray(res.xopt, np.float64)
        fobj = float(bb @ x)
        # Violations in the ORIGINAL (bad) coordinates.  The x-prox
        # enforces Dx = s exactly each iteration, so a cap-burned plain
        # run reports a seemingly "better" objective at an x with
        # NEGATIVE entries — the cone violation is the tell.
        eq_viol = float(np.linalg.norm(Db @ x - sb) / np.linalg.norm(sb))
        cone_viol = float(max(0.0, -np.min(x)))
        out[name] = (int(res.steps), fobj, eq_viol, cone_viol)
        if not quiet:
            print(f"{name:22s} steps {out[name][0]:6d}  obj {fobj:12.6f}  "
                  f"eq viol {eq_viol:.2e}  cone viol {cone_viol:.2e}")
    del cfg
    return out


if __name__ == "__main__":
    print("== Acceleration ladder (tight-tolerance LASSO) ==")
    acceleration_ladder()
    print("\n== Badly scaled LP (row/col scales 10^±2) ==")
    badly_scaled_lp()
