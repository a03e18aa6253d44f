"""Markowitz portfolio optimization: the efficient frontier as ONE
batched QP program.

Beyond the reference (whose QP solver handles one instance per call,
solvers/quadraticprogram.m): the whole risk-aversion sweep

    min_x  (gamma/2) x^T Sigma x - mu^T x
    s.t.   1^T x = 1,  x >= 0            (long-only, fully invested)

is rescaled to the shared-structure form  min 1/2 x^T Sigma x + q_g^T x
with q_g = -mu/gamma, so every gamma shares the (Sigma, constraint, rho)
KKT fold and the sweep runs as one vmapped `qp_batch` program — the same
MPC many-QPs-one-structure pattern as examples/mpc_qp.py, applied to the
classic finance frontier.

Usage:  python -m examples.portfolio
"""

from __future__ import annotations

import numpy as np


def efficient_frontier(n_assets=32, n_factors=4, n_gammas=16, seed=0,
                       maxiters=6000, quiet=False):
    from admm_tpu import ADMMConfig, qp_batch

    rng = np.random.default_rng(seed)
    # Factor-model covariance (PSD + diagonal idiosyncratic risk) and
    # expected returns loosely aligned with risk.
    F = rng.standard_normal((n_assets, n_factors)) / np.sqrt(n_factors)
    Sigma = F @ F.T + np.diag(0.05 + 0.2 * rng.random(n_assets))
    mu = 0.03 + 0.10 * rng.random(n_assets) + 0.05 * np.diag(Sigma)

    gammas = np.logspace(-0.5, 1.5, n_gammas)
    Qs = (-mu[None, :] / gammas[:, None]).astype(np.float64)
    D = np.ones((1, n_assets))
    s = np.array([1.0])

    cfg = ADMMConfig(maxiters=maxiters, abstol=1e-9, reltol=1e-9)
    out = qp_batch(Sigma, Qs, 0.0, D, s, cfg)
    Wts = np.asarray(out.zopt)  # the feasible (projected) iterate

    rows = []
    for g, w in zip(gammas, Wts):
        ret = float(mu @ w)
        vol = float(np.sqrt(w @ Sigma @ w))
        rows.append((float(g), ret, vol, float(w.sum()), float(w.min())))
    if not quiet:
        print(f"{'gamma':>8} {'return':>8} {'vol':>8} {'sum(w)':>8} "
              f"{'min(w)':>9}")
        for g, ret, vol, sw, mn in rows:
            print(f"{g:8.3f} {ret:8.4f} {vol:8.4f} {sw:8.5f} {mn:9.2e}")
    return rows


if __name__ == "__main__":
    efficient_frontier()
