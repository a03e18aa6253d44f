"""Standard vs fast vs accelerated ADMM comparison.

Mirrors reference examples/fasteradmmcomparison.m: solve the same model
problem with alg 0 (standard), alg 1 (fast, strong convexity) and alg 2
(accelerated with restart) and compare steps-to-convergence, x-error,
and wall time.

Usage:  python examples/fasteradmmcomparison.py [m] [n]
"""

from __future__ import annotations

import sys

import numpy as np


def fasteradmmcomparison(m=128, n=96, seed=0, maxiters=5000, quiet=False):
    from admm_tpu import ADMMConfig
    from admm_tpu.models.model import model

    rng = np.random.default_rng(seed)
    P, Q = rng.standard_normal((m, n)), rng.standard_normal((m, n))
    r, s = rng.standard_normal(m), rng.standard_normal(m)
    truex = np.linalg.solve(P.T @ P + Q.T @ Q, P.T @ r + Q.T @ s)

    variants = {
        "standard": ADMMConfig(maxiters=maxiters),
        "fast (strong)": ADMMConfig(maxiters=maxiters, fast=True, fasttype="strong"),
        "accelerated+restart (weak)": ADMMConfig(
            maxiters=maxiters, fast=True, fasttype="weak"
        ),
    }
    out = {}
    for name, cfg in variants.items():
        res = model(P, Q, r, s, cfg)
        xerr = float(np.linalg.norm(np.asarray(res.xopt) - truex))
        out[name] = (res.steps, xerr, res.runtime)
        if not quiet:
            print(f"{name:>28}: {res.steps:>5} steps, x-err {xerr:.2e}, "
                  f"{res.runtime:.3f}s")
    return out


if __name__ == "__main__":
    argv = [int(a) for a in sys.argv[1:3]]
    fasteradmmcomparison(*argv)
