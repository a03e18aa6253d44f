"""Step-size (rho) study.

Mirrors reference examples/stepsizetesting.m: run a tester across a list
of rho values and report steps-to-convergence and pass/fail per rho.

Usage:  python examples/stepsizetesting.py [solver]
"""

from __future__ import annotations

import sys

import numpy as np


def stepsizetesting(rhos=(0.1, 0.5, 1.0, 2.0, 10.0), tester="model",
                    seed=0, quiet=False, **tester_kwargs):
    from admm_tpu import ADMMConfig
    from admm_tpu.testers import problems as p

    tester_fn = getattr(p, f"{tester}test")
    out = {}
    for rho in rhos:
        cfg = ADMMConfig(rho=float(rho))
        if tester == "linearsvm":
            res, _, test = tester_fn(seed=seed, quiet=True, config=cfg, **tester_kwargs)
        else:
            res, test = tester_fn(seed=seed, quiet=True, config=cfg, **tester_kwargs)
        out[rho] = (res.steps, not test["failed"])
        if not quiet:
            print(f"rho = {rho:>6}: {res.steps:>6} steps, "
                  f"{'pass' if not test['failed'] else 'FAIL'}")
    return out


if __name__ == "__main__":
    stepsizetesting(tester=sys.argv[1] if len(sys.argv) > 1 else "model")
