"""Oracle test for least absolute deviations, mirroring reference
testers/ladtest.m:115-168: planted x, huge sparse outliers (100*randn at
~2% of rows) — the robustness property; assert x residual and objective
relative error within tolerance."""

import numpy as np

from admm_tpu import ADMMConfig, lad


def _make_instance(seed, rows, cols):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((rows, cols))
    xtrue = 10.0 * rng.standard_normal(cols)
    s = D @ xtrue
    idx = rng.choice(rows, size=int(np.ceil(rows / 50)), replace=False)
    s[idx] = s[idx] + 100.0 * rng.standard_normal(len(idx))
    return D, s, xtrue


def test_lad_robust_to_outliers():
    errtol = 1e-3
    D, s, xtrue = _make_instance(0, 512, 32)
    res = lad(D, s, ADMMConfig(objevals=True, convtest=True, maxiters=5000))
    assert not res.diverged
    xopt = np.asarray(res.xopt)
    trueobj = np.sum(np.abs(D @ xtrue - s))
    objopt = np.sum(np.abs(D @ xopt - s))
    assert np.linalg.norm(xtrue - xopt) < errtol
    assert abs(objopt - trueobj) <= errtol * trueobj


def test_lad_relaxed_variant():
    """Relaxation-aware z-prox path (reference args.userelax,
    lad.m:124-126) must still solve the problem."""
    D, s, xtrue = _make_instance(1, 512, 32)
    res = lad(D, s, ADMMConfig(relax=1.5, maxiters=5000))
    xopt = np.asarray(res.xopt)
    assert np.linalg.norm(xtrue - xopt) < 1e-2
