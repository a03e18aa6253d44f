"""Oracle test for the standard-form LP, mirroring reference
testers/linearprogramtest.m:108-138: nonnegative planted x with square
full-rank D makes the planted point the unique feasible (hence optimal)
point; assert objective relative error and constraint residual."""

import numpy as np

from admm_tpu import ADMMConfig, linearprogram


def _make_instance(seed, n):
    rng = np.random.default_rng(seed)
    b = rng.random(n) + 0.5
    truex = np.abs(rng.standard_normal(n))
    D = np.abs(rng.standard_normal((n, n)))
    s = D @ truex
    return b, D, s, truex


def test_lp_unique_feasible_point():
    errtol = 1e-6
    b, D, s, truex = _make_instance(0, 64)
    res = linearprogram(
        b, D, s,
        ADMMConfig(objevals=True, maxiters=10000, abstol=1e-11, reltol=1e-9),
    )
    xopt = np.asarray(res.xopt)
    trueobj = float(b @ truex)
    objopt = float(b @ xopt)
    Dx = D @ xopt
    relerror = np.mean(np.abs((Dx - s) / Dx))
    assert abs((trueobj - objopt) / objopt) <= errtol
    assert relerror <= errtol
