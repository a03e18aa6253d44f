"""Oracle test for basis pursuit, mirroring reference
testers/basispursuittest.m:109-143: plant a sparse x, set s = D x; the
ADMM objective must not exceed the planted ||x||_1 and the constraint
D x = s must hold to high relative accuracy (reference errtol 1e-10 for
this solver, solvertester.m:114-123)."""

import numpy as np
import pytest

from admm_tpu import ADMMConfig, basispursuit


def _make_instance(seed, rows, cols, density=0.1):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((rows, cols))
    testx = rng.standard_normal(cols) * (rng.random(cols) < density)
    s = D @ testx
    return D, s, testx


@pytest.mark.parametrize("seed,rows,cols", [(0, 32, 128), (1, 64, 256)])
def test_basispursuit_recovers_sparse_solution(seed, rows, cols):
    D, s, testx = _make_instance(seed, rows, cols)
    res = basispursuit(
        D, s, ADMMConfig(objevals=True, maxiters=10000, abstol=1e-9, reltol=1e-8)
    )
    xopt = np.asarray(res.xopt)
    assert np.sum(np.abs(testx)) >= np.sum(np.abs(xopt)) - 1e-8
    Dx = D @ xopt
    relerror = np.mean(np.abs((Dx - s) / Dx))
    assert relerror <= 1e-10


def test_basispursuit_rejects_overdetermined():
    rng = np.random.default_rng(2)
    D = rng.standard_normal((64, 32))
    with pytest.raises(ValueError):
        basispursuit(D, rng.standard_normal(64))
