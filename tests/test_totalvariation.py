"""Oracle test for TV denoising, mirroring reference
testers/totalvariationtest.m:109-155: a piecewise-constant staircase
signal plus unit Gaussian noise; the denoised objective must beat the
noisy/true signal's objective."""

import numpy as np

from admm_tpu import ADMMConfig, totalvariation
from admm_tpu.linop import DiffOp


def _staircase(seed, rows):
    rng = np.random.default_rng(seed)
    truex = np.ones(rows)
    for _ in range(3):
        rs = int(rng.integers(1, rows + 1))
        ri = int(rng.integers(1, 11))
        truex[int(np.ceil(rs / 2)) - 1 : rs] *= ri
    s = truex + rng.standard_normal(rows)
    return truex, s


def _objective(x, s, lam):
    return 0.5 * np.sum((x - s) ** 2) + lam * np.sum(np.abs(np.diff(x)))


def test_tv_denoises_staircase():
    lam = 1.0
    truex, s = _staircase(0, 256)
    res = totalvariation(s, lam, ADMMConfig(objevals=True, maxiters=10000))
    xopt = np.asarray(res.xopt)
    assert _objective(xopt, s, lam) < _objective(truex, s, lam)
    assert res.steps < 10000


def test_diffop_matches_reference_matrix():
    """DiffOp must equal spdiags([1 -1], 0:1, n, n)
    (solvers/totalvariation.m:127)."""
    n = 17
    op = DiffOp(n)
    Dd = np.asarray(op.dense(np.float64))
    expected = np.eye(n) - np.eye(n, k=1)
    np.testing.assert_array_equal(Dd, expected)
    rng = np.random.default_rng(1)
    v = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(op.mv(v)), expected @ v, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.rmv(v)), expected.T @ v, atol=1e-12)
