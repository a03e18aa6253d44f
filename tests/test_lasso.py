"""Oracle test for LASSO, mirroring reference testers/lassotest.m:109-147:
sparse planted signal + noise, column-normalized D, lambda = 0.1 *
||D^T s||_inf; the ADMM objective must beat the planted objective."""

import numpy as np
import pytest

from admm_tpu import ADMMConfig, lasso


def _make_instance(seed, rows, cols, density=0.6):
    rng = np.random.default_rng(seed)
    testx = rng.standard_normal(cols) * (rng.random(cols) < density)
    D = rng.standard_normal((rows, cols))
    D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
    s = D @ testx + np.sqrt(0.001) * rng.standard_normal(rows)
    lam = 0.1 * np.max(np.abs(D.T @ s))
    return D, s, lam, testx


def _obj(D, s, lam, x, z):
    return 0.5 * np.sum((D @ x - s) ** 2) + lam * np.sum(np.abs(z))


@pytest.mark.parametrize(
    "seed,rows,cols",
    [(0, 128, 64), (1, 256, 128), (2, 64, 128)],  # skinny, skinny, fat/Woodbury
)
def test_lasso_beats_planted_objective(seed, rows, cols):
    D, s, lam, testx = _make_instance(seed, rows, cols)
    res = lasso(D, s, lam, ADMMConfig(objevals=True, maxiters=5000))
    assert res.steps < 5000
    xopt = np.asarray(res.xopt)
    assert _obj(D, s, lam, xopt, xopt) < _obj(D, s, lam, testx, testx)


def test_lasso_fat_branch_matches_skinny_math():
    """The Woodbury fat-matrix x-update (getProxOps.m:1198-1205) must agree
    with directly solving (D^T D + rho I) x = b."""
    rng = np.random.default_rng(3)
    D = rng.standard_normal((32, 96))
    b = rng.standard_normal(96)
    rho = 1.7
    from admm_tpu.ops.solve import WoodburySolver

    x_wood = np.asarray(WoodburySolver.from_matrix(D).solve(b, rho))
    x_direct = np.linalg.solve(D.T @ D + rho * np.eye(96), b)
    np.testing.assert_allclose(x_wood, x_direct, rtol=1e-9, atol=1e-10)


def test_lasso_zero_lambda_is_least_squares():
    rng = np.random.default_rng(4)
    D = rng.standard_normal((128, 32))
    s = rng.standard_normal(128)
    # Tiny lambda: solution approaches the least-squares solution.
    res = lasso(D, s, 1e-10, ADMMConfig(maxiters=5000, abstol=1e-9, reltol=1e-7))
    xls = np.linalg.lstsq(D, s, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.xopt), xls, atol=1e-4)
