"""Numerical robustness on ill-conditioned inputs.

The rho-folded solvers (ops/solve.py) operate on G + rho*I, which is
positive definite even when the Gram G itself is singular — duplicated
features, rank-deficient data, and extreme scaling must therefore solve
cleanly (the reference's Cholesky caches share this property through
the same shift).  These tests pin that down at f64.
"""

import numpy as np
import pytest

from admm_tpu import ADMMConfig, lasso
from admm_tpu.ops.solve import SymShiftSolver


def test_lasso_with_duplicated_columns():
    # Exactly singular Gram: every column duplicated.  The folded
    # (D^T D + rho I) solve is still PD; ADMM must converge and split
    # weight across the duplicates (objective matches the oracle solve
    # on the deduplicated problem).
    rng = np.random.default_rng(0)
    base = rng.standard_normal((80, 10))
    D = np.concatenate([base, base], axis=1)  # rank 10, 20 columns
    x_true = np.zeros(20)
    x_true[:3] = [1.0, -2.0, 0.5]
    s = D @ x_true + 0.01 * rng.standard_normal(80)
    lam = 0.1 * np.max(np.abs(D.T @ s))
    res = lasso(D, s, lam, ADMMConfig(maxiters=3000))
    assert not res.diverged
    x = np.asarray(res.xopt)
    obj = 0.5 * np.sum((D @ x - s) ** 2) + lam * np.sum(np.abs(x))
    obj_true = 0.5 * np.sum((D @ x_true - s) ** 2) + lam * np.sum(np.abs(x_true))
    assert obj <= obj_true * (1 + 1e-6)


def test_symshift_solver_on_near_singular_gram():
    # Condition number ~1e12 in G: the rho shift dominates the tiny
    # eigenvalues, so the folded solve must stay accurate.
    rng = np.random.default_rng(1)
    Q, _ = np.linalg.qr(rng.standard_normal((50, 50)))
    w = np.geomspace(1e-12, 1.0, 50)
    G = (Q * w) @ Q.T
    sol = SymShiftSolver.from_matrix(G)
    rho = 0.5
    b = rng.standard_normal(50)
    x = np.asarray(sol.solve(b, rho))
    resid = np.linalg.norm((G + rho * np.eye(50)) @ x - b) / np.linalg.norm(b)
    assert resid < 1e-10


@pytest.mark.parametrize("scale", [1e-6, 1e6])
def test_lasso_extreme_data_scaling(scale):
    # The Boyd stopping rule is relative (abstol + reltol * norms), so
    # rescaling the data by 1e+-6 must still converge without NaNs.
    rng = np.random.default_rng(2)
    D = rng.standard_normal((60, 30)) * scale
    s = rng.standard_normal(60) * scale
    lam = 0.1 * np.max(np.abs(D.T @ s))
    res = lasso(D, s, lam, ADMMConfig(maxiters=4000, rho=scale**2))
    assert not res.diverged
    assert np.all(np.isfinite(np.asarray(res.xopt)))
    # Converged in-budget (scale-adapted rho keeps the iteration count
    # in the same regime as the unit-scale problem).
    assert int(res.steps) < 4000
