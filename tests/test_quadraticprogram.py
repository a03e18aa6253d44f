"""Oracle tests for the QP solver, both constraint forms
(reference testers/quadraticprogramtest.m:133-179)."""

import numpy as np

from admm_tpu import ADMMConfig, quadraticprogram


def _wellcond_P(rng, n):
    # Well-conditioned PD P via eigen-rescaling (quadraticprogramtest.m:135-138).
    P = rng.random((n, n))
    P = P + P.T
    V, _ = np.linalg.eigh(P)[1], None
    w = 1.0 + rng.random(n)
    Q = np.linalg.eigh(P + P.T)[1]
    return (Q * w) @ Q.T


def test_qp_standard_unique_feasible_point():
    """Square full-rank D with planted nonnegative x: the feasible set is a
    single point; ADMM must find it."""
    rng = np.random.default_rng(0)
    n = 48
    P = _wellcond_P(rng, n)
    q = rng.standard_normal(n)
    r = float(rng.standard_normal())
    truex = np.abs(rng.standard_normal(n))
    D = np.abs(rng.standard_normal((n, n)))
    s = D @ truex
    res = quadraticprogram(
        P, q, r, D, s,
        ADMMConfig(objevals=True, maxiters=10000, abstol=1e-11, reltol=1e-9),
    )
    xopt = np.asarray(res.xopt)
    np.testing.assert_allclose(xopt, truex, atol=1e-5)
    assert np.linalg.norm(D @ xopt - s) <= 1e-5


def test_qp_bounded_interior_optimum():
    """Bounds wide enough that the unconstrained minimizer -P^{-1}q is
    interior: ADMM must return it exactly."""
    rng = np.random.default_rng(1)
    n = 48
    P = _wellcond_P(rng, n)
    q = rng.standard_normal(n)
    xstar = -np.linalg.solve(P, q)
    lb = xstar - 1.0 - rng.random(n)
    ub = xstar + 1.0 + rng.random(n)
    res = quadraticprogram(
        P, q, 0.0, lb, ub,
        ADMMConfig(maxiters=10000, abstol=1e-11, reltol=1e-9),
    )
    np.testing.assert_allclose(np.asarray(res.xopt), xstar, atol=1e-6)


def test_qp_bounded_active_bounds_diagonal():
    """Diagonal P gives the separable closed form x_i = clip(-q_i/P_ii)."""
    rng = np.random.default_rng(2)
    n = 32
    d = 1.0 + rng.random(n)
    P = np.diag(d)
    q = rng.standard_normal(n) * 3.0
    lb = -0.5 * np.ones(n)
    ub = 0.5 * np.ones(n)
    xstar = np.clip(-q / d, lb, ub)
    res = quadraticprogram(
        P, q, 0.0, lb, ub,
        ADMMConfig(maxiters=20000, abstol=1e-11, reltol=1e-9),
    )
    np.testing.assert_allclose(np.asarray(res.xopt), xstar, atol=1e-5)


def test_qp_bound_normalization():
    """Swapped bounds are normalized (quadraticprogram.m:340-350)."""
    rng = np.random.default_rng(3)
    n = 16
    d = 1.0 + rng.random(n)
    q = rng.standard_normal(n)
    lb = -np.ones(n)
    ub = np.ones(n)
    r1 = quadraticprogram(np.diag(d), q, 0.0, lb, ub, ADMMConfig(maxiters=5000))
    r2 = quadraticprogram(np.diag(d), q, 0.0, ub, lb, ADMMConfig(maxiters=5000))
    np.testing.assert_allclose(np.asarray(r1.xopt), np.asarray(r2.xopt), atol=1e-10)


def test_qp_standard_altproxg_override():
    """altproxg must also reach the STANDARD form's z-prox (reference
    getProxOps.m:664-666 applies it in both forms; round 1 only wired
    the bounded form)."""
    import jax.numpy as jnp

    from admm_tpu import ADMMConfig, quadraticprogram

    seen = []

    def traced_g(x, z, u, rho, d):
        seen.append(True)
        return jnp.maximum(x + u, 0.0)

    rng = np.random.default_rng(4)
    n = 12
    truex = np.abs(rng.standard_normal(n))
    D = rng.standard_normal((n, n))
    s = D @ truex
    P = rng.standard_normal((n, n))
    P = P @ P.T + n * np.eye(n)
    q = rng.standard_normal(n)
    res = quadraticprogram(P, q, 0.0, D, s, ADMMConfig(maxiters=2000),
                           altproxg=traced_g)
    assert seen, "altproxg was never traced into the standard-form loop"
    assert np.asarray(res.zopt).min() >= -1e-10
