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


def test_lp_qp_affine_kkt_matches_chol():
    """The fully-folded affine KKT apply (kkt_mode='affine', the
    default) must track the factored apply on a problem with a
    nontrivial nullspace: identical step counts and ~1e-14 agreement."""
    from admm_tpu import quadraticprogram

    rng = np.random.default_rng(42)
    m, n = 48, 96
    truex = np.abs(rng.standard_normal(n))
    D = np.abs(rng.standard_normal((m, n)))
    s = D @ truex
    b = rng.random(n) + 0.5
    cfg = ADMMConfig(maxiters=20000)
    r_aff = linearprogram(b, D, s, cfg)
    r_chol = linearprogram(b, D, s, cfg, kkt_mode="chol")
    assert int(r_aff.steps) == int(r_chol.steps)
    xa, xc = np.asarray(r_aff.xopt), np.asarray(r_chol.xopt)
    np.testing.assert_allclose(xa, xc, atol=1e-12 * np.linalg.norm(xc))
    assert np.linalg.norm(D @ xa - s) / np.linalg.norm(s) < 1e-12

    P0 = rng.standard_normal((n, n))
    P = P0 @ P0.T + n * np.eye(n)
    q = rng.standard_normal(n)
    r_aff = quadraticprogram(P, q, 0.0, D, s, cfg)
    r_chol = quadraticprogram(P, q, 0.0, D, s, cfg, kkt_mode="chol")
    assert int(r_aff.steps) == int(r_chol.steps)
    np.testing.assert_allclose(
        np.asarray(r_aff.xopt), np.asarray(r_chol.xopt),
        atol=1e-12 * np.linalg.norm(np.asarray(r_chol.xopt)))

    import pytest

    with pytest.raises(ValueError):
        linearprogram(b, D, s, cfg, kkt_mode="bogus")


def test_lp_altproxg_override():
    """args.altproxg replaces the z-prox (reference
    linearprogram.m:162-171): a box projection must be honored and keep
    iterates inside the box."""
    import jax.numpy as jnp

    from admm_tpu import ADMMConfig, linearprogram

    def boxg(x, z, u, rho, d):
        return jnp.clip(x + u, 0.0, 10.0)

    rng = np.random.default_rng(3)
    n = 16
    truex = np.abs(rng.standard_normal(n))
    D = rng.standard_normal((n, n))
    s = D @ truex
    b = rng.standard_normal(n)
    res = linearprogram(b, D, s, ADMMConfig(maxiters=2000), altproxg=boxg)
    z = np.asarray(res.zopt)
    assert z.min() >= -1e-10 and z.max() <= 10.0 + 1e-8
