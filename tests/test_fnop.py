"""Matrix-free constraint operators (linop.FnOp) — the reference's
function-handle A with explicit nA (admm.m:121-130)."""

import numpy as np

from admm_tpu import ADMMConfig, FnOp, Hooks, admm
from admm_tpu.ops.prox import soft_threshold
from admm_tpu.utils import errorcheck


def _scale_mv(v, alpha):
    return alpha * v


def test_fnop_as_engine_constraint():
    """Solve a LAD-style problem with A given as a matrix-free callable
    pair instead of a dense matrix: A = 3*I via FnOp."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 32
    s = jnp.asarray(rng.standard_normal(n))
    alpha = jnp.asarray(3.0)
    A = FnOp(_scale_mv, _scale_mv, data=(alpha,))

    # min 1/2||x - s||^2 + ||z||_1  s.t.  3x - z = 0
    def prox_f(x, z, u, rho):
        # argmin 1/2||x-s||^2 + rho/2 ||3x - z + u||^2
        return (s + 3.0 * rho * (z - u)) / (1.0 + 9.0 * rho)

    def prox_g(x, z, u, rho):
        return soft_threshold(3.0 * x + u, 1.0 / rho)

    res = admm(prox_f, prox_g, ADMMConfig(maxiters=3000),
               A=A, B=-1.0, c=0.0, m=n, nA=n, nB=n)
    x = np.asarray(res.xopt)
    # Oracle: x = prox of (lam'=1/3-scaled soft threshold in y=3x space):
    # minimize 1/2||x-s||^2 + |3x|_1 -> x_i = sign(s)*max(|s|-3, 0)... with
    # the substitution y=3x: 1/2||y/3 - s||^2 + ||y||_1; closed form per
    # coordinate: x = sign(s) * max(|s| - 9, 0)/... verify via subgradient:
    # 0 in (x - s) + 3*sign(3x)  =>  x = s - 3*sign(x) when |s| > 3 else 0.
    expected = np.sign(np.asarray(s)) * np.maximum(np.abs(np.asarray(s)) - 3.0, 0.0)
    np.testing.assert_allclose(x, expected, atol=1e-4)


def test_errorcheck_row_column_vectors():
    col = errorcheck([1.0, 2.0, 3.0], "iscolumnvector")
    assert col.shape == (3, 1)
    row = errorcheck(np.ones((4, 1)), "isrowvector")
    assert row.shape == (1, 4)
    import pytest

    with pytest.raises(ValueError):
        errorcheck(np.ones((2, 3)), "isrowvector")
