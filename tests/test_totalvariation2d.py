"""2-D TV denoising (TPU-native extension; models/totalvariation2d.py)."""

import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.models.totalvariation2d import TV2DOp, totalvariation2d


def test_tv2d_operator_adjoint():
    """<A X, V> == <X, A^T V> for the stacked difference operator."""
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    m, n = 13, 17
    A = TV2DOp(m, n)
    X = jnp.asarray(rng.standard_normal((m, n)))
    V = jnp.asarray(rng.standard_normal((2, m, n)))
    lhs = float(np.sum(np.asarray(A.mv(X)) * np.asarray(V)))
    rhs = float(np.sum(np.asarray(X) * np.asarray(A.rmv(V))))
    assert abs(lhs - rhs) < 1e-10


def test_tv2d_prox_solves_sylvester_system():
    """The separable-eigenbasis x-prox must satisfy
    (I + rho (Dr^T Dr (+) Dc^T Dc)) X = B."""
    import jax.numpy as jnp

    from admm_tpu.linop import DiffOp
    from admm_tpu.models.totalvariation2d import _prox_f, make_prox_ops

    rng = np.random.default_rng(1)
    m, n = 12, 9
    S = rng.standard_normal((m, n))
    pf, pg, obj, data, A = make_prox_ops(S, 0.7, ADMMConfig())
    rho = 1.3
    Z = jnp.asarray(rng.standard_normal((2, m, n)))
    U = jnp.asarray(rng.standard_normal((2, m, n)))
    X = np.asarray(_prox_f(None, Z, U, rho, data))

    Dr = np.asarray(DiffOp(m).dense(np.float64))
    Dc = np.asarray(DiffOp(n).dense(np.float64))
    B = np.asarray(S) + rho * np.asarray(A.rmv(Z - U))
    lhs = X + rho * (Dr.T @ Dr @ X + X @ Dc.T @ Dc)
    np.testing.assert_allclose(lhs, B, atol=1e-9)


def test_tv2d_denoises_blocky_image():
    rng = np.random.default_rng(2)
    m = n = 48
    truth = np.ones((m, n))
    truth[10:30, 15:40] = 5.0
    truth[35:45, 5:20] = 3.0
    S = truth + rng.standard_normal((m, n))
    lam = 1.0
    res = totalvariation2d(S, lam, ADMMConfig(maxiters=3000))
    X = np.asarray(res.xopt)

    def objective(V):
        tv = np.abs(np.diff(V, axis=0)).sum() + np.abs(np.diff(V, axis=1)).sum()
        return 0.5 * np.sum((V - S) ** 2) + lam * tv

    assert objective(X) < objective(truth)
    assert objective(X) < objective(S)
    # Interior of the flat region should be nearly constant.
    assert np.std(X[15:25, 20:35]) < 0.25
