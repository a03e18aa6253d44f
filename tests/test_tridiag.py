"""Cyclic-reduction tridiagonal solver (ops/tridiag.py) + its TV wiring."""

import numpy as np
import pytest

from admm_tpu import ADMMConfig, totalvariation
from admm_tpu.ops.tridiag import CyclicReductionSolver


@pytest.mark.parametrize("n", [1, 3, 7, 10, 100, 255, 1000, 4097])
def test_cr_matches_dense_solve(n):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    d = 3.0 + rng.random(n)
    dl = np.r_[0.0, -rng.random(n - 1)] if n > 1 else np.zeros(1)
    du = np.r_[-rng.random(n - 1), 0.0] if n > 1 else np.zeros(1)
    T = np.diag(d)
    if n > 1:
        T += np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
    b = rng.standard_normal(n)
    sol = CyclicReductionSolver.from_tridiag(dl, d, du)
    x = np.asarray(sol.solve(jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(T, b), atol=1e-9)


def test_cr_solver_jits_and_vmaps():
    import jax
    import jax.numpy as jnp

    n = 257
    rng = np.random.default_rng(1)
    d = 4.0 * np.ones(n)
    off = -np.ones(n)
    sol = CyclicReductionSolver.from_tridiag(
        np.r_[0.0, off[1:]], d, np.r_[off[:-1], 0.0]
    )
    B = jnp.asarray(rng.standard_normal((5, n)))
    X = jax.jit(jax.vmap(sol.solve))(B)
    T = np.diag(d) + np.diag(off[1:], -1) + np.diag(off[:-1], 1)
    np.testing.assert_allclose(
        np.asarray(X), np.linalg.solve(T, np.asarray(B).T).T, atol=1e-8
    )


def test_tv_cr_path_matches_dense_path():
    """The CR TV path must produce the same denoised signal as the dense
    eigh path."""
    rng = np.random.default_rng(2)
    n = 512
    truex = np.ones(n)
    truex[100:300] *= 4
    s = truex + rng.standard_normal(n)
    cfg = ADMMConfig(maxiters=3000)
    r_dense = totalvariation(s, 1.0, cfg, solver="dense")
    r_cr = totalvariation(s, 1.0, cfg, solver="cr")
    assert r_cr.steps == r_dense.steps
    np.testing.assert_allclose(
        np.asarray(r_cr.xopt), np.asarray(r_dense.xopt), atol=1e-8
    )


def test_tv_cr_large_n():
    """Large-n TV (where the dense path would need a 16k^2 matrix)."""
    rng = np.random.default_rng(3)
    n = 16384
    truex = np.ones(n)
    truex[2000:9000] *= 5
    s = truex + rng.standard_normal(n)
    res = totalvariation(s, 2.0, ADMMConfig(maxiters=2000))  # auto -> cr
    x = np.asarray(res.xopt)

    def objective(v):
        return 0.5 * np.sum((v - s) ** 2) + 2.0 * np.sum(np.abs(np.diff(v)))

    assert objective(x) < objective(truex)
    assert objective(x) < objective(s)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 255, 1000])
def test_packed_cr_matches_dense_solve(n):
    import jax.numpy as jnp

    from admm_tpu.ops.tridiag import PackedCyclicReductionSolver

    rng = np.random.default_rng(3)
    dl = np.r_[0.0, rng.standard_normal(n - 1)] if n > 1 else np.zeros(1)
    du = np.r_[rng.standard_normal(n - 1), 0.0] if n > 1 else np.zeros(1)
    d = 4.0 + np.abs(rng.standard_normal(n))
    T = np.diag(d)
    if n > 1:
        T += np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
    b = rng.standard_normal(n)
    sol = PackedCyclicReductionSolver.from_tridiag(dl, d, du)
    np.testing.assert_allclose(np.asarray(sol.solve(jnp.asarray(b))),
                               np.linalg.solve(T, b), rtol=1e-10, atol=1e-12)


def test_packed_cr_jits_vmaps_and_batches():
    import jax
    import jax.numpy as jnp

    from admm_tpu.ops.tridiag import PackedCyclicReductionSolver

    rng = np.random.default_rng(4)
    n = 129
    dl = np.r_[0.0, rng.standard_normal(n - 1)]
    du = np.r_[rng.standard_normal(n - 1), 0.0]
    d = 4.0 + np.abs(rng.standard_normal(n))
    T = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
    sol = PackedCyclicReductionSolver.from_tridiag(dl, d, du)
    B = rng.standard_normal((5, n))
    want = np.linalg.solve(T, B.T).T
    # jit over the pytree-registered solver
    got = np.asarray(jax.jit(lambda s, b: s.solve(b))(sol, jnp.asarray(B)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # native leading batch dim == vmap
    got_v = np.asarray(jax.vmap(sol.solve)(jnp.asarray(B)))
    np.testing.assert_allclose(got_v, want, rtol=1e-10, atol=1e-12)


def test_tv_cr_variants_agree():
    """All three cyclic-reduction TV wirings — 'cr_packed' (the packed
    layout), 'cr_masked' (all levels masked), and 'cr' with the hybrid
    dense tail FORCED ON (n small, so exercise the cutoff directly via
    the solver class) — must produce the same trajectory as the dense
    path."""
    import jax.numpy as jnp

    from admm_tpu import ADMMConfig, totalvariation
    from admm_tpu.models.totalvariation import make_prox_ops
    from admm_tpu.ops.tridiag import CyclicReductionSolver

    rng = np.random.default_rng(5)
    n = 300
    sig = np.repeat(rng.standard_normal(10), 30) + 0.3 * rng.standard_normal(n)
    cfg = ADMMConfig(maxiters=400)
    r_p = totalvariation(sig, 0.8, cfg, solver="cr_packed")
    r_m = totalvariation(sig, 0.8, cfg, solver="cr_masked")
    r_d = totalvariation(sig, 0.8, cfg, solver="dense")
    assert r_p.steps == r_m.steps
    np.testing.assert_allclose(np.asarray(r_p.xopt), np.asarray(r_m.xopt),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(r_p.xopt), np.asarray(r_d.xopt),
                               rtol=1e-6, atol=1e-8)

    # The hybrid tail inside the TV prox: swap in a dense_cutoff solver
    # at this small n (the production gate only enables it at n > 16384)
    # and assert the trajectory is unchanged.
    pf, pg, obj, data, D = make_prox_ops(sig, 0.8, cfg, "cr_masked")
    rho = cfg.rho
    diag = 1.0 + rho * np.r_[1.0, 2.0 * np.ones(n - 1)]
    off = -rho * np.ones(n)
    hyb = CyclicReductionSolver.from_tridiag(
        np.r_[0.0, off[1:]], diag, np.r_[off[:-1], 0.0], dense_cutoff=63)
    b = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(hyb.solve(b)),
                               np.asarray(data["cr"].solve(b)),
                               rtol=1e-10, atol=1e-12)


def test_hybrid_cr_dense_tail_matches_masked():
    """dense_cutoff (hybrid) must reproduce the all-levels masked solve
    exactly, across cut depths and at awkward sizes."""
    import jax.numpy as jnp

    from admm_tpu.ops.tridiag import CyclicReductionSolver

    rng = np.random.default_rng(9)
    for n, cutoff in ((5000, 1023), (5000, 63), (300, 1023), (130, 7)):
        dl = np.r_[0.0, rng.standard_normal(n - 1)]
        du = np.r_[rng.standard_normal(n - 1), 0.0]
        d = 4.0 + np.abs(rng.standard_normal(n))
        b = rng.standard_normal(n)
        full = CyclicReductionSolver.from_tridiag(dl, d, du)
        hyb = CyclicReductionSolver.from_tridiag(dl, d, du,
                                                 dense_cutoff=cutoff)
        np.testing.assert_allclose(
            np.asarray(hyb.solve(jnp.asarray(b))),
            np.asarray(full.solve(jnp.asarray(b))),
            rtol=1e-10, atol=1e-11)
