"""Gradient-based hyperparameter tuning through the ADMM solver.

No reference analog: the MATLAB reference can only grid-search its
hyperparameters (examples/stepsizetesting.m sweeps rho by re-solving).
Here the solver itself is a differentiable JAX function
(admm_tpu.make_implicit_solver), so the denoising strength ``lam`` of a
1-D total-variation denoiser is LEARNED by descending

    d MSE(x*(lam), ground truth) / d lam,

the hypergradient through the ADMM fixed point, in a handful of steps —
versus the dozens of full solves a grid search needs for the same
resolution.

Usage:  python -m examples.hypergradient   (from the repo root)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tv_prox_f(xhat, z, u, rho, data):
    # argmin 0.5||x - b||^2 + rho/2 ||Dx - (z - u)||^2.  rho is static, so
    # Ginv = (I + rho D^T D)^-1 is precomputed ONCE and carried in data —
    # no refactorization inside the loop (the library-wide invariant);
    # gradients still flow through the GEMV to every data leaf.
    D, b, Ginv = data["D"], data["b"], data["Ginv"]
    return Ginv @ (b + rho * (D.T @ (z - u)))


def tv_prox_g(xhat, z, u, rho, data):
    v = data["D"] @ xhat + u
    k = jnp.exp(data["loglam"]) / rho  # positive lam via log-parameterization
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - k, 0.0)


def hypergradient_tuning(n=200, noise=0.25, steps=25, lr=0.3, seed=0,
                         quiet=False):
    from admm_tpu import ADMMConfig, DiffOp, make_implicit_solver

    rng = np.random.default_rng(seed)
    # Piecewise-constant ground truth + noise (the TV oracle construction,
    # reference testers/totalvariationtest.m).
    truth = np.zeros(n)
    for lo, hi, v in [(0, 60, 1.0), (60, 120, -0.5), (120, 200, 2.0)]:
        truth[lo:hi] = v
    truth = jnp.asarray(truth)
    b = truth + noise * jnp.asarray(rng.standard_normal(n))
    A_op = DiffOp(n)  # (Dx)_i = x_i - x_{i+1}, last row identity (linop.py)
    D = A_op.dense(b.dtype)

    cfg = ADMMConfig(rho=1.0, maxiters=2000, abstol=1e-10, reltol=1e-10,
                     quiet=True)
    Ginv = jnp.linalg.inv(jnp.eye(n, dtype=b.dtype) + cfg.rho * (D.T @ D))
    # Constraint Dx - z = 0: A is the difference operator, c = 0.
    solve = make_implicit_solver(tv_prox_f, tv_prox_g, cfg,
                                 A=A_op, nA=n, nB=n)

    @jax.jit
    def mse_and_grad(loglam):
        def mse(ll):
            x, _, _ = solve({"D": D, "b": b, "Ginv": Ginv, "loglam": ll})
            return jnp.mean((x - truth) ** 2)
        return jax.value_and_grad(mse)(loglam)

    loglam = jnp.asarray(float(np.log(0.01)))  # deliberately poor start
    # Adam on the hypergradient (inlined: the one scalar parameter does
    # not justify an optimizer-library dependency).
    b1, b2, eps = 0.9, 0.999, 1e-8
    mt = vt = jnp.zeros_like(loglam)
    history = []
    for k in range(steps):
        val, g = mse_and_grad(loglam)
        history.append((float(jnp.exp(loglam)), float(val)))
        if not quiet:
            print(f"step {k:2d}: lam = {float(jnp.exp(loglam)):.4f}  "
                  f"MSE = {float(val):.5f}  dMSE/dloglam = {float(g):+.5f}")
        mt = b1 * mt + (1 - b1) * g
        vt = b2 * vt + (1 - b2) * g * g
        mhat = mt / (1 - b1 ** (k + 1))
        vhat = vt / (1 - b2 ** (k + 1))
        loglam = loglam - lr * mhat / (jnp.sqrt(vhat) + eps)

    final_lam, final_mse = history[-1]
    noisy_mse = float(jnp.mean((b - truth) ** 2))
    if not quiet:
        print(f"\nlearned lam = {final_lam:.4f}: MSE {final_mse:.5f} "
              f"(noisy input MSE {noisy_mse:.5f}, "
              f"start MSE {history[0][1]:.5f})")
    return history


def consensus_hypergradient(m=512, n=24, steps=12, lr=0.4, seed=0,
                            quiet=False):
    """Hyperparameter learning over SHARDED data (round 3): the lasso
    strength ``lam`` of a CONSENSUS solve — training rows sharded over
    the device mesh — learned by descending a held-out MSE through the
    sharded fixed point (admm_tpu.make_implicit_consensus_solver).  The
    backward pass's consensus means compile to the same all-reduce
    collectives as the forward solve, so the whole hypergradient loop
    runs on the mesh.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from admm_tpu import ADMMConfig, make_implicit_consensus_solver
    from admm_tpu.parallel.consensus import (_cached_lasso_setup,
                                             _lasso_global_prox,
                                             _lasso_local_prox)
    from admm_tpu.parallel.mesh import make_mesh, pad_rows, shard_rows

    rng = np.random.default_rng(seed)
    xtrue = rng.standard_normal(n) * (rng.random(n) < 0.4)
    D = rng.standard_normal((m, n))
    s = D @ xtrue + 0.1 * rng.standard_normal(m)
    Dval = rng.standard_normal((m // 4, n))
    sval = jnp.asarray(Dval @ xtrue + 0.1 * rng.standard_normal(m // 4))
    Dval = jnp.asarray(Dval)

    mesh = make_mesh()
    W = mesh.devices.size
    cfg = ADMMConfig(rho=1.0, maxiters=4000, abstol=1e-11, reltol=1e-11,
                     quiet=True)
    Dp, _ = pad_rows(D, W)
    sp, _ = pad_rows(s, W)
    spec = NamedSharding(mesh, P(mesh.axis_names[0]))
    Di = jax.device_put(jnp.asarray(shard_rows(Dp, W)), spec)
    si = jax.device_put(jnp.asarray(shard_rows(sp, W)), spec)
    Minv, Dtsi = _cached_lasso_setup(spec, float(cfg.rho))(Di, si)

    solve = make_implicit_consensus_solver(
        _lasso_local_prox, _lasso_global_prox, cfg, n, W)

    @jax.jit
    def loss_and_grad(loglam):
        def val_mse(ll):
            data = {"Minv": Minv, "Dtsi": Dtsi, "lam": jnp.exp(ll)}
            _, z, _ = solve(data)
            return jnp.mean((Dval @ z - sval) ** 2)
        return jax.value_and_grad(val_mse)(loglam)

    loglam = jnp.asarray(float(np.log(50.0)))  # deliberately over-shrunk
    history = []
    for k in range(steps):
        val, g = loss_and_grad(loglam)
        history.append((float(jnp.exp(loglam)), float(val)))
        if not quiet:
            print(f"step {k:2d}: lam = {float(jnp.exp(loglam)):8.4f}  "
                  f"val MSE = {float(val):.5f}  grad = {float(g):+.5f}")
        loglam = loglam - lr * jnp.sign(g) * jnp.minimum(jnp.abs(g) * 10, 1.0)

    if not quiet:
        print(f"\nlearned lam = {history[-1][0]:.4f}: "
              f"val MSE {history[-1][1]:.5f} (start {history[0][1]:.5f})")
    return history


if __name__ == "__main__":
    hypergradient_tuning()
    consensus_hypergradient()
