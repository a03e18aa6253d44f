"""Sparse inverse covariance selection (graphical lasso):

    min tr(S X) - logdet(X) + lambda ||Z||_1   s.t.   X - Z = 0

over symmetric positive-definite matrices X — the library's matrix-valued
iterate problem (exercises the engine's N-d state support,
reference admm.m:478-492).

Reference: solvers/covarianceselection.m (wrapper; S = cov(D) at :145,
matrix-valued zero initial state :164-166) and getProxOps.m case
'covarianceselection' (:669-750) with x-prox xminCovarianceSelection
(getProxOps.m:1487-1496).

x-update:  eigendecompose rho (Z - U) - S = Q diag(e) Q^T,
           X = Q diag((e + sqrt(e^2 + 4 rho)) / (2 rho)) Q^T
z-update:  soft_threshold(U + X, lambda / rho)   (matrix-elementwise)

TPU design: the per-iteration eigh batches under vmap and maps onto the
MXU for the two n-by-n reconstruction matmuls; everything else is VPU
elementwise work fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ADMMConfig
from ..engine import Hooks, admm
from ..ops.prox import covsel_eig_prox, soft_threshold
from ..results import ADMMResults
from . import register
from ._common import bind_data, merge_config, timed_solver


def _prox_f(X, Z, U, rho, d):
    return covsel_eig_prox(rho * (Z - U) - d["S"], rho)


def _prox_g(X, Z, U, rho, d):
    return soft_threshold(U + X, d["lam"] / rho)


def _obj(X, Z, d):
    sign, logdet = jnp.linalg.slogdet(X)
    return jnp.trace(d["S"] @ X) - logdet + d["lam"] * jnp.sum(jnp.abs(Z))


def make_prox_ops(S, lam, config: ADMMConfig = ADMMConfig()):
    """Build (prox_f, prox_g, obj, data) from the empirical covariance S
    (getProxOps.m:669-750)."""
    S = jnp.asarray(S)
    data = {"S": S, "lam": jnp.asarray(lam, S.dtype)}
    return _prox_f, _prox_g, _obj, data


@register("covarianceselection")
def _registry_entry(S, lam, config=ADMMConfig(), **_):
    pf, pg, obj, data = make_prox_ops(S, lam, config)
    return bind_data(pf, pg, obj, data)


def empirical_covariance(D):
    """cov(D) with rows = samples, matching MATLAB's cov
    (covarianceselection.m:145): unbiased, mean-removed."""
    D = jnp.asarray(D)
    mu = jnp.mean(D, axis=0, keepdims=True)
    Dc = D - mu
    return (Dc.T @ Dc) / (D.shape[0] - 1)


@timed_solver
def covarianceselection(D=None, lam=None, config: ADMMConfig = ADMMConfig(), **overrides) -> ADMMResults:
    """Solve covariance selection (reference solvers/covarianceselection.m:80).

    ``D`` holds samples in rows; the empirical covariance is formed here
    (covarianceselection.m:145).  Iterates are n-by-n matrices with zero
    initial state (covarianceselection.m:164-166).
    """
    if D is None:
        # Zero-arg demo mode (reference solvers, e.g. lasso.m:122-129).
        from ..testers.problems import covarianceselectiontest

        res, _test = covarianceselectiontest(quiet=False)
        return res
    config = merge_config(config, overrides)
    D = jnp.asarray(D)
    S = empirical_covariance(D)
    n = S.shape[0]
    prox_f, prox_g, obj, data = make_prox_ops(S, lam, config)
    zero = jnp.zeros((n, n), dtype=S.dtype)
    return admm(
        prox_f, prox_g, config,
        A=1.0, B=-1.0, c=0.0,
        shape_x=(n, n), shape_z=(n, n),
        x0=zero, z0=zero, u0=zero,
        hooks=Hooks(obj=obj), dtype=S.dtype, data=data,
    )
