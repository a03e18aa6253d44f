"""The model problem: min 1/2||Px - r||^2 + 1/2||Qx - s||^2 via ADMM
splitting f(x) = 1/2||Px - r||^2, g(z) = 1/2||Qz - s||^2, x - z = 0.

Reference: solvers/model.m (wrapper, precompute at model.m:119-138) and
getProxOps.m case 'model' (:55-95) with proxes xminModel (:952-975) /
zminModel (:989-1012):

    x <- (P^T P + rho I)^{-1} (P^T r + rho (z - u))
    z <- (Q^T Q + rho I)^{-1} (Q^T s + rho (x + u))

TPU design: the reference's rho-keyed diagonal-perturbation cache
(getProxOps.m:968-971) becomes either a materialized inverse (static rho:
one MXU GEMV per prox) or a cached eigendecomposition (adaptive rho; see
ops/solve.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import ADMMConfig
from ..engine import Hooks, admm
from ..ops.solve import SymShiftSolver
from ..results import ADMMResults
from . import register
from ._common import merge_config, timed_solver


def make_prox_ops(P, Q, r, s, config: ADMMConfig):
    """Build (prox_f, prox_g, obj) closures for the model problem."""
    P = jnp.asarray(P)
    Q = jnp.asarray(Q)
    r = jnp.asarray(r)
    s = jnp.asarray(s)

    PtP = P.T @ P
    Ptr = P.T @ r
    QtQ = Q.T @ Q
    Qts = Q.T @ s

    if config.adaptive:
        solP = SymShiftSolver.from_matrix(PtP)
        solQ = SymShiftSolver.from_matrix(QtQ)

        def prox_f(x, z, u, rho):
            return solP.solve(Ptr + rho * (z - u), rho)

        def prox_g(x, z, u, rho):
            return solQ.solve(Qts + rho * (x + u), rho)

    else:
        rho0 = config.rho
        PtPinv = SymShiftSolver.from_matrix(PtP).materialize_inverse(rho0)
        QtQinv = SymShiftSolver.from_matrix(QtQ).materialize_inverse(rho0)

        def prox_f(x, z, u, rho):
            return PtPinv @ (Ptr + rho * (z - u))

        def prox_g(x, z, u, rho):
            return QtQinv @ (Qts + rho * (x + u))

    def obj(x, z):
        return 0.5 * jnp.sum((P @ x - r) ** 2) + 0.5 * jnp.sum((Q @ z - s) ** 2)

    return prox_f, prox_g, obj


@register("model")
def _registry_entry(P, Q, r, s, config=ADMMConfig(), **_):
    return make_prox_ops(P, Q, r, s, config)


@timed_solver
def model(P, Q, r, s, config: ADMMConfig = ADMMConfig(), **overrides) -> ADMMResults:
    """Solve the model problem (reference solvers/model.m:47).

    Constraint wiring matches model.m:129-134: A = 1, B = -1, c = 0 in R^n.
    """
    config = merge_config(config, overrides)
    P = jnp.asarray(P)
    n = P.shape[1]
    prox_f, prox_g, obj = make_prox_ops(P, Q, r, s, config)
    return admm(
        prox_f,
        prox_g,
        config,
        A=1.0,
        B=-1.0,
        c=0.0,
        m=n,
        nA=n,
        nB=n,
        hooks=Hooks(obj=obj),
        dtype=P.dtype,
    )
