"""Quadratic program in two constraint forms (auto-detected like the
reference, solvers/quadraticprogram.m:259-364):

standard:   min 1/2 x^T P x + q^T x + r   s.t.  D x = s,  x >= 0
bounded:    min 1/2 x^T P x + q^T x + r   s.t.  lb <= x <= ub

Reference: solvers/quadraticprogram.m (wrapper; rho-keyed factor caches at
:188-219) and getProxOps.m case 'quadraticprogram' (:545-666) with proxes
xminQPStandard (getProxOps.m:1397-1412), xminQPBounded (:1441-1456) and
zminQPBounded (:1470-1474).

standard x-update:  KKT solve [P + rho I, D^T; D, 0][x;y] =
                    [rho (z - u) - q; s], keep x
standard z-update:  max(x + u, 0)
bounded  x-update:  (P + rho I)^{-1} (rho (z - u) - q)
bounded  z-update:  clip(x + u, lb, ub)   (user altproxg overrides,
                    getProxOps.m case :545-666)

TPU design: both re-factorization paths (the reference re-chol's whenever
rho changes, getProxOps.m:1400-1405, 1444-1453) are replaced by a one-time
eigendecomposition of P; per-iteration work is MXU matmuls valid for any
runtime rho.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..config import ADMMConfig
from ..engine import Hooks, admm
from ..ops.prox import project_box, project_nonneg
from ..ops.solve import SymShiftSolver, kkt_eq_solver
from ..results import ADMMResults
from . import register
from ._common import merge_config, timed_solver


def make_prox_ops_standard(P, q, D, s, config: ADMMConfig = ADMMConfig()):
    """Standard (equality + nonnegativity) form (getProxOps.m:1397-1412)."""
    P = jnp.asarray(P)
    q = jnp.asarray(q)
    D = jnp.asarray(D)
    s = jnp.asarray(s)
    kkt = kkt_eq_solver.from_matrices(D, P=P)

    def prox_f(x, z, u, rho):
        return kkt.solve(rho * (z - u) - q, s, rho)

    def prox_g(x, z, u, rho):
        return project_nonneg(x + u)

    return prox_f, prox_g


def make_prox_ops_bounded(
    P, q, lb, ub, config: ADMMConfig = ADMMConfig(),
    altproxg: Optional[Callable] = None,
):
    """Bounded (box-constrained) form (getProxOps.m:1441-1474)."""
    P = jnp.asarray(P)
    q = jnp.asarray(q)
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)

    if config.adaptive:
        sol = SymShiftSolver.from_matrix(P)

        def prox_f(x, z, u, rho):
            return sol.solve(rho * (z - u) - q, rho)

    else:
        Minv = SymShiftSolver.from_matrix(P).materialize_inverse(config.rho)

        def prox_f(x, z, u, rho):
            return Minv @ (rho * (z - u) - q)

    if altproxg is not None:
        prox_g = altproxg
    else:

        def prox_g(x, z, u, rho):
            return project_box(x + u, lb, ub)

    return prox_f, prox_g


@register("quadraticprogram")
def _registry_entry(P, q, D=None, s=None, lb=None, ub=None, config=ADMMConfig(), **_):
    if D is not None:
        return make_prox_ops_standard(P, q, D, s, config)
    return make_prox_ops_bounded(P, q, lb, ub, config)


def _qp_obj(P, q, r):
    def obj(x, z):
        return 0.5 * jnp.dot(x, P @ x) + jnp.dot(q, x) + r

    return obj


@timed_solver
def quadraticprogram(
    P, q, r, cons1, cons2, config: ADMMConfig = ADMMConfig(), **overrides
) -> ADMMResults:
    """Solve a QP (reference solvers/quadraticprogram.m:99).

    Constraint-form auto-detection mirrors quadraticprogram.m:259-364:
    ``(cons1, cons2) = (D, s)`` with 2-D D selects the standard form;
    two vectors of length n select the bounded form (bounds are
    normalized so lb <= ub elementwise, quadraticprogram.m:340-350).
    """
    config = merge_config(config, overrides)
    P = jnp.asarray(P)
    q = jnp.asarray(q)
    n = P.shape[0]
    c1 = jnp.asarray(cons1)

    if c1.ndim == 2:
        D, s = c1, jnp.asarray(cons2)
        prox_f, prox_g = make_prox_ops_standard(P, q, D, s, config)
    else:
        l, u_ = c1, jnp.asarray(cons2)
        lb, ub = jnp.minimum(l, u_), jnp.maximum(l, u_)
        prox_f, prox_g = make_prox_ops_bounded(P, q, lb, ub, config)

    return admm(
        prox_f, prox_g, config,
        A=1.0, B=-1.0, c=0.0, m=n, nA=n, nB=n,
        hooks=Hooks(obj=_qp_obj(P, q, r)), dtype=P.dtype,
    )
