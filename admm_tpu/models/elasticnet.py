"""Elastic net: min 1/2 ||D x - s||^2 + lam (alpha ||z||_1 +
(1 - alpha)/2 ||z||^2)  s.t.  x - z = 0.

Beyond the reference (its shrinkage family is lasso/basis-pursuit/TV —
getProxOps.m:313-456 — with no combined l1+l2 penalty); standard ADMM
formulation per Boyd et al. §6.  The x-update is the library's shared
least-squares prox (lasso.make_ls_xprox: Gram / Woodbury, rho folded
analytically), so elastic net inherits every lasso perf path (fat-matrix
streams, static-rho GEMV).  The z-update composes shrinkage with a
uniform rescale:

    z = soft_threshold(x + u, lam*alpha/rho) / (1 + lam*(1-alpha)/rho)

— the closed-form prox of the elastic-net penalty, still one fused
elementwise pass.  ``alpha=1`` recovers lasso exactly; ``alpha=0`` is
ridge regression (closed-form testable).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ADMMConfig
from ..engine import Hooks, admm
from ..ops.prox import soft_threshold
from ..results import ADMMResults
from . import register
from ._common import bind_data, check_data_vector, merge_config, timed_solver
from .lasso import make_ls_xprox


def _prox_g(x, z, u, rho, d):
    v = x + u
    l1 = d["lam"] * d["alpha"]
    l2 = d["lam"] * (1.0 - d["alpha"])
    return soft_threshold(v, l1 / rho) / (1.0 + l2 / rho)


def _obj(x, z, d):
    fit = 0.5 * jnp.sum((d["D"] @ x - d["s"]) ** 2)
    pen = d["lam"] * (d["alpha"] * jnp.sum(jnp.abs(z))
                      + 0.5 * (1.0 - d["alpha"]) * jnp.sum(z**2))
    return fit + pen


def make_prox_ops(D, s, lam, alpha=0.5, config: ADMMConfig = ADMMConfig(),
                  stream_dtype=None):
    """Build (prox_f, prox_g, obj, data) for the elastic net."""
    if not 0.0 <= float(alpha) <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    prox_f, data = make_ls_xprox(D, s, config, stream_dtype)
    dt = data["D"].dtype
    data["lam"] = jnp.asarray(lam, dt)
    data["alpha"] = jnp.asarray(alpha, dt)
    return prox_f, _prox_g, _obj, data


@register("elasticnet")
def _registry_entry(D, s, lam, alpha=0.5, config=ADMMConfig(), **_):
    pf, pg, obj, data = make_prox_ops(D, s, lam, alpha, config)
    return bind_data(pf, pg, obj, data)


@timed_solver
def elasticnet(D, s, lam, alpha=0.5, config: ADMMConfig = ADMMConfig(), *,
               stream_dtype=None, x0=None, z0=None, u0=None,
               **overrides) -> ADMMResults:
    """Solve the elastic net.  ``alpha`` blends l1 (alpha=1, pure lasso)
    and squared-l2 (alpha=0, ridge) regularization at total strength
    ``lam``.  Constraint wiring x - z = 0 as in lasso (lasso.m:226-239).
    """
    check_data_vector(D, s)
    config = merge_config(config, overrides, body="gemv")
    D = jnp.asarray(D)
    n = D.shape[1]
    prox_f, prox_g, obj, data = make_prox_ops(D, s, lam, alpha, config,
                                              stream_dtype)
    return admm(
        prox_f, prox_g, config,
        A=1.0, B=-1.0, c=0.0, m=n, nA=n, nB=n,
        x0=x0, z0=z0, u0=u0,
        hooks=Hooks(obj=obj), dtype=D.dtype, data=data,
    )
