"""L1-regularized (sparse) logistic regression via ADMM:

    min  sum_i log(1 + exp(-ell_i d_i^T x)) + lam ||z||_1
    s.t. x - z = 0

The canonical consensus-ADMM application (Boyd et al. 2011, sec. 8.2
"Logistic regression") — BEYOND the reference library, which has no
logistic family; its nearest relatives are the SVM hinge solvers
(getProxOps.m:202-310).  Kept in the reference's L4 wrapper shape
(validate -> prox ops -> engine; e.g. solvers/lasso.m:77).

TPU design: the x-prox has no closed form — it minimizes the smooth,
rho-strongly-convex  f(x) + (rho/2)||x - (z - u)||^2  with a FIXED,
trace-time-static number of damped Newton steps inside the compiled
loop (a 'heavy' iteration body like covsel's eigh).  Each step builds
the Hessian  D^T diag(w) D + rho I  (one m x n GEMM pair on the MXU)
and solves it densely; a single objective-gated halving keeps the step
safe without data-dependent control flow.  The z-prox is the shared
soft threshold, so lam = 0 gives plain ridge-less logistic regression
regularized only through the splitting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ADMMConfig
from ..engine import Hooks, admm
from ..ops.prox import soft_threshold
from ..results import ADMMResults
from . import register
from ._common import bind_data, check_data_vector, merge_config, timed_solver

# Static inner Newton steps per x-prox evaluation.  The prox problem is
# rho-strongly convex with warm starts from the previous iterate, so a
# handful of damped steps reaches prox tolerance well below the ADMM
# iteration's own accuracy needs (oracle test: matches scipy's solver
# to 1e-5 relative objective).
_NEWTON_STEPS = 5


def _prox_objective(x, v, rho, d):
    t = d["ell"] * (d["D"] @ x)  # (m,) margins  y_i d_i^T x
    # log(1 + exp(-t)) computed stably as softplus(-t).
    return (jnp.sum(jnp.logaddexp(0.0, -t))
            + 0.5 * rho * jnp.sum((x - v) ** 2))


def _newton_xprox(x, v, rho, d):
    """Damped Newton for argmin_x sum softplus(-(Yx)_i) + rho/2 ||x-v||^2.

    The margins are ell_i * (D x) with ``D`` shared and ``ell`` a
    per-instance leaf — so logreg_batch maps only the (m,) labels and
    the whole one-vs-all batch shares one D (models/batch.py).  One
    objective-gated halving per step (select, not branch) keeps each
    update monotone without data-dependent control flow.
    """
    D, ell = d["D"], d["ell"]
    I = jnp.eye(D.shape[1], dtype=D.dtype)
    for _ in range(_NEWTON_STEPS):
        t = ell * (D @ x)
        sig = jax.nn.sigmoid(-t)           # = 1 - sigmoid(t)
        grad = -(D.T @ (ell * sig)) + rho * (x - v)
        w = sig * (1.0 - sig)              # logistic curvature weights
        H = (D * w[:, None]).T @ D + rho * I
        step = jnp.linalg.solve(H, grad)
        f0 = _prox_objective(x, v, rho, d)
        x1 = x - step
        x_half = x - 0.5 * step
        f1 = _prox_objective(x1, v, rho, d)
        # Take the full step when it descends, else the half step (which
        # descends whenever the quadratic model is sane; a second refusal
        # just leaves more work to later steps/iterations).
        x = jnp.where(f1 <= f0, x1, x_half)
    return x


def _prox_f(x, z, u, rho, d):
    return _newton_xprox(x, z - u, rho, d)


def _prox_g(x, z, u, rho, d):
    return soft_threshold(u + x, d["lam"] / rho)


def _obj(x, z, d):
    t = d["ell"] * (d["D"] @ x)
    return jnp.sum(jnp.logaddexp(0.0, -t)) + d["lam"] * jnp.sum(jnp.abs(z))


def make_prox_ops(D, ell, lam, config: ADMMConfig = ADMMConfig()):
    """Build (prox_f, prox_g, obj, data): data carries D, the +/-1
    labels, and the l1 weight (labels separate so batched one-vs-all
    lanes share one D)."""
    D = jnp.asarray(D)
    ell = jnp.asarray(ell, D.dtype)
    data = {"D": D, "ell": ell, "lam": jnp.asarray(lam, D.dtype)}
    return _prox_f, _prox_g, _obj, data


@register("logreg")
def _registry_entry(D, ell, lam, config=ADMMConfig(), **_):
    return bind_data(*make_prox_ops(D, ell, lam, config))


@timed_solver
def logreg(D=None, ell=None, lam=0.1, config: ADMMConfig = ADMMConfig(), *,
           x0=None, z0=None, u0=None, **overrides) -> ADMMResults:
    """Sparse logistic regression.  ``D`` (m, n) data rows, ``ell`` (m,)
    labels in {-1, +1}, ``lam`` the l1 weight (0 disables shrinkage).

    The returned ``zopt`` is the sparse iterate; ``xopt`` the smooth one
    (they coincide at convergence).
    """
    if D is None:
        from ..testers.problems import logregtest

        res, _test = logregtest(quiet=False)
        return res

    config = merge_config(config, overrides, body="heavy")
    check_data_vector(D, ell, "D", "ell")
    import numpy as np

    ellv = np.asarray(ell)
    if not np.all(np.isin(ellv, (-1.0, 1.0))):
        raise ValueError("ell must be +/-1 labels")
    if not float(lam) >= 0:
        raise ValueError(f"lam must be nonnegative, got {lam}")

    prox_f, prox_g, obj, data = make_prox_ops(D, ell, lam, config)
    n = data["D"].shape[1]
    return admm(
        prox_f, prox_g, config,
        A=1.0, B=-1.0, c=0.0, m=n, nA=n, nB=n,
        x0=x0, z0=z0, u0=u0,
        hooks=Hooks(obj=obj), dtype=data["D"].dtype, data=data,
    )
