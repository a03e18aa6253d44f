"""Robust PCA (principal component pursuit):

    min ||L||_* + lam ||S||_1   s.t.   L + S = M

— decompose a matrix into low-rank + sparse (Candes, Li, Ma, Wright
2011).  Beyond the reference (its shrinkage family has no spectral
penalty); the classic ADMM splitting maps directly onto the engine's
matrix-iterate support (admm.m:478-492, the covsel pattern) with
A = B = +1 and c = M:

    L-step:  SVT(M - S - U, 1/rho)       (singular value thresholding)
    S-step:  soft_threshold(M - L - U, lam/rho)
    U     += L + S - M

TPU design: the SVT is one jnp.linalg.svd per iteration — a 'heavy'
body (no unrolling; like the covsel eigh prox).  Everything else is
fused elementwise work.  lam defaults to the theory value
1/sqrt(max(m, n)) under which exact recovery holds for incoherent
low-rank + random sparse inputs — the oracle test plants exactly that.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ADMMConfig
from ..engine import Hooks, admm
from ..ops.prox import soft_threshold
from ..results import ADMMResults
from . import register
from ._common import bind_data, merge_config, timed_solver


def _prox_f(L, S, U, rho, d):
    # L-step: argmin ||L||_* + rho/2 ||L - (M - S - U)||_F^2 = SVT at 1/rho.
    V = d["M"] - S - U
    u_, s_, vt = jnp.linalg.svd(V, full_matrices=False)
    s_ = jnp.maximum(s_ - 1.0 / rho, 0.0)
    return (u_ * s_[None, :]) @ vt


def _prox_g(L, S, U, rho, d):
    # S-step: elementwise shrinkage toward M - L - U at lam/rho.
    return soft_threshold(d["M"] - L - U, d["lam"] / rho)


def _obj(L, S, d):
    return jnp.sum(jnp.linalg.svd(L, compute_uv=False)) + d["lam"] * jnp.sum(
        jnp.abs(S))


def make_prox_ops(M, lam=None, config: ADMMConfig = ADMMConfig()):
    """Build (prox_f, prox_g, obj, data) for robust PCA.

    ``lam`` defaults to 1/sqrt(max(M.shape)) (the exact-recovery theory
    value); it rides in ``data`` so re-solves across lam share the
    compiled runner."""
    M = jnp.asarray(M)
    if M.ndim != 2:
        raise ValueError(f"M must be a matrix, got shape {M.shape}")
    if lam is None:
        lam = 1.0 / float(max(M.shape)) ** 0.5
    data = {"M": M, "lam": jnp.asarray(lam, M.dtype)}
    return _prox_f, _prox_g, _obj, data


@register("rpca")
def _registry_entry(M, lam=None, config=ADMMConfig(), **_):
    pf, pg, obj, data = make_prox_ops(M, lam, config)
    return bind_data(pf, pg, obj, data)


@timed_solver
def rpca(M, lam=None, config: ADMMConfig = ADMMConfig(), *,
         x0=None, z0=None, u0=None, **overrides) -> ADMMResults:
    """Decompose ``M`` into low-rank ``xopt`` (= L) + sparse ``zopt``
    (= S) by principal component pursuit.

    Constraint wiring: A = 1, B = +1, c = M over matrix iterates.  The
    default stopping often fires on the primal residual ||L + S - M||;
    ``results.xopt + results.zopt`` reproduces M to that tolerance.
    """
    config = merge_config(config, overrides, body="heavy")
    M = jnp.asarray(M)
    prox_f, prox_g, obj, data = make_prox_ops(M, lam, config)
    return admm(
        prox_f, prox_g, config,
        A=1.0, B=1.0, c=M,
        shape_x=M.shape, shape_z=M.shape,
        x0=x0, z0=z0, u0=u0,
        hooks=Hooks(obj=obj), dtype=M.dtype, data=data,
    )
