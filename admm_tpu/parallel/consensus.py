"""Consensus (global-variable) ADMM over a device mesh.

The reference's parallel LASSO (getProxOps.m:367-442 setup;
xminParallelLASSO :1217-1260; zminParallelLASSO :1272-1299; altuLASSO
:1312-1326; lassonorms :1335-1343) shards data rows into N slices, gives
each worker a local x_i/u_i, and keeps a single global z:

    x_i <- local_prox(z - u_i)                                  [local]
    xbar = mean_i x_i,  ubar = mean_i u_i                       [all-reduce]
    z    <- global_prox(xbar + ubar)                            [replicated]
    u_i  <- u_i + x_i - z                                       [local]

with consensus residuals (stored *squared*, exactly as the reference's
lassonorms feeds them to the engine via specialnorms, admm.m:612-616):

    pnorm = sum_i ||x_i - xbar||^2
    dnorm = N rho^2 ||xbar - xbar_prev||^2

and Boyd errors computed from the consensus aggregates (the reference's
engine sees x = xbar, u = ubar via altu; admm.m:639-658).

This module exposes the pattern as a GENERIC engine — ``consensus_admm``
takes pluggable per-shard and global proximal operators (module-level
functions over a data pytree, the same caching contract as the core
engine) — plus the LASSO instantiation matching the reference.

TPU design: the reference pays a client->worker broadcast + gather per
prox per iteration (parfor); here the ENTIRE solve is one jitted program
over sharded state — per-shard solves are local matmuls on each device,
and the averages are psum/pmean collectives on ICI.  The per-iteration
collective payload is 2n floats (xbar, ubar) + 2 scalars, independent of
the data size: weak scaling in the number of rows is essentially free.

Implemented with sharding annotations (GSPMD) rather than shard_map: the
stacked per-shard arrays carry a NamedSharding over the mesh axis, means
over the shard axis compile to all-reduces, and the same program runs on
1..N devices (SURVEY.md section 7 "Distributed layer").
"""

from __future__ import annotations

import functools
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ADMMConfig
from ..ops.prox import soft_threshold
from ..results import ADMMResults
from .mesh import make_mesh, pad_rows, shard_rows


@functools.lru_cache(maxsize=64)
def _cached_consensus_runner(local_prox, global_prox, config: ADMMConfig,
                             W: int, n: int):
    """Cross-call compile cache: repeat consensus solves of the same
    (proxes, config, shard count, width) family reuse the compiled
    program."""
    N = int(config.maxiters)

    def run(data):
        leaves = jax.tree_util.tree_leaves(data)
        rdtype = leaves[0].dtype if leaves else jnp.float32
        rho = jnp.asarray(config.rho, rdtype)
        zeros_hist = jnp.full((N,), jnp.nan, rdtype)

        xi0 = jnp.zeros((W, n), rdtype)
        ui0 = jnp.zeros((W, n), rdtype)
        z0 = jnp.zeros((n,), rdtype)

        carry0 = (
            jnp.asarray(0, jnp.int32),
            xi0, z0, ui0,
            jnp.zeros((n,), rdtype),  # xbar_prev
            rho,
            jnp.asarray(False),
            (zeros_hist, zeros_hist, zeros_hist, zeros_hist),
        )

        def cond(c):
            return jnp.logical_and(c[0] < N, jnp.logical_not(c[6]))

        def body(c):
            k, xi, z, ui, xbar_prev, rho, done, hist = c

            # Local x-solves (xminParallelLASSO, getProxOps.m:1217-1260):
            # batched (sharded) per-device work.
            xi = local_prox(z, ui, rho, data)

            # Consensus aggregates: mean over the shard axis -> all-reduce.
            xbar = jnp.mean(xi, axis=0)
            ubar = jnp.mean(ui, axis=0)

            # Global z (zminParallelLASSO, getProxOps.m:1290-1293).
            z = global_prox(xbar, ubar, rho, W, data)

            # Immediate per-slice dual update (getProxOps.m:1296-1298).
            ui = ui + (xi - z[None, :])

            # Consensus residuals, squared (lassonorms,
            # getProxOps.m:1335-1343).
            pnorm = jnp.sum((xi - xbar[None, :]) ** 2)
            dnorm = W * rho**2 * jnp.sum((xbar - xbar_prev) ** 2)

            # Boyd errors on the aggregates (engine sees x=xbar, u=ubar
            # through altu; admm.m:639-658 with A=1, B=-1, c=0).
            sqn = jnp.sqrt(jnp.asarray(float(n), rdtype))
            perr = sqn * config.abstol + config.reltol * jnp.maximum(
                jnp.linalg.norm(xbar), jnp.linalg.norm(z)
            )
            derr = sqn * config.abstol + config.reltol * rho * jnp.linalg.norm(ubar)

            dual_ok = jnp.asarray(True) if config.nodualerror else (dnorm < derr)
            stop = (pnorm < perr) & dual_ok
            if config.domaxiters:
                stop = jnp.asarray(False)
            if config.nanguard:
                stop = stop | jnp.logical_not(jnp.isfinite(pnorm))

            if config.rbadaptive:
                # Residual balancing on the consensus residuals with the
                # scaled-dual rescale (ADMMConfig.rbadaptive; the
                # adaptive-consensus-ADMM idea of Xu et al. 2017).
                # pnorm/dnorm are stored SQUARED (reference lassonorms
                # parity); the balancing rule compares unsquared norms so
                # rbmu means the same imbalance ratio as in the engine.
                pn_lin = jnp.sqrt(pnorm)
                dn_lin = jnp.sqrt(dnorm)
                grow = pn_lin > config.rbmu * dn_lin
                shrink = dn_lin > config.rbmu * pn_lin
                factor = jnp.where(grow, config.rbtau,
                                   jnp.where(shrink, 1.0 / config.rbtau, 1.0))
                factor = jnp.where(stop, 1.0, factor).astype(rho.dtype)
                rho = rho * factor
                ui = ui / factor

            hp, hd, hpe, hde = hist
            hist = (
                hp.at[k].set(pnorm), hd.at[k].set(dnorm),
                hpe.at[k].set(perr), hde.at[k].set(derr),
            )
            return (k + 1, xi, z, ui, xbar, rho, stop, hist)

        k, xi, z, ui, xbar, rho_f, done, hist = lax.while_loop(cond, body, carry0)
        ubar = jnp.mean(ui, axis=0)
        return {
            "steps": k,
            "xopt": xbar,        # the reference returns xbar as x (:1260)
            "zopt": z,
            "uopt": ubar,
            "xi": xi,
            "ui": ui,
            "rho_final": rho_f,
            "diverged": jnp.asarray(False),
            "hist": {"pnorm": hist[0], "dnorm": hist[1],
                     "perr": hist[2], "derr": hist[3]},
        }

    return jax.jit(run)


def consensus_admm(
    local_prox: Callable,
    global_prox: Callable,
    data,
    n: int,
    config: ADMMConfig = ADMMConfig(),
    *,
    mesh: Optional[Mesh] = None,
    nshards: Optional[int] = None,
) -> ADMMResults:
    """Generic consensus ADMM.

    ``local_prox(z, ui, rho, data) -> xi`` computes ALL per-shard local
    solves at once on stacked (W, n) arrays whose leading axis is sharded;
    ``global_prox(xbar, ubar, rho, W, data) -> z`` is the replicated
    global update.  Both must be module-level functions (caching
    contract).  ``data`` is a pytree of operands; leaves with a leading
    shard axis should already be device_put with the shard sharding.
    """
    if config.stopcond != "standard":
        raise NotImplementedError(
            "consensus_admm supports stopcond='standard' only (the "
            "reference's consensus path); use the core engine for H-norm "
            "stopping"
        )
    if config.adaptive:
        raise NotImplementedError(
            "the reference's experimental adaptive mode is not wired into "
            "the consensus loop; use rbadaptive"
        )
    if mesh is None:
        mesh = make_mesh()
    W = nshards if nshards is not None else mesh.devices.size

    runner = _cached_consensus_runner(local_prox, global_prox, config, W, n)
    data = jax.block_until_ready(data)
    t0 = time.perf_counter()  # loop-only wall clock
    out = jax.block_until_ready(runner(data))

    res = ADMMResults.from_raw(
        {k: v for k, v in out.items() if k not in ("xi", "ui")}, config
    )
    res.runtime = time.perf_counter() - t0
    res.extra["xi"] = out["xi"]
    res.extra["ui"] = out["ui"]
    res.extra["nshards"] = W
    res.extra["mesh"] = mesh
    return res


# ---- LASSO instantiation (the reference's consensus problem) -------------


def _lasso_local_prox(z, ui, rho, d):
    rhs = d["Dtsi"] + rho * (z[None, :] - ui)
    return jnp.einsum("wij,wj->wi", d["Minv"], rhs)


def _lasso_local_prox_dynamic(z, ui, rho, d):
    # rho-parameterized per-shard solve via batched eigh of D_i^T D_i
    # (valid for any runtime rho — the rbadaptive path).
    rhs = d["Dtsi"] + rho * (z[None, :] - ui)
    y = jnp.einsum("wji,wj->wi", d["V"], rhs)
    y = y / (d["w"] + rho)
    return jnp.einsum("wij,wj->wi", d["V"], y)


def _lasso_global_prox(xbar, ubar, rho, W, d):
    # soft-threshold at lambda/(rho N) (zminParallelLASSO :1290-1293)
    return soft_threshold(xbar + ubar, d["lam"] / (rho * W))


def consensus_lasso(
    D,
    s,
    lam,
    config: ADMMConfig = ADMMConfig(),
    *,
    mesh: Optional[Mesh] = None,
    nshards: Optional[int] = None,
) -> ADMMResults:
    """Solve LASSO by consensus ADMM with data rows sharded over a mesh.

    Mirrors ``lasso(..., options.parallel)`` + the consensus closures
    (solvers/lasso.m:196-224, getProxOps.m:367-442).  ``nshards`` defaults
    to the mesh size (the reference defaults slices to the worker count,
    errorcheck.m:240-265).
    """
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    W = nshards if nshards is not None else mesh.devices.size
    if W != mesh.devices.size:
        # Shard count must equal the mesh extent (static shapes); build a
        # sub-mesh over the first W devices.
        mesh = make_mesh(W, axis)

    D = np.asarray(D)
    s = np.asarray(s)
    m, n = D.shape
    Dp, _ = pad_rows(D, W)       # zero rows: exact no-ops for D^T D, D^T s
    sp, _ = pad_rows(s, W)
    Di = shard_rows(Dp, W)       # (W, m/W, n)
    si = shard_rows(sp, W)       # (W, m/W)

    shard_spec = NamedSharding(mesh, P(axis))
    Di_dev = jax.device_put(jnp.asarray(Di), shard_spec)
    si_dev = jax.device_put(jnp.asarray(si), shard_spec)

    # Per-shard setup, batched + sharded: Gram, D^T s, and either the
    # rho-folded inverse (static rho; the reference's per-slice Cholesky
    # caches, getProxOps.m:404-442) or a batched eigh (dynamic rho).
    if config.rbadaptive:

        @partial(jax.jit, out_shardings=(shard_spec, shard_spec, shard_spec))
        def setup_dyn(Di, si):
            G = jnp.einsum("wij,wik->wjk", Di, Di)
            G = 0.5 * (G + jnp.swapaxes(G, -1, -2))
            w, V = jnp.linalg.eigh(G)
            Dtsi = jnp.einsum("wij,wi->wj", Di, si)
            return w, V, Dtsi

        w, V, Dtsi = setup_dyn(Di_dev, si_dev)
        data = {"w": w, "V": V, "Dtsi": Dtsi, "lam": jnp.asarray(lam, Dtsi.dtype)}
        return consensus_admm(
            _lasso_local_prox_dynamic, _lasso_global_prox, data, n, config,
            mesh=mesh, nshards=W,
        )

    @partial(jax.jit, out_shardings=(shard_spec, shard_spec))
    def setup(Di, si):
        G = jnp.einsum("wij,wik->wjk", Di, Di)
        G = G + config.rho * jnp.eye(n, dtype=Di.dtype)[None]
        Minv = jnp.linalg.inv(G)
        Dtsi = jnp.einsum("wij,wi->wj", Di, si)
        return Minv, Dtsi

    Minv, Dtsi = setup(Di_dev, si_dev)
    data = {"Minv": Minv, "Dtsi": Dtsi, "lam": jnp.asarray(lam, Dtsi.dtype)}

    return consensus_admm(
        _lasso_local_prox, _lasso_global_prox, data, n, config,
        mesh=mesh, nshards=W,
    )
