"""Distributed unwrapped ADMM with transpose reduction.

The reference's clearest multi-node pattern (solvers/unwrappedadmm.m:96-141
+ zminParallelLinearSVM, getProxOps.m:1120-1143): rows of D are sliced
across workers; each iteration does

    d_i = D_i^T (z_i - u_i)        [local matvec]
    d   = sum_i d_i                [all-reduce]
    x   = W^{-1} d,  W = sum_i D_i^T D_i   [replicated solve]
    z_i = prox_g(D_i x + u_i, ...) [local]
    u_i = u_i + D_i x - z_i        [local]

TPU design: one jitted XLA program over row-sharded (W, m/W, ...) arrays;
the reduce-sum is a psum over ICI of an n-vector per iteration, and the
replicated solve is a single n-by-n GEMV against the precomputed W^{-1}
(the reference solves W \\ d every iteration, unwrappedadmm.m:139).

Stopping preserved from the unwrapped driver (unwrappedadmm.m:81-92):
stopcond='both' with nodualerror — primal Boyd test OR H-norm test.

Padding note: rows are zero-padded to equal shards.  Padded rows carry a
zero mask entry so prox/objective treat them as absent; their z/u start
at zero and stay zero-coupled (D_i x = 0 on zero rows).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ADMMConfig
from ..engine import _with_matmul_precision, unrolled_body
from ..ops.prox import hinge_prox, zero_one_prox
from ..results import ADMMResults
from .mesh import make_mesh, pad_rows, shard_rows


@jax.jit
def _gram_pinv(Di):
    """One-time gram reduction: W_g = sum_i D_i^T D_i
    (unwrappedadmm.m:96-123) — psum of per-shard MXU grams — then a
    replicated pseudo-inverse (pinv, matching the serial driver's
    pinv(D): rank-deficient or underdetermined D degrades gracefully).
    Module-level jit so repeat solves reuse the compiled setup."""
    with jax.default_matmul_precision("highest"):
        G = jnp.einsum("wij,wik->jk", Di, Di)
        return jnp.linalg.pinv(0.5 * (G + G.T))


def unwrapped_admm_sharded(
    prox_g_shard: Callable,
    D,
    config: ADMMConfig = ADMMConfig(),
    *,
    aux=None,
    obj_shard: Optional[Callable] = None,
    obj_global: Optional[Callable] = None,
    mesh: Optional[Mesh] = None,
    nshards: Optional[int] = None,
    seed: int = 0,
) -> ADMMResults:
    """Row-sharded unwrapped ADMM.

    ``prox_g_shard(Dx_i, z_i, u_i, rho, aux_i)`` maps per-shard arrays of
    shape (W, m/W) -> new z_i.  ``aux`` is a pytree of per-row arrays
    (shape (m, ...)) sharded alongside D (e.g. labels + pad mask).
    ``obj_shard(x, Dx_i, z_i, aux_i)`` returns a per-call scalar summed
    over shards; ``obj_global(x)`` adds the replicated term.
    """
    if (config.fast or config.relax != 1.0 or config.adaptive
            or config.rbadaptive):
        raise NotImplementedError(
            "unwrapped_admm_sharded implements the reference driver's plain "
            "iteration (unwrappedadmm.m:96-141); fast/relax/adaptive/"
            "rbadaptive are not wired into the sharded runner — use the "
            "serial unwrappedadmm for those variants"
        )
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    W = nshards if nshards is not None else mesh.devices.size
    if W < mesh.devices.size:
        mesh = make_mesh(W, axis)
    elif W % mesh.devices.size:
        # More shards than devices batches slices per device (see
        # consensus.py) — allowed when the stacked axis shards evenly.
        raise ValueError(
            f"nshards={W} must be a multiple of the mesh size "
            f"{mesh.devices.size}")

    D = np.asarray(D)
    m, n = D.shape
    Dp, n_pad = pad_rows(D, W)
    mp = Dp.shape[0]
    Di = shard_rows(Dp, W)  # (W, m/W, n)

    def _shard_aux(a):
        ap, _ = pad_rows(np.asarray(a), W)
        return shard_rows(ap, W)

    aux_i = jax.tree_util.tree_map(_shard_aux, aux) if aux is not None else ()

    shard_spec = NamedSharding(mesh, P(axis))
    Di_dev = jax.device_put(jnp.asarray(Di), shard_spec)
    aux_dev = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), shard_spec), aux_i
    )

    Winv = _gram_pinv(Di_dev)

    # Random warm start in the valid region, zeros on padding
    # (unwrappedadmm.m:89-91).
    kx, kz, ku = jax.random.split(jax.random.PRNGKey(seed), 3)
    dtype = Di.dtype
    x0 = jax.random.uniform(kx, (n,), dtype=dtype)
    mrow = np.zeros((mp,), dtype=dtype)
    mrow[:m] = 1.0
    mask = jax.device_put(jnp.asarray(shard_rows(mrow, W)), shard_spec)
    z0 = jax.random.uniform(kz, (mp,), dtype=dtype).reshape(W, mp // W)
    u0 = jax.random.uniform(ku, (mp,), dtype=dtype).reshape(W, mp // W)

    runner = _cached_unwrapped_runner(prox_g_shard, obj_shard, obj_global, config, m)
    jax.block_until_ready((Winv, x0, z0, u0, mask, aux_dev))
    t0 = time.perf_counter()  # loop-only wall clock (setup flushed above)
    out = jax.block_until_ready(runner(Di_dev, Winv, x0, z0, u0, mask, aux_dev))
    runtime = time.perf_counter() - t0
    res = ADMMResults.from_raw(out, config)
    res.runtime = runtime
    res.extra["nshards"] = W
    res.extra["mesh"] = mesh
    res.extra["n_pad"] = n_pad
    return res


@functools.lru_cache(maxsize=64)
def _cached_unwrapped_runner(prox_g_shard, obj_shard, obj_global,
                             config: ADMMConfig, m: int):
    """Cross-call compile cache keyed on (prox/objective functions, config,
    true row count) - the same caching contract as the core engine."""
    N = int(config.maxiters)
    rho0 = config.rho
    needs_h = config.needs_hnorm

    def run(Di, Winv, x0, z0, u0, mask, aux_i):
        rdtype = x0.dtype
        rho = jnp.asarray(rho0, rdtype)
        z0 = z0 * mask
        u0 = u0 * mask
        nan_hist = jnp.full((N,), jnp.nan, rdtype)
        M1 = float(m)  # true row count (padding excluded from the error bar)

        carry0 = (
            jnp.asarray(0, jnp.int32), x0, z0, u0,
            (z0, rho * u0) if needs_h else (),  # H-norm w-parts (admm.m:302-313)
            jnp.asarray(False),                 # done
            jnp.asarray(False),                 # diverged (nanguard)
            (nan_hist, nan_hist) + ((nan_hist,) if needs_h else ()),
        )

        def cond(c):
            return jnp.logical_and(c[0] < N, jnp.logical_not(c[5]))

        def step(c):
            k, x, zi, ui, wparts, done, diverged, hist = c
            i = k + 1

            # x-update: local matvec + all-reduce + replicated GEMV.
            di = jnp.einsum("wij,wi->j", Di, zi - ui)
            x = Winv @ di
            Dx = jnp.einsum("wij,j->wi", Di, x)

            # z-update: local prox (masked on padded rows).
            zi = prox_g_shard(Dx, zi, ui, rho, aux_i) * mask

            # u-update (admm.m:547-552 with A=D, B=-1, c=0).
            r = (Dx - zi) * mask
            ui = ui + r

            pnorm = jnp.sqrt(jnp.sum(r * r))
            perr = jnp.sqrt(M1) * config.abstol + config.reltol * jnp.maximum(
                jnp.sqrt(jnp.sum((Dx * mask) ** 2)), jnp.sqrt(jnp.sum(zi * zi))
            )

            stop = pnorm < perr
            wparts_new = ()
            if needs_h:
                # H-norm over w = [x; z; rho u], B = -1 (admm.m:302-313).
                wz, wu = wparts
                wz_new, wu_new = zi, rho * ui
                Hsq = (rho * jnp.sum((wz - wz_new) ** 2)
                       + rho * jnp.sum((wu - wu_new) ** 2))
                stop = stop | ((i > 2) & (Hsq <= config.hnormtol))
                wparts_new = (wz_new, wu_new)
            if config.domaxiters:
                stop = jnp.asarray(False)
            bad = jnp.asarray(False)
            if config.nanguard:
                bad = jnp.logical_not(jnp.isfinite(pnorm))

            if needs_h:
                hp, hpe, hh = hist
                hist = (hp.at[k].set(pnorm), hpe.at[k].set(perr),
                        hh.at[k].set(Hsq))
            else:
                hp, hpe = hist
                hist = (hp.at[k].set(pnorm), hpe.at[k].set(perr))
            return (k + 1, x, zi, ui, wparts_new, stop | bad,
                    diverged | bad, hist)

        body = unrolled_body(step, int(config.unroll), N,
                             lambda c: (c[0], c[5]))
        k, x, zi, ui, _, _, diverged, hist = lax.while_loop(cond, body, carry0)

        objopt = ()
        if obj_shard is not None or obj_global is not None:
            Dx = jnp.einsum("wij,j->wi", Di, x)
            objopt = jnp.asarray(0.0, rdtype)
            if obj_shard is not None:
                objopt = objopt + obj_shard(x, Dx, zi, aux_i)
            if obj_global is not None:
                objopt = objopt + obj_global(x)

        h = {"pnorm": hist[0], "perr": hist[1]}
        if needs_h:
            h["Hnormsq"] = hist[2]
        return {
            "steps": k, "xopt": x, "zopt": zi, "uopt": ui,
            "rho_final": jnp.asarray(rho0, rdtype),
            "diverged": diverged,
            "objopt": objopt,
            "hist": h,
        }

    return jax.jit(_with_matmul_precision(run, config.matmul_precision))


# Module-level SVM shard functions (caching contract: per-row C rides in
# aux so the compiled runner is shared across calls and C values; per-row
# C also gives per-sample weighting for free).
def _svm_prox_hinge(Dx, zi, ui, rho, aux_i):
    ell_i, mask_i, C_i = aux_i
    return hinge_prox(Dx + ui, ell_i, C_i, rho)


def _svm_prox_01(Dx, zi, ui, rho, aux_i):
    ell_i, mask_i, C_i = aux_i
    # Guard padded rows (C_i = 0 there) against 0-division in rho/C.
    C_safe = jnp.where(C_i > 0, C_i, 1.0)
    return zero_one_prox(Dx + ui, ell_i, C_safe, rho)


def _svm_obj_hinge(x, Dx, zi, aux_i):
    ell_i, mask_i, C_i = aux_i
    return jnp.sum(C_i * jnp.maximum(1.0 - ell_i * Dx, 0.0) * mask_i)


def _svm_obj_01(x, Dx, zi, aux_i):
    ell_i, mask_i, C_i = aux_i
    return jnp.sum(C_i * jnp.maximum(jnp.sign(1.0 - ell_i * Dx), 0.0) * mask_i)


def _svm_obj_global(x):
    return 0.5 * jnp.sum(x * x)


def linearsvm_sharded(
    D, ell, C, config: ADMMConfig = ADMMConfig(), *, loss: str = "hinge",
    mesh: Optional[Mesh] = None, nshards: Optional[int] = None, seed: int = 0,
) -> ADMMResults:
    """Distributed linear SVM: the reference's parallel path
    (linearsvm.m:169-206 -> unwrappedadmm parfor branch ->
    zminParallelLinearSVM, getProxOps.m:1120-1143)."""
    ell = np.asarray(ell, dtype=np.asarray(D).dtype)
    use_01 = str(loss).replace("-", "") in ("01", "zeroone")
    mask = np.ones_like(ell)
    Crow = np.full_like(ell, float(C))

    import dataclasses

    # stopping defaults preserved from the unwrapped driver
    cfg = dataclasses.replace(config, stopcond="both", nodualerror=True)
    return unwrapped_admm_sharded(
        _svm_prox_01 if use_01 else _svm_prox_hinge,
        D, cfg,
        aux=(ell, mask, Crow),
        obj_shard=_svm_obj_01 if use_01 else _svm_obj_hinge,
        obj_global=_svm_obj_global,
        mesh=mesh, nshards=nshards, seed=seed,
    )
