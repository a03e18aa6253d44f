"""Decompose the LP-affine iteration's ~18 us/iter body tail (engine
34 us vs bare-GEMV floor 15.6 us at n=1024, K=16): add engine components
to a bare fori_loop one at a time and time each.

Components per iteration (engine alg 0, A=1, B=-1, c=0, LP):
  a) x-update GEMV: x = K1 @ cat(rho*(z-u)-b_neg, s) + vector ops
  b) z-prox (pos projection) + dual update
  c) Boyd norms: pnorm, ||x||, ||z||, derr (4 reductions)
  d) history writes: 4 .at[k].set scalars
  e) done-masking selects (unroll machinery)
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
n = 1024
K1 = jnp.asarray(rng.standard_normal((n, 2 * n)).astype(np.float32))
b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
s = jnp.asarray(rng.standard_normal(n).astype(np.float32))
ITERS = 2000
K = 16
NB = ITERS  # history length


def timeit(name, fn, *args):
    np.asarray(jax.block_until_ready(fn(*args)))[()] if False else None
    out = jax.block_until_ready(fn(*args))
    # force host materialization of one leaf (relay compile guard)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {ITERS / best:9.0f} iter/s "
          f"{best / ITERS * 1e6:7.2f} us/iter", flush=True)


def make_loop(with_zu=False, with_norms=False, with_hist=False,
              with_mask=False, packed_norms=False, chunk_hist=False):
    @jax.jit
    def run(z0, u0):
        hist = {k: jnp.full((NB,), jnp.nan, jnp.float32)
                for k in ("pnorm", "dnorm", "perr", "derr")} if with_hist else ()

        def sub(c, j):
            z, u, hist = c
            rhs = jnp.concatenate([1.0 * (z - u) - b, s])
            x = K1 @ rhs
            if with_zu:
                znew = jnp.maximum(x + u, 0.0)
                unew = u + x - znew
            else:
                znew, unew = x / jnp.float32(1.0001), u
            pn = dn = pe = de = None
            if with_norms:
                if packed_norms:
                    stacked = jnp.stack([x - znew, x, znew, unew])
                    sq = jnp.sum(stacked * stacked, axis=1)
                    pn = jnp.sqrt(sq[0])
                    pe = jnp.float32(1e-5) * 32 + 1e-3 * jnp.sqrt(
                        jnp.maximum(sq[1], sq[2]))
                    dn = jnp.sqrt(sq[3])
                    de = jnp.float32(1e-5) * 32 + 1e-3 * jnp.sqrt(sq[3])
                else:
                    pn = jnp.linalg.norm(x - znew)
                    pe = jnp.float32(1e-5) * 32 + 1e-3 * jnp.maximum(
                        jnp.linalg.norm(x), jnp.linalg.norm(znew))
                    dn = jnp.linalg.norm(unew)
                    de = jnp.float32(1e-5) * 32 + 1e-3 * jnp.linalg.norm(unew)
            if with_mask:
                keep = j < ITERS  # scalar bool, mimics done-masking selects
                znew = jnp.where(keep, znew, z)
                unew = jnp.where(keep, unew, u)
            h = hist
            if with_hist:
                h = dict(hist)
                h["pnorm"] = h["pnorm"].at[j].set(pn if pn is not None else 0.0)
                h["dnorm"] = h["dnorm"].at[j].set(dn if dn is not None else 0.0)
                h["perr"] = h["perr"].at[j].set(pe if pe is not None else 0.0)
                h["derr"] = h["derr"].at[j].set(de if de is not None else 0.0)
            return (znew, unew, h), (pn, dn, pe, de)

        def body(i, c):
            if chunk_hist and with_hist:
                z, u, hist = c
                vals = []
                cc = (z, u, ())
                for t in range(K):
                    cc, v = sub((cc[0], cc[1], ()), i * K + t)
                    vals.append(v)
                h = dict(hist)
                for idx, kname in enumerate(("pnorm", "dnorm", "perr", "derr")):
                    chunk = jnp.stack([v[idx] for v in vals])
                    h[kname] = jax.lax.dynamic_update_slice(
                        h[kname], chunk, (i * K,))
                return (cc[0], cc[1], h)
            for t in range(K):
                c, _ = sub(c, i * K + t)
            return c

        return jax.lax.fori_loop(0, ITERS // K, body, (z0, u0, hist))

    return run


z0 = jnp.zeros(n, jnp.float32)
u0 = jnp.zeros(n, jnp.float32)

timeit("gemv only", make_loop(), z0, u0)
timeit("+ z-prox/dual", make_loop(with_zu=True), z0, u0)
timeit("+ norms (4 reductions)", make_loop(with_zu=True, with_norms=True), z0, u0)
timeit("+ norms PACKED (1 reduction)", make_loop(with_zu=True, with_norms=True,
                                                 packed_norms=True), z0, u0)
timeit("+ norms + hist", make_loop(with_zu=True, with_norms=True,
                                   with_hist=True), z0, u0)
timeit("+ norms + hist CHUNKED", make_loop(with_zu=True, with_norms=True,
                                           with_hist=True, chunk_hist=True),
       z0, u0)
timeit("+ norms packed + hist chunked",
       make_loop(with_zu=True, with_norms=True, packed_norms=True,
                 with_hist=True, chunk_hist=True), z0, u0)
timeit("+ all + mask", make_loop(with_zu=True, with_norms=True,
                                 with_hist=True, with_mask=True), z0, u0)
