"""Probe 2: find the engine's ~15 us/iter overhead over a clean loop
(engine LP-affine 34 us/iter vs probe-1's full-math 18.8 us at n=1024,
K=16).  Suspects: done-mask selects per sub-step, the stop-test scalar
chain, the big carry (hist buffers threaded through sub-steps), Boyd's
extra norm terms, jnp.where history freezing.
"""

import time

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


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {ITERS / best:9.0f} iter/s "
          f"{best / ITERS * 1e6:7.2f} us/iter", flush=True)


def make_loop(masked=False, stop_chain=False, full_errs=False,
              while_loop=False):
    @jax.jit
    def run(z0, u0):
        hist = {k: jnp.full((ITERS,), jnp.nan, jnp.float32)
                for k in ("pnorm", "dnorm", "perr", "derr")}
        carry0 = {"k": jnp.int32(0), "x": jnp.zeros_like(z0), "z": z0,
                  "u": u0, "done": jnp.asarray(False), "hist": hist}

        def sub(c):
            k, z, u, done = c["k"], c["z"], c["u"], c["done"]
            rhs = jnp.concatenate([1.0 * (z - u) - b, s])
            x = K1 @ rhs
            znew = jnp.maximum(x + u, 0.0)
            unew = u + x - znew
            pn = jnp.linalg.norm(x - znew)
            dn = jnp.linalg.norm(unew)
            if full_errs:
                sqn = jnp.sqrt(jnp.float32(n))
                pe = sqn * 1e-5 + 1e-3 * jnp.maximum(
                    jnp.maximum(jnp.linalg.norm(x), jnp.linalg.norm(znew)),
                    jnp.float32(0.0))
                de = sqn * 1e-5 + 1e-3 * 1.0 * jnp.linalg.norm(unew)
            else:
                pe = 1e-5 * 32 + 1e-3 * jnp.linalg.norm(x)
                de = 1e-5 * 32 + 1e-3 * dn
            if stop_chain:
                stop = jnp.logical_and(pn < pe, dn < de)
                done_new = jnp.logical_or(done, stop)
            else:
                done_new = done
            h = dict(c["hist"])
            if masked:
                live = jnp.logical_not(done)
                x = jnp.where(live, x, c["x"])
                znew = jnp.where(live, znew, z)
                unew = jnp.where(live, unew, u)
                h["pnorm"] = h["pnorm"].at[k].set(
                    jnp.where(live, pn, h["pnorm"][k]))
                h["dnorm"] = h["dnorm"].at[k].set(
                    jnp.where(live, dn, h["dnorm"][k]))
                h["perr"] = h["perr"].at[k].set(
                    jnp.where(live, pe, h["perr"][k]))
                h["derr"] = h["derr"].at[k].set(
                    jnp.where(live, de, h["derr"][k]))
                knew = jnp.where(live, k + 1, k)
            else:
                h["pnorm"] = h["pnorm"].at[k].set(pn)
                h["dnorm"] = h["dnorm"].at[k].set(dn)
                h["perr"] = h["perr"].at[k].set(pe)
                h["derr"] = h["derr"].at[k].set(de)
                knew = k + 1
            return {"k": knew, "x": x, "z": znew, "u": unew,
                    "done": done_new, "hist": h}

        def body(c):
            for _ in range(K):
                c = sub(c)
            return c

        if while_loop:
            def cond(c):
                return jnp.logical_and(c["k"] < ITERS,
                                       jnp.logical_not(c["done"]))
            return jax.lax.while_loop(cond, body, carry0)
        return jax.lax.fori_loop(0, ITERS // K, lambda i, c: body(c), carry0)

    return run


z0 = jnp.zeros(n, jnp.float32)
u0 = jnp.zeros(n, jnp.float32)

timeit("baseline (hist, no mask, fori)", make_loop(), z0, u0)
timeit("+ full Boyd errors", make_loop(full_errs=True), z0, u0)
timeit("+ stop chain", make_loop(full_errs=True, stop_chain=True), z0, u0)
timeit("+ done-mask everything", make_loop(full_errs=True, stop_chain=True,
                                           masked=True), z0, u0)
timeit("+ while_loop (the real engine shape)",
       make_loop(full_errs=True, stop_chain=True, masked=True,
                 while_loop=True), z0, u0)
timeit("while_loop, unmasked", make_loop(full_errs=True, stop_chain=True,
                                         while_loop=True), z0, u0)
