"""Probe 3: is the engine's remaining LP gap (clean loop ~21 us/iter vs
engine ~30-36) the data-as-jit-ARGUMENT effect?  Same full-featured loop
as probe 2's worst case, with the GEMV operand (a) closed over as a
constant vs (b) passed as a jit argument (the engine's caching contract),
interleaved A/A/B/B/A/B to cancel the tunnel's ~±10% drift.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
n = 1024
K1c = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
bc = jnp.asarray(rng.standard_normal(n).astype(np.float32))
ITERS = 2000
K = 16


def build(const: bool):
    def run(z0, u0, K1, b):
        if const:
            K1, b = K1c, bc
        hist = {k: jnp.full((ITERS,), jnp.nan, jnp.float32)
                for k in ("pnorm", "dnorm", "perr", "derr")}
        carry0 = {"k": jnp.int32(0), "x": jnp.zeros_like(z0), "z": z0,
                  "u": u0, "done": jnp.asarray(False), "hist": hist}

        def sub(c):
            k, z, u, done = c["k"], c["z"], c["u"], c["done"]
            x = K1 @ (1.0 * (z - u) - b)
            znew = jnp.maximum(x + u, 0.0)
            unew = u + x - znew
            pn = jnp.linalg.norm(x - znew)
            dn = jnp.linalg.norm(unew)
            sqn = jnp.sqrt(jnp.float32(n))
            pe = sqn * 1e-5 + 1e-3 * jnp.maximum(jnp.linalg.norm(x),
                                                 jnp.linalg.norm(znew))
            de = sqn * 1e-5 + 1e-3 * jnp.linalg.norm(unew)
            done_new = jnp.logical_or(done, jnp.logical_and(pn < pe, dn < de))
            live = jnp.logical_not(done)
            x = jnp.where(live, x, c["x"])
            znew = jnp.where(live, znew, z)
            unew = jnp.where(live, unew, u)
            h = dict(c["hist"])
            for name, v in (("pnorm", pn), ("dnorm", dn), ("perr", pe),
                            ("derr", de)):
                h[name] = h[name].at[k].set(jnp.where(live, v, h[name][k]))
            return {"k": jnp.where(live, k + 1, k), "x": x, "z": znew,
                    "u": unew, "done": done_new, "hist": h}

        def body(c):
            for _ in range(K):
                c = sub(c)
            return c

        def cond(c):
            return jnp.logical_and(c["k"] < ITERS, jnp.logical_not(c["done"]))

        return jax.lax.while_loop(cond, body, carry0)

    return jax.jit(run)


z0 = jnp.zeros(n, jnp.float32)
u0 = jnp.zeros(n, jnp.float32)
variants = {"const": build(True), "arg": build(False)}
for name, fn in variants.items():
    out = jax.block_until_ready(fn(z0, u0, K1c, bc))
    np.asarray(out["k"])  # host materialization after compile

results = {name: [] for name in variants}
for _ in range(4):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn(z0, u0, K1c, bc))
        results[name].append(time.perf_counter() - t0)

for name, ts in results.items():
    best, med = min(ts), sorted(ts)[len(ts) // 2]
    print(f"{name:6s} best {ITERS / best:9.0f} iter/s "
          f"{best / ITERS * 1e6:7.2f} us/iter   "
          f"median {med / ITERS * 1e6:7.2f} us/iter", flush=True)
