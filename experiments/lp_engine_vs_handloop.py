"""Interleaved A/B: the ENGINE's LP-affine solve vs a hand-written loop
with the same math (probe-2's full-featured variant), alternated in one
process to cancel the tunnel's ±10-20% drift.  Decides whether the
engine's remaining gap over the clean loop (earlier windows read
~30 vs ~21.5 us/iter, not interleaved) is drift or machinery.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.models.linearprogram import linearprogram

rng = np.random.default_rng(0)
n = 1024
ITERS = 2000
K = 16

truex = np.abs(rng.standard_normal(n))
Dlp = np.abs(rng.standard_normal((n, n))).astype(np.float32)
slp = (Dlp @ truex).astype(np.float32)
blp = (rng.random(n) + 0.5).astype(np.float32)

cfg = ADMMConfig(maxiters=ITERS, domaxiters=True, unroll=K)

# Hand loop with the same affine-KKT math + norms + hist + mask + while.
K1 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
x0aff = jnp.asarray(rng.standard_normal(n).astype(np.float32))
b = jnp.asarray(blp)


@jax.jit
def hand(z0, u0):
    hist = {k: jnp.full((ITERS,), jnp.nan, jnp.float32)
            for k in ("pnorm", "dnorm", "perr", "derr")}
    carry0 = {"k": jnp.int32(0), "x": jnp.zeros_like(z0), "z": z0, "u": u0,
              "done": jnp.asarray(False), "hist": hist}

    def sub(c, frozen):
        k, z, u = c["k"], c["z"], c["u"]
        x = K1 @ (1.0 * (z - u) - b) + x0aff
        znew = jnp.maximum(x + u, 0.0)
        unew = u + x - znew
        pn = jnp.linalg.norm(x - znew)
        dn = jnp.linalg.norm(unew)
        sqn = jnp.sqrt(jnp.float32(n))
        pe = sqn * 1e-5 + 1e-3 * jnp.maximum(jnp.linalg.norm(x),
                                             jnp.linalg.norm(znew))
        de = sqn * 1e-5 + 1e-3 * jnp.linalg.norm(unew)
        done = jnp.logical_or(c["done"], jnp.logical_and(pn < pe, dn < de))
        sel = lambda old, new: jnp.where(frozen, old, new)
        kw = jnp.where(frozen, jnp.int32(ITERS), k)
        h = dict(c["hist"])
        for name, v in (("pnorm", pn), ("dnorm", dn), ("perr", pe),
                        ("derr", de)):
            h[name] = h[name].at[kw].set(v, mode="drop")
        return {"k": sel(k, k + 1), "x": sel(c["x"], x),
                "z": sel(z, znew), "u": sel(u, unew),
                "done": sel(c["done"], done), "hist": h}

    def body(c):
        for _ in range(K):
            frozen = jnp.logical_or(c["done"], c["k"] >= ITERS)
            c = sub(c, frozen)
        return c

    def cond(c):
        return jnp.logical_and(c["k"] < ITERS, jnp.logical_not(c["done"]))

    return jax.lax.while_loop(cond, body, carry0)


z0 = jnp.zeros(n, jnp.float32)
u0 = jnp.zeros(n, jnp.float32)

# Warm-ups with host materialization.
np.asarray(linearprogram(blp, Dlp, slp, cfg).steps)
np.asarray(jax.block_until_ready(hand(z0, u0))["k"])

eng, hnd = [], []
for _ in range(6):
    t0 = time.perf_counter()
    r = linearprogram(blp, Dlp, slp, cfg)
    eng.append(r.runtime)
    t0 = time.perf_counter()
    jax.block_until_ready(hand(z0, u0))
    hnd.append(time.perf_counter() - t0)

for name, ts in (("engine", eng), ("handloop", hnd)):
    best, med = min(ts), sorted(ts)[len(ts) // 2]
    print(f"{name:9s} best {ITERS / best:9.0f} iter/s "
          f"{best / ITERS * 1e6:7.2f} us/iter   median "
          f"{med / ITERS * 1e6:7.2f} us/iter", flush=True)
print(f"gap (median): {sorted(eng)[3] / sorted(hnd)[3]:.2f}x")
