"""VMEM-resident GEMV floor: unroll K sub-iterations per loop step so
XLA hoists the 60 MB of stream matrices into VMEM (as the engine's
unroll=16 does), then measure the pure 2-GEMV chain with no ADMM logic.
Compares against the engine's measured 40 us/iter to size the fusible
overhead."""

import time

import jax
import jax.numpy as jnp
import numpy as np

m, n = 1500, 5000
rng = np.random.default_rng(0)
D = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
E = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
Dt = D.T.copy()
b0 = jnp.asarray(rng.standard_normal(n), jnp.float32) * 1e-3

TOTAL = 2048


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    jax.block_until_ready(args)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"{name:46s} {dt / TOTAL * 1e6:8.2f} us/iter   {TOTAL / dt:10.0f} iter/s")


def unrolled(K, body):
    steps = TOTAL // K

    @jax.jit
    def run(b):
        def f(i, b):
            for _ in range(K):
                b = body(b)
            return b * (1.0 - 1e-12)

        return jax.lax.fori_loop(0, steps, f, b)

    return run


def two_gemv(prec):
    def body(b):
        with jax.default_matmul_precision(prec):
            t = E @ b
            x = Dt @ t
        return x * 1e-9  # keep magnitudes sane across 2048 iters

    return body


def two_gemv_rowvec(prec):
    En = E.T.copy()  # (n, m)

    def body(b):
        with jax.default_matmul_precision(prec):
            t = b @ En       # (n,) @ (n, m) -> (m,)
            x = t @ D        # (m,) @ (m, n) -> (n,)
        return x * 1e-9

    return body


def two_gemv_bf16():
    Eb = E.astype(jnp.bfloat16)
    Dtb = Dt.astype(jnp.bfloat16)

    def body(b):
        t = jnp.matmul(Eb, b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        x = jnp.matmul(Dtb, t.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return x * 1e-9

    return body


def full_body(prec):
    Dts = (Dt @ jnp.asarray(rng.standard_normal(m), jnp.float32)) * 1e-3
    kap = 0.01

    def body(b):
        z, u = b[:n], b[n:]
        with jax.default_matmul_precision(prec):
            bvec = Dts + (z - u)
            t = E @ bvec
            x = bvec - Dt @ t * 1e-9
        v = x + u
        z2 = jnp.sign(v) * jnp.maximum(jnp.abs(v) - kap, 0.0)
        u2 = u + x - z2
        # residual norms like the engine computes
        pn = jnp.linalg.norm(x - z2)
        dn = jnp.linalg.norm(z2 - z)
        return jnp.concatenate([z2, u2]) * (1.0 + 0e0 * (pn + dn))

    def wrap(b):
        return body(b)

    return wrap


print(f"platform: {jax.devices()[0].device_kind}; TOTAL={TOTAL}")
for K in (16, 64):
    timeit(f"2-GEMV matvec highest, K={K}", unrolled(K, two_gemv("highest")), b0)
timeit("2-GEMV matvec default, K=64", unrolled(64, two_gemv("default")), b0)
timeit("2-GEMV rowvec highest, K=64", unrolled(64, two_gemv_rowvec("highest")), b0)
timeit("2-GEMV bf16, K=64", unrolled(64, two_gemv_bf16()), b0)
timeit("full body + norms highest, K=16", unrolled(16, full_body("highest")),
       jnp.concatenate([b0, b0]))
