"""Locate the per-iteration floor of the fat-lasso headline.

Times, on the real TPU, pure fori_loop chains of the iteration's two
GEMV streams under different precisions/layouts, with no ADMM logic.
Answers: is the ~40us/iter floor (a) GEMV streaming rate, (b) the
transposed D.T access, (c) precision passes, or (d) loop overhead?
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

m, n = 1500, 5000
K = 512  # iterations per timed call

rng = np.random.default_rng(0)
D = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
E = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
Dt = D.T.copy()  # materialized (n, m) layout
b0 = jnp.asarray(rng.standard_normal(n), jnp.float32)


def timeit(name, fn, *args):
    fn(*args).block_until_ready()
    jax.block_until_ready(args)
    t0 = time.perf_counter()
    r = fn(*args)
    r.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{name:42s} {dt / K * 1e6:8.2f} us/iter   {K / dt:10.0f} iter/s")
    return dt


def chain(body):
    @jax.jit
    def run(b):
        def f(i, b):
            out = body(b)
            # keep a serial dependency, same output shape as input
            return out / (1.0 + 1e-12 * i)

        return jax.lax.fori_loop(0, K, f, b)

    return run


def two_gemv(prec, use_dt):
    def body(b):
        with jax.default_matmul_precision(prec):
            Eb = E @ b
            x = (Dt @ Eb) if use_dt else (D.T @ Eb)
        return x[:n] if x.shape[0] == n else x

    return chain(body)


def one_gemv(prec):
    def body(b):
        with jax.default_matmul_precision(prec):
            Eb = E @ b
        # pad back to n with zeros to keep the carry shape
        return jnp.zeros(n, jnp.float32).at[:m].set(Eb)

    return chain(body)


def bf16_two_gemv():
    Db = D.astype(jnp.bfloat16)
    Eb_ = E.astype(jnp.bfloat16)
    Dtb = Dt.astype(jnp.bfloat16)

    def body(b):
        v = Eb_ @ b.astype(jnp.bfloat16)
        x = jnp.matmul(Dtb, v, preferred_element_type=jnp.float32)
        return x

    return chain(body)


def full_iter(prec):
    """The actual fat-lasso iteration body (x, z, u updates + norms)."""
    Dts = Dt @ jnp.asarray(rng.standard_normal(m), jnp.float32)
    lam_over_rho = 0.01

    def body(carry):
        z, u = carry[:n], carry[n:]
        with jax.default_matmul_precision(prec):
            bvec = Dts + (z - u)
            Ebv = E @ bvec
            x = bvec - Dt @ Ebv
        v = x + u
        z2 = jnp.sign(v) * jnp.maximum(jnp.abs(v) - lam_over_rho, 0.0)
        u2 = u + x - z2
        return jnp.concatenate([z2, u2])

    return chain(body)


print(f"shapes: D,E = {m}x{n} f32 ({D.nbytes/1e6:.0f} MB each), K={K}")
print(f"platform: {jax.devices()[0].platform} {jax.devices()[0].device_kind}")

timeit("one GEMV E@b, highest", one_gemv("highest"), b0)
timeit("one GEMV E@b, default", one_gemv("default"), b0)
timeit("two GEMV (D.T view), highest", two_gemv("highest", False), b0)
timeit("two GEMV (Dt materialized), highest", two_gemv("highest", True), b0)
timeit("two GEMV (Dt materialized), default", two_gemv("default", True), b0)
timeit("two GEMV bf16 streams", bf16_two_gemv(), b0)
timeit("full lasso iteration body, highest", full_iter("highest"),
       jnp.concatenate([b0, b0]))
