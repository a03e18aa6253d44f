"""Prototype: the FULL fat-lasso ADMM iteration (x-GEMV pair +
soft-threshold + dual update + residual norms) inside ONE pallas_call
with the stream matrices VMEM-resident, K iterations per call.

Checks numerics against the engine's trajectory and times it.
Shapes padded to lane multiples; state carried as an (8, NP) tile with
row 0 live (rows 1-7 stay identically zero through every update).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

m, n = 1500, 5000
MP, NP = 1536, 5120
K = 64
CALLS = 8

rng = np.random.default_rng(0)
testx = rng.standard_normal(n) * (rng.random(n) < 0.1)
D = rng.standard_normal((m, n)).astype(np.float32)
D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
s = (D @ testx + np.sqrt(0.001) * rng.standard_normal(m)).astype(np.float32)
lam = float(0.1 * np.max(np.abs(D.T @ s)))
rho = 1.0

# FatShiftSolver streams: E = (D D^T/rho + I)^{-1} D;  x = b/rho - D^T(E b)/rho^2
G = D @ D.T / rho + np.eye(m, dtype=np.float32)
E = np.linalg.solve(0.5 * (G + G.T), D).astype(np.float32)
Dts = (D.T @ s).astype(np.float32)

# Padded row-vector operands: t = b @ Et;  DtEb = t @ Dm
Et = np.zeros((NP, MP), np.float32)
Et[:n, :m] = E.T
Dm = np.zeros((MP, NP), np.float32)
Dm[:m, :n] = D
Dts_p = np.zeros((8, NP), np.float32)
Dts_p[0, :n] = Dts

Et_j = jnp.asarray(Et)
Dm_j = jnp.asarray(Dm)
Dts_j = jnp.asarray(Dts_p)
kappa = lam / rho


def make_kernel(precision):
    def kernel(zu_ref, dts_ref, et_ref, dm_ref, out_ref, hist_ref):
        def body(i, carry):
            z, u = carry
            b = dts_ref[:] + rho * (z - u)
            t = jnp.dot(b, et_ref[:], preferred_element_type=jnp.float32,
                        precision=precision)
            x = b / rho - jnp.dot(t, dm_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=precision) / (rho * rho)
            v = x + u
            z2 = jnp.sign(v) * jnp.maximum(jnp.abs(v) - kappa, 0.0)
            u2 = u + x - z2
            pn2 = jnp.sum((x - z2) ** 2)
            dn2 = (rho * rho) * jnp.sum((z2 - z) ** 2)
            hist_ref[i, 0] = pn2
            hist_ref[i, 1] = dn2
            return (z2, u2)

        z0 = zu_ref[0:8, :]
        u0 = zu_ref[8:16, :]
        z, u = jax.lax.fori_loop(0, K, body, (z0, u0))
        out_ref[0:8, :] = z
        out_ref[8:16, :] = u

    @jax.jit
    def run(zu):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((16, NP), jnp.float32),
                jax.ShapeDtypeStruct((K, 128), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(zu, Dts_j, Et_j, Dm_j)

    return run


def reference_np(iters):
    z = np.zeros(n); u = np.zeros(n)
    hist = []
    for _ in range(iters):
        b = Dts + rho * (z - u)
        x = b / rho - D.T @ (E @ b) / rho**2
        v = x + u
        z2 = np.sign(v) * np.maximum(np.abs(v) - kappa, 0.0)
        u = u + x - z2
        hist.append((np.sum((x - z2) ** 2), rho**2 * np.sum((z2 - z) ** 2)))
        z = z2
    return z, u, np.array(hist)


print(f"platform: {jax.devices()[0].device_kind}; K={K}, CALLS={CALLS}")
run = make_kernel(jax.lax.Precision.HIGHEST)
zu0 = jnp.zeros((16, NP), jnp.float32)

out, hist = run(zu0)
jax.block_until_ready(out)

# ---- numerics vs f64 numpy reference over K iterations
z_np, u_np, hist_np = reference_np(K)
z_k = np.asarray(out[0, :n])
u_k = np.asarray(out[8, :n])
print("z err vs numpy:", np.max(np.abs(z_k - z_np)) / (np.max(np.abs(z_np)) + 1e-30))
print("u err:", np.max(np.abs(u_k - u_np)) / (np.max(np.abs(u_np)) + 1e-30))
print("pn2 rel err @K-1:", abs(float(hist[K - 1, 0]) - hist_np[-1, 0]) / (hist_np[-1, 0] + 1e-30))

# ---- timing: chained calls (state feeds back through HBM between calls)
def timeit(name, fn, arg):
    r, h = fn(arg)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    cur = arg
    for _ in range(CALLS):
        cur, h = fn(cur)
    jax.block_until_ready(cur)
    dt = time.perf_counter() - t0
    iters = K * CALLS
    print(f"{name:44s} {dt / iters * 1e6:8.2f} us/iter   {iters / dt:10.0f} iter/s")


timeit("pallas full-iter f32 highest (resident)", run, zu0)
run_d = make_kernel(jax.lax.Precision.DEFAULT)
timeit("pallas full-iter f32 default (resident)", run_d, zu0)
