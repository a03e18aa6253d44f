"""Probe: can a Pallas kernel with VMEM-resident stream matrices beat
XLA's ~31-34 us/iter 2-GEMV floor on the fat-lasso shapes?

Runs K iterations of t = b @ En; x = t @ Dm inside ONE pallas_call
(matrices DMA'd to VMEM once per call), f32-highest and bf16 variants.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

m, n = 1500, 5000
MP, NP = 1536, 5120  # padded to lane multiples
K = 64
CALLS = 8

rng = np.random.default_rng(0)
En_np = np.zeros((NP, MP), np.float32)
En_np[:n, :m] = rng.standard_normal((n, m)).astype(np.float32) / np.sqrt(n)
Dm_np = np.zeros((MP, NP), np.float32)
Dm_np[:m, :n] = rng.standard_normal((m, n)).astype(np.float32) / np.sqrt(m)
b_np = np.zeros((8, NP), np.float32)
b_np[0, :n] = rng.standard_normal(n)

En = jnp.asarray(En_np)
Dm = jnp.asarray(Dm_np)
b0 = jnp.asarray(b_np)


def make(dtype, precision):
    EnT = En.astype(dtype)
    DmT = Dm.astype(dtype)

    def kernel(b_ref, en_ref, dm_ref, out_ref):
        def body(i, b):
            t = jnp.dot(b.astype(dtype), en_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=precision)
            x = jnp.dot(t.astype(dtype), dm_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=precision)
            return x

        out_ref[:] = jax.lax.fori_loop(0, K, body, b_ref[:])

    @jax.jit
    def run(b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, NP), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
        )(b, EnT, DmT)

    return run


def timeit(name, fn):
    r = fn(b0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(CALLS):
        r = fn(b0)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    iters = K * CALLS
    print(f"{name:40s} {dt / iters * 1e6:8.2f} us/iter   {iters / dt:10.0f} iter/s")


print(f"platform: {jax.devices()[0].device_kind}; K={K} per call, {CALLS} calls")
timeit("pallas 2-GEMV f32 highest", make(jnp.float32, jax.lax.Precision.HIGHEST))
timeit("pallas 2-GEMV f32 default", make(jnp.float32, jax.lax.Precision.DEFAULT))
timeit("pallas 2-GEMV bf16", make(jnp.bfloat16, None))
